package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundary positions as a native Catalyst expression
  * — the O(chars) rolling twin of [[graft.analysis.Dedup.cdcChunkDedup]]'s
  * declarative per-position Horner fold (O(window·chars)).
  *
  * Spark has no scan/prefix higher-order function, so a rolling hash —
  * state carried from one char to the next — cannot be expressed
  * declaratively; per the extension preference order (compose > Expression
  * > plan > mapPartitions) a scalar Expression is the right altitude: it
  * fuses into the projection, keeps the chunking per-row, and needs no
  * shuffle.
  *
  * Semantics are BIT-IDENTICAL to the declarative fold (and to the DuckDB
  * oracle): position p (1-based) is a boundary iff window ≤ p < len and the
  * mod-prime Horner hash of the trailing `window` code points ≡ 0
  * (mod 2^maskBits). The rolling update h ← (h·257 + c_in − c_out·257^w)
  * mod p lands on the same residue class as the windowed fold because mod
  * commutes with add/multiply — one multiply/add/subtract/mod per char
  * instead of `window` of them. */
object CdcBoundaries {

  val Prime = 1000000007L
  val Base = 257L

  /** 1-based boundary positions (ascending, doc end excluded). Called from
    * generated code. */
  def compute(s: UTF8String, window: Int, maskBits: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    val mask = (1L << maskBits) - 1L
    if (len < window) return new GenericArrayData(Array.empty[Int])
    // 257^window mod p, once per call (window is a plan literal)
    var pw = 1L
    var e = 0
    while (e < window) { pw = (pw * Base) % Prime; e += 1 }
    val out = new java.util.ArrayList[Integer](len / 16 + 4)
    var h = 0L
    var j = 0
    while (j < len) {
      h = (h * Base + cps(j)) % Prime
      if (j >= window) {
        h = (h - (cps(j - window) * pw) % Prime + Prime) % Prime
      }
      val p = j + 1
      if (p >= window && p < len && (h & mask) == 0L) out.add(p)
      j += 1
    }
    val arr = new Array[Int](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  def cdcBoundaries(text: Column, window: Int, maskBits: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CdcBoundariesExpr(ColumnBridge.expression(text), window, maskBits))
  }
}

case class CdcBoundariesExpr(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression {
  require(window >= 2 && maskBits >= 1 && maskBits <= 20)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(input.asInstanceOf[UTF8String], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundaries.compute($c, $window, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundariesExpr =
    copy(child = newChild)
}
