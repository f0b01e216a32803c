package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Similarity
import graft.functions.DotProductExpr

class FuseVectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def countFused(df: DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach(p =>
      p.expressions.foreach(_.foreach {
        case _: DotProductExpr => n += 1
        case _ => ()
      }))
    n
  }

  /** Local relations constant-fold before any optimizer rule runs, so the
    * fixtures round-trip through parquet to behave like real scans. */
  private def viaParquet(df: DataFrame): DataFrame = {
    val dir = tmpDir("fuse_fixture")
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private lazy val vecs = viaParquet(Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, 0.0f, -1.0f), Array(2.0f, 8.0f, 2.0f))
  ).toDF("id", "a", "b"))

  test("declarative dot over float arrays fuses into the kernel, values unchanged") {
    val q = vecs.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
    assert(countFused(q) === 1, "rule did not fire on the HOF dot shape")
    val out = q.orderBy("id").collect().map(_.getDouble(1))
    assert(out.toSeq === Seq(32.0, -1.0))  // 4+10+18; 1+0-2
  }

  test("composable cosine fuses all three dots; division semantics untouched") {
    val q = vecs.select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(countFused(q) === 3)
    val got = q.collect().map(_.getDouble(0))
    val native = vecs.select(
      graft.functions.VectorOps.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    got.zip(native).foreach { case (g, n) => assert(g === n) }
    // zero vector: the declarative cosine THROWS under ANSI (divide by
    // zero), fused or not — the fusion leaves that contract untouched,
    // while the native cosineSim's 0.0 guard is a deliberately DIFFERENT
    // operator
    val ex = intercept[Exception] {
      viaParquet(Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b"))
        .select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("double-array folds keep the composable plan (float-only scope guard)") {
    val d = vecs.select(col("id"),
      transform(col("a"), x => x.cast("double")).as("a"),
      transform(col("b"), x => x.cast("double")).as("b"))
    val q = d.select(col("id"), Similarity.dot(col("a"), col("b")).as("dd"))
    assert(countFused(q) === 0, "rule must not fire on array<double>")
    assert(q.orderBy("id").collect().map(_.getDouble(1)).toSeq === Seq(32.0, -1.0))
  }

  test("edge semantics match the unfused fold: mismatch null, null element null, empty zero") {
    // the double-array path is the UNFUSED reference for the same values
    def both(a: Seq[java.lang.Float], b: Seq[java.lang.Float]) = {
      val df = viaParquet(Seq((a.toArray, b.toArray)).toDF("a", "b"))
      val fused = df.select(Similarity.dot(col("a"), col("b"))).collect().head
      val ref = df.select(Similarity.dot(
        transform(col("a"), x => x.cast("double")),
        transform(col("b"), x => x.cast("double")))).collect().head
      (Option(fused.get(0)), Option(ref.get(0)))
    }
    val mismatch = both(Seq(1.0f, 2.0f), Seq(1.0f))
    assert(mismatch._1 === mismatch._2 && mismatch._1.isEmpty)
    val nullElem = both(Seq(1.0f, null), Seq(1.0f, 2.0f))
    assert(nullElem._1 === nullElem._2 && nullElem._1.isEmpty)
    val empty = both(Seq.empty, Seq.empty)
    assert(empty._1 === empty._2 && empty._1 === Some(0.0))
  }
}
