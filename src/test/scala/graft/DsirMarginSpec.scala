package graft

import org.apache.spark.sql.functions._

/** The cross-BUILD portability gate for q165 (dsirSelect).
  *
  * The r8 integer-gate rewrite makes every q165 output column BIGINT: the
  * only floats left are the two pre-quantization scalars (per-bucket
  * logratio, per-doc Gumbel term), each mapped to Long micro-units via
  * ⌊x·10⁶ + 0.5⌋. `floor`, `*`, `+` are bit-deterministic IEEE on every
  * engine, so the only way a different DuckDB/libm build can change an
  * output bit is if its ln() ulp drift pushes x·10⁶ + 0.5 across an
  * integer boundary. This spec runs the GATE dataset (sf0.01 — the exact
  * corpus the driver's oracle evaluates) and asserts every such scalar
  * sits more than 1e-6 micro-units away from its boundary — at least
  * three orders of magnitude beyond any observed libm drift (~1e-9 micro
  * at |ln| ≤ 20). Membership of the top-k set needs no extra margin:
  * integer keys tie-break on doc_id, a total order both engines share.
  */
class DsirMarginSpec extends SparkSpec {

  private def boundaryDistance(raw: org.apache.spark.sql.Column) = {
    val v = raw * lit(1e6) + lit(0.5)
    val f = v - floor(v).cast("double")
    least(f, lit(1.0) - f)
  }

  test("q165 gate corpus: every micro-quantized scalar is off its floor boundary") {
    // GateData FAILS (not skips) when the gate corpus is absent: this spec
    // IS the cross-build invariance claim, so it must never silently pass
    val docs = graft.adapters.TestData.documents(spark, GateData.dir)
    val (ratio, keyed) = graft.analysis.CorpusPrep.dsirFrames(
      docs, isTarget = col("lang") === "en")

    val lrMin = ratio
      .agg(min(boundaryDistance(col("logratio_raw"))).as("d"))
      .collect().head.getDouble(0)
    assert(lrMin > 1e-6,
      s"a bucket logratio sits $lrMin micro-units from its floor boundary — " +
        "an ulp of cross-build ln drift could flip lr_micro; change the " +
        "quantum (1e6 -> a nearby prime scale) to move the boundary")

    val gMin = keyed
      .agg(min(boundaryDistance(col("gumbel_raw"))).as("d"))
      .collect().head.getDouble(0)
    assert(gMin > 1e-6,
      s"a doc gumbel term sits $gMin micro-units from its floor boundary")
  }
}
