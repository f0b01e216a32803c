package graft

import org.apache.spark.sql.functions._

/** Cross-BUILD portability gate for q56/q81 (pagerank micro-units).
  *
  * The r9 rewrite makes the pagerank gate column BIGINT micro-units
  * ⌊rank·10⁶ + 0.5⌋. The power iteration itself is pure IEEE +,*,/ (no
  * libm), but the per-node inflow SUM is order-sensitive, so Spark and a
  * DuckDB build may land on doubles a few ulps apart (~1e-8 micro-units
  * at rank ≈ 1 over 5 iterations). The quantized gate is invariant unless
  * a rank·10⁶ + 0.5 value sits on an integer boundary within that drift.
  * This spec runs the GATE corpus (the exact graph the driver's oracle
  * evaluates) and asserts every value clears the boundary by > 1e-6
  * micro-units — two orders of magnitude beyond the worst drift estimate.
  */
class PagerankMarginSpec extends SparkSpec {

  private def boundaryDistance(raw: org.apache.spark.sql.Column) = {
    val v = raw * lit(1e6) + lit(0.5)
    val f = v - floor(v).cast("double")
    least(f, lit(1.0) - f)
  }

  private def minMargin(weighted: Boolean): Double = {
    val clicks = graft.adapters.TestData.clicks(spark, GateData.dir)
    val edges = graft.analysis.Graphs.cooccurrenceEdges(
      clicks, "session_id", "document_id", maxPerKey = 100)
    val ranks = graft.analysis.Graphs.pageRank(
      edges, damping = 0.85, iterations = 5,
      weightCol = if (weighted) Some("weight") else None)
    ranks.agg(min(boundaryDistance(col("pagerank"))).as("d"))
      .collect().head.getDouble(0)
  }

  test("q56 gate corpus: every pagerank micro value is off its floor boundary") {
    val d = minMargin(weighted = false)
    assert(d > 1e-6,
      s"an unweighted pagerank sits $d micro-units from its floor boundary — " +
        "ulp-level cross-build sum-order drift could flip pagerank_micro; " +
        "change the quantum (1e6 -> a nearby prime scale) to move the boundary")
  }

  test("q81 gate corpus: every weighted pagerank micro value is off its floor boundary") {
    val d = minMargin(weighted = true)
    assert(d > 1e-6,
      s"a weighted pagerank sits $d micro-units from its floor boundary")
  }

  test("q233 gate corpus: every HITS micro value is off its floor boundary") {
    val clicks = graft.adapters.TestData.clicks(spark, GateData.dir)
      .filter(col("document_id").isNotNull)
    val scores = graft.analysis.Graphs.hits(
      clicks.select(col("session_id").as("src"), col("document_id").as("dst")),
      iterations = 5)
    val d = scores.agg(min(boundaryDistance(col("score"))).as("d"))
      .collect().head.getDouble(0)
    assert(d > 1e-6,
      s"a HITS score sits $d micro-units from its floor boundary — " +
        "ulp-level cross-build sum-order drift could flip score_micro")
  }
}
