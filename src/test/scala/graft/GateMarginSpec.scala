package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Data-refresh insurance for the NARROWEST MARGIN-OK oracle gates
  * (round-9 verdict #8, extending the DsirMarginSpec recipe from
  * quantized-integer gates to float-emitting ones).
  *
  * These queries emit float gate columns that the driver rounds to 6dp
  * before hashing. ORACLE_PORTABILITY.md measures every value's distance
  * to its rounding HALF boundary (x.5e-6 — where one ulp of cross-build
  * drift flips the 6th decimal on one engine only) and today's gate
  * corpus clears it everywhere — but the audit is a snapshot, and a data
  * refresh could silently land a new value ON the boundary, turning a
  * libm ulp into a phantom hash miss months later. This spec re-measures
  * the margin on the GATE corpus inside `sbt test`, for the ten queries
  * the audit ranks narrowest, so the regression is caught at commit time
  * with a named query and column instead of a red driver row.
  *
  * Threshold: 1e-6 micro-units, the DsirMarginSpec bound — three orders
  * of magnitude above observed libm drift (~1e-9 micro at |ln| ≤ 20).
  * q163's es_key (Efraimidis–Spirakis ln-derived keys, the one genuinely
  * narrow query at 0.003 micro today) is the main customer; the other
  * nine sit near the 0.5-micro maximum because their values are exact
  * 2-decimal currency sums, and the spec pins that property against
  * refreshed data too.
  */
class GateMarginSpec extends SparkSpec {

  // the ten narrowest MARGIN-OK rows of ORACLE_PORTABILITY.md (round 10);
  // measured distances at adoption time ranged 0.003 (q163) to 0.5 micro.
  // SINGLE SOURCE (round-10 ADVICE): the list lives in
  // tools/gate_margin_narrowest.txt and is read by BOTH this spec and
  // tools/oracle_portability.py, so a re-rank can't update one and not
  // the other.
  private val narrowest: Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("tools/gate_margin_narrowest.txt"))
      .asScala.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  test("narrowest float gates: every value stays off its 6dp rounding half boundary") {
    val misses = narrowest.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, GateData.dir)
      val floatCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
      }
      assert(floatCols.nonEmpty,
        s"$name has no float gate columns — it left MARGIN-OK; " +
          "retire it from this spec and promote the next-narrowest")
      floatCols.flatMap { c =>
        // distance from v·10⁶'s fractional part to the rounding half
        // point — the exact statistic tools/oracle_portability.py ranks
        val v = col(c).cast("double") * lit(1e6)
        val frac = v - floor(v)
        val d = df.filter(col(c).isNotNull && !isnan(col(c)))
          .agg(min(abs(frac - lit(0.5))).as("d"))
          .collect().head
        if (d.isNullAt(0)) None
        else if (d.getDouble(0) > 1e-6) None
        else Some(s"$name.$c at ${d.getDouble(0)} micro")
      }
    }
    assert(misses.isEmpty,
      "gate values within 1e-6 micro of a 6dp rounding half boundary " +
        "(cross-build ulp drift could flip the hashed digit): " +
        misses.mkString("; "))
  }

  test("mixture keep rates (q140/q283): every unsaturated rate sits off its basis-point floor boundary") {
    // q283 hides the temperature mixture's pow-derived rate inside an
    // all-integer output (the q180 INT-FROM-FLOAT shape):
    // floor(rate * 10000) is the one float→int decision a cross-build
    // pow() ulp could flip. This spec pins the GATE corpus off that
    // boundary, for both frames the mixture runs on: the raw corpus
    // (q140) and q283's decontaminated clean corpus. Saturated sources
    // (rate = the exact double literal 1.0 via least) need no margin —
    // identical bits by construction.
    import graft.analysis.CorpusPrep
    val docs = graft.adapters.TestData.documents(spark, GateData.dir)
    def minMargin(frame: org.apache.spark.sql.DataFrame): Option[Double] = {
      val v = col("rate") * lit(10000.0)
      val f = v - floor(v).cast("double")
      val d = CorpusPrep.temperatureRates(frame)
        .filter(col("rate") < 1.0)
        .agg(min(least(f, lit(1.0) - f)).as("d"))
        .collect().head
      if (d.isNullAt(0)) None else Some(d.getDouble(0))
    }
    minMargin(docs).foreach(m => assert(m > 1e-6,
      s"a q140 keep rate sits $m bp-units from its floor boundary — " +
        "cross-build pow drift could flip rate_bp"))
    minMargin(CorpusPrep.pretrainClean(docs)).foreach(m => assert(m > 1e-6,
      s"a q283 clean-corpus keep rate sits $m bp-units from its floor " +
        "boundary — cross-build pow drift could flip rate_bp"))
    // q291's batch-0 arm runs the SAME mixture over the as-of HALF corpus
    // (q287/q290's max-id split) — a different per-source count vector,
    // so its rates need their own boundary measurement
    val half = docs.agg(max("doc_id")).head.getLong(0) / 2
    minMargin(CorpusPrep.pretrainClean(docs.filter(col("doc_id") <= half)))
      .foreach(m => assert(m > 1e-6,
        s"a q291 batch-0 clean-corpus keep rate sits $m bp-units from its " +
          "floor boundary — cross-build pow drift could flip rate_bp"))
  }
}
