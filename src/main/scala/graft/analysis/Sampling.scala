package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Why not `df.sample()`: Spark's sampler is seeded per-partition, so the
  * selected set changes with partitioning, task retries re-draw it, and no
  * other engine can reproduce it — unacceptable for a dataset card that says
  * "20% of stratum X". Hash-gating on a stable key fixes all three: a row is
  * in the sample iff `bucket(md5(key)) < fraction·buckets`, a pure
  * per-row predicate with
  *  - no shuffle (embarrassingly parallel, pipelines into the scan),
  *  - exactly-once semantics under retries,
  *  - the same selected set in any engine with an md5 function,
  *  - built-in coordination: the p% sample is a SUBSET of the q% sample for
  *    p < q (useful for nested train/val carve-outs).
  *
  * The bucket is the first 8 md5 hex chars as an integer, modulo `buckets` —
  * uniform to ~2⁻³² regardless of key distribution.
  */
object Sampling {

  val DefaultBuckets = 10000

  /** Uniform hash bucket in [0, buckets) from a stable key column. */
  def hashBucket(key: Column, buckets: Int = DefaultBuckets): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Deterministic Bernoulli(fraction) sample gated on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      buckets: Int = DefaultBuckets): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    df.filter(hashBucket(col(keyCol), buckets) < math.round(fraction * buckets))
  }

  /** Stratified deterministic sample: per-stratum fractions, `default` for
    * strata not listed. One scan, no shuffle — the threshold is a when-chain
    * folded into the same codegen'd filter as the hash. */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0,
      buckets: Int = DefaultBuckets): DataFrame = {
    (fractions.values.toSeq :+ default).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction out of [0,1]: $f"))
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(math.round(default * buckets))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), buckets) < threshold)
  }

  /** Weighted deterministic sample: inclusion probability proportional to a
    * weight column — p_i = fraction · wᵢ / mean(w), capped at 1 by the
    * bucket range itself — gated on the same md5 bucket, so every
    * hashSample property survives (exactly-once under retries,
    * partitioning-independent, reproducible in any engine) while heavy rows
    * (long documents, high-value sessions) oversample. The mean weight is
    * ONE 1-row aggregate folded in as a literal; the per-row threshold is
    * pure double arithmetic in a fixed evaluation order so an external
    * oracle reproduces the selected set bit-for-bit. Expected sample size
    * ≈ fraction·n while few rows clamp. */
  def weightedHashSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      fraction: Double,
      buckets: Int = DefaultBuckets): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    val row = df.agg(avg(col(weightCol))).collect().head
    require(!row.isNullAt(0),
      s"weightedHashSample: no rows (or all-null $weightCol) to average")
    val meanW = row.getDouble(0)
    require(meanW > 0, s"mean($weightCol) must be positive, got $meanW")
    df.filter(hashBucket(col(keyCol), buckets) <
      lit(fraction) * lit(buckets.toDouble) * col(weightCol) / lit(meanW))
  }
}
