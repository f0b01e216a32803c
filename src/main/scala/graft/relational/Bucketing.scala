package graft.relational

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides
  * on the key. If the same join runs repeatedly (daily marts over the same
  * keys), pay that shuffle ONCE at write time: `bucketBy(n, key)` hash-
  * partitions the files and records the layout in the catalog, and every
  * subsequent join on the key reads both sides already co-partitioned —
  * the plan contains no Exchange at all (asserted in BucketingSpec).
  *
  * Rules of thumb: bucket counts equal on both sides (or integer multiples,
  * with spark.sql.bucketing.coalesceBucketsInJoin.enabled); sortBy the key
  * so the sort-merge join also skips its sort; size buckets ≈ 128-256 MB.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(nBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * are bucketed on `key` with compatible bucket counts. The merge hint
    * pins sort-merge: that is the strategy the bucket layout pre-pays for
    * (both sides of a bucket-worthy join are big; a broadcast-eligible side
    * wouldn't have needed bucketing). */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), Seq(key), joinType)
}
