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
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a PREVIOUS session's table leaves its directory behind with no entry
    // in this session's in-memory catalog; saveAsTable then refuses the
    // occupied location — clear the orphan so re-creation is idempotent
    // across sessions, not just within one
    // resolve the managed location through the catalog (a database-
    // qualified name lives at <warehouse>/<db>.db/<tbl>, not at a literal
    // "<db>.<tbl>" directory — string-concatenating the raw name would
    // delete the wrong path and leave the real orphan in place)
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
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

  /** Correctness gate for the bucketed-join path (q116): write lineitem and
    * orders bucketed on the order key, join them shuffle-free, aggregate
    * order volume per priority. The bucket layout must be invisible in the
    * result — the DuckDB oracle is the plain SQL join — so the green
    * hash-match row proves write-time hash partitioning + the Exchange-free
    * sort-merge join lose and duplicate nothing (the plan-shape half stays
    * asserted in BucketingSpec). Idempotent: Overwrite mode re-creates the
    * two catalog tables per call. */
  def bucketedOrderVolume(
      spark: SparkSession,
      lineitem: DataFrame,
      orders: DataFrame,
      nBuckets: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    writeBucketed(lineitem.select("l_orderkey", "l_quantity"),
      "graft_bkt_lineitem", "l_orderkey", nBuckets)
    writeBucketed(orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
      "graft_bkt_orders", "l_orderkey", nBuckets)
    colocatedJoin(spark, "graft_bkt_lineitem", "graft_bkt_orders", "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("line_count"))
      .orderBy("o_orderpriority")
  }
}
