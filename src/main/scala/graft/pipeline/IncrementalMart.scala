package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental mart maintenance: recompute ONLY the date partitions touched
  * by newly-arrived events and swap them in place, instead of the
  * reference's full T+1 recompute (etl_to_analytics_mart.py recomputes every
  * mart over the whole curated layer daily — fine at GB scale, ruinous at
  * 100 TB where a day touches a sliver of history).
  *
  * Mechanism: dynamic partition overwrite
  * (`spark.sql.sources.partitionOverwriteMode=dynamic`) — the write replaces
  * exactly the `event_date=...` directories present in the incremental
  * result and leaves every other partition untouched. Correct for any mart
  * whose rows are functions of a single date partition (all four cold marts
  * here: their group keys include event_date). Marts aggregating ACROSS
  * dates (e.g. trend_pct) must recompute the affected window instead.
  */
object IncrementalMart {

  /** Overwrite only the partitions present in `martSlice`. The target mart
    * must already be laid out partitioned by `partitionCol` (as
    * [[DailyPipeline.coldMarts]] writes them) — mixing this into a flat mart
    * directory would leave the old root-level files alongside the new
    * partition dirs. The overwrite mode is a per-write option, not a session
    * conf toggle, so concurrent refreshes of different marts can't race each
    * other into a static (delete-everything) overwrite. */
  def overwriteTouchedPartitions(
      martSlice: DataFrame,
      martPath: String,
      partitionCol: String = "event_date"): Unit =
    martSlice.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(martPath)

  /** Incrementally refresh a per-date mart: slice the curated layer to the
    * dates present in `newEvents` (partition pruning makes this slice read
    * only those directories), recompute the mart for that slice, and
    * dynamic-overwrite the touched partitions. */
  def refresh(
      spark: SparkSession,
      curatedPath: String,
      martPath: String,
      newEvents: DataFrame,
      mart: DataFrame => DataFrame,
      partitionCol: String = "event_date"): Seq[String] = {
    val touched = newEvents.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val slice = spark.read.parquet(curatedPath)
      .filter(col(partitionCol).cast("string").isin(touched: _*))
    overwriteTouchedPartitions(mart(slice), martPath, partitionCol)
    touched
  }
}
