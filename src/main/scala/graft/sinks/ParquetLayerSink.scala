package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Parquet data-lake layer writers
  * (reference: batch_to_archive_raw.py:170-176 append-partitioned,
  * etl_to_analytics_mart.py:109-197 per-mart overwrite).
  *
  * Scale notes:
  *  - `partitionBy(event_date)` gives partition pruning to every downstream
  *    date-filtered scan — the single most important layout decision in the
  *    reference, kept here;
  *  - `maxRecordsPerFile` bounds file size instead of the reference's
  *    `coalesce(1)` (which serializes the whole write through one task —
  *    correct for a demo, catastrophic at scale). Small-file pressure is
  *    handled by [[Compactor]] off the hot path instead.
  */
object ParquetLayerSink {

  /** Append-only layer write (archive raw / curated). */
  def appendPartitioned(
      df: DataFrame,
      path: String,
      partitionCol: String = "event_date",
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Full-refresh mart write (cold marts are recomputed T+1). */
  def overwriteMart(df: DataFrame, path: String, partitionCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
  }
}
