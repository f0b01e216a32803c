package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for a parquet layer
  * (reference: streaming_to_curated_stream.py:186-216 — read layer,
  * coalesce, rewrite to `_compacted`, delete+rename swap via py4j Hadoop FS;
  * here the Hadoop FileSystem API is called directly, no bridge).
  *
  * The swap is non-atomic (SURVEY.md §7.4): a crash between delete and
  * rename loses the layer. The reference accepts this for S3; we keep the
  * behavior but isolate it behind this interface so a transactional table
  * format can replace it without touching callers. `targetFiles` replaces
  * the reference's hardcoded coalesce(1) — size it to layer-bytes /
  * 128 MB on a real cluster.
  */
object Compactor {

  /** `partitionCols` MUST name the layer's partition columns (e.g.
    * `Seq("event_date")` for the curated layer) — a flat rewrite of a
    * partitioned layer would mix flat files into a partitioned directory
    * tree, breaking every subsequent read and silently dropping partition
    * pruning. */
  def compact(
      spark: SparkSession,
      layerPath: String,
      targetFiles: Int = 1,
      partitionCols: Seq[String] = Nil): Unit = {
    val tmpPath = layerPath.stripSuffix("/") + "_compacted"
    val df = spark.read.parquet(layerPath)
    val writer = df.coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmpPath)

    val fs = FileSystem.get(
      new java.net.URI(tmpPath),
      spark.sparkContext.hadoopConfiguration)
    val src = new Path(tmpPath)
    val dst = new Path(layerPath)
    if (!fs.delete(dst, true))
      throw new java.io.IOException(s"compaction: failed to delete $dst")
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"compaction: failed to rename $src -> $dst")
  }
}
