package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten / takedown deletion for partitioned parquet layers
  * — the compliance pass every training-data pipeline needs: opt-out and
  * takedown requests arrive as key lists, and the layer must shed those
  * rows without rewriting the world.
  *
  * Scale shape: the delete list is takedown-sized (broadcast); one semi-join
  * pass finds the AFFECTED partitions (aggregate returns #affected rows to
  * the driver, bounded by the partition count); the rewrite then reads ONLY
  * those partitions (partition pruning on the scan) and overwrites ONLY them
  * (dynamic partition overwrite). A layer with 10⁴ daily partitions and a
  * takedown touching 3 days rewrites 3 directories. Partitions whose rows
  * are ALL deleted produce no output under dynamic overwrite and are
  * removed explicitly — without that, the stale directory would keep
  * serving the deleted rows, the exact failure a compliance delete cannot
  * have.
  *
  * Same non-atomicity caveat as [[Compactor]]: per-partition directory
  * replacement is not transactional; a table format with snapshot commits
  * can slot in behind this interface.
  */
object Takedown {

  final case class Report(
      partitionsAffected: Seq[String],
      partitionsRemoved: Seq[String],
      rowsDeleted: Long)

  /** Delete every row whose `keyCol` appears in `deleteKeys` from the layer
    * at `layerPath` (partitioned by `partitionCol`), rewriting only affected
    * partitions. Returns what was touched — the audit record a takedown
    * process must emit. */
  def deleteKeys(
      spark: SparkSession,
      layerPath: String,
      deleteKeys: DataFrame,
      keyCol: String,
      partitionCol: String): Report = {
    val keys = deleteKeys.select(col(keyCol)).distinct()
    val layer = spark.read.parquet(layerPath)
    val affected = layer.join(broadcast(keys), Seq(keyCol), "left_semi")
      .groupBy(col(partitionCol).cast("string").as("p"))
      .agg(count(lit(1)).as("hits"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (affected.isEmpty) return Report(Nil, Nil, 0L)

    val parts = affected.keys.toSeq.sorted
    // materialized BEFORE the overwrite: the frame reads the very files the
    // write replaces, and the emptied-partition set must come from the
    // survivor rows, not from re-reading a layer that still holds them
    val survivors = layer
      .filter(col(partitionCol).cast("string").isInCollection(parts))
      .join(broadcast(keys), Seq(keyCol), "left_anti")
      .localCheckpoint(true)
    val survivedParts = survivors
      .select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet

    val conf = spark.conf
    val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try survivors.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(layerPath)
    finally prev match {
      case Some(v) => conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // dynamic overwrite never touches a partition with zero surviving rows —
    // delete those directories explicitly or the takedown silently no-ops
    // for exactly the keys that dominated their day
    val emptied = parts.filterNot(survivedParts.contains)
    if (emptied.nonEmpty) {
      val fs = new Path(layerPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { p =>
        fs.delete(new Path(layerPath, s"$partitionCol=$p"), true); ()
      }
    }
    Report(parts, emptied, affected.values.sum)
  }
}
