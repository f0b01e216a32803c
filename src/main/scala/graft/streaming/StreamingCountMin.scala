package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.CountMin

/** Streaming twin of the count-min sketch ([[CountMin]]). The batch build
  * is literally a grouped sum over (row, bucket) cells, and a grouped sum
  * is exactly what Structured Streaming's incremental aggregation state
  * maintains — so the streaming sketch needs NO custom state operator: the
  * engine's aggregate state IS the sketch, bounded at depth×width rows
  * forever regardless of key cardinality or stream length.
  *
  * Mergeability is the law that makes the twin trustworthy: the sketch
  * after any prefix of micro-batches equals the batch build over the union
  * of those batches, cell for cell (StreamingCountMinSpec asserts bit
  * equality, and that estimates through the streamed sketch match the
  * batch path). That is what lets a hot streaming sketch and a cold daily
  * batch sketch reconcile by cell-wise addition.
  */
object StreamingCountMin {

  /** Streaming sketch build: same single-pass cell generator as the batch
    * [[CountMin.build]], aggregated by the engine's update-mode state.
    * Emit with `outputMode("update")`; the latest row per (row, bucket) is
    * the current cell counter. */
  def buildStream(
      input: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    input
      .select(CountMin.cellsOf(col(keyCol), depth, width).as("cell"))
      .select(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
}
