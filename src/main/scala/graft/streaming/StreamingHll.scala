package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.analysis.Sketches

/** Streaming twin of the HyperLogLog sketch ([[Sketches.hllEstimate]]),
  * built the same way [[StreamingCountMin]] twins the count-min sketch:
  * the batch register build is a grouped MAX over 〈group, bucket〉 cells,
  * and a grouped max is exactly what Structured Streaming's update-mode
  * aggregation state maintains — NO custom state operator, and the state
  * is bounded at groups×64 small ints forever, regardless of stream length
  * or key cardinality.
  *
  * Max is idempotent and commutative, so the register file after any
  * prefix of micro-batches equals the batch build over the union of those
  * batches REGISTER FOR REGISTER (StreamingSketchSpec asserts bit
  * equality, and that estimates through the streamed registers match the
  * batch estimator). That mergeability is what lets a hot streaming HLL
  * and a cold daily batch HLL reconcile by register-wise max — the same
  * law the KMV and count-min twins pin.
  */
object StreamingHll {

  /** Streaming register build: the shared [[Sketches.hllCell]] projection,
    * aggregated by the engine's update-mode state. Emit with
    * `outputMode("update")`; the latest row per (group, bucket) is the
    * current register. Feed a snapshot to
    * [[Sketches.hllEstimateFromRegisters]] for the estimate. */
  def buildStream(input: DataFrame, groupCol: String, valueCol: String): DataFrame =
    Sketches.hllRegisters(input, groupCol, valueCol)
}
