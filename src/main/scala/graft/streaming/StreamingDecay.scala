package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.analysis.TimeSeries

/** Streaming twin of decayed popularity
  * ([[graft.analysis.TimeSeries.decayedPopularity]]), built the way the
  * HLL/count-min/KMV twins are: find the formulation in which the batch
  * aggregate's state IS the engine's update-mode aggregation state.
  *
  * The direct form (weights relative to "now") is NOT streamable — every
  * event's weight changes as time advances, so state would need continuous
  * rewriting. Anchoring at a fixed reference epoch
  * ([[TimeSeries.decayedWeights]]) makes each event's weight a constant
  * decided at arrival; the per-item score is then a plain DECIMAL sum —
  * commutative and order-independent — so the state after any prefix of
  * micro-batches equals the batch build over the union of those batches,
  * and a hot streaming artifact merges with a cold daily one by ADDING
  * s_ref/n_events (the same mergeability law the sketch twins pin).
  * Recency is applied at read time with one rescale
  * ([[TimeSeries.popularityFromRef]]); late events simply add — nothing
  * already in the state ever mutates.
  */
object StreamingDecay {

  /** Streaming build: the shared anchored-weights aggregation under the
    * engine's update-mode state. Emit with `outputMode("update")`; the
    * latest row per item is the current 〈s_ref, n_events〉 artifact. */
  def buildStream(
      input: DataFrame, itemCol: String, tsCol: String,
      ref: Column, halfLifeDays: Double = 7.0): DataFrame =
    TimeSeries.decayedWeights(input, itemCol, tsCol, ref, halfLifeDays)
}
