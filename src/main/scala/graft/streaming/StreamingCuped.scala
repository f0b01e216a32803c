package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the CUPED per-unit artifact
  * ([[graft.analysis.Stats.cupedUnits]], the q234/q241 family): the
  * experiment readout needs only per-unit exact integer (pre, post) sums,
  * and those merge by ADDITION — exactly `mapGroupsWithState` shape. Each
  * micro-batch quantizes its event values to BIGINT micros (the same
  * ⌊v·10⁶+0.5⌋ the batch path uses), splits them on the cutoff, and adds
  * them into per-unit state; updated units are emitted per batch.
  *
  * The state after any prefix of batches IS the batch
  * [[graft.analysis.Stats.cupedUnits]] over the union of those batches,
  * bit for bit (StreamingSketchSpec asserts it), because per-unit (Σx, Σy)
  * is associative/commutative — the law q241 gates for the incremental
  * batch path. Feeding the final state to
  * [[graft.analysis.Stats.cupedFromUnits]] reproduces q234's readout, so a
  * live experiment dashboard and the nightly batch rebuild reconcile
  * exactly.
  *
  * State per unit is two longs forever; total state is bounded by distinct
  * experiment units, not stream length.
  */
object StreamingCuped {

  final case class UnitSums(unit: String, x: Long, y: Long)

  /** Per-unit running (pre, post) micro sums, updated every micro-batch.
    * `events` is a streaming DataFrame with (unitCol, valCol, tsCol). */
  def unitSums(
      events: DataFrame,
      cutoff: Column,
      unitCol: String = "user_id",
      valCol: String = "value",
      tsCol: String = "ts"): Dataset[UnitSums] = {
    import events.sparkSession.implicits._
    val vm = floor(col(valCol).cast("double") * lit(1e6) + lit(0.5)).cast("long")
    events.select(col(unitCol).cast("string").as("unit"),
        when(col(tsCol) < cutoff, vm).otherwise(lit(0L)).as("xe"),
        when(col(tsCol) >= cutoff, vm).otherwise(lit(0L)).as("ye"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), UnitSums](GroupStateTimeout.NoTimeout())(
        (unit, rows, state: GroupState[(Long, Long)]) => {
          var (x, y) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { r =>
            x += r._2
            y += r._3
          }
          state.update((x, y))
          UnitSums(unit, x, y)
        })
  }
}
