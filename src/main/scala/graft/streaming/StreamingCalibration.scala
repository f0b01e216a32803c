package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the calibration-bins artifact
  * ([[graft.analysis.Stats.calibrationBins]], the q246/q248 family): the
  * reliability diagram and ECE need only per-bin exact integer
  * (n, n_pos, Σscore) sums, and those merge by ADDITION — exactly
  * `mapGroupsWithState` shape. Each micro-batch bins its scored examples
  * with the identical integer-division key the batch path uses and adds
  * the three sums into per-bin state; updated bins are emitted per batch.
  *
  * The state after any prefix of batches IS the batch
  * [[graft.analysis.Stats.calibrationBins]] over the union of those
  * batches, bit for bit (StreamingSketchSpec asserts it), because per-bin
  * integer sums are associative/commutative — the law q248 gates for the
  * incremental batch path. Feeding the state to
  * [[graft.analysis.Stats.calibrationFromBins]] reproduces q246's
  * readout, so a live calibration monitor over a scoring stream and the
  * nightly batch rebuild reconcile exactly.
  *
  * State is three longs per bin — at most `bins` keys forever, the
  * smallest state of any streaming twin here.
  */
object StreamingCalibration {

  final case class BinSums(bin: Long, n: Long, nPos: Long, ssum: Long)

  /** Per-bin running (n, n_pos, Σscore) sums, updated every micro-batch.
    * `scored` is a streaming DataFrame with (scorePpmCol, labelCol). */
  def binSums(
      scored: DataFrame,
      scorePpmCol: String = "score_ppm",
      labelCol: String = "y",
      bins: Int = 10): Dataset[BinSums] = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    import scored.sparkSession.implicits._
    scored.select(
        least(expr(s"($scorePpmCol * $bins) div 1000000"), lit(bins - 1L))
          .cast("long").as("bin"),
        col(labelCol).cast("long").as("y"),
        col(scorePpmCol).cast("long").as("s"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), BinSums](GroupStateTimeout.NoTimeout())(
        (bin, rows, state: GroupState[(Long, Long, Long)]) => {
          var (n, np, ss) = state.getOption.getOrElse((0L, 0L, 0L))
          rows.foreach { r =>
            n += 1L
            np += r._2
            ss += r._3
          }
          state.update((n, np, ss))
          BinSums(bin, n, np, ss)
        })
  }
}
