package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — Spark's bounded-state two-
  * stream join, the streaming sibling of
  * [[graft.relational.TemporalJoin.bandedRangeJoin]].
  *
  * Both sides declare watermarks and the join condition carries an explicit
  * time bound (`0 <= rightTime - leftTime <= within`), which is what lets
  * Spark EXPIRE state: a buffered left row can be dropped once the right
  * watermark passes `leftTime + within`, so state is bounded by
  * (arrival skew + within) × rate instead of growing forever. Without the
  * time bound the same join would buffer both streams indefinitely — the
  * canonical unbounded-state mistake.
  *
  * Inner join only: outer stream-stream joins additionally delay emission
  * until the watermark proves no match can arrive; start from inner unless
  * the consumer needs the nulls.
  */
object StreamJoin {

  /** Pairs (l, r) with equal `key` and `rightTime` in [leftTime,
    * leftTime + within]. Columns are prefixed `l_`/`r_` (key and times
    * keep one copy each) so the two sides never collide.
    *
    * Works identically on batch frames (watermarks are no-ops there),
    * which is how the oracle-equivalence spec drives it. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      within: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.columns.foldLeft(left) { (df, c) =>
      df.withColumnRenamed(c, s"l_$c")
    }.withWatermark(s"l_$leftTime", watermarkDelay)
    val r = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }.withWatermark(s"r_$rightTime", watermarkDelay)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$rightTime") >= col(s"l_$leftTime") &&
        col(s"r_$rightTime") <= col(s"l_$leftTime") + expr(s"INTERVAL $within"))
  }
}
