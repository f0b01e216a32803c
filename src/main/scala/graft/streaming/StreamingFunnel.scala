package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of [[graft.analysis.Funnel.stepTimes]] on the
  * `transformWithState` API (Spark 4's arbitrary-state operator, RocksDB
  * state store): per session, the earliest completion time of each funnel
  * step under the STRICTLY-AFTER rule — step k counts only when it lands
  * after step k−1's recorded time — maintained as one fixed-length array
  * per live session (O(#steps) state) and emitted as an updated snapshot
  * whenever a step completes.
  *
  * Matches the batch operator exactly under per-key in-order delivery
  * (the [[StreamingMarkov]] ordering contract): "first step-k event after
  * step k−1" IS the batch min when events arrive in event-time order;
  * within a micro-batch rows are sorted here. Chosen over
  * flatMapGroupsWithState deliberately — the typed ValueState handle, TTL
  * hooks, and RocksDB backing are the forward-path for stateful
  * operators, and this is the repo's reference use of the API.
  */
object StreamingFunnel {

  final case class Evt(
      session_id: String, event_ts: Timestamp, event_id: Long, event_type: String)
  /** times(i) = epoch millis step i completed, -1 while unreached. */
  final case class StepState(times: Seq[Long])
  final case class StepSnapshot(session_id: String, times: Seq[Long])

  class Processor(steps: Seq[String])
      extends StatefulProcessor[String, Evt, StepSnapshot] {
    @transient private var st: ValueState[StepState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[StepState](
        "times", Encoders.product[StepState], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[Evt],
        timerValues: TimerValues): Iterator[StepSnapshot] = {
      val cur: Array[Long] =
        if (st.exists()) st.get().times.toArray
        else Array.fill(steps.size)(-1L)
      var changed = false
      rows.toArray.sortBy(e => (e.event_ts.getTime, e.event_id)).foreach { e =>
        val i = steps.indexOf(e.event_type)
        if (i >= 0 && cur(i) < 0) {
          val prevOk = i == 0 ||
            (cur(i - 1) >= 0 && cur(i - 1) < e.event_ts.getTime)
          if (prevOk) { cur(i) = e.event_ts.getTime; changed = true }
        }
      }
      if (changed) {
        st.update(StepState(cur.toSeq))
        Iterator(StepSnapshot(key, cur.toSeq))
      } else Iterator.empty
    }
  }

  /** Update-mode snapshots of per-session funnel progress. Requires the
    * RocksDB state store provider (transformWithState's backing store). */
  def stepTimes(
      evts: Dataset[Evt], steps: Seq[String]): Dataset[StepSnapshot] = {
    import evts.sparkSession.implicits._
    evts
      .groupByKey(_.session_id)
      .transformWithState(
        new Processor(steps), TimeMode.None(), OutputMode.Update())
  }
}
