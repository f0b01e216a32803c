package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.analysis.Funnel.markovTransitions]]: the
  * transition PAIRS are emitted incrementally with `flatMapGroupsWithState`
  * holding exactly ONE event per live session (the last one seen — O(1)
  * state, vs buffering whole sessions), and the transition-count matrix
  * downstream is a plain grouped count, i.e. ordinary update-mode streaming
  * aggregation state. `<START>` is emitted on a session's first event;
  * `<END>` fires through the event-time timeout once the watermark passes
  * the session's last event + gap — the same close rule [[Sessionize]]
  * uses, and in batch-equality terms "the log ended" and "the gap elapsed"
  * coincide when the fixture's gaps are shorter than the session gap.
  *
  * Ordering contract: transitions match the batch operator exactly when
  * each session's events arrive in (event_ts, event_id) order ACROSS
  * micro-batches (within a batch they are sorted here). That is the
  * delivery order a source partitioned by session key provides (the
  * reference's Kafka topics key by user — producer_base.py:76-89);
  * cross-batch reordering within the watermark would interleave state
  * updates the one-event state cannot re-sort — the documented trade for
  * O(1) state.
  */
object StreamingMarkov {

  final case class Evt(
      session_id: String, event_ts: Timestamp, event_id: Long, event_type: String)
  final case class LastEvt(ts: Long, id: Long, typ: String)
  final case class Transition(from_state: String, to_state: String)

  def transitions(
      evts: Dataset[Evt],
      watermark: String = "30 minutes",
      gapSeconds: Long = 1800): Dataset[Transition] = {
    import evts.sparkSession.implicits._
    evts
      .withWatermark("event_ts", watermark)
      .groupByKey(_.session_id)
      .flatMapGroupsWithState[LastEvt, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, events, state: GroupState[LastEvt]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(Transition(last.typ, "<END>"))
          } else {
            val evs = events.toArray.sortBy(e => (e.event_ts.getTime, e.event_id))
            val out = Seq.newBuilder[Transition]
            var prev = state.getOption
            if (prev.isEmpty && evs.nonEmpty)
              out += Transition("<START>", evs.head.event_type)
            for (e <- evs) {
              prev.foreach(p => out += Transition(p.typ, e.event_type))
              prev = Some(LastEvt(e.event_ts.getTime, e.event_id, e.event_type))
            }
            prev.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp(p.ts + gapSeconds * 1000)
            }
            out.result().iterator
          }
      }
  }
}
