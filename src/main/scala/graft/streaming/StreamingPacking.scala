package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.analysis.TextAnalysis

/** Streaming twin of the sequence-packing artifact
  * ([[graft.analysis.CorpusPrep.packSlots]], the q256/q257 family):
  * concat-and-chunk packing assigns each document a global token START
  * offset in ingest order, and the only cross-batch state that assignment
  * needs is ONE running total — the tokens packed so far. Each micro-batch
  * counts its documents' tokens as a stateless codegen'd projection
  * (distributed), then a single-key `mapGroupsWithState` orders the
  * batch's (doc_id, n_tok) pairs, assigns starts off the running offset,
  * and advances it. State is one long forever.
  *
  * The sequential seam is INHERENT to concat-order packing (window w's
  * contents depend on every token before it), so the single-key stage is
  * honest — but it only ever sees id/count PAIRS (batch-sized metadata,
  * never text), exactly how a production packer assigns offsets. Emitted
  * spans feed [[graft.analysis.CorpusPrep.packSlotsFromSpans]] /
  * [[graft.analysis.CorpusPrep.packReportFromSlots]] unchanged, and the
  * accumulated spans equal the batch rebuild's positions bit-for-bit
  * (StreamingSketchSpec asserts the report equality across a multi-batch
  * replay) — the same law q257 gates for the incremental batch path,
  * because batches are doc-ranges packed at their recorded offsets.
  *
  * Replay caveat: unlike the per-doc-independent twins (winnowing), a
  * duplicated delivery would double-advance the offset — the job this
  * feeds must sit behind the exactly-once foreachBatch/checkpoint
  * machinery ([[CuratedStreamJob]]'s), not at-least-once.
  */
object StreamingPacking {

  final case class DocSpan(doc_id: Long, n_tok: Long, start: Long)

  /** Global (doc_id, n_tok, start) span rows off an append-mode document
    * stream, batch rows ordered by doc_id before assignment so replays of
    * the same batch sequence are deterministic.
    *
    * PRECONDITION (the q118 monotonic-ingest law, same as the batch
    * increment's): batches must arrive in doc-id order — every id in
    * batch N+1 exceeds every id in batch N. Concat-order packing is
    * ORDER-DEFINED, so an out-of-order batch doesn't error, it simply
    * packs in arrival order; equality with the doc-id-ordered batch
    * rebuild (what StreamingSketchSpec asserts) holds only under the
    * precondition. Ingest pipelines with assigned monotonic ids (the
    * reference's, and any log-structured ingest) satisfy it for free.
    *
    * Sizing: the state task materializes ONE batch's (id, count) pairs
    * (16 B each) to sort them — metadata-sized under any throttled
    * trigger (set `maxFilesPerTrigger`/`maxOffsetsPerTrigger` on the
    * source; an unthrottled backfill batch is the one shape that could
    * balloon it). `maxPairsPerBatch` fails FAST above the cap (default
    * 64M pairs ≈ 1 GiB) so an oversized batch errors loudly with a
    * throttling hint instead of silently OOMing the state task. */
  def spanStream(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxPairsPerBatch: Long = 64L << 20): Dataset[DocSpan] = {
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        coalesce(size(array_remove(TextAnalysis.tokens(col(textCol)), "")), lit(0))
          .cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Long, DocSpan](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (_, rows, state: GroupState[Long]) => {
          var off = state.getOption.getOrElse(0L)
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          rows.foreach { p =>
            if (buf.length >= maxPairsPerBatch)
              throw new IllegalStateException(
                s"spanStream batch exceeds maxPairsPerBatch=$maxPairsPerBatch " +
                  "(doc, token-count) pairs — throttle the source " +
                  "(maxFilesPerTrigger/maxOffsetsPerTrigger) or raise the cap")
            buf += p
          }
          val out = buf.sortBy(_._1).map { case (id, n) =>
            val s = off
            off += n
            DocSpan(id, n, s)
          }
          state.update(off)
          out.iterator
        })
  }
}
