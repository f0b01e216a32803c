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

  /** In-place tandem quicksort of (ids, ns) by id — keeps the batch
    * buffer primitive (no boxed comparator / tuple allocation). Middle
    * pivot: ingest batches arrive near-sorted by id, the case a
    * first-element pivot degrades on. Insertion sort below 32. */
  private[graft] def sortPairsById(
      ids: Array[Long], ns: Array[Long], n: Int): Unit = {
    def swap(i: Int, j: Int): Unit = {
      val a = ids(i); ids(i) = ids(j); ids(j) = a
      val b = ns(i); ns(i) = ns(j); ns(j) = b
    }
    def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        val ki = ids(i); val vi = ns(i)
        var j = i - 1
        while (j >= lo && ids(j) > ki) {
          ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1
        }
        ids(j + 1) = ki; ns(j + 1) = vi
        i += 1
      }
    }
    def qs(lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo >= 32) {
        val p = ids(lo + (hi - lo) / 2)
        var i = lo; var j = hi
        while (i <= j) {
          while (ids(i) < p) i += 1
          while (ids(j) > p) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        // recurse on the smaller half, loop on the larger: O(log n) stack
        if (j - lo < hi - i) { qs(lo, j); lo = i } else { qs(i, hi); hi = j }
      }
      insertion(lo, hi)
    }
    if (n > 1) qs(0, n - 1)
  }

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
          // PRIMITIVE buffers: two long arrays hold exactly 16 B/pair, so
          // the maxPairsPerBatch ≈ 1 GiB sizing is real — a boxed
          // Tuple2[Long, Long] buffer costs ~4× that and can OOM before
          // the fail-fast guard fires
          var ids = new Array[Long](1024)
          var ns = new Array[Long](1024)
          var len = 0
          rows.foreach { p =>
            if (len >= maxPairsPerBatch)
              throw new IllegalStateException(
                s"spanStream batch exceeds maxPairsPerBatch=$maxPairsPerBatch " +
                  "(doc, token-count) pairs — throttle the source " +
                  "(maxFilesPerTrigger/maxOffsetsPerTrigger) or raise the cap")
            if (len == ids.length) {
              ids = java.util.Arrays.copyOf(ids, ids.length * 2)
              ns = java.util.Arrays.copyOf(ns, ns.length * 2)
            }
            ids(len) = p._1
            ns(len) = p._2
            len += 1
          }
          sortPairsById(ids, ns, len)
          val total = len
          state.update(off + {
            var s = 0L; var i = 0
            while (i < total) { s += ns(i); i += 1 }
            s
          })
          var i = 0
          var cur = off
          new Iterator[DocSpan] {
            def hasNext: Boolean = i < total
            def next(): DocSpan = {
              val d = DocSpan(ids(i), ns(i), cur)
              cur += ns(i)
              i += 1
              d
            }
          }
        })
  }
}
