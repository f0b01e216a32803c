package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.analysis.Dedup

/** Streaming twin of the CDC chunk-count artifact ([[Dedup.cdcChunkCounts]],
  * the q228/q230 family): content-defined chunking is per-document and
  * therefore stateless, so each micro-batch runs the exact batch chunk
  * projection ([[Dedup.cdcChunkRows]] — the native rolling-hash boundary
  * expression, 60-bit md5 chunk identity), and the ONLY streaming state is
  * the mergeable per-hash artifact itself: 〈h → (Σn, min l)〉 maintained
  * with `mapGroupsWithState`, updated rows emitted per batch.
  *
  * The state after any prefix of batches IS [[Dedup.cdcChunkCounts]] over
  * the union of those batches, bit for bit (StreamingSketchSpec asserts
  * it), because per-hash (Σn, min l) is associative/commutative — the same
  * merge law q230 gates for the incremental batch path. Feeding the final
  * state to [[Dedup.cdcReportFromCounts]] reproduces q228's corpus report,
  * so the hot/cold split reconciles exactly.
  *
  * State per chunk hash is 16 bytes forever; total state is bounded by
  * DISTINCT chunks (the dedup artifact's own size), not by stream length.
  */
object StreamingCdc {

  final case class ChunkCount(h: Long, n: Long, l: Long)

  /** Per-chunk-hash running counts, updated every micro-batch.
    * `docs` is a streaming DataFrame with (idCol, textCol). */
  def chunkCounts(
      docs: DataFrame,
      window: Int = 16,
      maskBits: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): Dataset[ChunkCount] = {
    import docs.sparkSession.implicits._
    Dedup.cdcChunkRows(docs, window, maskBits, textCol, idCol)
      .select($"h", $"l").as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), ChunkCount](GroupStateTimeout.NoTimeout())(
        (h, rows, state: GroupState[(Long, Long)]) => {
          var (n, l) = state.getOption.getOrElse((0L, Long.MaxValue))
          rows.foreach { r =>
            n += 1L
            if (r._2 < l) l = r._2
          }
          state.update((n, l))
          ChunkCount(h, n, l)
        })
  }
}
