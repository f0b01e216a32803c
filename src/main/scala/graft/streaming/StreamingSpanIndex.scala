package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.analysis.Dedup

/** Streaming twin of the span-dedup index ([[Dedup.spanIndex]]), in the
  * same mold as [[StreamingCountMin]]/[[StreamingHll]]: the batch index is
  * a grouped COUNT + MIN at 〈span_fp, doc_id〉 grain, and count/min are
  * exactly what update-mode streaming aggregation state maintains — no
  * custom state operator. A document ingest stream therefore keeps the
  * substring-dedup artifact CURRENT as batches arrive; a snapshot feeds
  * [[Dedup.duplicatedSpansFromIndex]] for the report, and the q149 law
  * (per-doc-grain rows merge disjointly) guarantees the streamed index
  * equals the batch rebuild of everything ingested so far.
  *
  * State-size note: unlike the sketch twins (64 ints / depth×width cells
  * forever), this index grows with distinct 〈span, doc〉 pairs — it is the
  * streaming maintenance of a MATERIALIZED ARTIFACT, not a bounded sketch;
  * at scale it lives in a compacted store keyed by span_fp (the
  * [[graft.sinks.Compactor]] shape), with the stream appending increments.
  */
object StreamingSpanIndex {

  /** Streaming index build over a document stream. Emit with
    * `outputMode("update")`; the latest row per 〈span_fp, doc_id〉 is the
    * current index entry. */
  def buildStream(
      docs: DataFrame,
      spanTokens: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    Dedup.spanIndex(docs, spanTokens, textCol, idCol)
}
