package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.analysis.UnigramLM

/** Streaming twin of the unigram-LM trainer's sufficient statistic
  * ([[UnigramLM.wordTableArtifact]], the q271/q276 family), in the
  * [[StreamingSpanIndex]] mold: the word table is a grouped COUNT at word
  * grain — exactly what update-mode streaming aggregation state maintains,
  * no custom state operator. A document ingest stream therefore keeps the
  * trainer's ONLY input current as batches arrive; a snapshot feeds
  * [[UnigramLM.unigramTrainFromWords]] for a periodic retrain, and the
  * q276 law (the word table is additive across doc-disjoint slices, and
  * training from it equals the whole-corpus rebuild) guarantees the
  * streamed table trains to the SAME tokenizer as a batch rebuild of
  * everything ingested so far — bit-for-bit, because the trainer is a
  * deterministic function of the table.
  *
  * State-size note: state grows with the DISTINCT vocabulary (Heaps-law
  * sub-linear in the corpus, the q194 measurement), not the corpus; like
  * the span index it is streaming maintenance of a materialized artifact,
  * compactable by word key at rest. */
object StreamingWordTable {

  /** Streaming word-table build over a document stream. Emit with
    * `outputMode("update")`; the latest row per word is the current
    * artifact entry. */
  def buildStream(
      docs: DataFrame,
      maxWordLen: Int = UnigramLM.Params().maxWordLen,
      textCol: String = "text"): DataFrame =
    UnigramLM.wordTableArtifact(docs, maxWordLen, textCol)
}
