package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Dedup

/** Streaming twin of the winnowing fingerprint artifact
  * ([[Dedup.winnowingFingerprints]], the q245/q249/q250 family). A
  * document's fingerprints depend only on its OWN text, so the whole
  * fingerprinter is the per-row array expression
  * [[Dedup.winnowingFpArray]] — streaming-legal with NO state operator at
  * all (the strongest state-size story of any twin here: zero), where the
  * batch path's window-function form could never run on a stream. Each
  * micro-batch emits exactly its own documents' (doc_id, fp) rows;
  * per-doc independence means the accumulated artifact equals the batch
  * rebuild of everything ingested so far by plain UNION — the law q249
  * gates for the incremental batch path and StreamingSketchSpec asserts
  * bit-for-bit across a multi-batch replay. (Throughput: the array
  * expression is interpreted, measured ~4.5× the codegen'd batch
  * pipeline per document — see [[Dedup.winnowingFpArray]]'s A/B note;
  * that prices a micro-batch, not a corpus rebuild, so the trade is
  * right here and wrong for batch.)
  *
  * This is what lets the q250 decontamination CERTIFICATE run as a live
  * monitor: the corpus artifact grows append-only off the ingest stream
  * (at scale: the [[graft.sinks.Compactor]]-shaped store, like the span
  * index), and [[Dedup.winnowingDecontamFromFingerprints]] re-runs the
  * broadcast eval probe against the current snapshot — no text rescan,
  * guaranteed coverage of every ≥ k+window−1 token overlap ingested so
  * far.
  */
object StreamingWinnowing {

  /** (idCol, fp) fingerprint rows off an append-mode document stream —
    * stateless, one array expression per document. Rows are distinct per
    * document by construction (`winnowingFpArray` is a distinct array);
    * replayed/duplicate deliveries dedup at readout exactly as the q249
    * union law dedups overlapping batch artifacts. */
  def fingerprintStream(
      docs: DataFrame,
      k: Int = 5,
      window: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      explode(Dedup.winnowingFpArray(col(textCol), k, window)).as("fp"))
}
