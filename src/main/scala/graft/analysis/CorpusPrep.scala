package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composed pipeline the
  * individual operators exist for —
  *
  *   quality filter → exact dedup → near-dup removal (MinHash+LSH, greedy
  *   keep-lowest-id) → surviving corpus
  *
  * Physical shape: the quality filter is one codegen'd projection; exact
  * dedup is one hash-partition window; near-dup candidates come from the
  * banded LSH self-join over the ALREADY-reduced corpus (each stage shrinks
  * the data the next stage pays for — the order is the optimization).
  * Removal keeps the lower doc id of each verified pair (greedy transitive
  * approximation — exact clustering would need connected components, which
  * at corpus scale is a separate iterative job).
  */
object CorpusPrep {

  final case class Thresholds(minQuality: Double = 35.0, minJaccard: Double = 0.8)

  def prepareCorpus(
      docs: DataFrame,
      t: Thresholds = Thresholds(),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val qualityPass = docs.join(
      TextAnalysis.textStats(docs, textCol, idCol)
        .filter(col("quality_score") >= t.minQuality)
        .select(idCol),
      Seq(idCol))
    val exact = Dedup.dedupExact(qualityPass, textCol, idCol)
    val losers = Dedup.minhashNearDupPairs(exact, textCol, idCol, minJaccard = t.minJaccard)
      .select(col("doc_b").as(idCol)).distinct()
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** Per-stage survivor counts — the pipeline's observability surface. */
  def stageCounts(docs: DataFrame, t: Thresholds = Thresholds()): Map[String, Long] = {
    val qualityPass = docs.join(
      TextAnalysis.textStats(docs).filter(col("quality_score") >= t.minQuality)
        .select("doc_id"), Seq("doc_id"))
    val exact = Dedup.dedupExact(qualityPass)
    val prepared = prepareCorpus(docs, t)
    Map(
      "input" -> docs.count(),
      "quality_pass" -> qualityPass.count(),
      "exact_deduped" -> exact.count(),
      "near_dedup_survivors" -> prepared.count())
  }
}
