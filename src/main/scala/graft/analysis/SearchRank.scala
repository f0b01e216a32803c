package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Term-based document search scoring — the query-side capability the
  * reference's domain (clinical search logs) implies but its pipeline never
  * had. TF×IDF shape with the BM25-style smoothed document-frequency ratio
  * `(N - df + 0.5) / (df + 0.5)` kept rational (no log): transcendental
  * functions are not bit-identical across math libraries, and a rational
  * weight preserves the ranking while staying oracle-exact.
  *
  * Scale shape: document frequencies for the (few) query terms are one
  * tiny aggregate collected to the driver and folded into the scoring
  * expression as literals — the corpus scan then scores every document in
  * a single codegen'd projection, and top-k plans as TakeOrderedAndProject.
  */
object SearchRank {

  /** Corpus size + per-term document frequencies in ONE aggregate pass:
    * the scan tokenizes each document once and emits n plus one
    * contains-count per term. */
  def corpusStats(
      docs: DataFrame, terms: Seq[String], textCol: String = "text"): (Long, Map[String, Long]) = {
    val toks = array_distinct(TextAnalysis.tokens(col(textCol)))
    val aggs = count(lit(1)).as("n") +:
      terms.map(t => sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df_$t"))
    val row = docs.agg(aggs.head, aggs.tail: _*).collect().head
    (row.getAs[Long]("n"), terms.map(t => t -> row.getAs[Long](s"df_$t")).toMap)
  }

  /** Top-k documents for a bag-of-terms query. Output: doc_id, score
    * (rounded), per-term hit count columns omitted by design — callers
    * wanting explanations can recompute tf cheaply. */
  def search(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty)
    val (n, dfs) = corpusStats(docs, terms, textCol)
    def idf(t: String): Double = {
      val d = dfs(t).toDouble
      (n - d + 0.5) / (d + 0.5)
    }
    val toks = TextAnalysis.tokens(col(textCol))
    // one let-bound tokenizer evaluation; per-term tf × idf literals summed
    val score: Column = element_at(
      transform(array(toks), tks =>
        terms.map(t =>
          size(filter(tks, x => x === t)).cast(DoubleType) * lit(idf(t)))
          .reduce(_ + _)),
      1)
    docs
      .select(col(idCol), round(score, 4).as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
