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

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two top-k
    * rankings — the standard hybrid-search combiner (lexical ⊕ semantic,
    * clicks ⊕ freshness): rrf(d) = Σ_lists 1/(c + rank_d), summing only
    * over the lists that contain d. Rank-based, so incomparable scores
    * fuse without calibration.
    *
    * Scale shape: each input list reduces to its top-k FIRST
    * (TakeOrderedAndProject — per-partition heaps, the q06 rule), so the
    * rank windows and the fusion join run over 2k rows, never corpus rows.
    * Deterministic throughout: both orderings and the final ordering
    * tie-break on the id. Output: idCol, rank_a, rank_b (null = absent
    * from that list), rrf (round 6), ordered rrf desc. */
  def reciprocalRankFusion(
      listA: DataFrame, listB: DataFrame, idCol: String,
      orderA: Seq[Column], orderB: Seq[Column],
      k: Int = 100, c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, order: Seq[Column], rankCol: String) = {
      val top = df.orderBy(order :+ col(idCol): _*).limit(k)
      top.withColumn(rankCol,
        row_number().over(Window.orderBy(order :+ col(idCol): _*)))
        .select(col(idCol), col(rankCol))
    }
    val a = ranked(listA, orderA, "rank_a")
    val b = ranked(listB, orderB, "rank_b")
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)), 6))
      .orderBy(desc("rrf"), col(idCol))
  }

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

  /** Okapi BM25 top-k (Robertson & Zaragoza 2009) — the length-normalized
    * upgrade of [[search]]'s raw TF×IDF: term frequency saturates
    * (tf·(k1+1)/(tf+k1·norm)) so a keyword-stuffed doc can't win on
    * repetition alone, and the norm term (1−b+b·dl/avgdl) discounts long
    * documents, which raw TF×IDF systematically over-ranks. The Lucene
    * `+1` idf form keeps every term contribution positive.
    *
    * Scale shape: corpus statistics (N, per-term df, avgdl) come from ONE
    * aggregate (model-sized — the query's terms are a literal list) and
    * return to the driver as plan literals; scoring is a single codegen'd
    * projection with the tokenizer let-bound once (the q27 lesson), then
    * TakeOrdered(k). The corpus never shuffles.
    * Output: doc_id, score (round 4), top-k by (score desc, id). */
  def bm25(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    bm25FromStats(docs, bm25StatsArtifact(docs, terms, textCol),
      terms, k, k1, b, textCol, idCol)

  /** [[bm25]]'s MERGEABLE corpus-stats artifact: ONE row of exact
    * integers 〈n, tdl, df_<term>…〉 — doc count, total token length, and
    * per-term document frequencies, i.e. everything the scorer derives
    * its idf and avgdl from. Additive across disjoint document slices
    * ([[bm25MergeStats]]), so a sharded index refresh counts only its new
    * shard and merges — the law q262 gates against the whole-corpus
    * rebuild. One aggregate pass (tokenize once, emit all counts). */
  def bm25StatsArtifact(
      docs: DataFrame, terms: Seq[String], textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty)
    val toks = TextAnalysis.tokens(col(textCol))
    val toksD = array_distinct(toks)
    val dl = coalesce(size(array_remove(toks, "")), lit(0)).cast("long")
    // coalesce: sum() over an empty slice is null — an all-empty shard
    // must still produce the additive identity 〈0, 0, 0…〉, not nulls
    // that NPE the scorer's Long unboxing downstream
    val aggs = count(lit(1)).as("n") +: coalesce(sum(dl), lit(0L)).as("tdl") +:
      terms.map(t => coalesce(
          sum(when(array_contains(toksD, t), 1L).otherwise(0L)), lit(0L))
        .as(s"df_$t"))
    docs.agg(aggs.head, aggs.tail: _*)
  }

  /** Merge per-slice BM25 stats artifacts by columnwise addition. */
  def bm25MergeStats(artifacts: DataFrame*): DataFrame = {
    val u = artifacts.reduce(_ unionByName _)
    val sums = u.columns.map(c => coalesce(sum(col(c)), lit(0L)).as(c))
    u.agg(sums.head, sums.tail: _*)
  }

  /** Scoring half of [[bm25]] off a (possibly merged) stats artifact —
    * the 1-row artifact collects to plan literals (the codebook pattern)
    * and scoring stays one codegen'd projection + TakeOrdered. */
  def bm25FromStats(
      docs: DataFrame,
      stats: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty)
    val row = stats.collect().head
    val n = row.getAs[Long]("n")
    // a stats artifact built over zero documents has n = 0 (and, from
    // pre-coalesce artifacts, possibly null sums): nothing can score —
    // return the empty scored frame instead of dividing by avgdl = 0/0
    if (n == 0L)
      return docs.select(col(idCol), lit(0.0).as("score")).limit(0)
    val dfs = terms.map(t => t -> row.getAs[Long](s"df_$t")).toMap
    // exact-integer Σdl to double, then one IEEE division — identical to
    // the previous double-summed aggregate for any Σdl < 2^53
    val avgdl = row.getAs[Long]("tdl").toDouble / n
    val toks = TextAnalysis.tokens(col(textCol))
    val score: Column = element_at(
      transform(array(toks), tks => {
        val dl = size(filter(tks, x => x =!= "")).cast(DoubleType)
        val norm = lit(1.0 - b) + lit(b) * dl / lit(avgdl)
        terms.map { t =>
          val d = dfs(t).toDouble
          val idf = log((lit(n - d + 0.5) / lit(d + 0.5)) + lit(1.0))
          val tf = size(filter(tks, x => x === t)).cast(DoubleType)
          idf * (tf * lit(k1 + 1.0)) / (tf + lit(k1) * norm)
        }.reduce(_ + _)
      }),
      1)
    docs
      .select(col(idCol), round(score, 4).as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), col(idCol))
      .limit(k)
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

  /** All-pairs TF-IDF cosine similarity above a threshold through an
    * inverted index on terms — the sparse-vector sibling of the dense
    * embedding near-dup join ([[Similarity]]).
    *
    * Scale shape: pair candidates come only from shared terms, and terms
    * with document frequency above n/50 are dropped BEFORE the self-join —
    * ubiquitous terms contribute ~zero idf weight but quadratic join pairs
    * (the same latent-quadratic guard as `Dedup.ngramJaccardPairs`'
    * maxShingleDf). Weights stay rational (no log) for cross-engine
    * exactness, and dot products / norms are summed as DECIMAL so the
    * result is independent of shuffle order — the q16 lesson applied:
    * order-dependent double summation is not reproducible, decimal sums
    * are.
    *
    * Output: doc_a, doc_b, cosine (rounded to 4). */
  def tfidfPairs(
      docs: DataFrame,
      minCosine: Double = 0.3,
      ngram: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    // n-gram terms (ngram = 1 degrades to unigrams): phrase terms keep the
    // vocabulary large and document frequencies low, which is what makes
    // both the idf weights and the df cutoff meaningful on corpora whose
    // unigram vocabulary is saturated.
    //
    // n comes from a separate docs.count() ON PURPOSE: empty-token docs must
    // count in n (they are corpus members even with no terms), and a parquet
    // count(*) is metadata-only — no column data is read, at any scale. The
    // "single-scan" alternative (explode_outer + persist tf + distinct-count
    // ids over it) was built and MEASURED SLOWER: 3.5s vs 1.3s min-of-3 at
    // sf0.1 — caching 850k (id,term,tf) rows and shuffling them again for
    // the distinct costs far more than the free metadata count, and the
    // fused codegen recompute of tf for its two consumers beats the cache
    // round-trip. Evidence in PLANS.md (q57).
    val tf = docs
      .select(col(idCol).as("id"),
        explode(Dedup.shingles(TextAnalysis.tokens(col(textCol)), ngram)).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.count()
    val maxDf = math.max(2L, n / 50)
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val w = tf.join(dfs, "term")
      .select(col("id"), col("term"),
        (col("tf").cast(DoubleType) *
          ((lit(n.toDouble) - col("df").cast(DoubleType) + lit(0.5)) /
            (col("df").cast(DoubleType) + lit(0.5)))).as("w"))
      .persist()
    val norms = w.groupBy("id").agg(sum((col("w") * col("w")).cast(dec)).as("norm2"))
    val pairs = w.as("a")
      .join(w.as("b"), col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(sum((col("a.w") * col("b.w")).cast(dec)).as("dot"))
    val result = pairs
      .join(norms.select(col("id").as("doc_a"), col("norm2").as("na")), "doc_a")
      .join(norms.select(col("id").as("doc_b"), col("norm2").as("nb")), "doc_b")
      .withColumn("cosine",
        round(col("dot").cast(DoubleType) /
          (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))), 4))
      .filter(col("cosine") >= minCosine)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
    try result.localCheckpoint(true)
    finally { w.unpersist(); () }
  }

  /** Offline ranking evaluation — MRR and NDCG@k of a ranked list against
    * a binary relevance set, the report every retrieval change ships with
    * (q128 fuses rankings; this says whether the fusion helped).
    *
    *  - MRR = 1/rank of the first relevant item (0 if none ranked);
    *  - NDCG@k = DCG@k / IDCG@k with binary gains: DCG = Σ_{rel, rank≤k}
    *    ln2/ln(rank+1), IDCG = the same sum over ideal positions
    *    1..min(k, |relevant|). |relevant| counts the FULL relevance set —
    *    relevant items missing from the ranking lower NDCG, as they must.
    *
    * Engine parity: each log term is DECIMAL-cast before its sum (the q134
    * recipe) and written ln(2)/ln(rank+1) — one division, same shape both
    * engines. Scale shape: one join + three scalar aggregates; the ideal-
    * position generator is ≤ k rows. Output (1 row): n_relevant,
    * first_rank, mrr, ndcg (round 6). */
  def rankingMetrics(
      ranking: DataFrame,
      relevant: DataFrame,
      k: Int = 10,
      idCol: String = "doc",
      rankCol: String = "rank"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val rel = relevant.select(col(idCol)).distinct()
    val term = (log(lit(2.0)) / log(col(rankCol) + 1)).cast(dec)
    val j = ranking.join(rel, idCol)
    val s1 = rel.agg(count(lit(1)).as("n_relevant"))
    val s2 = j.agg(
      min(rankCol).as("first_rank"),
      coalesce(sum(when(col(rankCol) <= k, term)).cast(DoubleType), lit(0.0)).as("dcg"))
    // guard the ideal-position generator: with an empty relevance set,
    // sequence(1, 0) is DESCENDING [1, 0] and the i=0 term is ln2/ln(1)=∞,
    // while the SQL twin's range(1, 1) is empty — the null guard makes both
    // engines agree on the degenerate case (zero output rows)
    val idcg = s1
      .select(col("n_relevant"),
        explode(when(col("n_relevant") > 0,
          sequence(lit(1), least(lit(k), col("n_relevant"))))).as("i"))
      .groupBy("n_relevant")
      .agg(sum((log(lit(2.0)) / log(col("i") + 1)).cast(dec)).cast(DoubleType).as("idcg"))
    idcg.crossJoin(s2)
      .select(col("n_relevant"), col("first_rank"),
        round(
          when(col("first_rank").isNull, lit(0.0))
            .otherwise(lit(1.0) / col("first_rank")),
          6).as("mrr"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
  }

  /** Truncated rank-biased overlap (Webber et al., TOIS'10) between two
    * top-`depth` rankings — the top-weighted similarity of two retrieval
    * systems (lexical vs semantic, yesterday vs today): at each depth d,
    * agreement A_d = |A₁..d ∩ B₁..d| / d, weighted (1−p)·p^(d−1) so rank-1
    * disagreement dominates. Unlike Kendall/Spearman it handles
    * non-conjoint lists (each side may rank docs the other never saw).
    *
    * Scale shape: both inputs reduce to their top-`depth` FIRST
    * (TakeOrderedAndProject, the q06/q128 rule), so everything downstream
    * — the position join, the depth spine, the cumulative overlap — runs
    * on ≤ 2·depth rows regardless of corpus size.
    *
    * Cross-build portability: the geometric weights are driver-computed
    * literal doubles (the md5-constant recipe — identical bits in plan and
    * oracle via Double.toString); each depth's term is quantized to BIGINT
    * micro-units by one fixed left-assoc IEEE chain
    * floor(w_d·overlap/d·10⁶ + 0.5), and the running RBO is an exact
    * integer prefix sum over the ≤ depth-row spine. No engine-evaluated
    * transcendental anywhere.
    * Output per depth 1..`depth`: depth, n_overlap, term_micro,
    * rbo_cum_micro (BIGINT ×10⁻⁶ = truncated RBO at that depth). */
  def rankBiasedOverlap(
      a: DataFrame,
      b: DataFrame,
      depth: Int = 10,
      p: Double = 0.9,
      idCol: String = "doc",
      orderA: Seq[Column] = Nil,
      orderB: Seq[Column] = Nil): DataFrame = {
    require(depth >= 1 && p > 0 && p < 1, s"need depth >= 1, p in (0,1)")
    import org.apache.spark.sql.expressions.Window
    val spark = a.sparkSession
    def topRanked(df: DataFrame, order: Seq[Column]): DataFrame = {
      val ord = (if (order.isEmpty) Nil else order) :+ col(idCol)
      // TakeOrdered to `depth` rows FIRST; the rank window then runs over
      // those rows only (the q06 W2 idiom)
      df.orderBy(ord: _*).limit(depth)
        .withColumn("r", row_number().over(Window.orderBy(ord: _*)))
        .select(col(idCol), col("r"))
    }
    val ra = topRanked(a, orderA)
    val rb = topRanked(b, orderB)
    // a doc in both lists contributes to every depth >= max(rank_a, rank_b)
    val pairs = ra.join(rb.withColumnRenamed("r", "rb"), idCol)
      .select(greatest(col("r"), col("rb")).as("m"))
    val spine = spark.range(1, depth + 1).select(col("id").cast("int").as("depth"))
    // (1-p)p^(d-1) via plain JVM multiplication, embedded as literals
    val weights = (1 to depth).scanLeft(1.0 - p)((w, _) => w * p).init
    val wCol = element_at(array(weights.map(lit(_)): _*), col("depth"))
    val overlaps = spine
      .join(pairs, col("m") <= col("depth"), "left")
      .groupBy("depth").agg(count(col("m")).as("n_overlap"))
    val wCum = Window.orderBy("depth")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    overlaps
      // one fixed left-assoc IEEE chain, mirrored verbatim in the oracle
      .withColumn("term_micro",
        floor(wCol * col("n_overlap") / col("depth") * lit(1e6) + lit(0.5))
          .cast("long"))
      .withColumn("rbo_cum_micro", sum("term_micro").over(wCum))
      .select(col("depth"), col("n_overlap"), col("term_micro"),
        col("rbo_cum_micro"))
      .orderBy("depth")
  }
}
