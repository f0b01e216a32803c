package graft

import org.apache.spark.sql.functions.desc

import graft.analysis.SearchRank

class SearchRankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark spark common common"),   // heavy on the rare term
    (2L, "common common common common spark"), // heavy on the common term
    (3L, "common words only here"),
    (4L, "common text again nothing else")
  ).toDF("doc_id", "text")

  test("corpus stats: one-pass n + per-term document frequencies") {
    val (n, dfs) = SearchRank.corpusStats(docs, Seq("spark", "common", "absent"))
    assert(n === 4)
    assert(dfs("spark") === 2)
    assert(dfs("common") === 4)
    assert(dfs("absent") === 0)
  }

  test("rarer terms outweigh common ones; zero-hit docs are excluded") {
    val out = SearchRank.search(docs, Seq("spark", "common"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 (3x rare 'spark') must outrank doc 2 (4x ubiquitous 'common')
    assert(out(1L) > out(2L))
    // docs 3 and 4 match only the everywhere-term; still positive, still ranked
    assert(out.contains(3L) && out.contains(4L))
    assert(out(3L) < out(2L))
    // a query for a term nobody has returns nothing
    assert(SearchRank.search(docs, Seq("zzz"), k = 10).count() === 0)
  }

  test("tfidf pairs: identical docs hit cosine 1, disjoint docs produce no pair") {
    // 100 docs so the df cutoff (max(2, n/50) = 2) keeps pair-terms with
    // df <= 2: docs 1/2 share rare terms; 3 is disjoint; filler docs are
    // mutually disjoint single-word docs
    val corpus = (Seq(
      (1L, "quantum flux capacitor resonance"),
      (2L, "quantum flux capacitor resonance"),
      (3L, "entirely unrelated material")
    ) ++ (4L to 100L).map(i => (i, s"filler$i"))).toDF("doc_id", "text")
    val out = SearchRank.tfidfPairs(corpus, minCosine = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out === Map((1L, 2L) -> 1.0))
  }

  test("tfidf pairs: partial overlap scores between 0 and 1, df cutoff drops boilerplate terms") {
    // 'common tail phrase' appears in 3 of 100 docs -> df 3 > cutoff 2 ->
    // dropped: docs 1/2 still pair through 'alpha beta gamma' (df 2), but
    // doc 3 — whose ONLY shared 3-gram is the boilerplate — pairs with
    // nobody (without the cutoff it would)
    val corpus = (Seq(
      (1L, "alpha beta gamma common tail phrase"),
      (2L, "alpha beta gamma delta common tail phrase"),
      (3L, "unrelated stuff here common tail phrase")
    ) ++ (4L to 100L).map(i => (i, s"filler$i"))).toDF("doc_id", "text")
    val out = SearchRank.tfidfPairs(corpus, minCosine = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet === Set((1L, 2L)))
    assert(out(1L -> 2L) > 0.0 && out(1L -> 2L) < 1.0)
  }

  test("tfidf pairs: term-less docs still count in n (single-scan fold keeps the cutoff honest)") {
    // 150 docs, 147 with no 3-grams at all (empty / too short). True n = 150
    // puts the df cutoff at max(2, 150/50) = 3, so the df-3 shared phrase
    // survives and all three real docs pair. If term-less docs fell out of n
    // (the single-scan trap), the cutoff would collapse to 2 and drop the
    // phrase — zero pairs.
    val corpus = (Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma")
    ) ++ (4L to 150L).map(i => (i, if (i % 2 == 0) "" else "two words"))).toDF("doc_id", "text")
    val out = SearchRank.tfidfPairs(corpus, minCosine = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("ranking metrics: hand-computed MRR/NDCG, unranked relevant item lowers NDCG, perfect gets 1") {
    val ranking = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("doc", "rank")
    // relevant {2, 4, 99}; 99 never ranked -> in IDCG's R but not DCG
    val rel = Seq(2L, 4L, 99L).toDF("doc")
    val o = SearchRank.rankingMetrics(ranking, rel, k = 10).collect().head
    assert(o.getLong(0) === 3L && o.getInt(1) === 2)
    assert(o.getDouble(2) === 0.5) // first relevant at rank 2
    val ln2 = math.log(2)
    val dcg = ln2 / math.log(3) + ln2 / math.log(5)
    val idcg = 1.0 + ln2 / math.log(3) + ln2 / math.log(4)
    assert(math.abs(o.getDouble(3) - dcg / idcg) < 1e-6)
    // perfect single-relevant ranking
    val p = SearchRank.rankingMetrics(ranking, Seq(1L).toDF("doc"), k = 10).collect().head
    assert(p.getDouble(2) === 1.0 && p.getDouble(3) === 1.0)
  }

  test("bm25: tf saturation + rare-term idf outrank keyword stuffing; hand-computed score") {
    val docs = Seq(
      (1L, "spark spark spark"),   // stuffed: one common term repeated
      (2L, "spark query"),         // covers the rare term too
      (3L, "other words here")     // no query terms: excluded
    ).toDF("doc_id", "text")
    val out = SearchRank.bm25(docs, terms = Seq("spark", "query"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.map(_._1).toSeq === Seq(2L, 1L)) // saturation beats repetition
    // d1 by hand: idf=ln(1.6), tf=3, dl=3, avgdl=8/3 -> norm=1.09375
    val d1 = math.log(1.6) * (3.0 * 2.2) / (3.0 + 1.2 * (0.25 + 0.75 * 3.0 / (8.0 / 3.0)))
    assert(out.toMap.apply(1L) === math.rint(d1 * 10000) / 10000)
  }

  test("rank-biased overlap: identical lists hit the truncated-weight ceiling, disjoint stay 0") {
    val a = (1 to 20).map(i => (i.toLong, 100L - i)).toDF("doc", "score")
    val same = SearchRank.rankBiasedOverlap(a, a, depth = 10, p = 0.9,
      orderA = Seq(desc("score")), orderB = Seq(desc("score"))).collect()
    // full agreement: overlap d at every depth, term = w_d * 1e6 rounded
    assert(same.map(_.getAs[Long]("n_overlap")).toSeq === (1L to 10L).toSeq)
    val w = (1 to 10).scanLeft(0.1)((x, _) => x * 0.9).init
    val expect = w.map(x => math.floor(x * 1e6 + 0.5).toLong).sum
    assert(same.last.getAs[Long]("rbo_cum_micro") === expect)
    // 1 - 0.9^10 = 0.651322 truncated mass, within integer rounding
    assert(math.abs(expect - 651322L) <= 10L)
    val b = (21 to 40).map(i => (i.toLong, 100L - i)).toDF("doc", "score")
    val disj = SearchRank.rankBiasedOverlap(a, b, depth = 10, p = 0.9,
      orderA = Seq(desc("score")), orderB = Seq(desc("score"))).collect()
    assert(disj.map(_.getAs[Long]("rbo_cum_micro")).forall(_ === 0L))
  }

  test("rank-biased overlap: top-weighted — a head swap costs more than a tail swap") {
    val base = (1 to 10).map(i => (i.toLong, 100L - i)).toDF("doc", "score")
    def swapped(i: Int, j: Int) = (1 to 10).map { d =>
      val doc = if (d == i) j else if (d == j) i else d
      (doc.toLong, 100L - d)
    }.toDF("doc", "score")
    def rbo(b: org.apache.spark.sql.DataFrame) =
      SearchRank.rankBiasedOverlap(base, b, depth = 10, p = 0.9,
        orderA = Seq(desc("score")), orderB = Seq(desc("score")))
        .collect().last.getAs[Long]("rbo_cum_micro")
    assert(rbo(swapped(1, 2)) < rbo(swapped(9, 10)))
  }

  test("bm25 stats increment: shard artifacts merged by addition score like the rebuild") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark query engine"),
      (2L, "hash join plan"),
      (3L, "query planner hash"),
      (4L, "totally unrelated words here")).toDF("doc_id", "text")
    val terms = Seq("spark", "query", "hash")
    val merged = SearchRank.bm25FromStats(docs,
        SearchRank.bm25MergeStats(
          SearchRank.bm25StatsArtifact(docs.filter("doc_id <= 2"), terms),
          SearchRank.bm25StatsArtifact(docs.filter("doc_id > 2"), terms)),
        terms, k = 10)
      .collect().map(_.toSeq)
    val rebuilt = SearchRank.bm25(docs, terms, k = 10).collect().map(_.toSeq)
    assert(merged.toSeq === rebuilt.toSeq)
    // the artifact really is one exact-integer row
    val art = SearchRank.bm25StatsArtifact(docs, terms).collect()
    assert(art.length === 1)
    val r = art.head
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("tdl") === 14L &&
      r.getAs[Long]("df_spark") === 1L && r.getAs[Long]("df_query") === 2L &&
      r.getAs[Long]("df_hash") === 2L)
    // zero-document shards: the artifact is the additive identity (no
    // null sums), merging all-empty shards stays well-typed, and scoring
    // from an n=0 artifact returns the empty frame instead of NPE/0-div
    val empty = docs.filter("doc_id < 0")
    val eArt = SearchRank.bm25StatsArtifact(empty, terms).collect().head
    assert(eArt.getAs[Long]("n") === 0L && eArt.getAs[Long]("tdl") === 0L &&
      eArt.getAs[Long]("df_spark") === 0L)
    val eMerged = SearchRank.bm25MergeStats(
      SearchRank.bm25StatsArtifact(empty, terms),
      SearchRank.bm25StatsArtifact(empty, terms))
    assert(SearchRank.bm25FromStats(docs, eMerged, terms, k = 10)
      .collect().isEmpty)
  }
}
