package graft

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
}
