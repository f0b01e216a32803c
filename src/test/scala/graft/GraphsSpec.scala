package graft

import graft.analysis.Graphs

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrence edges: pair counts, hub keys dropped before the join") {
    val clicks = (Seq(
      ("s1", 1), ("s1", 2), ("s1", 3),
      ("s2", 1), ("s2", 2),
      ("s2", 2) // duplicate click must not inflate the weight
    ) ++ (1 to 50).map(i => ("hub", i))).toDF("sid", "doc")
    val edges = Graphs.cooccurrenceEdges(clicks, "sid", "doc", maxPerKey = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(edges === Map((1, 2) -> 2L, (1, 3) -> 1L, (2, 3) -> 1L))
  }

  test("pagerank: one iteration on a path graph matches the hand calculation") {
    // 1 - 2 - 3: deg(1)=deg(3)=1, deg(2)=2, N=3, r0=1/3 each
    // r1(1) = 0.05 + 0.85*(r0(2)/2)       = 0.05 + 0.85/6
    // r1(2) = 0.05 + 0.85*(r0(1)+r0(3))   = 0.05 + 0.85*2/3
    val edges = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val out = Graphs.pageRank(edges, damping = 0.85, iterations = 1)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val n = 3.0
    assert(math.abs(out(1) - (0.05 + 0.85 / 6) * n) < 1e-12)
    assert(math.abs(out(2) - (0.05 + 0.85 * 2 / 3) * n) < 1e-12)
    assert(math.abs(out(1) - out(3)) < 1e-15) // symmetry
  }

  test("pagerank: mass conserves (mean stays 1) and hubs outrank leaves") {
    // star: center 0 linked to 1..4, plus a detached pair 5-6
    val edges = ((1 to 4).map(i => (0, i)) :+ ((5, 6))).toDF("src", "dst")
    val out = Graphs.pageRank(edges, iterations = 5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(out.values.sum - 7.0) < 1e-9) // scaled ranks sum to N
    assert(out(0) > out(1)) // star center dominates its leaves
    assert(math.abs(out(5) - out(6)) < 1e-15)
  }
}
