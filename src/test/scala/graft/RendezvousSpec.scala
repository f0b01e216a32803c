package graft

import org.apache.spark.sql.functions._

import graft.analysis.Profiling
import graft.relational.Rendezvous

class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 2000L).map(Tuple1(_)).toDF("k")

  test("rendezvous: every shard gets a reasonable share, assignment is stable") {
    val shards = Seq("a", "b", "c", "d")
    val out = Rendezvous.assignments(keys, "k", shards)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet === shards.toSet)
    sizes.values.foreach(s => assert(s > 300 && s < 700, s"skewed share: $sizes"))
    val again = Rendezvous.assignments(keys, "k", shards)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === out)
  }

  test("rendezvous: removing a shard moves ONLY that shard's keys") {
    val before = Rendezvous.assignments(keys, "k", Seq("a", "b", "c", "d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Rendezvous.assignments(keys, "k", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    before.foreach { case (k, s) =>
      if (s != "d") assert(after(k) === s, s"key $k moved needlessly: $s -> ${after(k)}")
      else assert(Seq("a", "b", "c").contains(after(k)))
    }
    // and adding it back restores the original map exactly
    val restored = Rendezvous.assignments(keys, "k", Seq("a", "b", "c", "d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(restored === before)
  }

  test("psi drift: self-comparison ~0, shifted distribution flags") {
    val base = (1 to 5000).map(i => Tuple1((i % 100).toDouble)).toDF("v")
    val same = Profiling.psiDrift(base, base, "v").collect().head
    assert(math.abs(same.getDouble(0)) < 1e-9)
    assert(!same.getBoolean(3))
    val shifted = (1 to 5000).map(i => Tuple1((i % 100).toDouble + 60)).toDF("v")
    val drift = Profiling.psiDrift(base, shifted, "v").collect().head
    assert(drift.getDouble(0) > 0.2)
    assert(drift.getBoolean(3))
    // empty reference: PSI undefined (null), not an NPE on the null cuts
    val empty = base.filter(col("v") < 0)
    val undef = Profiling.psiDrift(empty, shifted, "v").collect().head
    assert(undef.isNullAt(0) && undef.getLong(1) === 0L && undef.getLong(2) === 5000L)
    assert(undef.isNullAt(3))
  }

  test("ks drift: hand-computed max ECDF gap with argmax location; identical samples accept") {
    // ref = {1,2,3,4}, cur = {3,4,5,6}: ECDF gap peaks at v=2 (2/4 - 0 = 0.5)
    val ref = Seq(1.0, 2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).map(Tuple1(_)).toDF("v")
    val r = Profiling.ksDrift(ref, cur, "v").collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 2.0) // smallest value achieving the max gap
    assert(!r.getBoolean(5))       // n too small: crit = 1.358*sqrt(8/16) = 0.96
    // same distribution, large n: stat 0, accept
    val big = (1 to 2000).map(i => Tuple1((i % 50).toDouble)).toDF("v")
    val same = Profiling.ksDrift(big, big, "v").collect().head
    assert(same.getDouble(2) === 0.0 && !same.getBoolean(5))
    // disjoint supports, large n: stat 1, reject
    val hi = (1 to 2000).map(i => Tuple1((i % 50).toDouble + 100)).toDF("v")
    val rej = Profiling.ksDrift(big, hi, "v").collect().head
    assert(rej.getDouble(2) === 1.0 && rej.getBoolean(5))
  }

  test("benford digits: sub-unit and multi-digit values extract correctly, expecteds pinned") {
    import spark.implicits._
    // 1e19 (>= 9e18) and 1e-20 (< 1e-18) are positive-but-out-of-domain:
    // dropped from the histogram AND counted in n_excluded; -3 and 0 are
    // non-positive — dropped in both the old and new domain, NOT counted
    val vals = Seq(1.0, 123.45, 0.5, 0.0017, 9.99, -3.0, 0.0, 1e19, 1e-20)
      .map(Tuple1(_)).toDF("v")
    val rows = Profiling.benfordDigits(vals, "v").orderBy("digit").collect()
    val out = rows
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getAs[Double]("expected")))).toMap
    // 1.0 and 123.45 -> 1; 0.5 -> 5; 0.0017 -> 1; 9.99 -> 9
    assert(out.keySet === Set(1, 5, 9))
    assert(out(1)._1 === 3L && out(5)._1 === 1L && out(9)._1 === 1L)
    assert(out(1)._2 === 0.30103)   // round(log10(2), 6)
    assert(out(9)._2 === 0.045757)  // round(log10(10/9), 6)
    assert(rows.map(_.getAs[Long]("n_excluded")).toSet === Set(2L))
    // observed ratios are over in-domain rows only (5 of them)
    assert(rows.map(_.getAs[Double]("observed")).sum === 1.0)
  }

  test("moments profile: symmetric triple hand-computed; constant group degenerates") {
    import spark.implicits._
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(7L, 7L).map(("c", _))).toDF("g", "x")
    val out = Profiling.momentsProfile(df, "g", "x").orderBy("group").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))).toMap
    // {1,2,3}: mean 2, m2 = 2/3, skew 0 (symmetric), kurt = 1.5 - 3 = -1.5 exact
    assert(out("a")._1 === 3L && out("a")._2 === 2.0)
    assert(out("a")._3 === Some(0.816497))
    assert(out("a")._4 === Some(0.0))
    assert(out("a")._5 === Some(-1.5))
    // constant group: zero variance -> shape stats null
    assert(out("c") === ((2L, 7.0, None, None, None)))
  }

  test("moments: power-sum artifacts merge by addition — split slices equal the rebuild") {
    import spark.implicits._
    val df = (Seq(1L, 2L, 3L, 9L).map(("a", _)) ++ Seq(4L, 5L).map(("b", _)))
      .zipWithIndex.map { case ((g, x), i) => (i.toLong, g, x) }
      .toDF("id", "g", "x")
    val whole = Profiling.momentsProfile(df, "g", "x").orderBy("group").collect().toSeq
    val stored = Profiling.momentSums(df.filter(col("id") < 3), "g", "x")
    val fresh = Profiling.momentSums(df.filter(col("id") >= 3), "g", "x")
    val merged = stored.unionByName(fresh).groupBy("group")
      .agg(sum("n").as("n"), sum("s1d").as("s1d"), sum("s2d").as("s2d"),
        sum("s3d").as("s3d"), sum("s4d").as("s4d"))
    val inc = Profiling.momentsFromSums(merged).orderBy("group").collect().toSeq
    assert(inc === whole)
  }

  test("correlation pairs: identity 1, anti-correlation -1, constant column null") {
    import spark.implicits._
    val df = Seq((1L, 1L, 10L, 5L), (2L, 2L, 9L, 5L), (3L, 3L, 8L, 5L))
      .toDF("a", "b", "neg", "k")
    val out = Profiling.correlationPairs(df, Seq("a", "b", "neg", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(3))).toMap
    assert(out(("a", "b")) === Some(1.0))
    assert(out(("a", "neg")) === Some(-1.0))
    assert(out(("a", "k")) === None)
    assert(out.size === 6)
  }

  test("dp noisy counts: replayable draws, epsilon scales noise, clamp holds") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .map(Tuple1(_)).toDF("k")
    def run(eps: Double, seed: String) =
      Profiling.dpNoisyCounts(df, Seq("k"), epsilon = eps, seed = seed)
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val a = run(1.0, "dp")
    assert(a.toSeq === run(1.0, "dp").toSeq, "identical runs must release identically")
    assert(a.map(_._1).toSeq === Seq("a", "b", "c"))
    assert(a.forall(r => r._4 >= 0L), "released counts are clamped at 0")
    // doubling epsilon halves the Laplace scale on the SAME uniform draw
    val tight = run(2.0, "dp")
    a.zip(tight).foreach { case ((_, _, n1, _), (_, _, n2, _)) =>
      assert(math.abs(n2 - n1 / 2) < 2e-6, s"eps=2 noise $n2 vs half of $n1")
    }
    // a different seed is a different draw
    assert(a.map(_._3).toSeq !== run(1.0, "other").map(_._3).toSeq)
  }

  test("centroid drift: orthogonal slices hand-computed; aligned slice sits at cos 1") {
    import spark.implicits._
    // label 0 centroid [1,0], label 1 centroid [0,1], global [0.5,0.5]
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Profiling.centroidDrift(emb)
      .orderBy("label").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // cos([1,0],[0.5,0.5]) = 0.5/(1*sqrt(0.5)); l2 = sqrt(0.25+0.25)
    assert(out(0) === ((2L, 0.707107, 0.707107)))
    assert(out(1) === ((2L, 0.707107, 0.707107)))
    // a slice that IS the corpus distribution has no drift
    val uni = Seq((1L, Array(3.0f, 4.0f), 7), (2L, Array(3.0f, 4.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val one = Profiling.centroidDrift(uni).collect().head
    assert(one.getDouble(2) === 1.0 && one.getDouble(3) === 0.0)
  }
}
