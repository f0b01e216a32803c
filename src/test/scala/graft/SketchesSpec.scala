package graft

import org.apache.spark.sql.functions._

import graft.analysis.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bottom-k reduce/merge: sorted, distinct, capped at k") {
    val agg = new Sketches.BottomK(4)
    val a = Seq(9L, 3L, 7L, 3L, 1L).foldLeft(agg.zero)(agg.reduce)
    assert(a.toSeq === Seq(1L, 3L, 7L, 9L))
    val b = Seq(2L, 3L, 8L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b).toSeq === Seq(1L, 2L, 3L, 7L)) // dedup of 3, capped
    assert(agg.merge(agg.zero, b).toSeq === b.toSeq)
    assert(agg.merge(b, agg.zero).toSeq === b.toSeq)
  }

  test("below k distinct values the estimate is exact") {
    val df = (1 to 40).map(i => ("g", i % 7)).toDF("g", "v")
    val out = Sketches.distinctEstimate(df, "g", "v", k = 64).collect().head
    assert(out.getAs[Double]("est_distinct") === 7.0)
  }

  test("at n >> k the estimate lands within the sketch's error envelope") {
    // k=64 → relative standard error 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    val n = 5000
    val df = (1 to n).map(i => ("g", i)).toDF("g", "v")
    val est = Sketches.distinctEstimate(df, "g", "v", k = 64)
      .collect().head.getAs[Double]("est_distinct")
    assert(math.abs(est - n) / n < 0.51, s"estimate $est too far from $n")
  }

  test("intersection estimate: exact below k, hand-checked overlap and jaccard") {
    // A = {1..5}, B = {3..8}: union 8 < k=64, so everything is exact
    val rows = ((1 to 5).map(i => ("a", i.toLong)) ++ (3 to 8).map(i => ("b", i.toLong)))
      .toDF("g", "v")
    val r = Sketches.intersectionEstimate(rows, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("n_common_sample") === 3L)
    assert(r.getAs[Double]("est_intersection") === 3.0)
    assert(r.getAs[Double]("est_jaccard") === 0.375) // 3 / 8
    assert(r.getAs[Long]("exact_intersection") === 3L)
  }

  test("intersection estimate: threshold branch lands near truth and is deterministic") {
    // A = 1..100, B = 51..150: exact intersection 50, jaccard 1/3; k=16
    val rows = ((1 to 100).map(i => ("a", i.toLong)) ++ (51 to 150).map(i => ("b", i.toLong)))
      .toDF("g", "v")
    val r = Sketches.intersectionEstimate(rows, "g", "v", "a", "b", k = 16)
      .collect().head
    val est = r.getAs[Double]("est_intersection")
    assert(r.getAs[Long]("exact_intersection") === 50L)
    assert(est > 10.0 && est < 200.0, s"estimate $est too far from 50")
    assert(r.getAs[Double]("est_jaccard") >= 0.0 && r.getAs[Double]("est_jaccard") <= 1.0)
    val again = Sketches.intersectionEstimate(rows, "g", "v", "a", "b", k = 16)
      .collect().head
    assert(again === r) // md5-fixed: no RNG anywhere
  }

  test("merged per-partition sketches equal the single-pass union sketch") {
    val df = (1 to 3000).map(i => (s"day${i % 5}", i % 900)).toDF("day", "v")
    val merged = Sketches.unionEstimate(df, "v", k = 64, partitionCol = Some("day"))
      .collect().head.getAs[Double]("est_distinct")
    val single = Sketches.unionEstimate(df, "v", k = 64, partitionCol = None)
      .collect().head.getAs[Double]("est_distinct")
    assert(merged === single) // mergeability: bit-identical, not just close
  }

  test("hll estimate: within register-sketch error of truth, small range near-exact") {
    import spark.implicits._
    val big = (1 to 5000).map(i => ("big", s"u$i")) ++
      (1 to 30).map(i => ("small", s"v${i % 12}")) // 12 distinct, repeated
    val out = Sketches.hllEstimate(big.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // m=64 registers -> relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(out("big") - 5000) / 5000.0 < 0.4, s"big est ${out("big")}")
    // small range: the m*ln(m/V) correction is near-exact well below m
    assert(math.abs(out("small") - 12) < 3, s"small est ${out("small")}")
    // deterministic: same input, same estimate to the digit
    val again = Sketches.hllEstimate(big.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again === out)
  }

  test("hash60 is non-negative and stable") {
    val out = spark.range(1).select(
      Sketches.hash60(lit("a")).as("h1"), Sketches.hash60(lit("a")).as("h2"),
      Sketches.hash60(lit("b")).as("h3")).collect().head
    assert(out.getAs[Long]("h1") === 57446577476672362L) // int(md5('a')[:15], 16)
    assert(out.getAs[Long]("h1") === out.getAs[Long]("h2"))
    assert(out.getAs[Long]("h1") !== out.getAs[Long]("h3"))
  }

  test("rolling hll distinct: each day's window estimate equals the batch estimate of the window union") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val rows = Seq(
      (d("2026-01-01"), "u1"), (d("2026-01-01"), "u2"),
      (d("2026-01-03"), "u2"), (d("2026-01-03"), "u3"),
      (d("2026-01-10"), "u9") // outside day 3's window, its own window is just itself
    ).toDF("day", "uid")
    val est = Sketches.rollingHllDistinct(rows, "day", "uid", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    def batchOf(days: Set[String]) = Sketches.hllEstimate(
        rows.filter(col("day").cast("string").isin(days.toSeq: _*))
          .withColumn("g", lit("w")),
        "g", "uid")
      .collect().head.getDouble(1)
    // the law that justifies the operator: rolled registers ARE the union's
    assert(est("2026-01-03") === batchOf(Set("2026-01-01", "2026-01-03")))
    assert(est("2026-01-01") === batchOf(Set("2026-01-01")))
    assert(est("2026-01-10") === batchOf(Set("2026-01-10")))
  }

  test("bloom membership: zero false negatives (the Bloom contract), FPs possible") {
    import spark.implicits._
    val corpus = (0 until 300).map(i => s"key$i").toDF("key")
    val probe = (0 until 600).map(i => s"key$i").toDF("key")
    // small bitmap on purpose: dense enough that false positives occur
    val out = Sketches.bloomMembership(corpus, probe, bits = 512, k = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(out.size === 600)
    // every inserted key MUST probe positive — no false negatives, ever
    out.filter(_._2._2).foreach { case (k, (might, _)) =>
      assert(might, s"false negative on inserted key $k")
    }
    // non-inserted keys: never a false negative to check, and with 900
    // set-bit candidates in 512 bits some false positives are expected —
    // assert the mechanism reports SOME true negatives too (not all-true)
    val nonMembers = out.filter(!_._2._2)
    assert(nonMembers.exists(!_._2._1), "bitmap saturated: test lost its power")
  }

  test("hdr quantiles: estimates bracket the exact order statistic; histograms merge by addition") {
    import spark.implicits._
    val vals = (1 to 1000).map(i => ("g", (i * 7 % 997) + 1L)) // 1..997 shuffled
    val df = vals.toDF("g", "v")
    val est = Sketches.hdrQuantiles(df, "g", "v", qs = Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    val sorted = vals.map(_._2).sorted
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1).toDouble
      val e = est(q)
      // lower bound of the bucket holding the order statistic: within one
      // sub-bucket width (1/4 relative) below, never above
      assert(e <= exact, s"q=$q: est $e above exact $exact")
      assert(exact < e * 1.25 + 1e-9, s"q=$q: est $e more than 25% below $exact")
    }
    // mergeability law: counts of the union are the SUM of per-part counts
    val (a, b) = (df.filter($"v" % 2 === 0), df.filter($"v" % 2 =!= 0))
    val merged = Sketches.hdrHistogram(a, "g", "v")
      .unionByName(Sketches.hdrHistogram(b, "g", "v"))
      .groupBy("g", "bid", "e", "sub").agg(sum("n").as("n"))
      .orderBy("bid").collect().map(r => (r.getInt(2), r.getInt(3), r.getLong(4)))
    val whole = Sketches.hdrHistogram(df, "g", "v")
      .orderBy("bid").collect().map(r => (r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(merged.toSeq === whole.toSeq)
  }
}
