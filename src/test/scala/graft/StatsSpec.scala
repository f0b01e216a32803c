package graft

import org.apache.spark.sql.functions._

import graft.analysis.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("arm assignment is deterministic and roughly balanced") {
    val units = (1 to 2000).map(i => Tuple1(i.toLong)).toDF("u")
    val arms = units.select(Stats.armOf(col("u")).as("arm"))
      .groupBy("arm").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(arms.keySet === Set("A", "B"))
    assert(math.abs(arms("A") - arms("B")) < 300) // ~4 sigma of binomial(2000, .5)
    // repeat run gives identical split (pure hash, no RNG)
    val again = units.select(Stats.armOf(col("u")).as("arm"))
      .groupBy("arm").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === arms)
  }

  test("cuped: perfectly correlated pre/post gives theta=2 and full variance reduction") {
    // each unit has one pre event (value v) and one post event (value 2v):
    // y = 2x exactly, so theta = cov/var = 2 and rho^2 = 1 regardless of
    // how md5 splits the arms
    val rows = (1 to 8).flatMap { i =>
      Seq((i.toLong, i.toDouble, "2024-01-10 00:00:00"),
        (i.toLong, 2.0 * i, "2024-01-20 00:00:00"))
    }.toDF("u", "value", "ts_s")
      .select(col("u"), col("value"), to_timestamp(col("ts_s")).as("ts"))
    val out = Stats.cuped(rows, "u", "value", "ts",
      lit("2024-01-16 00:00:00").cast("timestamp")).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("theta_ppm") === 2000000L)
      assert(r.getAs[Long]("var_reduction_ppm") === 1000000L)
      // adjusted means equal the GLOBAL post mean when y = theta*x exactly:
      // adj_a = mean_post_a - theta*(mean_pre_a - mean_pre) and
      // mean_post_a = theta*mean_pre_a, so adj_a = theta*mean_pre = 9e6 micros
      assert(r.getAs[Long]("mean_adj_micro") === 9000000L)
    }
    // n_units split covers all 8
    assert(out.map(_.getAs[Long]("n_units")).sum === 8L)
  }

  test("cuped: merged per-unit artifacts from disjoint slices equal the whole rebuild") {
    val rows = (1 to 40).map { i =>
      (i.toLong % 7, (i % 11).toDouble + 0.25,
        if (i % 3 == 0) "2024-01-10 00:00:00" else "2024-01-20 00:00:00")
    }.toDF("u", "value", "ts_s")
      .select(col("u"), col("value"), to_timestamp(col("ts_s")).as("ts"))
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val whole = Stats.cuped(rows, "u", "value", "ts", cutoff).collect()
    // arbitrary row split (by value parity) — units appear in BOTH slices
    val s1 = Stats.cupedUnits(rows.filter(col("value") < 5), "u", "value", "ts", cutoff)
    val s2 = Stats.cupedUnits(rows.filter(col("value") >= 5), "u", "value", "ts", cutoff)
    val merged = Stats.cupedFromUnits(Stats.cupedMergeUnits(s1, s2)).collect()
    assert(merged.toSeq === whole.toSeq)
  }

  test("cuped: degenerate pre-period (all zero) nulls the adjusted columns") {
    // cutoff before every event: x = 0 for all units -> var(x) = 0
    val rows = (1 to 4).map(i => (i.toLong, i.toDouble, "2024-01-20 00:00:00"))
      .toDF("u", "value", "ts_s")
      .select(col("u"), col("value"), to_timestamp(col("ts_s")).as("ts"))
    val out = Stats.cuped(rows, "u", "value", "ts",
      lit("2024-01-01 00:00:00").cast("timestamp")).collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("mean_adj_micro")))
      assert(r.isNullAt(r.fieldIndex("theta_ppm")))
      assert(r.isNullAt(r.fieldIndex("var_reduction_ppm")))
      // the unadjusted post mean still reports
      assert(r.getAs[Long]("mean_post_micro") > 0L)
    }
  }

  test("fleiss kappa: perfect agreement = 1, perfect 3-way disagreement with balanced margins = -0.5, constant panel = null") {
    // perfect: all raters agree per unit
    val perfect = Seq((1L, "a", "a", "a"), (2L, "b", "b", "b"), (3L, "c", "c", "c"))
      .toDF("u", "r1", "r2", "r3")
    val kp = Stats.fleissKappa(perfect, "u", Seq("r1", "r2", "r3")).collect().head
    assert(kp.getAs[Double]("p_bar") === 1.0 && kp.getAs[Double]("fleiss_kappa") === 1.0)
    // perfect disagreement, balanced marginals: P_bar = 0, P_e = 1/3, kappa = -0.5
    val disjoint = Seq((1L, "a", "b", "c"), (2L, "b", "c", "a"), (3L, "c", "a", "b"))
      .toDF("u", "r1", "r2", "r3")
    val kd = Stats.fleissKappa(disjoint, "u", Seq("r1", "r2", "r3")).collect().head
    assert(kd.getAs[Double]("p_bar") === 0.0)
    assert(kd.getAs[Double]("p_e") === 0.333333)
    assert(kd.getAs[Double]("fleiss_kappa") === -0.5)
    // every rater constant: P_e = 1 -> kappa undefined -> null
    val const = Seq((1L, "x", "x", "x"), (2L, "x", "x", "x")).toDF("u", "r1", "r2", "r3")
    val kc = Stats.fleissKappa(const, "u", Seq("r1", "r2", "r3")).collect().head
    assert(kc.isNullAt(kc.fieldIndex("fleiss_kappa")))
  }

  test("two-proportion z: hand-checked statistic and significance") {
    // construct unit outcomes directly, then verify against manual math:
    // find which arm each unit lands in, induce rates 0.5 vs 0.1
    val units = (1 to 400).map(i => (i.toLong, "x"))
      .toDF("u", "pad")
    val withArm = units.select(col("u"), Stats.armOf(col("u")).as("arm"))
    val byArm = withArm.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val obs = (1 to 400).map { i =>
      val converted = if (byArm(i.toLong) == "A") i % 2 == 0 else i % 10 == 0
      (i.toLong, converted)
    }.toDF("u", "converted")
    val out = Stats.twoProportionZ(obs, "u", col("converted")).collect().head
    val (nA, cA) = (out.getAs[Long]("n_a"), out.getAs[Long]("conv_a"))
    val (nB, cB) = (out.getAs[Long]("n_b"), out.getAs[Long]("conv_b"))
    val (pa, pb) = (cA.toDouble / nA, cB.toDouble / nB)
    val pool = (cA + cB).toDouble / (nA + nB)
    val z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(out.getAs[Double]("z_score") - math.rint(z * 1e4) / 1e4) < 1e-9)
    assert(out.getAs[Boolean]("significant")) // 0.5 vs 0.1 at n=400 is decisive
  }

  test("chi-square: independent columns give ~0, dependent give large") {
    val indep = (1 to 1000).map(i => (s"a${i % 2}", s"b${i % 5}")).toDF("x", "y")
    val r1 = Stats.chiSquare(indep, "x", "y").collect().head
    assert(r1.getAs[Double]("chi2") === 0.0) // perfectly balanced grid
    assert(r1.getAs[Int]("dof") === 4 && r1.getAs[Long]("n_cells") === 10L)
    val dep = (1 to 1000).map(i => (s"a${i % 2}", s"b${i % 2}")).toDF("x", "y")
    val r2 = Stats.chiSquare(dep, "x", "y").collect().head
    assert(r2.getAs[Double]("chi2") === 1000.0) // perfect association: chi2 = n
  }

  test("mutual information: zero for independent columns, ln 2 for a perfect copy") {
    // independent: every (a, b) cell equally likely
    val ind = (for { a <- Seq("x", "y"); b <- Seq(0, 1); _ <- 1 to 25 } yield (a, b))
      .toDF("a", "b")
    val mi0 = Stats.mutualInformation(ind, "a", "b").collect().head.getDouble(1)
    assert(math.abs(mi0) < 1e-9)
    // b is a function of a, both uniform over 2 values -> I = H = ln 2
    val dep2 = (1 to 100).map(i => (if (i % 2 == 0) "x" else "y", i % 2)).toDF("a", "b")
    val mi1 = Stats.mutualInformation(dep2, "a", "b").collect().head.getDouble(1)
    assert(math.abs(mi1 - math.log(2)) < 1e-6)
  }

  test("gini concentration: uniform load 0, hand-computed skew, nulls dropped") {
    val uniform = Seq("a", "a", "b", "b").toDF("k")
    val u = Stats.giniConcentration(uniform, "k").collect().head
    assert((u.getLong(0), u.getLong(1), u.getDouble(2)) === ((2L, 4L, 0.0)))
    // counts (1, 9): G = (2*(1*1 + 2*9) - 3*10) / (2*10) = 8/20 = 0.4
    val skew = (Seq.fill(1)("a") ++ Seq.fill(9)("b")).toDF("k")
    assert(Stats.giniConcentration(skew, "k").collect().head.getDouble(2) === 0.4)
    val withNull = Seq(Some("a"), Some("a"), None, Some("b"), Some("b")).toDF("k")
    assert(Stats.giniConcentration(withNull, "k").collect().head.getLong(1) === 4L)
  }

  test("sprt: symmetric hypotheses decide at |2k-t| >= 3; undecided stream continues") {
    // p0=.25 vs p1=.75: llr = (2k-t)*ln3, boundary ln19 -> first |2k-t| = 3
    def stream(xs: Seq[Int]) = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x === 1) }.toDF("ts", "hit")
    def run(xs: Seq[Int]) = Stats.sprtBernoulli(stream(xs), col("hit"),
      tsCol = "ts", tieCol = "ts", p0Bp = 2500, p1Bp = 7500).collect().head
    val h1 = run(Seq(1, 1, 1, 0, 0, 0, 0, 0))
    assert(h1.getString(3) === "accept_h1")
    assert(h1.getInt(0) === 3 && h1.getLong(1) === 3L) // stopped at t=3, not horizon
    assert(math.abs(h1.getDouble(2) - 3 * math.log(3.0)) < 1e-6)
    val h0 = run(Seq(0, 0, 0, 1, 1, 1, 1, 1))
    assert(h0.getString(3) === "accept_h0" && h0.getInt(0) === 3)
    val undecided = run(Seq(1, 0, 1, 0, 1, 0))
    assert(undecided.getString(3) === "continue")
    assert(undecided.getInt(0) === 6 && undecided.getLong(1) === 3L) // end-of-data state
  }

  test("mann-whitney u: hand-computed, midrank ties, degenerate variance null") {
    import spark.implicits._
    def run(pairs: Seq[(String, Double)]) =
      Stats.mannWhitneyU(pairs.toDF("arm", "v"), "v", "arm").collect().head
    // A={1,2}, B={3,4}: U_A=0, z = -2/sqrt(5/3)
    val sep = run(Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)))
    assert(sep.getLong(0) === 2L && sep.getLong(1) === 2L)
    assert(sep.getDouble(2) === 0.0)
    assert(sep.getDouble(3) === -1.549193)
    assert(!sep.getBoolean(4))
    // ties: A={1,1}, B={1,2} -> midrank 2 for the tie group, U_A=1,
    // tie-corrected sigma^2 = 1 -> z = -1
    val tied = run(Seq(("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 2.0)))
    assert(tied.getDouble(2) === 1.0)
    assert(tied.getDouble(3) === -1.0)
    // all values identical: variance degenerates -> z and flag null
    val flat = run(Seq(("A", 5.0), ("A", 5.0), ("B", 5.0)))
    assert(flat.isNullAt(3) && flat.isNullAt(4))
  }

  test("hill tail index: hand-computed on an exact dyadic tail; short input degrades to k=0") {
    import spark.implicits._
    // top-2 over threshold 2: gamma = (ln(8/2) + ln(4/2))/2 = 1.5 ln 2
    val vals = Seq(8.0, 4.0, 2.0, 1.0).map(Tuple1(_)).toDF("v")
    val out = Stats.hillTailIndex(vals, "v", k = 2).collect().head
    assert(out.getLong(0) === 2L)
    assert(out.getDouble(1) === 2.0)
    assert(out.getDouble(2) === 1.039721)  // round(1.5 ln 2, 6)
    assert(math.abs(out.getDouble(3) - 1.0 / 1.039721) < 1e-6)
    // flat tail: all selected equal the threshold -> gamma 0, alpha null
    val flat = Seq(3.0, 3.0, 3.0, 3.0).map(Tuple1(_)).toDF("v")
    val f = Stats.hillTailIndex(flat, "v", k = 2).collect().head
    assert(f.getDouble(2) === 0.0 && f.isNullAt(3))
    // fewer than k+1 positive values: k=0 row with null estimates
    val short = Seq(5.0, 2.0).map(Tuple1(_)).toDF("v")
    val s0 = Stats.hillTailIndex(short, "v", k = 5).collect().head
    assert(s0.getLong(0) === 0L && s0.isNullAt(2))
  }

  test("cohen's kappa: perfect 1, marginal-independence 0, skew exposes accuracy") {
    import spark.implicits._
    def kappa(pairs: Seq[(String, String)]) =
      Stats.cohensKappa(pairs.toDF("a", "b"), "a", "b").collect().head
    val perfect = kappa(Seq(("y", "y"), ("n", "n"), ("y", "y")))
    assert(perfect.getDouble(1) === 1.0 && perfect.getDouble(3) === 1.0)
    // balanced 2x2 with po = pe = 0.5 -> kappa exactly 0
    val indep = kappa(Seq(("y", "y"), ("y", "n"), ("n", "y"), ("n", "n")))
    assert(indep.getDouble(1) === 0.5 && indep.getDouble(2) === 0.5)
    assert(indep.getDouble(3) === 0.0)
    // 90% raw agreement on a skewed label still scores kappa 0 — the
    // accuracy-inflation case the statistic exists for
    val skew = kappa(Seq.fill(9)(("x", "x")) :+ (("x", "y")))
    assert(skew.getDouble(1) === 0.9 && skew.getDouble(3) === 0.0)
    // both raters constant: pe = 1 leaves kappa undefined -> null
    val const = kappa(Seq(("x", "x"), ("x", "x")))
    assert(const.isNullAt(3))
  }

  test("bradley-terry: transitive strengths order correctly, ghost decays winless items") {
    import spark.implicits._
    // 1 dominates 2, 2 dominates 3; 4 never wins; 5 plays nobody kept
    val games = (Seq.fill(3)((1L, 2L)) ++ Seq.fill(2)((2L, 3L)) :+ ((1L, 3L))
      :+ ((3L, 4L)) :+ ((2L, 4L))).toDF("winner", "loser")
    val out = Stats.bradleyTerry(games, "winner", "loser", iters = 5, topK = 10)
      .collect()
    val byItem = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // raw counts survive the cap
    assert(byItem(1L)._1 === 4L && byItem(1L)._2 === 0L)
    assert(byItem(4L)._1 === 0L && byItem(4L)._2 === 2L)
    // ratings respect the dominance chain, winless item sinks below start
    val r = byItem.view.mapValues(_._3).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L))
    assert(r(4L) < 1000000L)
    // output ordered by rating desc and ppm shares sum to ~1e6
    assert(out.map(_.getLong(3)).toSeq === out.map(_.getLong(3)).sortBy(-_).toSeq)
    val ppmSum = out.map(_.getLong(4)).sum
    assert(math.abs(ppmSum - 1000000L) <= out.length)
    // deterministic: a second run is bit-identical
    val again = Stats.bradleyTerry(games, "winner", "loser", iters = 5, topK = 10)
      .collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("bradley-terry: topK cap keeps the most-played items only") {
    import spark.implicits._
    val games = (Seq.fill(5)((1L, 2L)) :+ ((3L, 1L))).toDF("w", "l")
    val out = Stats.bradleyTerry(games, "w", "l", iters = 3, topK = 2)
    assert(out.select("item").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("calibration report: hand-computed bins, round-half-up ppm, exact weighted ECE") {
    import spark.implicits._
    // bin 0: five rows at 5% confidence, one positive -> acc 0.2, conf 0.05
    // bin 9: four rows at 95% confidence, three positive -> acc 0.75, conf 0.95
    val rows = (Seq.fill(4)((50000L, 0L)) :+ ((50000L, 1L))) ++
      (Seq.fill(3)((950000L, 1L)) :+ ((950000L, 0L)))
    val out = Stats.calibrationReport(rows.toDF("s", "y"), "s", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.keySet === Set(0L, 9L))
    assert(out(0L) === ((5L, 1L, 200000L, 50000L, 172222L)))
    assert(out(9L) === ((4L, 3L, 750000L, 950000L, 172222L)))
  }

  test("calibration increment law: merged slice artifacts ≡ whole-corpus report") {
    import spark.implicits._
    val rows = Seq((50000L, 0L, 0L), (50000L, 1L, 1L), (450000L, 1L, 2L),
      (450000L, 0L, 3L), (950000L, 1L, 4L), (950000L, 1L, 5L), (250000L, 0L, 6L))
    val df = rows.toDF("s", "y", "id")
    val whole = Stats.calibrationReport(df, "s", "y").collect().map(_.toSeq).toSeq
    val merged = Stats.calibrationFromBins(Stats.calibrationMergeBins(
        Stats.calibrationBins(df.filter($"id" % 2 === 0), "s", "y"),
        Stats.calibrationBins(df.filter($"id" % 2 =!= 0), "s", "y")))
      .collect().map(_.toSeq).toSeq
    assert(merged === whole)
  }

  test("calibration report: a score of exactly 1.0 lands in the top bin, not bin 10") {
    import spark.implicits._
    val out = Stats.calibrationReport(
      Seq((1000000L, 1L), (1000000L, 1L)).toDF("s", "y"), "s", "y").collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 9L)
    assert(out.head.getLong(3) === 1000000L) // perfectly calibrated
    assert(out.head.getLong(5) === 0L)       // zero ECE
  }

  test("trimmed mean: one outlier owns the plain mean, the 10% trim drops it") {
    // values 1..9 plus a 100 outlier: plain mean 14.5; k = 1 trims rank 1
    // (value 1) and rank 10 (value 100) -> mean of 2..9 = 5.5
    val ev = ((1 to 9).map(i => (i.toLong, "a", i.toDouble)) :+ (10L, "a", 100.0))
      .toDF("event_id", "event_type", "value")
    val out = graft.analysis.Stats.trimmedMean(ev).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((10L, 8L, 14500000L, 5500000L)))
  }

  test("poisson bootstrap: identity resample is the exact mean; bounds ordered; shard merge equals rebuild") {
    val ev = (1 to 400).map(i =>
        (i.toLong, if (i % 2 == 0) "click" else "view", (i % 7).toDouble))
      .toDF("event_id", "event_type", "value")
    val full = Stats.poissonBootstrapCi(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    // point estimate = exact round-half-up micro mean, from the b=0 sums
    val clickVals = (1 to 400).filter(_ % 2 == 0).map(i => (i % 7).toLong)
    val expect = (2L * clickVals.sum * 1000000L + clickVals.size) / (2L * clickVals.size)
    assert(full("click").getLong(1) === clickVals.size.toLong)
    assert(full("click").getLong(2) === expect)
    // all 20 resamples survive on 200 rows/group; band is ordered
    for (t <- Seq("click", "view")) {
      assert(full(t).getLong(5) === 20L)
      assert(full(t).getLong(3) <= full(t).getLong(4))
    }
    // the increment law: weights depend only on (id, b), so shard sums add
    val merged = Stats.bootstrapCiFromSums(
        Stats.bootstrapMergeSums("event_type",
          Stats.bootstrapSums(ev.filter("event_id % 3 = 0")),
          Stats.bootstrapSums(ev.filter("event_id % 3 <> 0"))),
        "event_type")
      .collect().map(_.toSeq)
    val rebuilt = Stats.poissonBootstrapCi(ev).collect().map(_.toSeq)
    assert(merged.toSeq === rebuilt.toSeq)
  }
}
