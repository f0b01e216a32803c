package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Experiment / distribution statistics over event frames.
  *
  * Both tests reduce to grouped counts before any math touches them, so the
  * heavy stage is one (or two chained) map-side-combinable aggregates; the
  * test statistics are computed on frames whose size is bounded by group
  * cardinality (arms, contingency cells), never data size. Deterministic
  * md5-based arm assignment makes experiments replayable across engines —
  * the same property the sampling operators build on
  * ([[Sampling.hashBucket]]).
  */
object Stats {

  /** Deterministic 50/50 arm assignment: parity of the first md5 nibble of
    * the unit key. Stable across runs, engines, and data order. */
  def armOf(unit: Column): Column =
    when(conv(substring(md5(unit.cast("string")), 1, 1), 16, 10) % 2 === 0, "A")
      .otherwise("B")

  /** CUPED variance reduction (Deng et al. 2013) — the industry-standard
    * A/B sensitivity boost: adjust each unit's experiment-period metric by
    * its PRE-period metric, Y' = Y − θ(X − X̄), with θ = cov(X,Y)/var(X)
    * pooled across arms. Pre-period behaviour is unaffected by treatment,
    * so the adjustment removes between-user variance without biasing the
    * arm contrast; the achievable reduction is exactly ρ²(X,Y).
    *
    * Exactness recipe (the [[graft.analysis.Profiling.momentSums]] /
    * q103 pattern): each event value quantizes to BIGINT micro-units
    * FIRST (⌊v·10⁶+0.5⌋ — deterministic per event, so per-unit sums are
    * exact integers, order-insensitive); all second-moment sums are
    * DECIMAL(38,0) products of those integers; every downstream step is
    * deterministic IEEE arithmetic on the exact sums, identical bits on
    * any engine — no margin spec needed.
    *
    * Scale shape: ONE scan with conditional pre/post sums per unit, one
    * global + one per-arm aggregate over the unit frame (both map-side
    * combinable), crossJoined 1-row stats — never a window, never a
    * collect of data-sized state.
    *
    * Output per arm: arm, n_units, mean_post_micro, mean_adj_micro,
    * theta_ppm, var_reduction_ppm (= pooled ρ² in ppm; null when a
    * moment degenerates). */
  def cuped(
      df: DataFrame, unitCol: String, valCol: String, tsCol: String,
      cutoff: Column): DataFrame =
    cupedFromUnits(cupedUnits(df, unitCol, valCol, tsCol, cutoff))

  /** The mergeable PER-UNIT artifact behind [[cuped]]: unit, arm, and the
    * exact BIGINT-micro pre/post sums. Artifacts from disjoint event
    * slices merge by per-unit ADDITION of x and y (a unit seen in two
    * slices contributes the sum of its slice sums — exactly what one scan
    * of the union computes), so a daily ingest scans only its batch and
    * the adjusted experiment readout still equals a whole-corpus rebuild —
    * the law q241 gates. */
  def cupedUnits(
      df: DataFrame, unitCol: String, valCol: String, tsCol: String,
      cutoff: Column): DataFrame = {
    val vm = floor(col(valCol).cast("double") * lit(1e6) + lit(0.5)).cast("long")
    df.select(col(unitCol).as("unit"),
        when(col(tsCol) < cutoff, vm).otherwise(lit(0L)).as("pre_e"),
        when(col(tsCol) >= cutoff, vm).otherwise(lit(0L)).as("post_e"))
      .groupBy("unit")
      .agg(sum("pre_e").as("x"), sum("post_e").as("y"))
      .select(col("unit"), armOf(col("unit")).as("arm"), col("x"), col("y"))
  }

  /** Merge per-unit CUPED artifacts from disjoint slices: per-unit
    * addition of the exact integer sums (arm is a pure function of the
    * unit key, so it re-derives rather than merges). */
  def cupedMergeUnits(slices: DataFrame*): DataFrame = {
    require(slices.nonEmpty)
    slices.reduce(_ unionByName _)
      .groupBy("unit").agg(sum("x").as("x"), sum("y").as("y"))
      .select(col("unit"), armOf(col("unit")).as("arm"), col("x"), col("y"))
  }

  /** The readout stage of [[cuped]], runnable on a fresh scan's unit frame
    * or on a merged artifact ([[cupedMergeUnits]]) interchangeably. */
  def cupedFromUnits(units: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val xd = col("x").cast(dec)
    val yd = col("y").cast(dec)
    val g = units.agg(
      count(lit(1)).as("n"),
      sum(xd).as("sx"), sum(yd).as("sy"),
      sum(xd * xd).as("sxx"), sum(xd * yd).as("sxy"), sum(yd * yd).as("syy"))
    val perArm = units.groupBy("arm").agg(
      count(lit(1)).as("na"), sum(xd).as("sxa"), sum(yd).as("sya"))
    val numd = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dend = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vpd = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val theta = numd / dend
    val meanPost = col("sya").cast("double") / col("na")
    val adj = meanPost -
      theta * (col("sxa").cast("double") / col("na") - col("sx").cast("double") / col("n"))
    perArm.crossJoin(g).select(
        col("arm"), col("na").as("n_units"),
        floor(meanPost + lit(0.5)).cast("long").as("mean_post_micro"),
        when(dend === 0, lit(null).cast("long"))
          .otherwise(floor(adj + lit(0.5)).cast("long")).as("mean_adj_micro"),
        when(dend === 0, lit(null).cast("long"))
          .otherwise(floor(theta * lit(1e6) + lit(0.5)).cast("long")).as("theta_ppm"),
        when(dend === 0 || vpd === 0, lit(null).cast("long"))
          .otherwise(floor((numd / dend) * (numd / vpd) * lit(1e6) + lit(0.5))
            .cast("long")).as("var_reduction_ppm"))
      .orderBy("arm")
  }

  /** Deterministic subsample confidence interval for a mean — hash-based
    * m-out-of-n bootstrap: `replicates` half-samples, each selected by the
    * replayable md5 gate (replicate id salted into the hash, so replicates
    * are independent draws yet every one of them re-selects the SAME rows
    * on any engine, run, or retry — what rand()-based bootstraps lose),
    * and the CI is the [α/2, 1−α/2] quantile band of the replicate means.
    * Uncertainty quantification at corpus scale with zero RNG state.
    *
    * Scale shape: one explode (rows × replicates — bound `replicates`
    * accordingly), one grouped DECIMAL mean per replicate (map-side
    * combinable; exact, so replicate means are bit-stable), then the
    * quantile runs over `replicates` scalars. Output (1 row): n, mean,
    * ci_lo, ci_hi (round 6). */
  def subsampleCI(
      df: DataFrame, idCol: String, valCol: String,
      replicates: Int = 20, fraction: Double = 0.5,
      alpha: Double = 0.05): DataFrame = {
    require(replicates > 1 && fraction > 0 && fraction < 1 && alpha > 0 && alpha < 1)
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    val buckets = 10000
    val vals = df.select(col(idCol).as("id"), col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val gate = conv(substring(
        md5(concat(col("rep").cast("string"), lit("|"), col("id").cast("string"))),
        1, 8), 16, 10).cast("long") % buckets
    val repMeans = vals
      .withColumn("rep", explode(sequence(lit(0), lit(replicates - 1))))
      .filter(gate < lit((fraction * buckets).toLong))
      .groupBy("rep")
      .agg((sum(col("v").cast(dec)).cast("double") / count(lit(1))).as("m"))
    val band = repMeans.agg(
      percentile(col("m"), array(lit(alpha / 2), lit(1 - alpha / 2))).as("q"))
      .select(element_at(col("q"), 1).as("ci_lo_raw"), element_at(col("q"), 2).as("ci_hi_raw"))
    vals.agg(count(lit(1)).as("n"),
        (sum(col("v").cast(dec)).cast("double") / count(lit(1))).as("mean_raw"))
      .crossJoin(band)
      .select(col("n"), round(col("mean_raw"), 6).as("mean"),
        round(col("ci_lo_raw"), 6).as("ci_lo"), round(col("ci_hi_raw"), 6).as("ci_hi"))
  }

  /** Mutual information between two categorical columns — the
    * dependence-strength companion to [[chiSquare]] (χ² answers "is there
    * dependence", MI answers "how many nats of it"): I = Σ p(x,y)·ln(p(x,y)
    * /(p(x)p(y))), summed over the observed grid. Feature-selection /
    * leakage-screening workhorse. One grouped count to grid granularity,
    * margins derived from the grid (no second scan), terms DECIMAL-summed
    * so the statistic is bit-stable across partitionings and engines.
    * Output (1 row): n, mi (nats, round 6). */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val grid = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c")).persist()
    try {
      val ma = grid.groupBy("a").agg(sum("c").as("ca"))
      val mb = grid.groupBy("b").agg(sum("c").as("cb"))
      val n = grid.agg(sum("c")).collect().head.getLong(0)
      val result = grid.join(broadcast(ma), "a").join(broadcast(mb), "b")
        .select(((col("c").cast("double") / n) *
          log(lit(n.toDouble) * col("c").cast("double") /
            (col("ca").cast("double") * col("cb").cast("double"))))
          .cast(dec).as("term"))
        .agg(lit(n).as("n"), round(sum("term").cast("double"), 6).as("mi"))
      result.localCheckpoint(true)
    } finally { grid.unpersist(); () }
  }

  /** Two-proportion z-test between arms A and B of `df`.
    *
    * Input grain: one row per (unit, outcome) observation; the unit's
    * outcome is `converted` = max(outcomeCol) (any success counts). The
    * pooled z statistic: z = (pA − pB) / √(p̂(1−p̂)(1/nA + 1/nB)) with
    * p̂ the pooled rate. |z| > 1.96 ⇒ significant at α = 0.05.
    * Output (one row): nA, convA, nB, convB, rate_a, rate_b, z_score,
    * significant. */
  def twoProportionZ(
      df: DataFrame, unitCol: String, outcomeCol: Column): DataFrame = {
    val perUnit = df
      .groupBy(col(unitCol).as("unit"))
      .agg(max(outcomeCol.cast("int")).as("converted"))
      .withColumn("arm", armOf(col("unit")))
    val arms = perUnit.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
    val wide = arms
      .agg(
        max(when(col("arm") === "A", col("n"))).as("n_a"),
        max(when(col("arm") === "A", col("conv"))).as("conv_a"),
        max(when(col("arm") === "B", col("n"))).as("n_b"),
        max(when(col("arm") === "B", col("conv"))).as("conv_b"))
    val pA = col("conv_a").cast(DoubleType) / col("n_a").cast(DoubleType)
    val pB = col("conv_b").cast(DoubleType) / col("n_b").cast(DoubleType)
    val pooled = (col("conv_a") + col("conv_b")).cast(DoubleType) /
      (col("n_a") + col("n_b")).cast(DoubleType)
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a").cast(DoubleType) + lit(1.0) / col("n_b").cast(DoubleType)))
    wide.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(pA, 4).as("rate_a"), round(pB, 4).as("rate_b"),
      round((pA - pB) / se, 4).as("z_score"),
      (abs((pA - pB) / se) > 1.96).as("significant"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns. Observed counts come from one grouped aggregate; expected
    * counts from the row/column marginals joined back (both marginal frames
    * are category-cardinality-sized — broadcast). The statistic sums
    * (O−E)²/E over cells in DECIMAL so the total is shuffle-order-stable.
    * Output: chi2 (round 4), dof, n_cells. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .persist()
    val rowTot = obs.groupBy("a").agg(sum("o").as("ra"))
    val colTot = obs.groupBy("b").agg(sum("o").as("cb"))
    val n = obs.agg(sum("o")).collect().head.getLong(0).toDouble
    // the FULL grid, not just observed cells: an absent combination still
    // contributes (0−E)²/E = E, and dropping those silently deflates the
    // statistic exactly when association is strongest
    val cells = rowTot.crossJoin(colTot)
      .join(obs, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("e", col("ra").cast(DoubleType) * col("cb").cast(DoubleType) / lit(n))
      .withColumn("term",
        ((col("o").cast(DoubleType) - col("e")) * (col("o").cast(DoubleType) - col("e"))
          / col("e")).cast(dec))
    val nA = rowTot.count()
    val nB = colTot.count()
    val out = cells.agg(
      round(sum("term").cast(DoubleType), 4).as("chi2"),
      count(lit(1)).as("n_cells"))
      .withColumn("dof", lit(((nA - 1) * (nB - 1)).toInt))
      .select("chi2", "dof", "n_cells")
    try out.localCheckpoint(true)
    finally { obs.unpersist(); () }
  }

  /** Gini coefficient of event concentration over a key — the standard
    * inequality digest ("do 1% of the documents absorb 90% of the
    * clicks?") a popularity-skew report leads with, and the number that
    * says whether the skew-join/salting machinery is even needed.
    * Computed by the rank formula G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)
    * over counts sorted ascending — numerator and denominator are pure
    * INTEGER sums (exact cross-engine); only the final ratio is a double.
    *
    * Scale shape: one hash aggregate to key granularity, then a rank +
    * single aggregate over the key-count-sized frame (catalog-sized, not
    * event-sized). The global rank window is over that aggregated frame
    * only. Output (1 row): n_keys, total, gini (round 6). */
  /** Wald's SPRT on a Bernoulli stream (Wald 1945) — the SEQUENTIAL member
    * of the experiment family: [[twoProportionZ]] answers a fixed-horizon
    * question after the fact; this one monitors the stream as it arrives
    * and says WHEN the evidence first sufficed. H₀: p = p0 vs H₁: p = p1;
    * each observation adds one of two constant log-likelihood increments,
    * so LLR_t = k·ln(p1/p0) + (t−k)·ln((1−p1)/(1−p0)) is a pure function
    * of the INTEGER prefix counts (t, k) — no running float state, which
    * is what makes the whole trajectory engine-reproducible. Stop at the
    * first t where LLR ≥ ln((1−β)/α) (accept H₁) or ≤ ln(β/(1−α))
    * (accept H₀); otherwise `continue` with the end-of-data state.
    * Rates and risks arrive in basis points so every logarithm's operand
    * is a ratio of exact integer-valued doubles.
    *
    * Scale shape: one ordered window over the observation stream builds
    * (t, k); the crossing is a filter + min-struct aggregate. The global
    * order is per EXPERIMENT — at fleet scale, partition the window by
    * experiment id; a single experiment's stream is the unit of analysis
    * by definition. Output (1 row): n_obs, n_success, llr (round 6),
    * decision, upper (round 6), lower (round 6). */
  def sprtBernoulli(
      df: DataFrame,
      success: Column,
      tsCol: String,
      tieCol: String,
      p0Bp: Int,
      p1Bp: Int,
      alphaBp: Int = 500,
      betaBp: Int = 500): DataFrame = {
    require(p0Bp > 0 && p0Bp < 10000 && p1Bp > 0 && p1Bp < 10000 && p0Bp != p1Bp,
      s"need distinct rates in (0,1), got $p0Bp/$p1Bp bp")
    import org.apache.spark.sql.expressions.Window
    val lnS = log(lit(p1Bp.toDouble) / lit(p0Bp.toDouble))
    val lnF = log(lit((10000 - p1Bp).toDouble) / lit((10000 - p0Bp).toDouble))
    val upper = log(lit((10000 - betaBp).toDouble) / lit(alphaBp.toDouble))
    val lower = log(lit(betaBp.toDouble) / lit((10000 - alphaBp).toDouble))
    val ord = Window.orderBy(col(tsCol), col(tieCol))
    val cum = df
      .select(success.cast("long").as("x"), col(tsCol), col(tieCol))
      .withColumn("t", row_number().over(ord))
      .withColumn("k", sum("x").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("llr", col("k") * lnS + (col("t") - col("k")) * lnF)
      .persist()
    try {
      val crossed = cum.filter(col("llr") >= upper || col("llr") <= lower)
        .agg(min(struct(col("t"), col("k"), col("llr"))).as("c"))
      val last = cum.agg(max(struct(col("t"), col("k"), col("llr"))).as("e"))
      last.crossJoin(broadcast(crossed))
        .select(
          coalesce(col("c.t"), col("e.t")).as("n_obs"),
          coalesce(col("c.k"), col("e.k")).as("n_success"),
          round(coalesce(col("c.llr"), col("e.llr")), 6).as("llr"),
          when(col("c").isNull, "continue")
            .when(col("c.llr") >= upper, "accept_h1")
            .otherwise("accept_h0").as("decision"),
          round(upper, 6).as("upper"), round(lower, 6).as("lower"))
    } finally { cum.unpersist(); () }
  }

  /** COHEN'S KAPPA: chance-corrected agreement between two categorical
    * labelings of the same rows — κ = (p_o − p_e)/(1 − p_e), where p_o is
    * observed agreement and p_e the agreement two independent raters with
    * these marginals would reach by luck. The standard way to certify one
    * classifier against another (or against gold labels) beyond raw
    * accuracy, which inflates under skewed class balance.
    *
    * Scale shape: ONE grid aggregate (|A|×|B| rows — metric-sized);
    * marginals, p_o, and p_e are integer sums over the grid, so the only
    * floating step is the final ratio — no libm, bit-identical anywhere.
    * Degenerate guard: p_e = 1 (both raters constant) leaves κ undefined
    * → null.
    *
    * Output (1 row): n, po (round 6), pe (round 6), kappa (round 6). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val grid = df
      .select(col(aCol).cast(StringType).as("a"), col(bCol).cast(StringType).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    // margins joined on the class label — classes one rater never uses
    // contribute zero to p_e via the inner join, which is exact (0·x = 0)
    val ma = grid.groupBy("a").agg(sum("c").as("ra"))
    val mb = grid.groupBy("b").agg(sum("c").as("cb"))
    val peNum = ma.join(mb, ma("a") === mb("b"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("pe_num"))
    val totals = grid.agg(
      sum("c").as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(lit(0L))).as("diag"))
    totals.crossJoin(peNum)
      .select(col("n"),
        round(col("diag").cast(DoubleType) / col("n").cast(DoubleType), 6).as("po"),
        round(col("pe_num").cast(DoubleType)
          / (col("n").cast(DoubleType) * col("n").cast(DoubleType)), 6).as("pe"),
        col("diag"), col("pe_num"))
      .withColumn("po_raw", col("diag").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("pe_raw", col("pe_num").cast(DoubleType)
        / (col("n").cast(DoubleType) * col("n").cast(DoubleType)))
      .select(col("n"), col("po"), col("pe"),
        when(lit(1.0) - col("pe_raw") > 0,
          round((col("po_raw") - col("pe_raw")) / (lit(1.0) - col("pe_raw")), 6))
          .as("kappa"))
  }

  /** FLEISS' KAPPA: chance-corrected agreement among R ≥ 2 raters over the
    * same units — [[cohensKappa]]'s multi-rater generalization, the
    * standard certification number for annotation panels (human or
    * heuristic) before their labels are trusted as training signal. Each
    * unit must carry exactly R non-null ratings (complete panel; missing-
    * data designs are Krippendorff territory).
    *
    * κ = (P̄ − P̄e)/(1 − P̄e) with P̄ from Σ_u Σ_c n_uc² and P̄e from the
    * squared category marginals — BOTH integer sums, so the only float
    * steps are three final ratios on exact integers (bit-identical on any
    * engine; the [[cohensKappa]] exactness argument verbatim).
    *
    * Scale shape: one melt (R rows/unit), one (unit, label) count, one
    * Σn² aggregate + one marginal aggregate — all map-side combinable;
    * no window, no collect.
    * Output (1 row): n_units, n_raters, p_bar (round 6), p_e (round 6),
    * fleiss_kappa (round 6; null when P̄e = 1 — every rater constant). */
  def fleissKappa(
      ratings: DataFrame, unitCol: String, raterCols: Seq[String]): DataFrame = {
    require(raterCols.size >= 2, s"need >= 2 raters, got $raterCols")
    val r = raterCols.size
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val long = ratings.select(col(unitCol).as("u"),
        explode(array(raterCols.map(c => col(c).cast(StringType)): _*)).as("lab"))
      .filter(col("lab").isNotNull)
    val cells = long.groupBy("u", "lab").agg(count(lit(1)).as("nuc")).persist()
    val s2 = cells.agg(
      sum((col("nuc").cast(dec) * col("nuc").cast(dec))).as("s2"),
      count_distinct(col("u")).as("n_units"))
    val marg = cells.groupBy("lab").agg(sum("nuc").as("tc"))
      .agg(sum(col("tc").cast(dec) * col("tc").cast(dec)).as("te2"))
    s2.crossJoin(marg)
      .select(col("n_units"), lit(r).as("n_raters"),
        ((col("s2").cast(DoubleType) - col("n_units") * lit(r.toDouble))
          / (col("n_units").cast(DoubleType) * lit((r * (r - 1)).toDouble)))
          .as("p_bar_raw"),
        (col("te2").cast(DoubleType)
          / (col("n_units").cast(DoubleType) * lit(r.toDouble)
            * (col("n_units").cast(DoubleType) * lit(r.toDouble))))
          .as("p_e_raw"))
      .select(col("n_units"), col("n_raters"),
        round(col("p_bar_raw"), 6).as("p_bar"),
        round(col("p_e_raw"), 6).as("p_e"),
        when(lit(1.0) - col("p_e_raw") > 0,
          round((col("p_bar_raw") - col("p_e_raw")) / (lit(1.0) - col("p_e_raw")), 6))
          .as("fleiss_kappa"))
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) with tie correction: the
    * nonparametric two-sample test on MAGNITUDES, completing the
    * experiment toolkit next to [[twoProportionZ]] (rates) — robust to
    * the heavy-tailed metrics ([[hillTailIndex]]) that invalidate a
    * t-test. Ranks use the standard midrank treatment of ties; the
    * normal approximation's variance carries the Σ(t³−t) tie term.
    *
    * Scale shape: ONE grouped aggregate to the distinct-value grid, then a
    * DISTRIBUTED cumulative sum over that grid for midranks (the q95
    * range-partition + per-partition-offsets recipe via
    * [[graft.relational.Relational.distributedCumSum]] — a continuous
    * metric makes the distinct grid O(n), and a bare Window.orderBy would
    * drag it through one task), then scalar math. Midranks are exact
    * half-integers, so every sum is exact in doubles (no rounding
    * ambiguity to quarantine); the only irrational step is the final sqrt
    * (IEEE-exact). No p-value on purpose — that would need erf; the z
    * score and the |z| > 1.96 flag are the portable deliverables.
    *
    * Output (1 row): n_a, n_b, u_a (round 6), z (round 6; null when the
    * variance degenerates — all values tied), significant. */
  def mannWhitneyU(
      df: DataFrame, valCol: String, armCol: String,
      armA: String = "A"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val vals = df
      .select(col(armCol).cast(StringType).as("arm"), col(valCol).cast(DoubleType).as("v"))
      .filter(col("v").isNotNull)
    val grid = vals.groupBy("v").agg(
      sum(when(col("arm") === armA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("arm") =!= armA, 1L).otherwise(0L)).as("cb"))
    val ranked = graft.relational.Relational.distributedCumSum(
        grid.withColumn("t", col("ca") + col("cb")), Seq("v"), Seq("t"))
      .withColumn("cum", col("cum_t"))
      // midrank of a tie group = ranks (cum-t+1 .. cum) averaged
      .withColumn("avg_rank",
        (col("cum") - col("t")).cast(DoubleType) + (col("t") + 1).cast(DoubleType) / lit(2.0))
    val agg = ranked.agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      sum((col("avg_rank") * col("ca").cast(DoubleType)).cast(dec))
        .cast(DoubleType).as("ra"),
      sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    val nA = col("n_a").cast(DoubleType)
    val nB = col("n_b").cast(DoubleType)
    val n = nA + nB
    val uA = col("ra") - nA * (nA + lit(1.0)) / lit(2.0)
    val sigma2 = (nA * nB / lit(12.0)) *
      ((n + lit(1.0)) - col("ties").cast(DoubleType) / (n * (n - lit(1.0))))
    val z = (uA - nA * nB / lit(2.0)) / sqrt(sigma2)
    agg.select(col("n_a"), col("n_b"),
        round(uA, 6).as("u_a"),
        when(sigma2 > 0, round(z, 6)).as("z"))
      .withColumn("significant", when(col("z").isNotNull, abs(col("z")) > 1.96))
  }

  /** HILL TAIL-INDEX estimator over the top-k order statistics:
    * γ̂ = (1/k)·Σᵢ₌₁..ₖ ln(x₍ᵢ₎/x₍ₖ₊₁₎), α̂ = 1/γ̂ — the standard
    * heavy-tail exponent measurement (α ≈ 1–2 = very heavy; α large =
    * light tail). The capacity-planning number behind "how bad can one
    * session/key get", complementing [[giniConcentration]]'s one-number
    * skew with an actual tail law.
    *
    * Scale shape: the ONLY data-sized step is a TakeOrdered(k+1); the
    * estimator runs on k rows with DECIMAL-summed log terms. Ties at the
    * threshold are harmless (equal values → identical selected multiset,
    * and their terms are ln 1 = 0). Needs > k positive values — with
    * fewer, the threshold frame is empty and the single output row reads
    * k=0 with null estimates rather than a fabricated tail.
    *
    * Output (1 row): k, x_threshold, gamma_hat (round 6), alpha_hat
    * (round 6; null when γ̂ = 0, i.e. the whole tail is flat). */
  def hillTailIndex(df: DataFrame, valCol: String, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"need k >= 1, got $k")
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val top = df.select(col(valCol).cast(DoubleType).as("x"))
      .filter(col("x") > 0)
      .orderBy(desc("x")).limit(k + 1)
    val ranked = top.withColumn("rn", row_number().over(Window.orderBy(desc("x"))))
    val thr = ranked.filter(col("rn") === k + 1).select(col("x").as("x_thr"))
    ranked.filter(col("rn") <= k)
      .crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("k"),
        max("x_thr").as("x_threshold"),
        round(sum(log(col("x") / col("x_thr")).cast(dec)).cast(DoubleType)
          / count(lit(1)), 6).as("gamma_hat"))
      .withColumn("alpha_hat",
        when(col("gamma_hat") > 0, round(lit(1.0) / col("gamma_hat"), 6)))
  }

  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("x"))
    // global rank over (x, k) — keys are sessions/users (billions at
    // 100 TB), so the rank is the q95 distributed recipe, never a bare
    // Window.orderBy through one task
    val ranked = graft.relational.Relational.distributedCumSum(
      counts, Seq("x", "k"), Nil, rankCol = Some("i"))
    ranked
      .agg(count(lit(1)).as("n_keys"), sum("x").as("total"),
        sum(col("i") * col("x")).as("sixi"))
      .select(col("n_keys"), col("total"),
        round(
          (lit(2) * col("sixi") - (col("n_keys") + 1) * col("total")).cast(DoubleType) /
            (col("n_keys").cast(DoubleType) * col("total").cast(DoubleType)),
          6).as("gini"))
  }

  /** Bradley–Terry strength ratings from pairwise preferences — the
    * arena-leaderboard / RLHF-preference-aggregation estimator: items get
    * latent strengths w with P(i beats j) = w_i/(w_i+w_j), fit by `iters`
    * fixed MM iterations (Hunter 2004): w_i ← Wins_i / Σ_j n_ij/(w_i+w_j),
    * with the standard ghost-opponent regularization (each item plays one
    * extra win and one extra loss against a fixed strength-1 ghost) so the
    * comparison graph is always connected and winless items decay rather
    * than freeze at the start value.
    *
    * Scale shape: the data-sized stage is ONE aggregate of `games`
    * (winnerCol, loserCol rows) to a directed win-count grid; items are
    * capped to the `topK` most-played (TakeOrdered, ties on item asc), so
    * the grid is ≤ topK² rows — MODEL-sized by construction (arena items
    * are models/sources, not documents), and the MM loop runs driver-side
    * on that grid the way the IVF codebooks do, never touching the data
    * again. At 100 TB only the first aggregate grows.
    *
    * Cross-build portability (the q165/q180 lesson): ratings live in BIGINT
    * micro-units the entire loop. Each MM term is quantized
    * floor(n_ij·10¹²/(W_i+W_j)+0.5) — integer-input IEEE multiply/divide
    * then floor, bit-identical on any engine — summed in exact Long, and
    * the rating update floor(Wins_i·10¹²/denom+0.5) is the same shape, so
    * the whole iteration is expressible verbatim in the DuckDB oracle
    * (unrolled CTEs) with zero engine-build-sensitive arithmetic.
    *
    * Output per top-K item, (rating desc, item asc): item, n_wins,
    * n_losses, rating_micro (BIGINT, unnormalized MM fixed point after
    * `iters` rounds, start 10⁶), rating_ppm (BIGINT share of total). */
  def bradleyTerry(
      games: DataFrame,
      winnerCol: String,
      loserCol: String,
      iters: Int = 5,
      topK: Int = 20): DataFrame = {
    require(iters >= 1 && topK >= 2, s"need iters >= 1, topK >= 2")
    val spark = games.sparkSession
    val g = games.select(col(winnerCol).cast("long").as("wi"),
        col(loserCol).cast("long").as("li"))
      .filter(col("wi").isNotNull && col("li").isNotNull && col("wi") =!= col("li"))
    val appearances = g.select(col("wi").as("item"))
      .unionByName(g.select(col("li").as("item")))
      .groupBy("item").agg(count(lit(1)).as("n_games"))
    val top = appearances.orderBy(desc("n_games"), col("item")).limit(topK)
      .select(col("item"))
    val kept = g
      .join(broadcast(top.withColumnRenamed("item", "wi")), Seq("wi"))
      .join(broadcast(top.withColumnRenamed("item", "li")), Seq("li"))
    // ≤ topK² rows: the directed win grid IS the model
    val grid = kept.groupBy("wi", "li").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (winner, loser, n)
    val items = grid.flatMap { case (w, l, _) => Seq(w, l) }.distinct.sorted
    val wins = grid.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val losses = grid.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // symmetric games-between counts n_ij (i<j folded both ways)
    val nBetween = grid.groupBy { case (w, l, _) => if (w < l) (w, l) else (l, w) }
      .view.mapValues(_.map(_._3).sum).toMap
    var rating = items.map(_ -> 1000000L).toMap // micro-units, start 1.0
    for (_ <- 1 to iters) {
      rating = items.map { i =>
        // ghost-opponent regularization (the standard connectivity fix):
        // every item also plays one win + one loss against a fixed
        // 1.0-rated ghost, so zero-win items decay instead of freezing at
        // the start value and the MM map is total with no zero guards
        // max(1, ·): with ratings clamped below 4e12 the ghost term alone
        // is ≥ 1, but the guard makes the MM map total even off-domain
        val denomMicro = math.max(1L, items.iterator.filter(_ != i).map { j =>
          val nij = nBetween.getOrElse(if (i < j) (i, j) else (j, i), 0L)
          if (nij == 0) 0L
          else math.floor(nij * 1e12 / (rating(i) + rating(j)) + 0.5).toLong
        }.sum + // exact Long sum — order-free by construction
          math.floor(2 * 1e12 / (rating(i) + 1000000L) + 0.5).toLong)
        val wi = wins.getOrElse(i, 0L) + 1L
        // clamp to 4e12 micro (rating 4e6): keeps 2·r·10⁶ + totalMicro far
        // inside Long on the ppm line; unreachable under the ghost decay
        i -> math.min(4000000000000L, math.floor(wi * 1e12 / denomMicro + 0.5).toLong)
      }.toMap
    }
    val totalMicro = items.map(rating).sum
    val rows = items.map { i =>
      val r = rating(i)
      (i, wins.getOrElse(i, 0L), losses.getOrElse(i, 0L), r,
        (2 * r * 1000000L + totalMicro) / (2 * totalMicro)) // round-half-up ppm
    }
    import spark.implicits._
    rows.toSeq.toDF("item", "n_wins", "n_losses", "rating_micro", "rating_ppm")
      .orderBy(desc("rating_micro"), col("item"))
  }
  /** CALIBRATION report + Expected Calibration Error over an integer ppm
    * confidence column — the reliability diagram every heuristic/model
    * score needs before its confidences gate data decisions (a 900000-ppm
    * "sure" that is right 60% of the time is a miscalibrated filter, not
    * a strict one). Scores land in `bins` equal-width bins; each bin
    * reports observed accuracy vs mean claimed confidence, and ECE is the
    * n-weighted mean absolute gap (Naeini et al. 2015; Guo et al. 2017).
    *
    * ALL-INTEGER lattice: the score is already BIGINT ppm (the caller
    * quantizes — heuristic ratios are born integer here, model scores go
    * through the q165 micro-quantization recipe), the bin key is integer
    * division, accuracies/confidences are round-half-up integer ppm, and
    * ECE's weighted sum is exact BIGINT arithmetic — nothing can drift
    * across engines or builds. Each row also carries the corpus-level
    * ece_ppm (constant column) so the single gate emits diagram + scalar.
    *
    * Scale shape: one groupBy on the bin key (`bins` rows), a 1-row total,
    * broadcast back — a counting pass, no wide state.
    * Output per non-empty bin: bin, n, n_pos, acc_ppm, conf_ppm, ece_ppm. */
  def calibrationReport(
      df: DataFrame,
      scorePpmCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame =
    calibrationFromBins(calibrationBins(df, scorePpmCol, labelCol, bins))

  /** [[calibrationReport]]'s MERGEABLE artifact: per-bin exact integer
    * sums 〈bin, n, n_pos, ssum〉. Additive by construction — artifacts
    * from disjoint slices (daily eval batches, per-source shards) merge
    * with [[calibrationMergeBins]] and the merged readout reproduces the
    * whole-corpus report bit-for-bit (q248's LAW gate), so calibration
    * monitoring never rescans old slices. ≤ `bins` rows per slice. */
  def calibrationBins(
      df: DataFrame,
      scorePpmCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    df.select(
        least(expr(s"($scorePpmCol * $bins) div 1000000"), lit(bins - 1L))
          .cast("long").as("bin"),
        col(labelCol).cast("long").as("y"), col(scorePpmCol).as("s"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"), sum("s").as("ssum"))
  }

  /** Merge per-slice calibration artifacts by per-bin ADDITION of the
    * exact integer sums. */
  def calibrationMergeBins(artifacts: DataFrame*): DataFrame =
    artifacts.reduce(_ unionByName _)
      .groupBy("bin")
      .agg(sum("n").as("n"), sum("n_pos").as("n_pos"), sum("ssum").as("ssum"))

  /** Readout half of [[calibrationReport]]: accuracies, confidences, and
    * the n-weighted ECE from a (possibly merged) bins artifact.
    *
    * Intermediates widen to DECIMAL(38,0) before the multiplies (the q246
    * oracle's HUGEINT): `n_pos * 2e6` and `ssum * 2` overflow BIGINT past
    * ~4.6e12 rows per bin and the gap*n sum past ~9e12 weighted rows —
    * the same class of ANSI overflow-throw the round-10 lofLattice fix
    * closed. `div` (IntegralDivide) takes decimal inputs and still emits
    * BIGINT, so the output schema is unchanged. */
  /** POISSON BOOTSTRAP confidence interval (Chamandy et al. 2012, "
    * Estimating Uncertainty for Massive Data Streams" — the map-reduce
    * bootstrap): instead of drawing n-out-of-n resamples (impossible to
    * coordinate across shards), each row independently receives a
    * Poisson(1) multiplicity per resample, so a resample is ONE weighted
    * aggregate and B resamples are one groupBy over a B-way literal
    * spine. Multiplicities here are DETERMINISTIC — the md5-derived
    * [[Sketches.hash60]] of (row id, resample id) inverted through the
    * Poisson(1) CDF — so the interval is reproducible and oracle-exact
    * across engines (the q250 hash recipe; no RNG anywhere).
    *
    * Resample b = 0 is the identity (every weight 1): its sums ARE the
    * point-estimate numerator/denominator, so one artifact frame carries
    * everything. The interval is the 2nd-smallest/2nd-largest resample
    * mean (a ~90% band at B = 20), ranked with a deterministic (mean, b)
    * tie-break.
    *
    * Scale shape: the B-way spine explodes rows BEFORE a
    * map-side-combinable aggregate — partial combine collapses each
    * partition to |groups|·(B+1) rows, so the shuffle never carries the
    * blow-up; the readout windows over ≤ B rows per group. Values
    * quantize to exact BIGINT micros (the q234 recipe).
    * Output per group: groupCol, n, est_micro, ci_lo_micro, ci_hi_micro,
    * n_resamples. */
  def poissonBootstrapCi(
      df: DataFrame,
      groupCol: String = "event_type",
      valCol: String = "value",
      idCol: String = "event_id",
      b: Int = 20): DataFrame =
    bootstrapCiFromSums(bootstrapSums(df, groupCol, valCol, idCol, b), groupCol)

  /** [[poissonBootstrapCi]]'s MERGEABLE artifact: per (group, resample)
    * exact integer sums 〈groupCol, b, s, w〉 — Σ weight·value_micro and
    * Σ weight, with b = 0 the identity resample (s = Σvalue_micro,
    * w = n). Weights depend only on (row id, b), never on which shard
    * counted the row, so artifacts from disjoint slices merge by
    * per-(group, b) ADDITION ([[bootstrapMergeSums]]) — the law q267
    * gates: a sharded eval fleet bootstraps without ever co-locating
    * rows. */
  def bootstrapSums(
      df: DataFrame,
      groupCol: String = "event_type",
      valCol: String = "value",
      idCol: String = "event_id",
      b: Int = 20): DataFrame = {
    require(b >= 4, s"need b >= 4 resamples, got $b")
    val spark = df.sparkSession
    import spark.implicits._
    val vm = floor(col(valCol).cast("double") * lit(1e6) + lit(0.5)).cast("long")
    // Poisson(1) CDF in millionths: P(X<=k) for k = 0..5, else 6
    val u = pmod(Sketches.hash60(
      concat(col(idCol).cast("string"), lit(":"), col("b").cast("string"))),
      lit(1000000L))
    val w = when(col("b") === 0, lit(1L))
      .when(u < 367879, 0L).when(u < 735759, 1L).when(u < 919699, 2L)
      .when(u < 981012, 3L).when(u < 996340, 4L).when(u < 999406, 5L)
      .otherwise(6L)
    df.select(col(groupCol), col(idCol), vm.as("vm"))
      .crossJoin(broadcast((0 to b).map(_.toLong).toDF("b")))
      .withColumn("w", w)
      .groupBy(groupCol, "b")
      // DECIMAL(38,0) sums: Σ w·vm overflows BIGINT past ~1.5e10 rows at
      // micro quantization (the q246/lofLattice widening posture); the
      // oracle's HUGEINT
      .agg(sum((col("w") * col("vm")).cast("decimal(38,0)")).as("s"),
        sum("w").as("w"))
  }

  /** Merge per-slice bootstrap artifacts by per-(group, resample)
    * addition. The group key is named, not positional — a reordered
    * artifact projection must not silently change the merge key. */
  def bootstrapMergeSums(
      groupCol: String, artifacts: DataFrame*): DataFrame =
    artifacts.reduce(_ unionByName _)
      .groupBy(groupCol, "b")
      .agg(sum("s").as("s"), sum("w").as("w"))

  /** TRIMMED MEAN per group — the robust location estimate eval
    * dashboards quote when a handful of outlier rows (latency spikes,
    * runaway generations) would otherwise own the mean: drop the lowest
    * and highest ⌊trim·n⌋ values by EXACT rank (deterministic (value, id)
    * tie-break) and average the middle. Reported next to the plain mean
    * so the gap itself is the outlier-mass signal. Exact integer micros
    * end-to-end (the q234 quantization), trimmed mean round-half-up.
    *
    * Scale shape: per-group rank via the DISTRIBUTED rank recipe — one
    * [[graft.relational.Relational.distributedCumSum]] over the
    * (group, value, id) total order (range partition, #partitions-row
    * driver scan) minus a broadcast per-group offset — NOT a
    * Window.partitionBy(group) rank, which sorts each group inside ONE
    * task and serializes on a mega-group (one event type can be a double
    *-digit-TB slice of a 100-TB stream). Groups-sized frames broadcast.
    * n < 1/trim rows → nothing trims, the trimmed mean equals the plain
    * mean.
    * Output per group: groupCol, n, n_trimmed, mean_micro,
    * trimmed_mean_micro. */
  def trimmedMean(
      df: DataFrame,
      groupCol: String = "event_type",
      valCol: String = "value",
      idCol: String = "event_id",
      trimPpm: Int = 100000): DataFrame = {
    require(trimPpm >= 0 && trimPpm < 500000,
      s"need trim in [0, 0.5) as ppm, got $trimPpm")
    val vm = floor(col(valCol).cast("double") * lit(1e6) + lit(0.5)).cast("long")
    val globalRanked = graft.relational.Relational.distributedCumSum(
      df.select(col(groupCol), col(idCol), vm.as("vm")),
      orderCols = Seq(groupCol, "vm", idCol), sumCols = Seq.empty,
      rankCol = Some("grk"))
    // per-group size and exclusive global offset: |groups| rows, broadcast
    val offsets = globalRanked.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), min("grk").as("g0"))
    val ranked = globalRanked.join(broadcast(offsets), Seq(groupCol))
      .withColumn("rn", col("grk") - col("g0") + 1L)
      .withColumn("k", expr(s"(n * $trimPpm) div 1000000"))
    ranked.groupBy(groupCol)
      .agg(max("n").as("n"),
        sum(when(col("rn") > col("k") && col("rn") <= col("n") - col("k"), 1L)
          .otherwise(0L)).as("n_trimmed"),
        sum(col("vm").cast("decimal(38,0)")).as("sv"),
        sum(when(col("rn") > col("k") && col("rn") <= col("n") - col("k"),
          col("vm")).otherwise(0L).cast("decimal(38,0)")).as("st"))
      .select(col(groupCol), col("n"), col("n_trimmed"),
        expr("(2 * sv + n) div (2 * n)").as("mean_micro"),
        when(col("n_trimmed") > 0,
          expr("(2 * st + n_trimmed) div (2 * n_trimmed)"))
          .as("trimmed_mean_micro"))
      .orderBy(groupCol)
  }

  /** Readout half of [[poissonBootstrapCi]]: point estimate off the
    * identity resample, interval off the 2nd-smallest/2nd-largest
    * resample means (deterministic (mean, b) rank). Resamples whose total
    * weight is 0 carry no information and drop out; groups with fewer
    * than 4 surviving resamples report null bounds. */
  def bootstrapCiFromSums(sums: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id0 = sums.filter(col("b") === 0)
      .select(col(groupCol), col("w").as("n"),
        when(col("w") > 0, expr("(2 * s + w) div (2 * w)")).as("est_micro"))
    val res = sums.filter(col("b") > 0 && col("w") > 0)
      .withColumn("m", expr("(2 * s + w) div (2 * w)"))
    val win = Window.partitionBy(groupCol).orderBy(col("m"), col("b"))
    val ranked = res
      .withColumn("rn", row_number().over(win))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(groupCol)))
    val ci = ranked.groupBy(groupCol)
      .agg(max(col("cnt")).as("n_resamples"),
        max(when(col("rn") === 2 && col("cnt") >= 4, col("m"))).as("ci_lo_micro"),
        max(when(col("rn") === col("cnt") - 1 && col("cnt") >= 4, col("m")))
          .as("ci_hi_micro"))
    id0.join(ci, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("est_micro"),
        col("ci_lo_micro"), col("ci_hi_micro"),
        coalesce(col("n_resamples"), lit(0L)).as("n_resamples"))
      .orderBy(groupCol)
  }

  def calibrationFromBins(binsArtifact: DataFrame): DataFrame = {
    val perBin = binsArtifact
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(CAST(n_pos AS DECIMAL(38,0)) * 2000000 + n) div (2 * n)")
          .as("acc_ppm"),
        expr("(CAST(ssum AS DECIMAL(38,0)) * 2 + n) div (2 * n)")
          .as("conf_ppm"))
      .localCheckpoint(true) // referenced twice: rows + the ECE total
    val ece = perBin
      .agg(sum(abs(col("acc_ppm") - col("conf_ppm"))
          .cast("decimal(38,0)") * col("n")).as("gap"),
        sum("n").as("nt"))
      .select(expr("(gap * 2 + nt) div (2 * nt)").as("ece_ppm"))
    perBin.crossJoin(broadcast(ece)).orderBy("bin")
  }
}
