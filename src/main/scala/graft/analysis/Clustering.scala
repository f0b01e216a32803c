package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic Lloyd k-means over embedding columns.
  *
  * Unlike the ML-library quantizer inside [[Similarity.knnIvf]] (random
  * init, engine-private iteration order — which is why q37 gates it only at
  * the exhaustive-probe setting), this implementation is REPLAYABLE TO THE
  * BIT across engines: first-k-by-id init, squared-distance sums evaluated
  * in fixed dimension order, deterministic (distance, cluster) tie-break,
  * and centroid means accumulated in DECIMAL before one double division —
  * so an external SQL engine reproduces every iteration exactly, and the
  * correctness gate covers the whole clustering loop, not just a projection
  * of it. [[Similarity.knnIvfDeterministic]] reuses the fit as a coarse
  * quantizer, which is what makes a true nProbe < nCells IVF oracle (q117)
  * possible.
  *
  * Scale shape per iteration: assignment is a pure PROJECTION against
  * centroid literals (k·dim doubles broadcast inside the plan — no join,
  * no shuffle; the vector rides along so the update never joins back to
  * the points), and the update is one explode + grouped decimal sum whose
  * k·dim-row result returns to the driver (the model state, bounded by
  * model size, never data size). Exactly the two-phase structure every
  * distributed k-means runs; iterations is a small constant.
  */
object Clustering {

  /** Assignment projection: each row of `pts` (id, v) gets its nearest
    * centroid by squared L2, ties broken by cluster id (lexicographic
    * struct sort = (distance, cluster) tie-break). Keeps `v`. */
  private[graft] def assignedOf(pts: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit): _*)
      struct(
        aggregate(zip_with(col("v"), cLit, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d).as("d2"),
        lit(i).as("cluster"))
    }
    pts.withColumn("best", element_at(array_sort(array(dists: _*)), 1))
      .select(col("id"), col("v"), col("best.cluster").as("cluster"),
        col("best.d2").as("d2"))
  }

  private[graft] def ptsOf(points: DataFrame, idCol: String, vecCol: String): DataFrame =
    points.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))

  /** Run `iterations` Lloyd rounds and return the final centroids —
    * deterministic (first-k-by-id init, DECIMAL means), so an external SQL
    * engine reproduces them bit-for-bit. Clusters that lose all members
    * keep their previous centroid. */
  def lloydCentroids(
      points: DataFrame,
      k: Int,
      iterations: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    val dec = DecimalType(38, 12)
    val pts = ptsOf(points, idCol, vecCol).persist()
    try {
      // deterministic init: the k lowest-id points are the seed centroids
      var centroids: Array[Array[Double]] = pts.orderBy("id").limit(k)
        .collect().map(_.getSeq[Double](1).toArray)
      for (_ <- 1 to iterations) {
        val stats = assignedOf(pts, centroids)
          .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim")
          .agg(sum(col("x").cast(dec)).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = centroids.map(_.clone())
        stats.groupBy(_.getAs[Int]("cluster")).foreach { case (cl, rows) =>
          rows.foreach { r =>
            next(cl)(r.getAs[Int]("dim")) =
              r.getAs[java.math.BigDecimal]("s").doubleValue() / r.getAs[Long]("n")
          }
        }
        centroids = next // clusters with no members keep their old centroid
      }
      centroids
    } finally { pts.unpersist(); () }
  }

  /** Run `iterations` Lloyd rounds and return final assignments:
    * idCol, cluster, dist2 (squared distance to the final centroid,
    * round 6). */
  def lloydKMeans(
      points: DataFrame,
      k: Int = 4,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = lloydCentroids(points, k, iterations, idCol, vecCol)
    assignedOf(ptsOf(points, idCol, vecCol), centroids)
      .select(col("id").as(idCol), col("cluster"),
        round(col("d2"), 6).as("dist2"))
      .localCheckpoint(true)
  }

  /** External cluster-quality metrics against a reference labeling —
    * the evaluation step after any clustering/quantization run:
    *
    *  - purity: Σ_c max_l n_cl / n (share of points whose cluster's
    *    dominant label is theirs);
    *  - ARI (Hubert & Arabie 1985): pair-counting agreement corrected for
    *    chance — the C(n,2) sums are INTEGER arithmetic (x·(x−1) >> 1), so
    *    every term is exact cross-engine and only the final ratio is a
    *    double;
    *  - NMI: MI(cluster, label)/√(H_c·H_l), every Σ term DECIMAL-cast
    *    before summing (the q134 recipe) so reordering can't drift it.
    *
    * Scale shape: one join + grid aggregate (k×L rows — metric-sized, not
    * data-sized); everything after is arithmetic over 1-row frames.
    * Degenerate guards: a single cluster AND single label ⇒ ARI 1.0 (both
    * partitions trivially agree); zero entropy on either side ⇒ NMI 0.
    * Output (1 row): n, purity, ari, nmi (round 6). */
  def clusterQuality(
      assign: DataFrame,
      reference: DataFrame,
      idCol: String = "vec_id",
      clusterCol: String = "cluster",
      labelCol: String = "label"): DataFrame = {
    val dec = DecimalType(28, 12)
    val grid = assign.select(col(idCol).as("id"), col(clusterCol).as("cl"))
      .join(reference.select(col(idCol).as("id"), col(labelCol).as("lb")), "id")
      .groupBy("cl", "lb").agg(count(lit(1)).as("c"))
      .persist()
    try {
      val n = grid.agg(sum("c")).collect().head.getLong(0)
      require(n > 0, "clusterQuality needs a non-empty assignment∩reference")
      val ma = grid.groupBy("cl").agg(sum("c").as("a"))
      val mb = grid.groupBy("lb").agg(sum("c").as("b"))
      def c2(x: org.apache.spark.sql.Column) = shiftright(x * (x - 1), 1)
      val sidx = grid.agg(sum(c2(col("c"))).as("sidx"))
      val sa = ma.agg(sum(c2(col("a"))).as("sa"))
      val sb = mb.agg(sum(c2(col("b"))).as("sb"))
      val pur = grid.groupBy("cl").agg(max("c").as("mx"))
        .agg(sum("mx").as("pmax"))
      val mi = grid.join(broadcast(ma), "cl").join(broadcast(mb), "lb")
        .select(((col("c").cast(DoubleType) / n) *
          log(lit(n.toDouble) * col("c").cast(DoubleType) /
            (col("a").cast(DoubleType) * col("b").cast(DoubleType))))
          .cast(dec).as("term"))
        .agg(sum("term").cast(DoubleType).as("mi"))
      def entropyOf(m: DataFrame, cnt: String, out: String) = m
        .select(((col(cnt).cast(DoubleType) / n) * log(col(cnt).cast(DoubleType) / n))
          .cast(dec).as("t"))
        .agg((-sum("t").cast(DoubleType)).as(out))
      val hc = entropyOf(ma, "a", "hc")
      val hl = entropyOf(mb, "b", "hl")
      val cn = (n * (n - 1) / 2).toDouble
      val expected = col("sa").cast(DoubleType) * col("sb").cast(DoubleType) / lit(cn)
      val maxterm = (col("sa") + col("sb")).cast(DoubleType) / lit(2.0)
      val result = sidx.crossJoin(sa).crossJoin(sb).crossJoin(pur)
        .crossJoin(mi).crossJoin(hc).crossJoin(hl)
        .select(
          lit(n).as("n"),
          round(col("pmax").cast(DoubleType) / n, 6).as("purity"),
          round(
            when(maxterm === expected, lit(1.0))
              .otherwise((col("sidx").cast(DoubleType) - expected) / (maxterm - expected)),
            6).as("ari"),
          round(
            when(col("hc") * col("hl") > 0, col("mi") / sqrt(col("hc") * col("hl")))
              .otherwise(lit(0.0)),
            6).as("nmi"))
      result.localCheckpoint(true)
    } finally { grid.unpersist(); () }
  }

  /** Prototypicality-based data pruning (Sorscher et al. 2022,
    * arXiv:2206.14486): within each k-means cell, rank points by distance
    * to their centroid and KEEP the far ("hard") ones — in the data-rich
    * regime, easy prototypical examples are the redundant mass and pruning
    * them beats random subsetting; the complement of [[Similarity.semDedup]],
    * which removes pairwise-redundant points regardless of difficulty.
    *
    * The keep rule is integer-exact: row r of a c-point cell (ranked by
    * dist2 desc, id-tie-broken) survives iff (r−1)·100 < c·keepPct — the
    * ceil(keepPct·c) cut computed WITHOUT floating-point, because
    * engine-side decimal-vs-IEEE evaluation of `c * 0.7` genuinely
    * diverges at exact multiples (c=20: 14.0 vs 14.000000000000002).
    *
    * Scale shape: the assignment is [[lloydKMeans]]'s (model-sized driver
    * state, one scan per round); the rank is one window per cell —
    * exactly the partitioned-top-k shape, no global sort.
    * Output: idCol, cluster, dist2, keep. */
  def prototypePrune(
      points: DataFrame,
      k: Int = 4,
      iterations: Int = 2,
      keepPct: Int = 70,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"need keepPct in [0,100], got $keepPct")
    import org.apache.spark.sql.expressions.Window
    val asg = lloydKMeans(points, k, iterations, idCol, vecCol)
    val cell = Window.partitionBy("cluster")
    val rank = Window.partitionBy("cluster").orderBy(desc("dist2"), col(idCol))
    asg
      .withColumn("__rn", row_number().over(rank))
      .withColumn("__c", count(lit(1)).over(cell))
      .select(col(idCol), col("cluster"), col("dist2"),
        ((col("__rn") - 1) * 100 < col("__c") * keepPct).as("keep"))
  }

  /** SIMPLIFIED SILHOUETTE (centroid-based, Hruschka et al.): per point,
    * a = distance to its own centroid, b = distance to the nearest OTHER
    * centroid, s = (b − a)/max(a, b); reported as the per-cluster mean.
    * The internal quality metric that needs no reference labeling —
    * [[clusterQuality]]'s unsupervised sibling, and the k-selection dial
    * (mean s collapsing toward 0 flags over/under-clustering).
    *
    * The full silhouette is an all-pairs O(n²) construction; the
    * centroid form is THE standard scalable variant — one pass against k
    * broadcast centroid literals (same codegen'd projection as
    * [[assignedOf]], keeping the two smallest distances instead of one),
    * then a cluster-sized aggregate. sqrt is IEEE-exact, the ratio is
    * identical-IEEE-ops, and per-point terms are DECIMAL-summed, so the
    * report is bit-stable cross-engine.
    *
    * Output per cluster: cluster, n, mean_silhouette (round 6). */
  def silhouette(
      points: DataFrame,
      k: Int = 4,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2, got $k")
    val dec = DecimalType(28, 12)
    val centroids = lloydCentroids(points, k, iterations, idCol, vecCol)
    // with fewer input points than k, Lloyd seeds fewer centroids; a
    // single centroid would make element_at(sorted, 2) an ANSI
    // INVALID_ARRAY_INDEX at runtime — fail here with the real reason
    require(centroids.length >= 2,
      s"silhouette needs >= 2 seeded centroids (k=$k) but the input yielded " +
        s"${centroids.length} — fewer points than clusters?")
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit): _*)
      struct(
        aggregate(zip_with(col("v"), cLit, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d).as("d2"),
        lit(i).as("cluster"))
    }
    val sorted = array_sort(array(dists: _*))
    ptsOf(points, idCol, vecCol)
      .withColumn("best", element_at(sorted, 1))
      .withColumn("second", element_at(sorted, 2))
      .select(col("best.cluster").as("cluster"),
        sqrt(col("best.d2")).as("a"), sqrt(col("second.d2")).as("b"))
      .withColumn("s",
        when(greatest(col("a"), col("b")) > 0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        round(sum(col("s").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
          .as("mean_silhouette"))
  }
}
