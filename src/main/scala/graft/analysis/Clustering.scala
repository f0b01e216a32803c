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
  private def assignedOf(pts: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
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

  private def ptsOf(points: DataFrame, idCol: String, vecCol: String): DataFrame =
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
}
