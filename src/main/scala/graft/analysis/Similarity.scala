package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, per the standard ANN playbook:
  *  - [[knnBruteForce]]: exact top-k by cosine — broadcast the (small) query
  *    set against the corpus; per-row cost is one fused dot-product
  *    expression, no shuffle until the final per-query top-k. This is the
  *    correctness baseline and is actually optimal when |queries| is small.
  *  - [[knnLsh]]: random-hyperplane sign-LSH (Charikar) — corpus is bucketed
  *    by a bit signature, queries probe only their own bucket. Sub-linear
  *    candidate sets at the cost of recall; the scale path for corpus×corpus.
  *
  * All arithmetic is double-precision built-in expressions (zip_with +
  * aggregate) — codegen'd, no UDF, no Python roundtrip.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a fused expression (floats upcast to double first). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k neighbors for each query vector.
    * Queries are broadcast (they must be small — that is the contract of this
    * path); the corpus scan computes cosine in one projection, then a
    * per-query window keeps k rows. Norms are precomputed on both sides so
    * the inner loop is one dot product, not three. */
  def knnBruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("c_vec"), col("q_vec")) / (col("c_norm") * col("q_norm")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * fixed function of (p, j) via a splitmix64-style mix — engine-portable,
    * no RNG state, reproducible across runs and cluster sizes. */
  private[analysis] def planeComponent(p: Int, j: Int): Double = {
    var z = (p.toLong << 32 | j.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** Sign-LSH bit signature of a vector against `nPlanes` hyperplanes,
    * packed as an int (bit p = sign of ⟨v, plane_p⟩). Planes are materialized
    * as literal arrays so the whole signature is one codegen'd expression. */
  def lshSignature(vec: Column, dim: Int, nPlanes: Int = 12): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = array((0 until dim).map(j => lit(planeComponent(p, j))): _*)
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: bucket corpus and queries by LSH signature, search only
    * within the bucket. Recall < 1 by construction; raise nPlanes for purer
    * buckets (less work, lower recall) or lower it for the opposite. The
    * shuffle is on the bucket key — at 10⁹ vectors each bucket holds
    * ~n/2^planes candidates, so per-query work drops accordingly. */
  def knnLsh(
      corpus: DataFrame,
      queries: DataFrame,
      dim: Int,
      k: Int = 5,
      nPlanes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"),
      lshSignature(col(vecCol), dim, nPlanes).as("bucket"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"),
      lshSignature(col(vecCol), dim, nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("c_vec"), col("q_vec")) / (col("c_norm") * col("q_norm")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 4).as("cosine"))
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nCells` cells; each query probes only its `nProbe`
    * nearest cells. The standard middle ground between brute force and LSH:
    * data-adaptive cells give better recall/cost than random hyperplanes on
    * clustered corpora (this is the Faiss IVF-Flat shape, expressed as a
    * Spark join).
    *
    * Scale shape: training samples a bounded subset to the driver via MLlib
    * KMeans (cheap, one pass); assignment is a broadcast of nCells centroid
    * vectors; the probe join shuffles on cell id only. Deterministic via the
    * fixed seed.
    */
  def knnIvf(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCells: Int = 16,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val spark = corpus.sparkSession
    val asVec = corpus.select(
      col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setFeaturesCol("features")
      .fit(asVec)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centroidDf = spark.createDataFrame(centroids.toSeq).toDF("cell", "centroid")

    // cell assignment for the corpus (nearest centroid, argmin by L2)
    def nearestCells(df: DataFrame, n: Int): DataFrame = {
      val joined = df.crossJoin(broadcast(centroidDf))
        .withColumn("d2", aggregate(
          zip_with(col(vecCol), col("centroid"), (x, y) =>
            (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
          lit(0.0), (acc, v) => acc + v))
      val w = Window.partitionBy(idCol).orderBy(col("d2"), col("cell"))
      joined.withColumn("__r", row_number().over(w)).filter(col("__r") <= n)
        .drop("__r", "d2", "centroid", "features")
    }

    val corpusCells = nearestCells(asVec, 1)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("cell"))
      .withColumn("c_norm", l2Norm(col("c_vec")))
    val queryCells = nearestCells(
        queries.select(col(idCol), col(vecCol),
          array_to_vector(col(vecCol).cast("array<double>")).as("features")), nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("cell"))
      .withColumn("q_norm", l2Norm(col("q_vec")))

    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("c_vec"), col("q_vec")) / (col("c_norm") * col("q_norm")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs: corpus×corpus through LSH
    * buckets (no broadcast side — both sides shuffle on the bucket key).
    * Exactly the MinHash-LSH shape with cosine instead of Jaccard. */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      dim: Int,
      minCosine: Double = 0.95,
      nPlanes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      l2Norm(col(vecCol)).as("norm"),
      lshSignature(col(vecCol), dim, nPlanes).as("bucket"))
    c.as("x").join(c.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cosine",
        dot(col("x.vec"), col("y.vec")) / (col("x.norm") * col("y.norm")))
      .filter(col("cosine") >= minCosine)
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        round(col("cosine"), 4).as("cosine"))
  }
}
