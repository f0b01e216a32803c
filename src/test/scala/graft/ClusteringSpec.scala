package graft

import graft.analysis.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("lloyd k-means separates well-separated clusters regardless of init") {
    // two tight blobs far apart; seeds (lowest ids) both start in blob A,
    // yet one centroid must migrate to blob B within 2 iterations
    val blobA = (0L to 9L).map(i => (i, Array(0.0f + i * 0.01f, 0.0f)))
    val blobB = (10L to 19L).map(i => (i, Array(100.0f + i * 0.01f, 50.0f)))
    val pts = (blobA ++ blobB).toDF("vec_id", "embedding")
    val out = Clustering.lloydKMeans(pts, k = 2, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val aClusters = (0L to 9L).map(out).toSet
    val bClusters = (10L to 19L).map(out).toSet
    assert(aClusters.size === 1 && bClusters.size === 1)
    assert(aClusters != bClusters)
  }

  test("deterministic across runs and tie-broken by cluster id") {
    val pts = (0L to 7L).map(i => (i, Array((i % 4).toFloat, (i / 4).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Clustering.lloydKMeans(pts, k = 3, iterations = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    val b = Clustering.lloydKMeans(pts, k = 3, iterations = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_._3 >= 0.0))
    assert(a.map(_._2).distinct.length <= 3) // at most k clusters used
  }
}
