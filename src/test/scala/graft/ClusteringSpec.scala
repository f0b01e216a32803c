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

  test("cluster quality: perfect match maxes metrics, independence zeroes NMI, degenerate guards hold") {
    val ref = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("vec_id", "label")
    // same partition under renamed cluster ids -> all three metrics = 1
    val perfect = Seq((1L, 5), (2L, 5), (3L, 9), (4L, 9)).toDF("vec_id", "cluster")
    val o1 = Clustering.clusterQuality(perfect, ref).collect().head
    assert(o1.getLong(0) === 4L)
    assert((o1.getDouble(1), o1.getDouble(2), o1.getDouble(3)) === ((1.0, 1.0, 1.0)))
    // balanced independent grid: MI exactly 0, ARI at its chance-corrected
    // negative value (hand-computed -0.5 for this 2x2 case)
    val indep = Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1)).toDF("vec_id", "cluster")
    val o2 = Clustering.clusterQuality(indep, ref).collect().head
    assert(o2.getDouble(3) === 0.0)
    assert(o2.getDouble(2) === -0.5)
    // one cluster over two labels: zero entropy side -> NMI 0, ARI 0 here
    val single = Seq((1L, 7), (2L, 7), (3L, 7), (4L, 7)).toDF("vec_id", "cluster")
    val o3 = Clustering.clusterQuality(single, ref).collect().head
    assert((o3.getDouble(1), o3.getDouble(2), o3.getDouble(3)) === ((0.5, 0.0, 0.0)))
    // one cluster AND one label: both partitions trivially agree -> ARI 1
    val oneLab = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0)).toDF("vec_id", "label")
    val o4 = Clustering.clusterQuality(single, oneLab).collect().head
    assert((o4.getDouble(1), o4.getDouble(2), o4.getDouble(3)) === ((1.0, 1.0, 0.0)))
  }

  test("prototype prune: far-from-centroid points survive, per-cell integer cut, tiny cells keep") {
    // seeds 0,1 split the plane; cell0={0,2,3,4} (4 at the fringe), cell1={1}
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.0f)),
      (3L, Array(0.8f, 0.0f)),
      (4L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.prototypePrune(pts, k = 2, iterations = 1, keepPct = 50)
      .orderBy("vec_id").collect()
    val keep = out.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("vec_id")).toSet
    // cell0 centroid [0.8, 0.125]: dist2 desc = 4, 0, 2, 3 -> 50% keeps {4, 0};
    // the singleton cell keeps its only point at any positive pct
    assert(keep === Set(4L, 0L, 1L))
    val all = Clustering.prototypePrune(pts, k = 2, iterations = 1, keepPct = 100)
      .collect()
    assert(all.forall(_.getAs[Boolean]("keep")))
  }

  test("silhouette: well-separated blobs score near 1, hand-checked cluster means") {
    // ids 1,2 seed the two cells; one Lloyd round pulls centroids to
    // [0, 0.5] and [10, 10.5]
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(10.0f, 10.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(10.0f, 11.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.silhouette(pts, k = 2, iterations = 1)
      .orderBy("cluster").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(0, 1))
    assert(out(0)._1 === 2L && out(1)._1 === 2L)
    assert(out.values.forall(_._2 > 0.9), s"separated blobs must score high: $out")
  }

  test("silhouette: coincident points with coincident centroids score 0, k>=2 enforced") {
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // both centroids sit at the origin -> a = b = 0 -> s defined as 0
    val out = Clustering.silhouette(pts, k = 2, iterations = 1).collect()
    assert(out.map(_.getDouble(2)).forall(_ === 0.0))
    assertThrows[IllegalArgumentException] {
      Clustering.silhouette(pts, k = 1, iterations = 1)
    }
  }
}
