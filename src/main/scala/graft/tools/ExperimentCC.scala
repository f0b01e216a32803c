package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round experiment: phase-level timing of
  * [[graft.analysis.Dedup.connectedComponents]] (body mirrored) on the
  * capstone's pair/node frames, to attribute its ~1.7 s at sf0.1 between
  * sym setup, per-round iteration, and the final corpus join. */
object ExperimentCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analysis._

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc-exp] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.adapters.TestData.documents(spark, sfDir)
    val scored = TextAnalysis.textStats(docs)
      .select(col("doc_id"),
        floor(col("quality_score") * 100 + 0.5).cast("long").as("quality_centi"))
      .localCheckpoint(true)
    val pairs = Dedup.minhashNearDupPairs(docs) // localCheckpointed inside
    println(s"pairs=${pairs.count()} docs=${scored.count()}")

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      val edges = pairs
      val nodes = scored.select(col("doc_id"))
      val idCol = "doc_id"
      val nodeIds = nodes.select(col(idCol).as("__nid"))
      val sym = time("sym build+count") {
        val s = edges
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
          .union(edges.select(col("doc_b").as("a"), col("doc_a").as("b")))
          .distinct()
          .join(nodeIds.withColumnRenamed("__nid", "a"), Seq("a"), "left_semi")
          .join(nodeIds.withColumnRenamed("__nid", "b"), Seq("b"), "left_semi")
          .persist()
        s.count()
        s
      }
      var labels = time("labels init ckpt") {
        sym.select(col("a").as("id")).distinct()
          .select(col("id"), col("id").as("label"))
          .localCheckpoint(true)
      }
      var round = 0
      var changed = 1L
      while (changed > 0 && round < 20) {
        val next = time(s"round ${round + 1} ckpt") {
          val nbrMin = sym.join(labels, col("b") === col("id"))
            .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
          val stepped = labels.as("l")
            .join(nbrMin.as("m"), col("l.id") === col("m.a"), "left")
            .select(col("l.id").as("id"),
              least(col("l.label"), coalesce(col("m.nbr_label"), col("l.label"))).as("label"),
              col("l.label").as("__old"))
          stepped.as("x")
            .join(stepped.select(col("id").as("lid"), col("label").as("llabel")).as("y"),
              col("x.label") === col("y.lid"), "left")
            .select(col("x.id").as("id"),
              coalesce(col("y.llabel"), col("x.label")).as("label"),
              col("x.__old").as("__old"))
            .localCheckpoint(true)
        }
        changed = time(s"round ${round + 1} count") {
          next.filter(col("label") =!= col("__old")).count()
        }
        labels = next.drop("__old")
        round += 1
      }
      sym.unpersist()
      val result = time("final nodes join mat") {
        nodes.select(col(idCol).as("id"))
          .join(labels, Seq("id"), "left")
          .select(col("id"), coalesce(col("label"), col("id")).as("component"))
          .localCheckpoint(true)
      }
      time("keepBest tail mat") {
        val cc = result
          .select(col("id").as(idCol), col("component").as("cluster_id"))
          .join(scored, idCol)
        val best = cc.groupBy("cluster_id")
          .agg(min(struct((-col("quality_centi")).as("ns"), col(idCol).as("bid"))).as("b"))
          .select(col("cluster_id"), col("b.bid").as("keeper_id"))
        cc.join(best, "cluster_id")
          .select(col(idCol), col("cluster_id"), col("quality_centi"),
            (col(idCol) === col("keeper_id")).as("is_keeper"))
          .orderBy(idCol)
          .localCheckpoint(true)
      }
      spark.catalog.clearCache()
    }

    // ===== V2: no endpoint semi-joins (caller-guaranteed), broadcast-gated
    // loop + final join, keepBest tail with zero pre-sort corpus shuffles
    (1 to reps).foreach { rep =>
      println(s"=== V2 rep $rep ===")
      val edges = pairs
      val idCol = "doc_id"
      val sym = time("v2 sym build+count") {
        val s = edges
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
          .union(edges.select(col("doc_b").as("a"), col("doc_a").as("b")))
          .distinct()
          .persist()
        s.count()
        s
      }
      val symCount = sym.count()
      val small = symCount <= 1000000L
      def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
      var labels = time("v2 labels init ckpt") {
        sym.select(col("a").as("id")).distinct()
          .select(col("id"), col("id").as("label"))
          .localCheckpoint(true)
      }
      var round = 0
      var changed = 1L
      while (changed > 0 && round < 20) {
        val next = time(s"v2 round ${round + 1} ckpt") {
          val nbrMin = sym.join(bc(labels), col("b") === col("id"))
            .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
          val stepped = labels.as("l")
            .join(bc(nbrMin).as("m"), col("l.id") === col("m.a"), "left")
            .select(col("l.id").as("id"),
              least(col("l.label"), coalesce(col("m.nbr_label"), col("l.label"))).as("label"),
              col("l.label").as("__old"))
          stepped.as("x")
            .join(bc(stepped.select(col("id").as("lid"), col("label").as("llabel"))).as("y"),
              col("x.label") === col("y.lid"), "left")
            .select(col("x.id").as("id"),
              coalesce(col("y.llabel"), col("x.label")).as("label"),
              col("x.__old").as("__old"))
            .localCheckpoint(true)
        }
        changed = time(s"v2 round ${round + 1} count") {
          next.filter(col("label") =!= col("__old")).count()
        }
        labels = next.drop("__old")
        round += 1
      }
      sym.unpersist()
      time("v2 keepBest direct mat") {
        // clustered docs only: tiny frame (labels ⋈ scored by broadcast)
        val clustered = scored.join(bc(labels.withColumnRenamed("id", idCol)), idCol)
        val best = clustered.groupBy("label")
          .agg(min(struct((-col("quality_centi")).as("ns"), col(idCol).as("bid"))).as("b"))
          .select(col("label"), col("b.bid").as("keeper_id"))
        val lk = labels.withColumnRenamed("id", idCol)
          .join(bc(best), "label")
        scored
          .join(bc(lk), Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("label"), col(idCol)).as("cluster_id"),
            col("quality_centi"),
            coalesce(col(idCol) === col("keeper_id"), lit(true)).as("is_keeper"))
          .orderBy(idCol)
          .localCheckpoint(true)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
