package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main for the optimization rounds: time the capstone pipeline
  * STAGE BY STAGE (guide §1 — measure first, noop-sink the computation) so
  * per-stage cost is attributable before any change. Mirrors
  * [[graft.analysis.CorpusPrep.pretrainStages]]' dataflow through public
  * API calls; stages that the pipeline materializes (localCheckpoint) are
  * timed as materializations, projections are timed through the noop sink.
  *
  * Usage: StageProfile [sfDir] [reps]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analysis._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      spark.sparkContext.setJobDescription("capstone stage profile")
      val docs = graft.adapters.TestData.documents(spark, sfDir)
      time("docs count")(docs.count())
      val stats = time("textStats -> checkpoint") {
        TextAnalysis.textStats(docs)
          .select(col("doc_id"), col("quality_score"),
            floor(col("quality_score") * 100 + 0.5).cast("long").as("quality_centi"))
          .localCheckpoint(true)
      }
      val scored = stats.select(col("doc_id"), col("quality_centi"))
      val qualityPass = docs.join(
        stats.filter(col("quality_score") >= 35.0).select("doc_id"), Seq("doc_id"))
      time("qualityPass noop")(noop(qualityPass))
      val exact = time("dedupExact -> checkpoint") {
        Dedup.dedupExact(qualityPass).localCheckpoint(true)
      }
      val pairs = time("minhashNearDupPairs(exact)") {
        Dedup.minhashNearDupPairs(exact)
      }
      val keepers = time("dedupClustersKeepBest mat") {
        Dedup.dedupClustersKeepBest(pairs,
            scored.join(exact.select("doc_id"), Seq("doc_id")))
          .filter(col("is_keeper")).select("doc_id")
          .localCheckpoint(true)
      }
      val trainCand = time("trainCand -> checkpoint") {
        exact.join(keepers, Seq("doc_id"))
          .filter(col("doc_id") % 17 =!= 0).localCheckpoint(true)
      }
      val contaminated = time("winnowingDecontam mat") {
        Dedup.winnowingDecontam(trainCand, docs.filter(col("doc_id") % 17 === 0))
          .select("doc_id").localCheckpoint(true)
      }
      val clean = time("clean -> checkpoint") {
        trainCand.join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint(true)
      }
      val kept = time("temperatureKeep mat") {
        CorpusPrep.temperatureKeep(clean).localCheckpoint(true)
      }
      time("sequencePack noop")(noop(CorpusPrep.sequencePack(kept, 256)))
      // ---- artifact-layer side (q290/q292 cost centers) ----
      spark.sparkContext.setJobDescription("artifact layer profile")
      val half = docs.agg(max("doc_id")).head.getLong(0) / 2
      val arts = time("pretrainArtifacts(half)") {
        CorpusPrep.pretrainArtifacts(docs.filter(col("doc_id") <= half))
      }
      val root = sys.props("java.io.tmpdir") + "/graft_profile_layer"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      time("writeArtifacts v0")(CorpusPrep.writeArtifacts(arts, root, 0L))
      val back = time("readArtifacts") {
        CorpusPrep.readArtifacts(spark, root, 1L)
      }
      time("increment from read-back noop") {
        noop(CorpusPrep.pretrainPipelineIncrement(back, docs.filter(col("doc_id") > half)))
      }
      // ---- the increment's internals, mirrored stage by stage ----
      spark.sparkContext.setJobDescription("increment stage profile")
      locally {
        val a = CorpusPrep.readArtifacts(spark, root, 1L)
        val newDocs = docs.filter(col("doc_id") > half)
        time("inc: monotonic guard") {
          val bound = a.scored.agg(max(col("doc_id")).as("mx"))
            .crossJoin(newDocs.agg(min(col("doc_id")).as("mn")))
            .filter(col("mx").isNotNull && col("mn").isNotNull && col("mx") >= col("mn"))
          require(bound.isEmpty)
        }
        val stats = time("inc: textStats(batch) ckpt") {
          TextAnalysis.textStats(newDocs)
            .select(col("doc_id"), col("quality_score"),
              floor(col("quality_score") * 100 + 0.5).cast("long").as("quality_centi"))
            .localCheckpoint(true)
        }
        val newScored = stats.select(col("doc_id"), col("quality_centi"))
        val newQuality = newDocs.join(
          stats.filter(col("quality_score") >= 35.0).select("doc_id"), Seq("doc_id"))
        val newExact = time("inc: newExact ckpt") {
          Dedup.dedupExact(newQuality)
            .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
            .join(a.fingerprints.withColumnRenamed("fingerprint", "__fp"),
              Seq("__fp"), "left_anti")
            .drop("__fp")
            .localCheckpoint(true)
        }
        val newSketch = time("inc: sketchDocs(newExact) ckpt") {
          Dedup.sketchDocs(newExact).localCheckpoint(true)
        }
        val crossPairs = time("inc: crossPairs (ckpt inside)") {
          Dedup.crossNearDupPairsFromSketches(newSketch, a.sketch)
            .select(col("existing_id").as("doc_a"), col("new_id").as("doc_b"))
        }
        val newPairs = time("inc: newPairs from sketch mat") {
          Dedup.nearDupPairsFromSketch(newSketch)
            .select("doc_a", "doc_b").unionByName(crossPairs).localCheckpoint(true)
        }
        val pairs = a.pairs.unionByName(newPairs)
        val exactAll = a.exactDocs.unionByName(newExact)
        val newScoredExact = newScored.join(newExact.select("doc_id"), Seq("doc_id"))
        val scoredAll = a.scored.unionByName(newScoredExact)
        val ccOnly = time("inc: CC alone mat") {
          Dedup.connectedComponents(pairs, scoredAll.select("doc_id"),
            srcCol = "doc_a", dstCol = "doc_b", idCol = "doc_id")
            .localCheckpoint(true)
        }
        ccOnly.unpersist()
        val keepers = time("inc: keepBest (CC) mat") {
          Dedup.dedupClustersKeepBest(pairs, scoredAll)
            .filter(col("is_keeper")).select("doc_id").localCheckpoint(true)
        }
        val trainCand = time("inc: trainCand ckpt") {
          exactAll.join(keepers, Seq("doc_id"))
            .filter(col("doc_id") % 17 =!= 0).localCheckpoint(true)
        }
        val newWinnowFps = time("inc: winnowFps(batch) mat") {
          Dedup.winnowingFingerprints(newExact).localCheckpoint(true)
        }
        val trainFps = a.winnowFps.unionByName(newWinnowFps)
          .join(trainCand.select("doc_id"), Seq("doc_id"))
        val newEvalFps = Dedup.winnowingFingerprints(
          newDocs.filter(col("doc_id") % 17 === 0))
        val evalFps = a.evalFps.unionByName(newEvalFps)
        val contaminated = time("inc: decontamFromFps mat") {
          Dedup.winnowingDecontamFromFingerprints(trainFps, evalFps)
            .select("doc_id").localCheckpoint(true)
        }
        val clean = time("inc: clean ckpt") {
          trainCand.join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint(true)
        }
        time("inc: pack(keep(clean)) noop") {
          noop(CorpusPrep.sequencePack(CorpusPrep.temperatureKeep(clean), 256))
        }
      }
      time("compactArtifacts")(CorpusPrep.compactArtifacts(spark, root, 0L))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
