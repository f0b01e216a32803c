package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing harness: `runMain graft.Audit q58_fuzzy_match ...`
  * runs each named query min-of-3 at SPARK_GRAFT_SF_DIR — the local feedback
  * loop for plan work without a full Bench pass. Session sizing reads the
  * SAME env vars as [[Bench]] (SPARK_GRAFT_CPUS, default 32 to match the
  * driver's bench invocation) so Audit numbers diagnose Bench numbers —
  * a different core/shuffle-partition count would change the plans. */
object Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      var best = Double.MaxValue
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"[audit] $name rows=$n t=$dt%.3f")
        spark.catalog.clearCache()
      }
      println(f"[audit] $name MIN=$best%.3f")
    }
    spark.stop()
  }
}
