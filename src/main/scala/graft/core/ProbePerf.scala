package graft.core

import org.apache.spark.sql.SparkSession

/** One-off perf probe: run selected SparkEntry queries with timing +
  * formatted explain. Usage: runMain graft.core.ProbePerf <sfDir> <q>... */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.local(32)
    names.foreach { n =>
      // construction timed separately: iterative queries (CC, pagerank,
      // sketch pipelines) run embedded actions while BUILDING the frame,
      // so "build" often carries the real cost, not the final count
      val tB = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val build = (System.nanoTime() - tB) / 1e9
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[perf] $n rows=$c build=$build%.2f s count=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache() // same per-query hygiene as Bench/Verify
    }
    spark.stop()
  }
}
