package graft.core

import org.apache.spark.sql.SparkSession

/** One-off perf probe: run selected SparkEntry queries with timing +
  * formatted explain. Usage: runMain graft.core.ProbePerf <sfDir> <q>...
  *
  * GRAFT_FORCE=1 times `queryExecution.toRdd.count()` instead of
  * `df.count()`: a plain count lets the optimizer rewrite the plan under
  * a count aggregate — Spark's distinct-key propagation ELIMINATES a
  * left-joined aggregate entirely (measured on q166: 0.2 s counted vs
  * ~tens of seconds materialized at 10×), so count-based numbers for
  * "score joined back to the full table" shapes measure the join
  * elimination, not the operator. toRdd evaluates the query's own plan
  * with every output column materialized. */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.local(32)
    val force = sys.env.contains("GRAFT_FORCE")
    names.foreach { n =>
      // construction timed separately: iterative queries (CC, pagerank,
      // sketch pipelines) run embedded actions while BUILDING the frame,
      // so "build" often carries the real cost, not the final count
      val tB = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val build = (System.nanoTime() - tB) / 1e9
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
      val t0 = System.nanoTime()
      val c = if (force) df.queryExecution.toRdd.count() else df.count()
      val label = if (force) "forced" else "count"
      println(f"[perf] $n rows=$c build=$build%.2f s $label=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache() // same per-query hygiene as Bench/Verify
    }
    spark.stop()
  }
}
