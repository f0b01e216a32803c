package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan of named registry
  * queries (comma-separated substrings in args(0)) against a testdata dir
  * (args(1), default sf0.001). The per-round plan-audit notes in PLANS.md
  * are read off this output — broadcast vs shuffle joins, pushed filters,
  * pruned read schemas, WholeStageCodegen spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("").split(",").toSeq.filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.exists(n.contains) }
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
