package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // amortize JVM/codegen/parquet-reader warmup outside the measured window
    // (region is a 5-row dim table — this warms code paths, not data)
    spark.range(1000000).selectExpr("sum(id)").collect()
    try graft.core.Tables.region(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val n = fn(spark, sfDir).count()
        System.err.println(s"[bench] $name rows=$n")
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // release per-query persisted intermediates outside the timed window
      spark.catalog.clearCache()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
