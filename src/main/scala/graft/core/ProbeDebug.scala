package graft.core

import org.apache.spark.sql.functions._

import graft.analysis.{Dedup, TextAnalysis}

/** Temporary stage-bisection probe for minhash perf. */
object ProbeDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm up the JVM / codegen with an unrelated job
    spark.range(1000000).selectExpr("sum(id)").collect()

    val par = spark.sparkContext.defaultParallelism
    // shape A (current code): repartition -> project -> persist -> count
    val docsA = graft.adapters.TestData.documents(spark, "/root/testdata/sf0.1")
    val a = docsA.repartition(par)
      .select(col("doc_id").as("id"), Dedup.shingleSet(col("text"), 3).as("sh")).persist()
    time("A_project_then_persist")(a.count())
    a.unpersist()
    // shape B: repartition -> persist raw -> project
    val docsB = graft.adapters.TestData.documents(spark, "/root/testdata/sf0.1")
      .repartition(par).persist()
    docsB.count()
    time("B_persist_then_project")(
      docsB.select(col("doc_id").as("id"), Dedup.shingleSet(col("text"), 3).as("sh")).count())
    spark.stop()
  }
}
