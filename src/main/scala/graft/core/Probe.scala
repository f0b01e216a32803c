package graft.core

import org.apache.spark.sql.SparkSession

/** One-off sanity probe for local iteration (not part of the library API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, truncate = false)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.printSchema()
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.printSchema()
    println("events rows=" + ev.count())
    val flagship = graft.SparkEntry.entry(spark)
    flagship.show(5, truncate = false)
    println("entry rows=" + flagship.count())
    spark.stop()
  }
}
