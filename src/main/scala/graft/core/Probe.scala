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

    // End-to-end pipeline drive: fixture jsonl → archive → curated → marts,
    // then the streaming curated job over the same fixture.
    val in = java.nio.file.Files.createTempDirectory("probe_in").toString
    val root = java.nio.file.Files.createTempDirectory("probe_root").toString
    val mk = (s: String, d: Int, t: String, day: String, k: String) =>
      s"""{"DateCreated":"/Date(1452038902000)/","SessionId":"$s","DocumentId":$d,""" +
        s""""Url":"u","Title":"t","DOI":"x","Keywords":"k","ClinicalAreas":",Onco,Surg",""" +
        s""""Documents":[],"event_ts":"$t","event_date":"$day","dedup_key":"$k"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "events.json"),
      Seq(
        mk("s1", 1, "2026-01-01T15:00:00+00:00", "2026-01-01", "k1"),
        mk("s1", 1, "2026-01-01T15:00:00+00:00", "2026-01-01", "k1"),
        mk("s2", 2, "2026-01-01T15:05:00+00:00", "2026-01-01", "k2")
      ).mkString("\n").getBytes("UTF-8"))
    val counts = graft.pipeline.DailyPipeline.run(spark, in, root)
    println("pipeline counts=" + counts.toSeq.sorted.mkString(", "))

    val ck = java.nio.file.Files.createTempDirectory("probe_ck").toString
    val src = graft.streaming.CuratedStreamJob.jsonlSource(spark, in, 1)
    val cur = graft.streaming.CuratedStreamJob.curate(src, rawIsKafka = false)
    val q = graft.streaming.CuratedStreamJob.start(cur, root + "/stream_curated", ck,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    println("stream curated rows=" + spark.read.parquet(root + "/stream_curated").count())
    spark.stop()
  }
}
