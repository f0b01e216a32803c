package graft

import graft.pipeline.DailyPipeline
import graft.sinks.Compactor

class PipelineSpec extends SparkSpec {

  test("daily pipeline: raw jsonl → archive → curated (deduped) → 4 marts") {
    val inDir = tmpDir("pipe_in")
    val root = tmpDir("pipe_root")
    val lines = Seq(
      Fixtures.rawEventJson("s1", 1, "2026-01-01T15:00:00+00:00", "2026-01-01", dedupKey = "k1"),
      Fixtures.rawEventJson("s1", 1, "2026-01-01T15:00:00+00:00", "2026-01-01", dedupKey = "k1"), // dup
      Fixtures.rawEventJson("s1", 2, "2026-01-01T15:05:00+00:00", "2026-01-01", dedupKey = "k2"),
      Fixtures.rawEventJson("s2", 3, "2026-01-02T10:00:00+00:00", "2026-01-02", dedupKey = "k3"))
    Fixtures.writeJsonl(inDir, "events.json", lines)

    val counts = DailyPipeline.run(spark, inDir, root)
    assert(counts("archive_raw") === 4)   // archive keeps duplicates
    assert(counts("curated") === 3)       // dedup_key k1 collapsed
    assert(counts("mart_session_analysis") === 2)  // (s1,d1), (s2,d2)
    assert(counts("mart_daily_traffic") === 2)     // 2 days
    assert(counts("mart_popular_documents") === 3) // 3 distinct (day,doc)
    assert(counts("mart_clinical_areas") > 0)
  }

  test("compactor rewrites a layer in place (K4)") {
    val root = tmpDir("compact")
    val layer = root + "/layer"
    spark.range(1000).toDF("id").repartition(8).write.parquet(layer)
    val before = new java.io.File(layer).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before > 1)
    Compactor.compact(spark, layer, targetFiles = 1)
    val after = new java.io.File(layer).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after === 1)
    assert(spark.read.parquet(layer).count() === 1000)
  }

  test("compactor preserves a partitioned layout (K4 on curated-style layers)") {
    import spark.implicits._
    val root = tmpDir("compact_part")
    val layer = root + "/layer"
    Seq((1, "2026-01-01"), (2, "2026-01-01"), (3, "2026-01-02"))
      .toDF("id", "event_date")
      .repartition(4)
      .write.partitionBy("event_date").parquet(layer)
    Compactor.compact(spark, layer, targetFiles = 1, partitionCols = Seq("event_date"))
    val dirs = new java.io.File(layer).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("event_date=2026-01-01", "event_date=2026-01-02"))
    val back = spark.read.parquet(layer)
    assert(back.count() === 3)
    assert(back.columns.contains("event_date"))
  }
}
