package graft

import org.apache.spark.sql.functions._

import graft.ingest.Normalizer

class NormalizerSpec extends SparkSpec {
  import spark.implicits._

  private def rawDf(lines: Seq[String]) =
    spark.createDataset(lines).toDF("json")

  test("fromJsonLines produces the curated snake_case projection") {
    val out = Normalizer.fromJsonLines(rawDf(Seq(
      Fixtures.rawEventJson("s1", 42, "2026-01-01T15:00:00+00:00", "2026-01-01"))))
    assert(out.columns.toSeq === Seq("session_id", "document_id", "url", "title",
      "doi", "keywords", "clinical_areas", "event_ts", "event_date", "dedup_key"))
    val row = out.collect().head
    assert(row.getAs[String]("session_id") === "s1")
    assert(row.getAs[Int]("document_id") === 42)
    assert(row.getAs[java.sql.Timestamp]("event_ts").toInstant.toString
      === "2026-01-01T15:00:00Z")
  }

  test("rows with null dedup_key are dropped (P5)") {
    val good = Fixtures.rawEventJson("s1", 1, "2026-01-01T15:00:00+00:00", "2026-01-01")
    val bad = good.replace(""","dedup_key":"s1-1-2026-01-01T15:00:00+00:00"}""", "}")
    assert(Normalizer.fromJsonLines(rawDf(Seq(good, bad))).count() === 1)
  }

  test("legacy /Date(ms)/ parses to the right instant (P17)") {
    val out = spark.range(1)
      .select(Normalizer.parseLegacyDate(lit("/Date(1452038902000)/")).as("ts"))
      .collect().head.getTimestamp(0)
    assert(out.toInstant.toEpochMilli === 1452038902000L)
  }

  test("dedupKey is a stable 16-hex-char digest (P16)") {
    val keys = spark.range(2)
      .select(Normalizer.dedupKey(lit("s1"), lit(7), lit("2026-01-01T15:00:00")).as("k"))
      .collect().map(_.getString(0))
    assert(keys(0) === keys(1))
    assert(keys(0).matches("[0-9a-f]{16}"))
  }

  test("dead-letter channel captures unparseable and keyless rows with reasons") {
    val good = Fixtures.rawEventJson("s1", 1, "2026-01-01T15:00:00+00:00", "2026-01-01")
    val keyless = good.replace(""","dedup_key":"s1-1-2026-01-01T15:00:00+00:00"}""", "}")
    val garbage = "this is { not json"
    val (ok, bad) = Normalizer.fromJsonLinesWithDeadLetter(
      rawDf(Seq(good, keyless, garbage)))
    assert(ok.count() === 1)
    val rejects = bad.select("reject_reason").collect().map(_.getString(0)).sorted
    assert(rejects.toSeq === Seq("missing_dedup_key", "unparseable_json"))
    // raw payload preserved for replay/forensics
    assert(bad.filter(col("reject_reason") === "unparseable_json")
      .select("raw").collect().head.getString(0) === garbage)
  }

  test("archiveRawProjection keeps curated fields + kafka + load metadata (B2A)") {
    val json = Fixtures.rawEventJson("s1", 7, "2026-01-01T15:00:00+00:00", "2026-01-01")
    val kafkaFrame = Seq(
      ("s1".getBytes("UTF-8"), json.getBytes("UTF-8"), "tripclick_raw_logs", 0, 42L,
        new java.sql.Timestamp(1767279600000L))
    ).toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val out = Normalizer.archiveRawProjection(kafkaFrame, ingestionType = "batch")
    val row = out.collect().head
    assert(row.getAs[String]("session_id") === "s1")
    assert(row.getAs[String]("kafka_key") === "s1")
    assert(row.getAs[String]("topic") === "tripclick_raw_logs")
    assert(row.getAs[Long]("offset") === 42L)
    assert(row.getAs[String]("ingestion_type") === "batch")
    assert(out.columns.contains("ingested_at"))
    assert(row.getAs[java.sql.Timestamp]("event_ts") !== null)
  }

  test("dedupFirst keeps exactly the first row per key, deterministically") {
    val df = Seq(
      ("k1", "2026-01-01T15:00:00", 1),
      ("k1", "2026-01-01T15:00:01", 2),
      ("k2", "2026-01-01T15:00:02", 3)
    ).toDF("dedup_key", "ts", "payload")
    val out = Normalizer.dedupFirst(df, Seq("dedup_key"), Seq(col("ts"), col("payload")))
      .orderBy("dedup_key").collect()
    assert(out.map(_.getAs[Int]("payload")).toSeq === Seq(1, 3))
  }
}
