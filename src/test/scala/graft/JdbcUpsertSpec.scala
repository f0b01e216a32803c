package graft

import java.sql.DriverManager

import graft.sinks.JdbcUpsertSink

class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_upsert;create=true"

  test("upsert: second batch updates matched keys, inserts new ones, idempotent on replay") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE traffic (\"minute_key\" VARCHAR(32) PRIMARY KEY, \"clicks\" INT)")
    conn.close()

    val types = Some("minute_key VARCHAR(32), clicks INT")
    val batch1 = Seq(("m1", 10), ("m2", 20)).toDF("minute_key", "clicks")
    JdbcUpsertSink.upsert(batch1, url, "traffic", Seq("minute_key"),
      JdbcUpsertSink.AnsiMergeDialect, batchId = 1, stagingColumnTypes = types)

    val batch2 = Seq(("m2", 25), ("m3", 5)).toDF("minute_key", "clicks")
    JdbcUpsertSink.upsert(batch2, url, "traffic", Seq("minute_key"),
      JdbcUpsertSink.AnsiMergeDialect, batchId = 2, stagingColumnTypes = types)
    // replay of batch 2 (checkpoint recovery) must be a no-op, not a dup
    JdbcUpsertSink.upsert(batch2, url, "traffic", Seq("minute_key"),
      JdbcUpsertSink.AnsiMergeDialect, batchId = 2, stagingColumnTypes = types)

    val c2 = DriverManager.getConnection(url)
    val rs = c2.createStatement().executeQuery(
      "SELECT \"minute_key\", \"clicks\" FROM traffic ORDER BY \"minute_key\"")
    val rows = Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getString(1), r.getInt(2))).toList
    c2.close()
    assert(rows === List(("m1", 10), ("m2", 25), ("m3", 5)))
  }

  test("postgres dialect renders ON CONFLICT upsert (reference K7 shape)") {
    val sql = JdbcUpsertSink.PostgresDialect.mergeSql(
      "mart_realtime_traffic_minute", "stage_1",
      Seq("event_minute"), Seq("total_clicks", "unique_sessions"))
    assert(sql.contains("ON CONFLICT (\"event_minute\") DO UPDATE SET"))
    assert(sql.contains("\"total_clicks\" = EXCLUDED.\"total_clicks\""))
  }

  test("postgres dialect golden SQL: exact statement text for a representative mart") {
    // The Postgres path cannot execute in this sandbox (no server), so its
    // SQL is pinned verbatim: any change to quoting, clause order, or the
    // EXCLUDED form is a deliberate, reviewed diff — not silent drift.
    // Shape matches the reference's psycopg2 upsert (RT:117-131) with a
    // composite conflict key.
    val sql = JdbcUpsertSink.PostgresDialect.mergeSql(
      "mart_realtime_top_docs", "mart_realtime_top_docs_stage_7",
      Seq("window_start", "document_id"), Seq("clicks", "rank"))
    val expected =
      """INSERT INTO mart_realtime_top_docs ("window_start", "document_id", "clicks", "rank")
        |SELECT "window_start", "document_id", "clicks", "rank" FROM mart_realtime_top_docs_stage_7
        |ON CONFLICT ("window_start", "document_id") DO UPDATE SET "clicks" = EXCLUDED."clicks", "rank" = EXCLUDED."rank"""".stripMargin
    assert(sql === expected)
  }

  test("ansi merge dialect golden SQL: exact statement text") {
    val sql = JdbcUpsertSink.AnsiMergeDialect.mergeSql(
      "traffic", "traffic_stage_2", Seq("minute_key"), Seq("clicks"))
    val expected =
      """MERGE INTO traffic t USING traffic_stage_2 s ON (t."minute_key" = s."minute_key")
        |WHEN MATCHED THEN UPDATE SET t."clicks" = s."clicks"
        |WHEN NOT MATCHED THEN INSERT ("minute_key", "clicks") VALUES (s."minute_key", s."clicks")""".stripMargin
    assert(sql === expected)
  }
}
