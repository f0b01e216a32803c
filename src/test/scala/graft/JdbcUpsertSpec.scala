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
}
