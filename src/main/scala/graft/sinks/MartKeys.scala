package graft.sinks

/** Serving-mart key contract: primary-key and value columns per mart
  * table, mirroring the reference serving schema
  * (reference: mart/postgres/init/01_create_tables.sql:9-142 — each
  * PRIMARY KEY clause below is that file's, line-cited per entry).
  *
  * This is the single source of truth the upsert path must agree with:
  * `JdbcUpsertSinkSqlSpec` generates [[JdbcUpsertSink.PostgresDialect]]
  * merge SQL for every entry and asserts the ON CONFLICT target is exactly
  * the declared PK — the proof that the Postgres dialect (which only Derby
  * can't execute in this sandbox) conflicts on the right columns for every
  * mart the reference serves.
  */
object MartKeys {

  final case class MartKey(table: String, keyCols: Seq[String], valCols: Seq[String])

  /** All 8 reference marts (4 hot + 4 cold). */
  val all: Seq[MartKey] = Seq(
    // 01_create_tables.sql:9-16 PRIMARY KEY (event_minute)
    MartKey("mart_realtime_traffic_minute",
      Seq("event_minute"),
      Seq("total_clicks", "unique_sessions", "unique_docs", "updated_at")),
    // 01_create_tables.sql:26-34 PRIMARY KEY (snapshot_ts, rank)
    MartKey("mart_realtime_top_docs_1h",
      Seq("snapshot_ts", "rank"),
      Seq("document_id", "title", "click_count", "unique_sessions")),
    // 01_create_tables.sql:41-48 PRIMARY KEY (snapshot_ts, clinical_area)
    MartKey("mart_realtime_clinical_trend_24h",
      Seq("snapshot_ts", "clinical_area"),
      Seq("click_count", "unique_sessions", "trend_pct")),
    // 01_create_tables.sql:54-62 PRIMARY KEY (detected_ts, session_id)
    MartKey("mart_realtime_anomaly_sessions",
      Seq("detected_ts", "session_id"),
      Seq("window_start", "window_end", "click_count", "severity")),
    // 01_create_tables.sql:84-93 PRIMARY KEY (session_id, event_date)
    MartKey("mart_session_analysis",
      Seq("session_id", "event_date"),
      Seq("click_count", "unique_docs", "first_click_ts", "last_click_ts",
        "session_duration_sec")),
    // 01_create_tables.sql:104-111 event_date DATE PRIMARY KEY
    MartKey("mart_daily_traffic",
      Seq("event_date"),
      Seq("total_events", "unique_sessions", "unique_documents", "peak_hour")),
    // 01_create_tables.sql:122-128 PRIMARY KEY (event_date, clinical_area)
    MartKey("mart_clinical_areas",
      Seq("event_date", "clinical_area"),
      Seq("search_count", "unique_sessions")),
    // 01_create_tables.sql:134-141 PRIMARY KEY (event_date, document_id)
    MartKey("mart_popular_documents",
      Seq("event_date", "document_id"),
      Seq("title", "view_count", "unique_sessions")))
}
