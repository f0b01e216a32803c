package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC serving-layer sinks
  * (reference: load_to_postgres.py:46-64 full overwrite,
  * streaming_to_analytics_mart_realtime.py:158-180 append,
  * RT:78-155 the psycopg2 staging upsert — the one sink Spark has no
  * built-in for, SURVEY.md §2.2 K7).
  *
  * Upsert strategy, kept from the reference because it is the right shape at
  * scale: executors bulk-load a staging table over plain JDBC (parallel,
  * batched), then the driver runs ONE set-based merge statement
  * server-side — no per-row driver round-trips, and the merge is atomic so
  * micro-batch replays are idempotent on the key columns.
  *
  * The merge SQL is dialect-specific: `INSERT … ON CONFLICT DO UPDATE`
  * (PostgreSQL, the reference's serving store) or standard `MERGE` (Derby —
  * used by the test suite since it ships with Spark; also valid for most
  * ANSI engines).
  */
object JdbcUpsertSink {

  sealed trait Dialect {
    def mergeSql(table: String, staging: String, keyCols: Seq[String], valCols: Seq[String]): String
    /** Spark's JDBC writer quotes column identifiers when it creates the
      * staging table, so the merge must quote them identically or a
      * case-folding engine (Derby uppercases unquoted names) won't resolve
      * them. Target tables must therefore use lowercase column names —
      * which is also the PostgreSQL convention the reference relies on. */
    protected def q(c: String): String = "\"" + c + "\""
  }

  /** PostgreSQL `ON CONFLICT` upsert (reference parity: RT:117-131). */
  case object PostgresDialect extends Dialect {
    def mergeSql(table: String, staging: String, keyCols: Seq[String], valCols: Seq[String]): String = {
      val cols = (keyCols ++ valCols).map(q)
      val sets = valCols.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |SELECT ${cols.mkString(", ")} FROM $staging
         |ON CONFLICT (${keyCols.map(q).mkString(", ")}) DO UPDATE SET $sets""".stripMargin
    }
  }

  /** ANSI MERGE upsert (Derby, and most non-Postgres engines). */
  case object AnsiMergeDialect extends Dialect {
    def mergeSql(table: String, staging: String, keyCols: Seq[String], valCols: Seq[String]): String = {
      val on = keyCols.map(c => s"t.${q(c)} = s.${q(c)}").mkString(" AND ")
      val sets = valCols.map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")
      val insertCols = (keyCols ++ valCols).map(q).mkString(", ")
      val insertVals = (keyCols ++ valCols).map(c => s"s.${q(c)}").mkString(", ")
      s"""MERGE INTO $table t USING $staging s ON ($on)
         |WHEN MATCHED THEN UPDATE SET $sets
         |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
    }
  }

  /** Stage `df` to a temp table via Spark's parallel JDBC writer, then run
    * one server-side merge into `table` on `keyCols`, then drop the staging
    * table. `batchId` makes the staging name deterministic per micro-batch
    * (replay-safe, unlike the reference's wall-clock suffix at RT:97). */
  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      dialect: Dialect,
      batchId: Long = 0L,
      connectionProperties: java.util.Properties = new java.util.Properties(),
      stagingColumnTypes: Option[String] = None): Unit = {
    val staging = s"${table}_stage_$batchId"
    val valCols = df.columns.filterNot(keyCols.contains).toSeq

    val writer = df.write.mode(SaveMode.Overwrite)
    // Spark maps StringType to engine LOB types on some dialects (Derby:
    // CLOB), which are not comparable in a merge ON clause — let callers pin
    // the staging DDL to the target table's types.
    stagingColumnTypes.foreach(t => writer.option("createTableColumnTypes", t))
    writer.jdbc(url, staging, connectionProperties)

    val conn: Connection = DriverManager.getConnection(url, connectionProperties)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(dialect.mergeSql(table, staging, keyCols, valCols))
        st.executeUpdate(s"DROP TABLE $staging")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  /** Plain full-refresh JDBC write (reference: load_to_postgres.py:46-64). */
  def overwrite(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** Insert-only append (hot snapshot/anomaly marts, RT:158-180). */
  def append(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
}
