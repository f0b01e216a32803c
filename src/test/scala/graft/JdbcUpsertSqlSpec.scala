package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcUpsertSink.{AnsiMergeDialect, PostgresDialect}
import graft.sinks.MartKeys

/** Postgres-dialect proof beyond Derby execution (round-6 VERDICT item 5):
  * the sandbox has no Postgres/H2 driver, so the ON CONFLICT path can't
  * execute here — instead this spec pins the GENERATED SQL for every
  * reference mart against the declared primary keys
  * (reference: mart/postgres/init/01_create_tables.sql:9-142, mirrored in
  * [[MartKeys]]), which is exactly the part Derby execution can't cover:
  * that each mart conflicts on its real PK and updates all-and-only its
  * value columns. */
class JdbcUpsertSqlSpec extends AnyFunSuite {

  private val conflictRe = """ON CONFLICT \(([^)]*)\) DO UPDATE SET (.*)""".r

  test("postgres merge SQL conflicts on each mart's declared PK, updates all value cols") {
    MartKeys.all.foreach { mk =>
      val sql = PostgresDialect
        .mergeSql(mk.table, s"${mk.table}_stage_0", mk.keyCols, mk.valCols)
        .replace("\n", " ")
      val m = conflictRe.findFirstMatchIn(sql)
        .getOrElse(fail(s"${mk.table}: no ON CONFLICT clause in: $sql"))
      val conflictCols = m.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
      assert(conflictCols === mk.keyCols,
        s"${mk.table}: conflict target != declared PK")
      val sets = m.group(2)
      mk.valCols.foreach { c =>
        assert(sets.contains(s""""$c" = EXCLUDED."$c""""),
          s"${mk.table}: value col $c missing from DO UPDATE SET")
      }
      mk.keyCols.foreach { c =>
        assert(!sets.contains(s""""$c" = EXCLUDED."$c""""),
          s"${mk.table}: key col $c must not be updated")
      }
      // insert list covers the whole row, keys first (staging SELECT order)
      val expectIns = (mk.keyCols ++ mk.valCols).map(c => s""""$c"""").mkString(", ")
      assert(sql.contains(s"INSERT INTO ${mk.table} ($expectIns)"),
        s"${mk.table}: INSERT column list wrong")
    }
  }

  test("ansi merge SQL matches on each mart's declared PK, updates all value cols") {
    MartKeys.all.foreach { mk =>
      val sql = AnsiMergeDialect
        .mergeSql(mk.table, s"${mk.table}_stage_0", mk.keyCols, mk.valCols)
        .replace("\n", " ")
      mk.keyCols.foreach { c =>
        assert(sql.contains(s"""t."$c" = s."$c""""),
          s"${mk.table}: key col $c missing from ON clause")
      }
      mk.valCols.foreach { c =>
        assert(sql.contains(s"""t."$c" = s."$c""""),
          s"${mk.table}: value col $c missing from UPDATE SET")
      }
    }
  }

  test("golden: mart_daily_traffic postgres upsert, byte-for-byte") {
    val mk = MartKeys.all.find(_.table == "mart_daily_traffic").get
    val sql = PostgresDialect.mergeSql(mk.table, "mart_daily_traffic_stage_7",
      mk.keyCols, mk.valCols)
    val expected =
      """INSERT INTO mart_daily_traffic ("event_date", "total_events", "unique_sessions", "unique_documents", "peak_hour")
        |SELECT "event_date", "total_events", "unique_sessions", "unique_documents", "peak_hour" FROM mart_daily_traffic_stage_7
        |ON CONFLICT ("event_date") DO UPDATE SET "total_events" = EXCLUDED."total_events", "unique_sessions" = EXCLUDED."unique_sessions", "unique_documents" = EXCLUDED."unique_documents", "peak_hour" = EXCLUDED."peak_hour"""".stripMargin
    assert(sql === expected)
  }

  test("golden: mart_realtime_anomaly_sessions postgres upsert (composite PK)") {
    val mk = MartKeys.all.find(_.table == "mart_realtime_anomaly_sessions").get
    val sql = PostgresDialect.mergeSql(mk.table, "s", mk.keyCols, mk.valCols)
    assert(sql.contains("""ON CONFLICT ("detected_ts", "session_id") DO UPDATE SET"""))
  }
}
