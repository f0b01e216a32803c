package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.relational.TemporalJoin

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // quotes (right): user A gets quotes at 10:00, 10:05, 10:10; user B none
  private lazy val quotes = Seq(
    ("A", t("2026-01-01 10:00:00"), 100L),
    ("A", t("2026-01-01 10:05:00"), 105L),
    ("A", t("2026-01-01 10:10:00"), 110L),
    ("C", t("2026-01-01 09:00:00"), 900L)
  ).toDF("uid", "qts", "price")

  // trades (left): exactly-equal ts, between-ts, before-any-ts, no-right-key
  private lazy val trades = Seq(
    ("A", t("2026-01-01 10:05:00"), 1L), // equal to a quote ts
    ("A", t("2026-01-01 10:07:30"), 2L), // between 10:05 and 10:10
    ("A", t("2026-01-01 09:59:59"), 3L), // before any quote
    ("B", t("2026-01-01 12:00:00"), 4L)  // key with no quotes at all
  ).toDF("uid", "tts", "trade_id")

  private def runAsof(strict: Boolean) =
    TemporalJoin.asofJoin(trades, quotes, key = "uid",
        leftTime = "tts", rightTime = "qts",
        rightPayload = Seq("price"), strict = strict,
        rightTieBreak = Some("price"))
      .select("trade_id", "asof_price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap

  test("asof inclusive: equal-time right row matches; earlier rows picked; misses are null") {
    val m = runAsof(strict = false)
    assert(m(1L) === Some(105L)) // equal ts visible when inclusive
    assert(m(2L) === Some(105L)) // latest at-or-before 10:07:30
    assert(m(3L) === None)       // before any quote
    assert(m(4L) === None)       // key with no right rows
  }

  test("asof strict: equal-time right row is NOT visible") {
    val m = runAsof(strict = true)
    assert(m(1L) === Some(100L)) // 10:05 quote excluded, falls back to 10:00
    assert(m(2L) === Some(105L)) // unaffected
  }

  test("asof tie-break: equal right timestamps resolve to the largest tie-break value") {
    val tied = Seq(
      ("A", t("2026-01-01 10:00:00"), 1L),
      ("A", t("2026-01-01 10:00:00"), 9L),
      ("A", t("2026-01-01 10:00:00"), 5L)
    ).toDF("uid", "qts", "price")
    val one = Seq(("A", t("2026-01-01 11:00:00"), 1L)).toDF("uid", "tts", "trade_id")
    val out = TemporalJoin.asofJoin(one, tied, "uid", "tts", "qts",
      rightPayload = Seq("price"), rightTieBreak = Some("price"))
    assert(out.select("asof_price").as[Long].head() === 9L)
  }

  test("asof tie-break on a STRING column keeps its native ordering (no lossy long cast)") {
    import spark.implicits._
    val left = Seq(("k", 10L)).toDF("key", "t")
    val right = Seq(("k", 10L, "uuid-b", "B"), ("k", 10L, "uuid-a", "A"))
      .toDF("key", "t", "rid", "payload")
    val out = graft.relational.TemporalJoin.asofJoin(
        left, right, key = "key", leftTime = "t", rightTime = "t",
        rightPayload = Seq("payload"), strict = false, rightTieBreak = Some("rid"))
      .collect()
    // both right rows share (key, t); the larger rid string must win
    assert(out.length === 1)
    assert(out.head.getAs[String]("asof_payload") === "B")
  }

  test("asof equals the naive join+argmax formulation on a dense fixture") {
    val ev = adapters.TestData.eventsRaw(spark, "/root/testdata/sf0.001")
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val fast = TemporalJoin.asofJoin(left, right, "user_id", "ts", "ts",
        rightPayload = Seq("click_id"), strict = true, rightTieBreak = Some("click_id"))
      .select(col("event_id"), col("asof_click_id"))
    // naive: inequality join then keep the max-(ts, click_id) right row
    val naive = left.as("l")
      .join(right.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.ts") > col("r.ts"), "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(max_by(col("r.click_id"), struct(col("r.ts"), col("r.click_id"))).as("asof_click_id"))
    assert(fast.orderBy("event_id").collect().toSeq ===
      naive.orderBy("event_id").collect().toSeq)
  }

  test("asof plan: one exchange for the window, no join operator") {
    val plan = runAsofPlan()
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
  }

  private def runAsofPlan(): String =
    TemporalJoin.asofJoin(trades, quotes, "uid", "tts", "qts", Seq("price"))
      .queryExecution.executedPlan.toString

  test("banded range join: half-open (start, end] boundaries, multi-band intervals") {
    val points = Seq(
      ("A", t("2026-01-01 10:00:00"), 1L), // == start: excluded
      ("A", t("2026-01-01 10:30:00"), 2L), // inside
      ("A", t("2026-01-01 11:30:00"), 3L), // inside (second band of the interval)
      ("A", t("2026-01-01 12:00:00"), 4L), // == end: included
      ("A", t("2026-01-01 12:00:01"), 5L), // past end
      ("B", t("2026-01-01 10:30:00"), 6L)  // other key
    ).toDF("uid", "pts", "pid")
    // one 2-hour interval for A — spans 3 one-hour bands
    val ivs = Seq(("A", t("2026-01-01 10:00:00"), t("2026-01-01 12:00:00"), 7L))
      .toDF("uid", "s", "e", "iid")
    val got = TemporalJoin.bandedRangeJoin(points, ivs, "uid", "pts", "s", "e",
        bandSeconds = 3600L)
      .select("pid").as[Long].collect().sorted
    assert(got === Array(2L, 3L, 4L))
  }

  test("banded range join produces each qualifying pair exactly once") {
    val points = Seq(("A", t("2026-01-01 10:30:00"), 1L)).toDF("uid", "pts", "pid")
    val ivs = Seq(("A", t("2026-01-01 09:00:00"), t("2026-01-01 13:00:00"), 7L))
      .toDF("uid", "s", "e", "iid") // 4-hour interval: 5 band copies
    val got = TemporalJoin.bandedRangeJoin(points, ivs, "uid", "pts", "s", "e",
      bandSeconds = 3600L)
    assert(got.count() === 1L)
  }

  test("banded range join equals the naive BETWEEN join") {
    val ev = adapters.TestData.eventsRaw(spark, "/root/testdata/sf0.001")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("s"), (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
    val banded = TemporalJoin.bandedRangeJoin(views, errors, "user_id", "ts", "s", "e")
      .select("error_id", "view_id")
    val naive = views.join(errors, Seq("user_id"))
      .filter(col("ts") > col("s") && col("ts") <= col("e"))
      .select("error_id", "view_id")
    assert(banded.orderBy("error_id", "view_id").collect().toSeq ===
      naive.orderBy("error_id", "view_id").collect().toSeq)
  }

  test("point-in-time scd2 lookup (as-of on valid_from) equals interval membership") {
    import graft.relational.ChangeCapture
    val history = Seq(
      ("s1", 10, t("2026-01-01 10:00:00")),
      ("s1", 20, t("2026-01-01 11:00:00")), // version change
      ("s1", 20, t("2026-01-01 11:30:00")), // no change: same interval
      ("s2", 77, t("2026-01-01 09:00:00"))
    ).toDF("k", "doc", "ts")
    val dim = ChangeCapture.scd2Intervals(history, "k", "doc", "ts")
    val facts = Seq(
      ("s1", 1L, t("2026-01-01 10:30:00")), // inside v1
      ("s1", 2L, t("2026-01-01 11:00:00")), // boundary: new version inclusive
      ("s1", 3L, t("2026-01-01 09:00:00")), // before first version -> null
      ("s2", 4L, t("2026-01-01 12:00:00"))  // open-ended current version
    ).toDF("k", "fid", "fts")
    val pit = TemporalJoin.asofJoin(facts, dim, "k", "fts", "valid_from",
        rightPayload = Seq("doc"), rightPrefix = "dim_")
      .collect().map(r => r.getLong(1) ->
        Option(r.get(r.fieldIndex("dim_doc"))).map(_.asInstanceOf[Int])).toMap
    // the naive definition: the interval containing the fact timestamp
    val naive = facts.join(dim,
        facts("k") === dim("k") && col("fts") >= col("valid_from") &&
          (col("valid_to").isNull || col("fts") < col("valid_to")), "left")
      .collect().map(r => r.getLong(1) ->
        Option(r.get(r.fieldIndex("doc"))).map(_.asInstanceOf[Int])).toMap
    assert(pit === naive)
    assert(pit === Map(1L -> Some(10), 2L -> Some(20), 3L -> None, 4L -> Some(77)))
  }
}
