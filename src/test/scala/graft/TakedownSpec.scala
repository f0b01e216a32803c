package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.sinks.Takedown

class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def partitionFiles(root: String, part: String): Map[String, Long] = {
    val dir = new File(root, part)
    if (!dir.exists()) Map.empty
    else dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("takedown rewrites only affected partitions, drops fully-deleted ones") {
    val root = tmpDir("takedown_layer")
    Seq(
      (1L, "2026-01-01", "keep-a"), (2L, "2026-01-01", "del-b"),
      (3L, "2026-01-02", "keep-c"),                       // untouched day
      (4L, "2026-01-03", "del-d"), (5L, "2026-01-03", "del-e") // fully deleted day
    ).toDF("user_id", "event_date", "payload")
      .write.mode("overwrite").partitionBy("event_date").parquet(root)
    val before = partitionFiles(root, "event_date=2026-01-02")
    assert(before.nonEmpty)

    val report = Takedown.deleteKeys(spark, root,
      Seq(2L, 4L, 5L, 99L).toDF("user_id"), "user_id", "event_date")
    assert(report.rowsDeleted === 3L)
    assert(report.partitionsAffected === Seq("2026-01-01", "2026-01-03"))
    assert(report.partitionsRemoved === Seq("2026-01-03"))

    val after = spark.read.parquet(root)
    assert(after.select("user_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 3L))
    // the untouched partition's files were not rewritten (same names+mtimes)
    assert(partitionFiles(root, "event_date=2026-01-02") === before)
    // the fully-deleted day's directory is gone, not serving stale rows
    assert(!new File(root, "event_date=2026-01-03").exists())
    // idempotent: replaying the same takedown is a no-op
    val again = Takedown.deleteKeys(spark, root,
      Seq(2L, 4L, 5L, 99L).toDF("user_id"), "user_id", "event_date")
    assert(again.rowsDeleted === 0L && again.partitionsAffected.isEmpty)
  }
}
