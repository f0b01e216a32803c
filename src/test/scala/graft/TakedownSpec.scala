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

  test("takedown handles escaped and null partition directory names") {
    val root = tmpDir("takedown_escaped")
    Seq(
      (1L, Some("a b:c"), "keep"), (2L, Some("a b:c"), "del"),
      (3L, None, "del-null"), (4L, None, "keep-null"),
      (5L, Some("plain"), "del-all")
    ).toDF("user_id", "cat", "payload")
      .write.mode("overwrite").partitionBy("cat").parquet(root)
    // Spark writes these as cat=a b%3Ac and cat=__HIVE_DEFAULT_PARTITION__
    assert(new File(root, "cat=a b%3Ac").exists())

    val report = Takedown.deleteKeys(spark, root,
      Seq(2L, 3L, 5L).toDF("user_id"), "user_id", "cat")
    assert(report.rowsDeleted === 3L)
    // null partition sorts under its on-disk sentinel name, not an NPE
    assert(report.partitionsAffected
      === Seq("__HIVE_DEFAULT_PARTITION__", "a b:c", "plain"))
    // the emptied directory is found THROUGH the escaping (a raw-string
    // path would silently miss it and keep serving the deleted rows)
    assert(report.partitionsRemoved === Seq("plain"))
    assert(!new File(root, "cat=plain").exists())
    assert(new File(root, "cat=a b%3Ac").exists())

    val after = spark.read.parquet(root)
    assert(after.select("user_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 4L))
    // the surviving null-partition row still reads back as null
    assert(after.filter(col("cat").isNull).select("user_id")
      .collect().map(_.getLong(0)).toSeq === Seq(4L))
  }
}
