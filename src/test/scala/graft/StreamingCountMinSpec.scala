package graft

import org.apache.spark.sql.Row

import graft.analysis.CountMin
import graft.streaming.StreamingCountMin

class StreamingCountMinSpec extends SparkSpec {
  import spark.implicits._

  test("streaming count-min across micro-batches equals the batch sketch of the union") {
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String](spark)
    // latest cell value per (row, bucket) via foreachBatch (update mode
    // re-emits changed cells; memory-sink row order is not defined)
    val cells = scala.collection.concurrent.TrieMap.empty[(Int, Long), Long]
    val q = StreamingCountMin.buildStream(
        input.toDS().toDF().withColumnRenamed("value", "k"), "k", depth = 4, width = 32)
      .writeStream
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Row], _: Long) =>
        ds.collect().foreach(r =>
          cells((r.getInt(0), r.getLong(1))) = r.getLong(2))
      }
      .outputMode("update").start()
    try {
      input.addData((1 to 40).map(i => s"key${i % 7}"): _*)
      q.processAllAvailable()
      input.addData((1 to 25).map(i => s"key${i % 11}"): _*)
      q.processAllAvailable()
    } finally q.stop()

    val union = ((1 to 40).map(i => s"key${i % 7}") ++
      (1 to 25).map(i => s"key${i % 11}")).toDF("k")
    val batch = CountMin.build(union, "k", depth = 4, width = 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.toMap === batch) // cell-for-cell identical, not just close

    // estimates THROUGH the streamed sketch match the batch estimate path
    val streamedSketch = cells.toSeq.map { case ((r, b), c) => (r, b, c) }
      .toDF("row", "bucket", "c")
    val probes = (0 until 11).map(i => s"key$i").toDF("k")
    val estStream = CountMin.estimate(streamedSketch, probes, "k", depth = 4, width = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val estBatch = CountMin.estimate(
        CountMin.build(union, "k", depth = 4, width = 32), probes, "k", depth = 4, width = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estStream === estBatch)
    // count-min never underestimates: the true counts lower-bound estimates
    val truth = union.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) => assert(estStream(k) >= n) }
  }
}
