package graft

import org.apache.spark.sql.functions._

import graft.analysis.Sketches
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{Estimate, KeyedValue}

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("scala-side hash60 equals the Column-side hash60") {
    val values = Seq("a", "42", "hello world", "")
    val colSide = spark.createDataset(values).toDF("v")
      .select(Sketches.hash60(col("v")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(colSide === values.map(StreamingSketch.hash60))
  }

  test("streaming sketch across micro-batches equals the batch sketch of the union") {
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[KeyedValue](spark)
    // (batchId, group) -> estimate, collected via foreachBatch so "latest
    // per group" is well-defined (memory-sink row order is not)
    val seen = scala.collection.concurrent.TrieMap.empty[(Long, String), Double]
    val q = StreamingSketch.distinctEstimates(input.toDS(), k = 16)
      .writeStream
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Estimate], id: Long) =>
        ds.collect().foreach(e => seen((id, e.group)) = e.est_distinct)
      }
      .outputMode("update").start()
    try {
      // batch 1: 10 distinct under g1 (below k -> exact), 30 under g2 (over k)
      input.addData((1 to 10).map(i => KeyedValue("g1", s"a$i")) ++
        (1 to 30).map(i => KeyedValue("g2", s"b$i")): _*)
      q.processAllAvailable()
      // batch 2: overlap + new values; state must merge, not reset
      input.addData((6 to 20).map(i => KeyedValue("g1", s"a$i")) ++
        (21 to 50).map(i => KeyedValue("g2", s"b$i")): _*)
      q.processAllAvailable()
      val lastBatch = seen.keys.map(_._1).max
      val streamed = seen.collect { case ((b, g), e) if b == lastBatch => g -> e }.toMap
      val union = ((1 to 20).map(i => ("g1", s"a$i")) ++
        (1 to 50).map(i => ("g2", s"b$i"))).toDF("g", "v")
      val batch = Sketches.distinctEstimate(union, "g", "v", k = 16)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
      assert(streamed === batch) // bit-identical, not just close
      // batch-1 emission for g1 was exact (10 distinct < k)
      assert(seen((0L, "g1")) === 10.0)
    } finally q.stop()
  }
}
