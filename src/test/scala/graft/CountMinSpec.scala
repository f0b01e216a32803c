package graft

import org.apache.spark.sql.functions._

import graft.analysis.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++ Seq("cold"))
    .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "i")

  test("estimates are upper bounds and exact without collisions") {
    // width 1024 >> 3 keys: collisions essentially impossible -> exact
    val sketch = CountMin.build(data, "k", depth = 4, width = 1024)
    val probes = Seq("hot", "warm", "cold", "absent").toDF("k")
    val est = CountMin.estimate(sketch, probes, "k", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") === 50L && est("warm") === 7L && est("cold") === 1L)
    assert(est("absent") === 0L)
  }

  test("collisions inflate, never deflate, and the grid stays bounded") {
    // width 2 forces heavy collisions
    val sketch = CountMin.build(data, "k", depth = 4, width = 2)
    assert(sketch.count() <= 4 * 2) // grid bound: depth x width
    val est = CountMin.estimate(sketch, Seq("hot", "warm").toDF("k"), "k",
        depth = 4, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 50L)
    assert(est("warm") >= 7L)
  }

  test("sketch of a union equals cellwise sum of the parts (mergeable)") {
    val a = data.filter(col("i") < 30)
    val b = data.filter(col("i") >= 30)
    val merged = CountMin.build(a, "k", 4, 64)
      .union(CountMin.build(b, "k", 4, 64))
      .groupBy("row", "bucket").agg(sum("c").as("c"))
    val direct = CountMin.build(data, "k", 4, 64)
    val diff = merged.as("m").join(direct.as("d"), Seq("row", "bucket"), "full")
      .filter(coalesce(col("m.c"), lit(0)) =!= coalesce(col("d.c"), lit(0)))
    assert(diff.count() === 0)
  }
}
