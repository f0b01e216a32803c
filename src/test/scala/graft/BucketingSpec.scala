package graft

import graft.relational.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join is shuffle-free and matches the plain join") {
    val left = Seq.tabulate(1000)(i => (i.toLong % 100, s"l$i")).toDF("k", "lv")
    val right = Seq.tabulate(500)(i => (i.toLong % 100, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", nBuckets = 4)
    Bucketing.writeBucketed(right, "bkt_right", "k", nBuckets = 4)

    val joined = Bucketing.colocatedJoin(spark, "bkt_left", "bkt_right", "k")
    val n = joined.count()
    assert(n === left.join(right, Seq("k")).count())

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, plan was:\n$plan")
  }
}
