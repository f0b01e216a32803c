package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.relational.Relational

/** Gate for the q95-recipe factoring (round-8 verdict item 4): the four
  * stat operators that used to run a bare `Window.orderBy` over a
  * potentially data-sized frame (mannWhitneyU, ksDrift, giniConcentration,
  * conformalReport) now go through [[Relational.distributedCumSum]] /
  * [[Relational.exactRankProbe]]. This spec pins (a) exact equivalence to
  * the single-window ground truth and (b) the execution shape: no
  * single-partition Exchange anywhere in the helper's plan.
  */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  // injective map i -> (i*48271) mod 100003 keeps the order key unique
  // (a total order is the helper's documented contract)
  private def frame(n: Int) =
    (1 to n).map(i => ((i.toLong * 48271L) % 100003L, 1L + i % 7))
      .toDF("v", "t")

  test("distributedCumSum: equals the single-window ground truth on sums and ranks") {
    val df = frame(5000)
    val got = Relational.distributedCumSum(df, Seq("v"), Seq("t"), rankCol = Some("i"))
      .select("v", "cum_t", "i").orderBy("v").collect()
    val w = Window.orderBy("v")
    val want = df
      .withColumn("cum_t", sum("t").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("i", row_number().over(w).cast("long"))
      .select("v", "cum_t", "i").orderBy("v").collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("distributedCumSum: no single-partition exchange in the plan") {
    val out = Relational.distributedCumSum(frame(2000), Seq("v"), Seq("t"),
      rankCol = Some("i"))
    out.count() // materialize so the executed plan is final
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(500))
    assert(!plan.contains("Exchange SinglePartition"),
      "the distributed-rank helper must never funnel rows through one task:\n" +
        plan.take(2000))
  }

  test("distributedCumSum: empty and single-row frames") {
    val empty = Relational.distributedCumSum(frame(0), Seq("v"), Seq("t"),
      rankCol = Some("i"))
    assert(empty.count() === 0L)
    val one = Relational.distributedCumSum(frame(1), Seq("v"), Seq("t"),
      rankCol = Some("i")).collect().head
    assert(one.getAs[Long]("cum_t") === one.getAs[Long]("t"))
    assert(one.getAs[Long]("i") === 1L)
  }

  test("exactRankProbe: arbitrary order statistics match a full sort") {
    val xs = (1 to 1000).map(i => ((i.toLong * 48271L) % 100003L).toDouble)
    val df = xs.map(Tuple1(_)).toDF("x")
    val sorted = xs.sorted
    Seq(1L, 7L, 500L, 999L, 1000L).foreach { k =>
      val Some((v, n, _, _)) =
        Relational.exactRankProbe(df, "x", _ => k, bins = 32)
      assert(n === 1000L)
      assert(v === sorted((k - 1).toInt), s"k=$k")
    }
  }
}
