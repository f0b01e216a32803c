package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.TextAnalysis
import graft.adapters.TestData
import graft.core.GraftSession

/** Stage profiler for q242 (`TextAnalysis.rarityBuckets`) — the round-11
  * instrument for the 100×-slope adjudication. The round-10 hypothesis
  * (ScaleUp's linear vocabulary growth inflates the unigram-model groupBy
  * and the tok⋈freq shuffle) was REFUTED by measurement: on a Heaps-shaped
  * corpus (vocab ∝ n^0.6, BENCHSCALE11 heaps arm) the 30→100× slope stayed
  * ~1.2. This main times each pipeline stage in isolation (count-forced,
  * cache-cleared between stages) so the superlinear stage is NAMED instead
  * of argued.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileRarity
  */
object ProfileRarity {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TestData.documents(spark, sfDir)

    def timeIt(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val tok = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    timeIt("tokenize+explode")(tok.count())
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    timeIt("unigram model (freq)")(freq.count())
    val totals = freq.agg(sum("c").as("n"), count(lit(1)).as("v"))
    val perDoc = tok.join(freq, "tok").crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr("(n + v) div (c + 1)")).as("sr"))
      .select(col("doc_id"), expr("sr * 1000000 div n_tokens").as("rarity_micro"))
    timeIt("score: tok-join-freq+agg")(perDoc.count())
    if (sys.env.contains("SPARK_GRAFT_PROFILE_DEEP")) {
      perDoc.explain("formatted")
      val perDocB = tok.join(broadcast(freq), "tok").crossJoin(broadcast(totals))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr("(n + v) div (c + 1)")).as("sr"))
        .select(col("doc_id"), expr("sr * 1000000 div n_tokens").as("rarity_micro"))
      timeIt("score w/ broadcast(freq)")(perDocB.count())
      // join-free variant: fold the (n+v) div (c+1) weight into the freq
      // side ONCE (vocab-sized), then join
      val wfreq = freq.crossJoin(broadcast(totals))
        .select(col("tok"), expr("(n + v) div (c + 1)").as("wt"))
      val perDocW = tok.join(broadcast(wfreq), "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("wt").as("sr"))
        .select(col("doc_id"), expr("sr * 1000000 div n_tokens").as("rarity_micro"))
      timeIt("score w/ prefolded weight")(perDocW.count())
      // shuffle-HASH join: build the vocab side per partition, never sort
      // the token side — the plan that survives any vocab size
      val perDocH = tok.join(freq.hint("shuffle_hash"), "tok")
        .crossJoin(broadcast(totals))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr("(n + v) div (c + 1)")).as("sr"))
        .select(col("doc_id"), expr("sr * 1000000 div n_tokens").as("rarity_micro"))
      timeIt("score w/ shuffle_hash(freq)")(perDocH.count())
    }
    val scored = docs.select(col("doc_id"), col("lang")).join(perDoc, "doc_id")
    timeIt("lang join")(scored.count())
    val ranked = graft.relational.Relational.distributedCumSum(
      scored, Seq("lang", "rarity_micro", "doc_id"), Nil, rankCol = Some("grk"))
    timeIt("distributedCumSum rank")(ranked.count())
    timeIt("FULL rarityBuckets")(TextAnalysis.rarityBuckets(docs).count())
    spark.stop()
  }
}
