package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 optimization experiment: CC loop variants on the LONG-DIAMETER
  * ensemble pair graph (q178/q181's union of minhash + exact-cosine-0.4
  * pairs — the graph whose label propagation runs ~11 rounds, vs 2 on the
  * 0.8-jaccard minhash graph ExperimentCC covers). Variants:
  *
  *   base   — the production loop shape (no loop broadcast hints, 1 jump)
  *   bc     — broadcast hints on every per-round join (labels/nbrMin/jump)
  *   bc2    — bc + a SECOND pointer jump per round (path compressed twice;
  *            fewer rounds at the cost of a wider fused round job)
  *   bc3    — bc + three jumps per round
  *
  * Prints per-phase wall seconds and the round count per variant, so the
  * rounds-vs-round-cost tradeoff is measured, not argued.
  */
object ExperimentCC2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analysis._

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc2] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.adapters.TestData.documents(spark, sfDir)
    val emb = graft.adapters.TestData.embeddings(spark, sfDir)
    val tp = Dedup.minhashNearDupPairs(docs).select("doc_a", "doc_b")
    val ep = Similarity.embeddingNearDupPairsExact(emb, minCosine = 0.4)
      .select("doc_a", "doc_b")
    val pairs = tp.unionByName(ep).distinct().localCheckpoint(true)
    val nodes = docs.select(col("doc_id")).localCheckpoint(true)
    println(s"pairs=${pairs.count()} nodes=${nodes.count()}")

    def runVariant(name: String, useBc: Boolean, jumps: Int): Unit = {
      val t0 = System.nanoTime()
      val sym = time(s"$name sym build+count") {
        val s = pairs
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
          .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
          .distinct()
          .persist()
        s.count()
        s
      }
      println(s"[cc2] $name symCount=${sym.count()}")
      def bc(df: DataFrame): DataFrame = if (useBc) broadcast(df) else df
      var labels = time(s"$name labels init ckpt") {
        sym.select(col("a").as("id")).distinct()
          .select(col("id"), col("id").as("label"))
          .localCheckpoint(true)
      }
      var round = 0
      var changed = 1L
      while (changed > 0 && round < 30) {
        val next = time(s"$name round ${round + 1} ckpt") {
          val nbrMin = sym.join(bc(labels), col("b") === col("id"))
            .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
          val stepped = labels.as("l")
            .join(bc(nbrMin).as("m"), col("l.id") === col("m.a"), "left")
            .select(col("l.id").as("id"),
              least(col("l.label"), coalesce(col("m.nbr_label"), col("l.label"))).as("label"),
              col("l.label").as("__old"))
          val jumped = (1 to jumps).foldLeft(stepped) { (cur, _) =>
            cur.as("x")
              .join(bc(cur.select(col("id").as("lid"), col("label").as("llabel"))).as("y"),
                col("x.label") === col("y.lid"), "left")
              .select(col("x.id").as("id"),
                coalesce(col("y.llabel"), col("x.label")).as("label"),
                col("x.__old").as("__old"))
          }
          jumped.localCheckpoint(true)
        }
        changed = time(s"$name round ${round + 1} count") {
          next.filter(col("label") =!= col("__old")).count()
        }
        labels = next.drop("__old")
        round += 1
      }
      sym.unpersist()
      val mat = time(s"$name final labels->clusters mat") {
        nodes.select(col("doc_id").as("id"))
          .join(if (useBc) broadcast(labels) else labels, Seq("id"), "left")
          .select(col("id"), coalesce(col("label"), col("id")).as("component"))
          .localCheckpoint(true)
      }
      val n = mat.count()
      println(f"[cc2] $name TOTAL rounds=$round rows=$n ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      runVariant("base ", useBc = false, jumps = 1)
      runVariant("bc   ", useBc = true, jumps = 1)
      runVariant("bc2  ", useBc = true, jumps = 2)
      runVariant("bc3  ", useBc = true, jumps = 3)
    }
    spark.stop()
  }
}
