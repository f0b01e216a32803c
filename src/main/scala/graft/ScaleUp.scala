package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up dataset generator (measurement tool, not library surface):
  * derives an N×-sf0.1 corpus by unioning N re-keyed copies of every table
  * with structure-PRESERVING perturbations, so the scaling-slope benches
  * (PLANS.md §scaling) measure "corpus grows, local structure constant" —
  * the null model under which a bucketed/blocked operator should scale
  * near-linearly and an all-pairs baseline quadratically.
  *
  * Perturbations, per copy c > 0 (copy 0 is the original, bit-for-bit):
  *  - every id/key column shifts by c·(max+1) — keys stay unique, joins
  *    stay consistent within a copy and never cross copies;
  *  - text/name tokens get a copy suffix (`token` → `tokenxc`) — per-copy
  *    shingle/token/blocking structure is isomorphic to the original while
  *    cross-copy similarity collapses to zero; without this, every document
  *    would gain N−1 exact clones and near-dup clusters would grow N× in
  *    SIZE (quadratic pair blow-up inside clusters) instead of N× in COUNT;
  *  - embeddings rotate circularly by c dims — within-copy distances are
  *    exactly the original's (rotation is an isometry), cross-copy
  *    neighborhoods decorrelate;
  *  - event timestamps/props stay as-is: N× sessions over the same day
  *    range and document vocabulary, i.e. "more traffic on the same site".
  *
  * HEAPS MODE (`runMain graft.ScaleUp <src> <out> <factor> heaps`):
  * the standard mode suffixes every token occurrence with its copy id, so
  * the corpus VOCABULARY grows ∝ factor — real corpora grow ∝ n^β,
  * β ≈ 0.5–0.7 (Heaps' law), and a vocabulary-keyed stage (unigram model
  * build, tok⋈freq shuffle) that is Heaps-sub-linear in production looks
  * super-linear under the standard mode's linear-vocab null (the q242
  * 100×-slope adjudication, round-10 verdict #4). Heaps mode draws the
  * copy suffix from a FIXED POOL of ⌈factor^0.6⌉ values (`copy_ % K`), so
  * vocab grows ∝ factor^0.6 while documents, token occurrences, and ids
  * still grow ∝ factor. TRADE: copies c and c+K carry textually IDENTICAL
  * documents (ids still disjoint), so heaps corpora are for LM-model /
  * vocabulary-keyed measurements ONLY — dedup/pair benches would see
  * cross-copy exact-dup clusters that the standard mode deliberately
  * prevents. Use the standard mode for everything else.
  *
  * TEMPLATE MODE (`runMain graft.ScaleUp <src> <out> <factor> template`):
  * the standard per-copy salting plus ONE fixed boilerplate footer (24
  * tokens, unsalted) appended to EVERY document — the corpus class the
  * q284 df bound exists for: every ≥8-token footer span has document
  * frequency = |corpus|, so the unbounded q275 per-fingerprint self-join
  * squares on the footer alone (the latent quadratic of template-heavy
  * web corpora: nav bars, disclaimers, license blocks), while the
  * df-bounded arm drops those spans before pairing. Documents table only
  * (the A/B reads nothing else).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <factor> [heaps|template]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sfx"
    val factor = if (args.length > 2) args(2).toInt else 10
    val heaps = args.length > 3 && args(3) == "heaps"
    val template = args.length > 3 && args(3) == "template"
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[16]"), 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (template) writeTemplateDocs(spark, src, out, factor)
    else writeAll(spark, src, out, factor, heaps)
    spark.stop()
  }

  /** The fixed footer every template-mode document carries — 24 tokens,
    * ≥17 distinct 8-token spans each with df = |corpus|. */
  val templateFooter: String =
    "this document is provided as is without warranty of any kind express " +
      "or implied including but not limited to merchantability fitness and " +
      "noninfringement"

  def writeTemplateDocs(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    scaled(docs, factor, ids = Seq("doc_id"), salted = Seq("text"))
      .withColumn("text", concat(col("text"), lit(" " + templateFooter)))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
  }

  /** Suffix-pool size for heaps mode: ⌈factor^0.6⌉, the middle of the
    * measured Heaps exponent band for web/news corpora. */
  def heapsPool(factor: Int): Int =
    math.max(1, math.ceil(math.pow(factor.toDouble, 0.6)).toInt)

  def writeAll(spark: SparkSession, src: String, out: String, factor: Int,
      heaps: Boolean = false): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")

    // fixed dims replicate as-is (a bigger fact side joins the same dims)
    Seq("region", "nation").foreach(t => write(read(t), t))

    val pool = if (heaps) Some(heapsPool(factor)) else None
    write(scaled(read("documents"), factor, ids = Seq("doc_id"),
        salted = Seq("text"), suffixPool = pool)
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")

    val emb = read("embeddings")
    write(scaled(emb, factor, ids = Seq("vec_id"))
      .withColumn("embedding", rotate(col("embedding"), col("copy_"), 64))
      .drop("copy_"), "embeddings")

    write(scaled(read("events"), factor, ids = Seq("event_id", "user_id")), "events")
    write(scaled(read("part"), factor, ids = Seq("p_partkey"),
      salted = Seq("p_name")), "part")
    write(scaled(read("supplier"), factor, ids = Seq("s_suppkey"),
      salted = Seq("s_name")), "supplier")
    write(scaled(read("customer"), factor, ids = Seq("c_custkey"),
      salted = Seq("c_name")), "customer")
    write(scaled(read("orders"), factor, ids = Seq("o_orderkey", "o_custkey")), "orders")
    write(scaled(read("lineitem"), factor,
      ids = Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
  }

  /** Union `factor` copies: id columns shift by copy·(max+1); salted string
    * columns get a per-token copy suffix — the copy id itself, or
    * `copy_ % suffixPool` in heaps mode (vocab ∝ pool instead of ∝ factor).
    * Keeps a `copy_` column only if a caller still needs it (dropped
    * otherwise). */
  private def scaled(
      base: DataFrame,
      factor: Int,
      ids: Seq[String],
      salted: Seq[String] = Nil,
      suffixPool: Option[Int] = None): DataFrame = {
    val spark = base.sparkSession
    val spans = ids.map { c =>
      c -> (base.agg(max(col(c).cast("long"))).head.getLong(0) + 1L)
    }.toMap
    val copies = base.crossJoin(
      spark.range(factor.toLong).toDF("copy_"))
    val withIds = spans.foldLeft(copies) { case (df, (c, span)) =>
      df.withColumn(c, col(c) + col("copy_") * span)
    }
    val suffix = suffixPool match {
      case Some(k) => col("copy_") % lit(k.toLong)
      case None => col("copy_")
    }
    val withSalt = salted.foldLeft(withIds) { (df, c) =>
      df.withColumn(c,
        when(col("copy_") === 0, col(c)).otherwise(
          regexp_replace(col(c), lit("(\\w+)"), concat(lit("$1x"), suffix))))
    }
    if (ids.contains("vec_id")) withSalt // embeddings still need copy_ for rotate
    else withSalt.drop("copy_")
  }

  /** Circular left-rotation of a fixed-dim array by `by` positions —
    * an isometry, so within-copy distance structure is exactly preserved. */
  private def rotate(v: Column, by: Column, dim: Int): Column = {
    // modulo the dimension: factors > dim (the 100x run) would otherwise
    // ask slice() for a negative length; a 0-rotation copy (c = k*dim)
    // still decorrelates from the original via its id shift
    val r = by % dim
    when(r === 0, v).otherwise(
      concat(slice(v, r + 1, lit(dim) - r), slice(v, lit(1), r)))
  }
}
