package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.relational.ChangeCapture

/** Hot/cold reconciliation — the Lambda-architecture audit the reference's
  * dual-path marts imply (the hot streaming mart serves low-latency reads;
  * the cold batch recomputation is the truth; the difference between them is
  * late data, dropped batches, or a bug, and must be measured, not
  * assumed).
  */
object Reconcile {

  /** Per-key discrepancy report between a hot mart and its cold
    * recomputation: `hot_only` (cold lost rows / hot leaked them),
    * `cold_only` (late data the hot path never saw), `drift` (both have
    * the key, values differ). Matching keys drop out, so the result is
    * sized by the discrepancy, not the mart. Built on
    * [[ChangeCapture.snapshotDiff]] — one full outer join on the key,
    * fixed-size md5 digests instead of value tuples. */
  def diff(
      hot: DataFrame,
      cold: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame =
    ChangeCapture.snapshotDiff(hot, cold, keyCols, valueCols)
      .withColumn("status",
        when(col("change_type") === "added", "cold_only")
          .when(col("change_type") === "deleted", "hot_only")
          .otherwise("drift"))
      .drop("change_type")

  /** One-row health summary: DISTINCT-key counts on both sides,
    * discrepancies by class, and the match rate (matching keys / cold
    * keys). Everything is key-based — a mart with a duplicated key (e.g. a
    * replayed append) counts once, and its diff rows dedupe per key before
    * classification, so the stats stay consistent (never negative). The
    * inputs are persisted across the three actions so each mart's lineage
    * executes once, not per action. */
  def summary(
      hot: DataFrame,
      cold: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val h = hot.persist(); val c = cold.persist()
    try {
      val d = diff(h, c, keyCols, valueCols)
        .select((keyCols.map(col) :+ col("status")): _*).distinct()
        .groupBy("status").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nHot = h.select(keyCols.map(col): _*).distinct().count()
      val nCold = c.select(keyCols.map(col): _*).distinct().count()
      val drift = d.getOrElse("drift", 0L)
      val coldOnly = d.getOrElse("cold_only", 0L)
      val hotOnly = d.getOrElse("hot_only", 0L)
      val matching = nCold - coldOnly - drift
      val spark = hot.sparkSession
      import spark.implicits._
      Seq((nHot, nCold, matching, drift, hotOnly, coldOnly,
          if (nCold == 0) 1.0 else matching.toDouble / nCold))
        .toDF("n_hot", "n_cold", "n_matching", "n_drift", "n_hot_only",
          "n_cold_only", "match_rate")
    } finally { h.unpersist(); c.unpersist(); () }
  }
}
