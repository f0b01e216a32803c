package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Normalizer
import graft.marts.ColdMarts
import graft.sinks.ParquetLayerSink

/** Local batch pipeline runner — replaces the reference's Airflow DAG chain
  * (producer → streaming → batch → mart → load,
  * orchestration/dags/pipeline/tripclick_main_dag.py:118-126) for
  * single-process runs and tests. Each stage is a pure function over paths;
  * orchestration (retries, scheduling) is deliberately out of scope — any
  * scheduler can call these.
  */
object DailyPipeline {

  final case class Layout(root: String) {
    val archiveRaw = s"$root/archive_raw"
    val curated = s"$root/curated"
    val quarantine = s"$root/quarantine"
    def mart(name: String) = s"$root/analytics_mart/$name"
  }

  /** Stage 1 (reference: batch_to_archive_raw.py): raw JSONL → archive-raw
    * layer, append-partitioned by event_date, duplicates retained. Corrupt
    * or keyless payloads land in the quarantine layer with reason +
    * timestamp (same layout as the streaming dead-letter channel,
    * [[graft.streaming.CuratedStreamJob.startRejects]]) instead of being
    * silently filtered — the batch and streaming ingress share one
    * quarantine contract. */
  def archiveRaw(spark: SparkSession, jsonlDir: String, layout: Layout): Long = {
    val raw = spark.read.text(jsonlDir).withColumnRenamed("value", "json")
    val (good, bad) = Normalizer.fromJsonLinesWithDeadLetter(raw)
    val parsed = good
      .withColumn("ingested_at", current_timestamp())
      .withColumn("ingestion_type", lit("batch"))
    // good first, bad second: both sides share the parse plan lazily and
    // the source re-read is cheaper than caching it for the rare rejects
    ParquetLayerSink.appendPartitioned(parsed, layout.archiveRaw)
    val rejects = bad.withColumn("reject_date", to_date(col("rejected_at")))
    if (!rejects.isEmpty) {
      rejects.write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("reject_date").parquet(layout.quarantine)
    }
    spark.read.parquet(layout.archiveRaw).count()
  }

  /** Stage 2 (batch analog of streaming_to_curated_stream.py): archive-raw →
    * deduplicated curated layer. Batch dedup is the replay-deterministic
    * argmin variant, not arbitrary-row dropDuplicates. */
  def curate(spark: SparkSession, layout: Layout): Long = {
    val raw = spark.read.parquet(layout.archiveRaw)
      .drop("ingested_at", "ingestion_type")
    val deduped = Normalizer.dedupFirst(raw,
      keys = Seq("dedup_key"),
      orderCols = Seq(col("event_ts"), col("session_id")))
    ParquetLayerSink.overwriteMart(deduped, layout.curated, Some("event_date"))
    spark.read.parquet(layout.curated).count()
  }

  /** The four cold marts, by name — single source of truth for the compute
    * and serving-load stages. */
  val coldMartNames: Seq[String] = Seq("mart_session_analysis", "mart_daily_traffic",
    "mart_clinical_areas", "mart_popular_documents")

  /** Stage 3 (reference: etl_to_analytics_mart.py): curated → 4 cold marts.
    * Marts are partitioned by event_date — every mart's keys include the
    * date, downstream reads prune on it, and the layout is what
    * [[IncrementalMart]] requires for partition-scoped refresh. */
  def coldMarts(spark: SparkSession, layout: Layout): Map[String, Long] = {
    val curated = spark.read.parquet(layout.curated)
    val marts: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "mart_session_analysis" -> ColdMarts.sessionAnalysis(curated),
      "mart_daily_traffic" -> ColdMarts.dailyTraffic(curated),
      "mart_clinical_areas" -> ColdMarts.clinicalAreas(curated),
      "mart_popular_documents" -> ColdMarts.popularDocuments(curated, withTitle = true))
    coldMartNames.map { name =>
      ParquetLayerSink.overwriteMart(marts(name), layout.mart(name), Some("event_date"))
      name -> spark.read.parquet(layout.mart(name)).count()
    }.toMap
  }

  /** Stage 4 (reference: load_to_postgres.py:46-64 via
    * orchestration/dags/mart/tripclick_load_postgres.py): re-read each
    * cold-mart parquet
    * dir and full-refresh it into the serving database over JDBC. */
  def loadToServing(
      spark: SparkSession,
      layout: Layout,
      jdbcUrl: String,
      martNames: Seq[String] = coldMartNames,
      props: java.util.Properties = new java.util.Properties()): Map[String, Long] =
    martNames.map { name =>
      val df = spark.read.parquet(layout.mart(name))
      graft.sinks.JdbcUpsertSink.overwrite(df, jdbcUrl, name, props)
      name -> df.count()
    }.toMap

  /** Full daily cycle. Returns per-stage row counts for assertion/logging. */
  def run(spark: SparkSession, jsonlDir: String, root: String): Map[String, Long] = {
    val layout = Layout(root)
    val rawN = archiveRaw(spark, jsonlDir, layout)
    val curatedN = curate(spark, layout)
    Map("archive_raw" -> rawN, "curated" -> curatedN) ++ coldMarts(spark, layout)
  }

  /** [[run]] under [[Orchestrator]] supervision with the reference DAG's
    * policies (1 retry / 5-min delay / 30-min SLA per batch stage,
    * fail-fast chaining). Stage bodies are idempotent (append of identical
    * re-parsed input is curated away by dedup; marts are overwrite), so a
    * retry after a partial failure converges. */
  def runManaged(
      spark: SparkSession,
      jsonlDir: String,
      root: String): Seq[Orchestrator.StageReport] = {
    val layout = Layout(root)
    Orchestrator.run(spark, Seq(
      Orchestrator.Stage("archive_raw")(() => { archiveRaw(spark, jsonlDir, layout); () }),
      Orchestrator.Stage("curate")(() => { curate(spark, layout); () }),
      Orchestrator.Stage("cold_marts")(() => { coldMarts(spark, layout); () })))
  }
}
