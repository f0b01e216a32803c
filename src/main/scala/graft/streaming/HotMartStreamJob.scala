package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.marts.HotMarts

/** Hot-mart streaming job
  * (reference: streaming_to_analytics_mart_realtime.py — SURVEY.md §3.3):
  * stream the curated parquet layer, and per micro-batch cache the batch
  * once, fan out to the four hot-mart transforms, and hand each result to a
  * sink callback.
  *
  * Differences from the reference, deliberate:
  *  - explicit curated schema instead of `streaming.schemaInference=true`
  *    (SURVEY.md §1.3 — inference is a deployment convenience, not a
  *    semantic);
  *  - sinks receive `batchId` so idempotent upsert keys can be
  *    replay-stable ([[graft.sinks.JdbcUpsertSink.upsert]]) instead of the
  *    reference's wall-clock snapshot_ts (RT:218-236, a replay hazard);
  *  - `updated_at`/`snapshot_ts` columns are stamped here at the sink
  *    boundary, keeping the mart transforms pure and testable.
  */
object HotMartStreamJob {

  /** Per-batch outputs handed to the serving sink. */
  final case class HotMartBatch(
      batchId: Long,
      trafficMinute: DataFrame,
      topDocs: DataFrame,
      categoryTrend: DataFrame,
      anomalies: DataFrame)

  def parquetSource(
      spark: SparkSession,
      curatedPath: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .format("parquet")
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(curatedPath)

  /** Compute all four hot marts from one cached micro-batch
    * (reference caches + sequentially fans out, RT:345-381). */
  def computeBatch(batch: DataFrame, batchId: Long, exact: Boolean = true): HotMartBatch = {
    val areaCounts = graft.marts.ColdMarts.clinicalAreas(batch, exact)
    HotMartBatch(
      batchId = batchId,
      trafficMinute = HotMarts.trafficPerMinute(batch, exact)
        .withColumn("updated_at", current_timestamp()),
      topDocs = HotMarts.topDocs(batch, 20, exact)
        .withColumn("batch_id", lit(batchId)),
      // NOTE: within one micro-batch the lag window usually sees a single
      // event_date per area, so trend_pct is null here — the real
      // day-over-day trend needs history and is produced by the batch /
      // backfill path (ColdMarts over the full curated layer, q07); the hot
      // path carries current counts and the serving-side upsert keeps the
      // mart's trend column from the last batch that could compute it.
      categoryTrend = HotMarts.categoryTrend(
          areaCounts, "clinical_area", "event_date", "search_count")
        .withColumn("batch_id", lit(batchId)),
      anomalies = HotMarts.anomalySessions(batch)
        .withColumn("batch_id", lit(batchId)))
  }

  /** TRUE stateful anomaly detection — unlike the reference's per-batch
    * tumbling windows (RT:284-290 recomputes within each micro-batch, so a
    * burst split across two batches is invisible), this is a global
    * watermarked streaming aggregation: window state accumulates across
    * batches in the state store and each window emits once, when the
    * watermark closes it. The engine improvement the reference's comment
    * wished for. */
  def statefulAnomalySessions(
      curatedStream: DataFrame,
      windowDuration: String = "5 minutes",
      watermark: String = "10 minutes",
      warnAt: Long = 50,
      criticalAt: Long = 100): DataFrame =
    HotMarts.anomalySessions(
      curatedStream.withWatermark("event_ts", watermark),
      windowDuration, warnAt, criticalAt)

  /** Start the stream; `sink` is called once per non-empty micro-batch with
    * the four mart frames (production: JDBC upsert/append; tests: collect). */
  def start(
      source: DataFrame,
      sink: HotMartBatch => Unit,
      checkpointPath: String,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      exact: Boolean = true): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.persist()
          try sink(computeBatch(batch, batchId))
          finally { batch.unpersist(); () }
        }
      }
      .start()
}
