package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.Normalizer
import graft.sinks.ParquetLayerSink

/** Streaming Kafka→Curated job
  * (reference: streaming_to_curated_stream.py — SURVEY.md §3.2):
  * raw frames → normalize → watermarked streaming dedup → per-micro-batch
  * partitioned parquet append, with checkpointing.
  *
  * Dedup semantics (D1): `dropDuplicates("dedup_key")` after
  * `withWatermark(event_ts, …)` keeps per-key state in the state store and
  * expires it when the watermark passes — at-least-once input becomes
  * effectively-once output, with state bounded by (keys arriving within the
  * watermark) instead of growing forever. That bound is what makes this work
  * on an unbounded 100 TB/day stream.
  *
  * Sources are abstracted (SURVEY.md §7.4): tests drive this with a file
  * source; production uses [[kafkaSource]] with identical downstream code.
  */
object CuratedStreamJob {

  /** Production source: Kafka subscription, config-compatible with the
    * reference's options (S2C:110-118). Not exercisable in this sandbox —
    * kept thin and identical in shape to the tested file source. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
      .load()

  /** Test/backfill source: stream a directory of JSON-lines event files. */
  def jsonlSource(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .withColumnRenamed("value", "json")

  /** The transform: normalize + watermarked dedup. `rawIsKafka` selects the
    * frame parser; everything downstream is shared.
    *
    * Deliberate deviation from the reference: the reference's
    * `withWatermark(...).dropDuplicates(["dedup_key"])` (S2C:147-151) does
    * NOT bound its state — Spark only evicts dedup state when the event-time
    * column is part of the dedup keys, so on an unbounded stream that state
    * store grows forever. `dropDuplicatesWithinWatermark` is the operator
    * built for this contract: state for a key is dropped once the watermark
    * passes it, duplicates within the watermark collapse, and a duplicate
    * arriving later than the watermark may re-emit (the documented
    * at-least-once edge the downstream idempotent upsert sink absorbs). */
  def curate(raw: DataFrame, rawIsKafka: Boolean, watermark: String = "10 minutes"): DataFrame = {
    val normalized =
      if (rawIsKafka) Normalizer.fromKafkaFrame(raw)
      else Normalizer.fromJsonLines(raw)
    normalized
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("dedup_key"))
  }

  /** Dead-letter twin of [[curate]]: the REJECT side of the same permissive
    * parse — corrupt JSON, null payloads, rows missing their dedup key —
    * quarantined with a reason and arrival timestamp instead of being
    * silently dropped by the clean path's null filters
    * ([[Normalizer.fromJsonLinesWithDeadLetter]] proves the two sides
    * partition the input exhaustively, NormalizerSpec). Runs as its OWN
    * query and checkpoint over the same source — the standard split-sink
    * layout: the clean path keeps its stateful watermarked dedup untouched,
    * the quarantine is a stateless append, and each side recovers
    * independently. At-least-once ingress makes corrupt events an
    * operational certainty; the reference's parse drops them on the floor
    * (S2C:126-139). */
  def rejects(raw: DataFrame): DataFrame =
    Normalizer.fromJsonLinesWithDeadLetter(raw)._2

  /** Start the quarantine stream: per-batch parquet append partitioned by
    * reject date, same empty-batch guard as [[start]]. */
  def startRejects(
      rejected: DataFrame,
      quarantinePath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery =
    rejected.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          batch.withColumn("reject_date", to_date(col("rejected_at")))
            .write.mode("append").partitionBy("reject_date")
            .parquet(quarantinePath)
        }
      }
      .start()

  /** Start the stream: foreachBatch partitioned append with an empty-batch
    * guard (reference: S2C:157-176). The reference's per-batch `coalesce(1)`
    * is dropped — ParquetLayerSink bounds file sizes instead and the
    * [[graft.sinks.Compactor]] owns small-file cleanup off the hot path.
    *
    * `crashAfterSinkOnBatch` is the crash-injection surface for the
    * recovery gate (StreamingSpec; same pattern as Compactor's injected
    * crashes): throwing AFTER the sink write but BEFORE foreachBatch
    * returns models a worker dying between the parquet append and the
    * checkpoint commit — the worst-case window, which on restart replays
    * that micro-batch (at-least-once into the curated layer; the keyed
    * JDBC upsert downstream absorbs the replay into exactly-once). */
  def start(
      curated: DataFrame,
      outputPath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
      crashAfterSinkOnBatch: Option[Long] = None): StreamingQuery =
    curated.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          ParquetLayerSink.appendPartitioned(batch, outputPath)
        }
        if (crashAfterSinkOnBatch.contains(batchId))
          throw new RuntimeException(s"injected crash after sink, batch $batchId")
      }
      .start()
}
