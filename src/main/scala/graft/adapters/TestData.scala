package graft.adapters

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{GraftSession, Tables}

/** Binds the driver's synthetic tables (TESTDATA.md) to the engine's
  * canonical column vocabulary, so the mart transforms — written against the
  * clinical-search domain (session_id / document_id / event_ts / event_date) —
  * run unchanged over `events.parquet`.
  *
  * Mapping: user_id → session_id, props.k (JSON) → document_id,
  * ts → event_ts, date(ts) → event_date, event_type → kept as-is.
  * The JSON hop intentionally exercises the reference's from_json path
  * (reference: streaming_to_curated_stream.py:126).
  */
object TestData {

  /** `events` with `ts` materialized as a proper microsecond timestamp,
    * whatever physical type the generator chose for it. Two generations of
    * the synthetic data exist: parquet TIMESTAMP(NANOS) — surfaced as a
    * nanosecond LONG under `nanosAsLong`, integer-divided by 1000 (float
    * division would lose precision on 1.7e18-scale nanos) — and parquet
    * TIMESTAMP(MICROS), which Spark reads as a timestamp directly. Branch
    * on the observed type so the engine runs unchanged over both. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.prepare(spark)
    val ev = Tables.events(spark, sfDir)
    ev.schema("ts").dataType match {
      case LongType => ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampType | _: TimestampNTZType => ev
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected nanos-long or timestamp)")
    }
  }

  /** Canonical click-frame: session_id, document_id, event_ts, event_date (+
    * event_type, value passthrough). */
  def clicks(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir).select(
      col("event_id"),
      col("user_id").cast(StringType).as("session_id"),
      from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
        .getField("k").as("document_id"),
      col("ts").as("event_ts"),
      to_date(col("ts")).as("event_date"),
      col("event_type"),
      col("value"))

  def documents(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.prepare(spark)
    Tables.documents(spark, sfDir)
  }

  def embeddings(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.prepare(spark)
    Tables.embeddings(spark, sfDir)
  }
}
