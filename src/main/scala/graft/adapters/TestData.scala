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

  /** `events` with the parquet NANOS timestamp materialized as a proper
    * microsecond TimestampType. Read as long (nanosAsLong) then integer-divide
    * by 1000 — float division would lose precision on 1.7e18-scale nanos. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.prepare(spark)
    Tables.events(spark, sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
