package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.TripClick

/** Raw-frame → curated-event normalization.
  *
  * Reproduces the reference's parse/project chain
  * (reference: streaming_to_curated_stream.py:125-139,
  * batch_to_archive_raw.py:130-162) as one reusable, codegen-friendly
  * transform: CAST(value AS STRING) → from_json(schema) → snake_case
  * projection → to_timestamp → null-key filter. No UDFs anywhere — the
  * whole chain stays inside whole-stage codegen.
  */
object Normalizer {

  /** Parse a Kafka-shaped frame (binary `value` + metadata columns) into the
    * curated projection. Works identically on batch and streaming frames. */
  def fromKafkaFrame(frame: DataFrame): DataFrame =
    curatedProjection(
      frame.select(from_json(col("value").cast(StringType), TripClick.rawSchema).as("data"))
    )

  /** Parse JSON-lines text already read as a single string column `json`. */
  def fromJsonLines(lines: DataFrame, jsonCol: String = "json"): DataFrame =
    curatedProjection(
      lines.select(from_json(col(jsonCol), TripClick.rawSchema).as("data"))
    )

  /** The snake_case projection of the parsed struct
    * (reference: streaming_to_curated_stream.py:127-139). */
  def curatedProjection(parsed: DataFrame): DataFrame =
    parsed.select(
      col("data.SessionId").as("session_id"),
      col("data.DocumentId").as("document_id"),
      col("data.Url").as("url"),
      col("data.Title").as("title"),
      col("data.DOI").as("doi"),
      col("data.Keywords").as("keywords"),
      col("data.ClinicalAreas").as("clinical_areas"),
      to_timestamp(col("data.event_ts")).as("event_ts"),
      col("data.event_date").as("event_date"),
      col("data.dedup_key").as("dedup_key")
    ).filter(col("dedup_key").isNotNull)

  /** Archive-raw projection: curated fields + Kafka + load metadata
    * (reference: batch_to_archive_raw.py:139-162). */
  def archiveRawProjection(kafkaFrame: DataFrame, ingestionType: String = "batch"): DataFrame = {
    val parsed = kafkaFrame.select(
      from_json(col("value").cast(StringType), TripClick.rawSchema).as("data"),
      col("key").cast(StringType).as("kafka_key"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_timestamp"))
    parsed.select(
      (curatedColumns.map(c => col(s"data.${c._1}").as(c._2)) ++ Seq(
        col("kafka_key"), col("topic"), col("partition"), col("offset"),
        col("kafka_timestamp"),
        current_timestamp().as("ingested_at"),
        lit(ingestionType).as("ingestion_type"))): _*
    ).withColumn("event_ts", to_timestamp(col("event_ts")))
  }

  private val curatedColumns: Seq[(String, String)] = Seq(
    "SessionId" -> "session_id", "DocumentId" -> "document_id",
    "Url" -> "url", "Title" -> "title", "DOI" -> "doi",
    "Keywords" -> "keywords", "ClinicalAreas" -> "clinical_areas",
    "event_ts" -> "event_ts", "event_date" -> "event_date",
    "dedup_key" -> "dedup_key")

  /** Parse with a dead-letter side channel: rows whose JSON fails to parse
    * (from_json → null struct) or that lack the dedup key are captured with
    * the raw payload instead of silently vanishing — at pipeline scale,
    * silent drop rates are how corpora rot. Returns (curated, deadLetter).
    * Both frames share the parse plan lazily; a caller materializing both
    * sides should cache the input (or write good first, bad second) to avoid
    * parsing the source twice. */
  def fromJsonLinesWithDeadLetter(
      lines: DataFrame, jsonCol: String = "json"): (DataFrame, DataFrame) = {
    // from_json in PERMISSIVE mode yields a null-FIELDED struct on malformed
    // input, not a null struct — the corrupt-record column is the reliable
    // malformed-row signal
    val parseSchema = graft.schema.TripClick.rawSchema
      .add(StructField("_corrupt_record", StringType))
    val parsed = lines.select(
      col(jsonCol).as("raw"),
      from_json(col(jsonCol), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("data"))
    val corrupt = col("data._corrupt_record").isNotNull
    val good = curatedProjection(parsed.filter(
      !corrupt && col("data.dedup_key").isNotNull))
    val bad = parsed
      .filter(corrupt || col("data.dedup_key").isNull)
      .select(col("raw"),
        when(col("raw").isNull, "null_payload")
          .when(corrupt, "unparseable_json")
          .otherwise("missing_dedup_key").as("reject_reason"),
        current_timestamp().as("rejected_at"))
    (good, bad)
  }

  /** Producer-side dedup key, engine edition
    * (reference: ingestion/producer/producer_base.py:42-53 computes
    * xxhash64(session|document|ts).hexdigest() with md5 fallback).
    * We standardize on Spark's codegen'd xxhash64 rendered as hex — same
    * collision properties, no custom Expression needed. */
  def dedupKey(sessionId: Column, documentId: Column, eventTs: Column): Column =
    lower(hex(xxhash64(concat_ws("|", sessionId, documentId.cast(StringType), eventTs.cast(StringType)))))

  /** Legacy "/Date(1452038902000)/" → proper timestamp
    * (reference: ingestion/sample_data/session_based_splitter.py:24-34). */
  def parseLegacyDate(dateCreated: Column): Column =
    timestamp_millis(regexp_extract(dateCreated, "/Date\\((-?\\d+)\\)/", 1).cast(LongType))

  /** Deterministic batch dedup: keep the first row per key by (orderCol, tieBreak).
    * `dropDuplicates` keeps an arbitrary row — fine for streaming
    * effectively-once (reference: streaming_to_curated_stream.py:147-151), but
    * non-deterministic for batch replays; this variant is replay-stable.
    * Implemented as a window argmin, which Catalyst executes as a single
    * hash-partition shuffle on `keys` (no extra sort pass beyond the window). */
  def dedupFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
