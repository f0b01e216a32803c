package graft.schema

import org.apache.spark.sql.types._

/** Schemas for the clinical-search click-event domain.
  *
  * The raw event shape mirrors the reference's `TRIPCLICK_SCHEMA`
  * (reference: processing/spark/jobs/streaming_to_curated_stream.py:68-81,
  * batch_to_archive_raw.py:68-81) — declared once here instead of three times.
  */
object TripClick {

  /** Raw JSON event as produced upstream (one input type for the pipeline). */
  val rawSchema: StructType = StructType(Seq(
    StructField("DateCreated", StringType),          // legacy "/Date(epoch_ms)/"
    StructField("SessionId", StringType),
    StructField("DocumentId", IntegerType),
    StructField("Url", StringType),
    StructField("Title", StringType),
    StructField("DOI", StringType),
    StructField("Keywords", StringType),
    StructField("ClinicalAreas", StringType),        // comma-separated multi-value
    StructField("Documents", ArrayType(StringType)),
    StructField("event_ts", StringType),             // ISO-8601, producer-added
    StructField("event_date", StringType),           // YYYY-MM-DD partition col
    StructField("dedup_key", StringType)             // producer hash
  ))

  /** Curated layer: snake_case projection with typed event_ts
    * (reference: streaming_to_curated_stream.py:127-138). */
  val curatedSchema: StructType = StructType(Seq(
    StructField("session_id", StringType),
    StructField("document_id", IntegerType),
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("doi", StringType),
    StructField("keywords", StringType),
    StructField("clinical_areas", StringType),
    StructField("event_ts", TimestampType),
    StructField("event_date", StringType),
    StructField("dedup_key", StringType)
  ))

  /** Typed row for Dataset ergonomics in tests. */
  final case class CuratedEvent(
      session_id: String,
      document_id: java.lang.Integer,
      url: String,
      title: String,
      doi: String,
      keywords: String,
      clinical_areas: String,
      event_ts: java.sql.Timestamp,
      event_date: String,
      dedup_key: String)
}
