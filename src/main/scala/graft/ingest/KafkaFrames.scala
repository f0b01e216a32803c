package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kafka frame conversions.
  *
  * [[toProducerFrame]] is the engine edition of the reference's Python
  * producer (reference: ingestion/producer/producer.py:151-155 — key =
  * SessionId, value = JSON of the full event): a pure transform to the
  * 〈key, value〉 binary schema Spark's Kafka sink expects, so the write is
  * `toProducerFrame(df).write.format("kafka")…` batch or streaming. Keying
  * by session preserves the reference's per-session ordering guarantee
  * (one session → one partition).
  */
object KafkaFrames {

  def toProducerFrame(events: DataFrame, keyCol: String = "session_id"): DataFrame =
    events.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(events.columns.map(col): _*)).as("value"))

  /** Inverse for tests: parse a produced frame back through the normalizer
    * (value is the raw-event JSON). */
  def roundTrip(producerFrame: DataFrame): DataFrame =
    Normalizer.fromJsonLines(
      producerFrame.select(col("value").cast("string").as("json")))
}
