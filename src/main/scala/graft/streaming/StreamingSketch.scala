package graft.streaming

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analysis.Sketches

/** Streaming twin of the KMV distinct-count sketch ([[Sketches]]): a
  * per-group bottom-k state maintained across micro-batches with
  * `mapGroupsWithState`, emitting an updated estimate per group per batch.
  *
  * The state IS the batch aggregator's buffer (same sorted-distinct
  * Array[Long], same reduce), so the streaming estimate after any prefix of
  * batches equals the batch estimate over the union of those batches —
  * sketch mergeability is what makes the hot/cold split reconcilable
  * (StreamingSketchSpec asserts the equality). State per key is O(k)
  * forever: the stream can run unbounded without state growth, which is the
  * whole point versus exact streaming distinct counts whose state grows
  * with cardinality.
  */
object StreamingSketch {

  final case class KeyedValue(group: String, value: String)
  final case class Estimate(group: String, sketch_size: Int, est_distinct: Double)

  /** Same 60-bit md5 hash as [[Sketches.hash60]] (first 15 hex chars), so
    * streaming and batch sketches are bit-identical. */
  def hash60(value: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(value.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    new BigInteger(hex, 16).longValue()
  }

  def estimateOf(buf: Array[Long], k: Int): Double =
    if (buf.length < k) buf.length.toDouble
    else {
      val raw = (k - 1).toDouble * Sketches.HashSpace / buf(k - 1).toDouble
      // HALF_UP like Spark's round(), so streaming == batch to the digit
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  /** Per-group distinct estimates, updated every micro-batch. */
  def distinctEstimates(
      input: Dataset[KeyedValue], k: Int = 64): Dataset[Estimate] = {
    import input.sparkSession.implicits._
    val agg = new Sketches.BottomK(k)
    input
      .groupByKey(_.group)
      .mapGroupsWithState[Array[Long], Estimate](GroupStateTimeout.NoTimeout())(
        (group, values, state: GroupState[Array[Long]]) => {
          val buf = values.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, v) => agg.reduce(b, hash60(v.value))
          }
          state.update(buf)
          Estimate(group, buf.length, estimateOf(buf, k))
        })
  }
}
