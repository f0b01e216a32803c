package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Sketches

/** Rendezvous (highest-random-weight) hashing: assign each key to the shard
  * with the highest hash(shard, key) score.
  *
  * The property that matters at scale — and that modulo sharding lacks —
  * is MINIMAL DISRUPTION: removing a shard reassigns exactly the keys that
  * lived on it (their other shards' scores are untouched, so every other
  * key keeps its argmax; RendezvousSpec pins this). That is what makes it
  * the standard assignment for shard maps, consistent cache routing, and
  * sticky task placement.
  *
  * Physical shape: a pure projection — the per-shard scores are an inlined
  * struct array, argmax is `array_max`'s lexicographic struct ordering
  * (score, then shard name for ties). No shuffle, no join, no state;
  * engine-portable via the md5 hash, so an assignment computed here and one
  * computed by an external router agree key-for-key.
  */
object Rendezvous {

  /** Winning shard for `key` among `shards`. */
  def assign(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty, "rendezvous needs at least one shard")
    val scored = shards.map { s =>
      struct(
        Sketches.hash60(concat(lit(s + "|"), key.cast("string"))).as("score"),
        lit(s).as("shard"))
    }
    array_max(array(scored: _*)).getField("shard")
  }

  /** Key → shard assignment frame. Output: keyCol, shard. */
  def assignments(df: DataFrame, keyCol: String, shards: Seq[String]): DataFrame =
    df.select(col(keyCol), assign(col(keyCol), shards).as("shard"))
}
