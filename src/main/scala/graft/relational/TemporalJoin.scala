package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for: as-of join (each left
  * row matched to the single most recent right row at-or-before its
  * timestamp) and banded range join (point-in-interval with an equi key).
  *
  * Reference scope note: the reference pipeline (SURVEY.md §2.4) contains
  * exactly one join, a left equi-join — these are engine-hardening extras
  * from SURVEY.md §2.5's "missing from the reference" list.
  *
  * Scale doctrine — why NOT the naive formulations:
  *  - naive as-of = join on key + time inequality, then argmax per left row.
  *    The inequality join is a conditional cross product per key: a key with
  *    L left and R right rows produces O(L·R) intermediate rows before the
  *    argmax throws almost all of them away. The union+window formulation
  *    below shuffles each row exactly ONCE (on the key), sorts within the
  *    partition, and carries O(1) running state (`last` over an unbounded-
  *    preceding frame) — linear at any per-key density.
  *  - naive range join = key equi-join + BETWEEN filter: same conditional
  *    cross product per key. Banding decomposes the time axis into
  *    fixed-width bands, explodes each interval to the bands it covers,
  *    and equi-joins on (key, band) — so only rows in the same band ever
  *    meet. A point lies in exactly one band, so no post-join dedup.
  */
object TemporalJoin {

  /** As-of join: for each left row, the most recent right row with the same
    * key and `rightTime <= leftTime` (`strict = true` ⇒ strictly earlier).
    * Left rows with no eligible right row get nulls (left-outer semantics).
    * Output: every left column, then each `rightPayload` column and
    * `rightTime` prefixed with `rightPrefix`.
    *
    * Ties on `rightTime` within a key are broken by `rightTieBreak`
    * (largest wins), making the result deterministic even where a native
    * ASOF operator would be free to pick either row.
    *
    * Physical shape: both sides tagged and unioned, ONE shuffle on the key,
    * one intra-partition sort by (time, side, tie-break), a running
    * `last(payload, ignoreNulls)` window, then keep the left rows — the left
    * row rides through the union as a struct, so there is no re-join.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightPrefix: String = "asof_",
      strict: Boolean = false,
      rightTieBreak: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val payloadCols = (rightPayload :+ rightTime).distinct
    val payloadT = struct(payloadCols.map(c => col(c).as(c)): _*)
    val leftRowT = struct(left.columns.map(c => col(c).as(c)): _*)
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    val leftRowType = StructType(left.schema.fields)
    // side ordering at equal timestamps decides inclusivity: right rows sort
    // BEFORE left at the same instant (0 < 1) ⇒ visible ⇒ inclusive (<=);
    // strict flips the tags so an equal-time right row sorts after the left
    // row and is not yet visible to it
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)
    // the tie column keeps its NATIVE type (casting a string id to long
    // would null it out and silently lose determinism); it only ever
    // disambiguates right rows among themselves — left vs right order at
    // equal time is decided by __side alone, so the left side's tie value
    // is irrelevant and a typed null suffices
    val tieType = rightTieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val rightSide = right.select(
      col(key).as("__k"),
      col(rightTime).as("__t"),
      lit(rightTag).as("__side"),
      rightTieBreak.map(col).getOrElse(lit(0L)).cast(tieType).as("__tie"),
      payloadT.as("__payload"),
      lit(null).cast(leftRowType).as("__lrow"))
    val leftSide = left.select(
      col(key).as("__k"),
      col(leftTime).as("__t"),
      lit(leftTag).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payloadType).as("__payload"),
      leftRowT.as("__lrow"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rightSide.unionByName(leftSide)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__lrow").isNotNull)
    val withLeft = left.columns.foldLeft(matched) { (df, c) =>
      df.withColumn(c, col("__lrow").getField(c))
    }
    payloadCols.foldLeft(withLeft) { (df, c) =>
      df.withColumn(rightPrefix + c, col("__match").getField(c))
    }.drop("__k", "__t", "__side", "__tie", "__payload", "__lrow", "__match")
  }

  /** Banded range join: pairs (point, interval) with the same key and
    * `startCol < pointTime <= endCol` (half-open, end-inclusive — "events in
    * the hour AFTER the trigger").
    *
    * Each interval explodes to the bands it covers (ceil(length/band)+1
    * copies); each point maps to exactly one band, so every qualifying pair
    * is produced exactly once and no `distinct` is needed. Pick
    * `bandSeconds` ≈ typical interval length: shorter bands → more interval
    * copies, longer bands → more non-qualifying same-band pairs filtered
    * after the join.
    */
  def bandedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointTime: String,
      startCol: String,
      endCol: String,
      bandSeconds: Long = 3600L): DataFrame = {
    require(bandSeconds > 0)
    def band(t: Column): Column = floor(unix_timestamp(t) / bandSeconds).cast("long")
    val p = points.withColumn("__band", band(col(pointTime)))
    val iv = intervals
      .withColumn("__band", explode(sequence(band(col(startCol)), band(col(endCol)))))
    p.join(iv, Seq(key, "__band"))
      .filter(col(pointTime) > col(startCol) && col(pointTime) <= col(endCol))
      .drop("__band")
  }
}
