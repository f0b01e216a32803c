package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Change-data-capture primitives a batch pipeline grows into once sources
  * start re-delivering data: snapshot diffing (what changed between two
  * loads?) and SCD type-2 interval builds (when was each value current?).
  * Both are single-shuffle shapes — CDC must not cost more than the load
  * it audits.
  */
object ChangeCapture {

  /** Classify rows between two keyed snapshots as added / deleted / changed
    * with ONE full outer join on the key. Row content is compared via md5
    * over the named compare columns (null-safe, '|'-delimited), so wide rows
    * shuffle a fixed-size digest instead of their bodies; unchanged rows
    * drop out of the result entirely.
    *
    * `compareCols` should hold stably-printable types (strings, integers,
    * dates) — floating-point rendering is engine-specific, so hash a
    * rounded decimal cast rather than a raw double.
    *
    * The digest is injective over the row: cell values backslash-escape the
    * delimiter ('|' → '\|', '\' → '\\') so a '|' inside a value cannot
    * shift column boundaries, and NULL encodes as the sentinel '\N' (which
    * a real "\N" value escapes away from), so NULL ≠ empty string.
    *
    * Output: keyCols*, old_hash, new_hash, change_type. */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    def cell(c: String) = coalesce(
      replace(replace(col(c).cast(StringType), lit("\\"), lit("\\\\")),
        lit("|"), lit("\\|")),
      lit("\\N"))
    def hashed(df: DataFrame, as: String): DataFrame =
      df.select(keyCols.map(col) :+
        md5(concat_ws("|", compareCols.map(cell): _*)).as(as): _*)
    hashed(oldSnap, "old_hash")
      .join(hashed(newSnap, "new_hash"), keyCols, "full_outer")
      .withColumn("change_type",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "deleted")
          .when(col("old_hash") =!= col("new_hash"), "changed"))
      .filter(col("change_type").isNotNull)
  }

  /** SCD type-2 interval build from an event stream: collapse each key's
    * history into one row per RUN of equal attribute values — valid_from =
    * first timestamp of the run, valid_to = start of the next run (null =
    * still current).
    *
    * Two windows over the SAME (key, ts) partitioning — Catalyst plans one
    * shuffle + one sort for both (lag marks change points, lead closes the
    * intervals after the filter). State per key is its event history slice,
    * never global. Ordering must be unambiguous: pass a tie-free tsCol or
    * pre-dedup equal timestamps.
    *
    * Output: key, attr, valid_from, valid_to, is_current. */
  def scd2Intervals(
      events: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    // first row per key via row_number, NOT "lag is null": a null attr value
    // also makes lag null, and a run of nulls must still collapse to one row
    val changePoints = events
      .select(col(keyCol), col(attrCol), col(tsCol))
      .withColumn("__rn", row_number().over(byKey))
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    changePoints
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("is_current"))
  }
}
