package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Data-quality profiling: the audit pass a pipeline runs on every new
  * batch before trusting it (null explosions, cardinality collapses, and
  * range drift are the three classic upstream-breakage signals).
  */
object Profiling {

  /** One-pass column profile: per column — null count, distinct count, min,
    * max. ALL columns profile in a single aggregate job (4 × #cols partial
    * aggregates, map-side combined; the exact distinct counts make it one
    * shuffle per column internally — swap `approx_count_distinct` in at
    * 100 TB, same switch as the marts). The single result row is collected
    * and melted driver-side: #cols × 4 scalars, not data.
    *
    * min/max are surfaced as strings for a uniform schema; pre-cast columns
    * whose native string rendering is engine-ambiguous (raw doubles) to
    * DECIMAL/DATE in the caller.
    *
    * Output: column_name, n_nulls, n_distinct, min_value, max_value. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    // spread first: the multi-distinct aggregate plans an Expand ×(k+1)
    // before the partial aggregate, so its CPU cost is (k+1)× the scan —
    // and a small single parquet file arrives as ONE split, pinning all of
    // it to one core (measured 4×+ on a 32-core local run). On a real
    // cluster the input arrives in many splits and this rebalance is one
    // narrow-row shuffle; same rule as the sketch pipelines.
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast(StringType).as(s"${c}__min"),
        max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    val row = spread.agg(aggs.head, aggs.tail: _*).collect().head
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      (c, row.getAs[Long](s"${c}__nulls"), row.getAs[Long](s"${c}__distinct"),
        row.getAs[String](s"${c}__min"), row.getAs[String](s"${c}__max"))
    }.toDF("column_name", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
