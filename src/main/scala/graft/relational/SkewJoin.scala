package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join splitting (on by default) handles most skew at runtime;
  * this explicit salt is the fallback for the pathologies AQE can't fix —
  * a single hot key whose post-split partitions still overwhelm executors,
  * or a skewed BROADCAST-ineligible dimension. Standard construction:
  * the big side gets a deterministic salt in [0, saltFactor); the small side
  * is replicated saltFactor times; the join key becomes (key, salt), so one
  * hot key spreads over saltFactor reducers.
  *
  * Cost model: small side grows saltFactor×; big side shuffle unchanged in
  * bytes but uniform in distribution. Pick saltFactor ≈ (hot-key rows /
  * target-partition rows).
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would preserve each unmatched small-side REPLICA,
    // emitting saltFactor copies of it — only big-side-preserving joins are
    // sound under small-side replication
    require(Set("inner", "left", "left_outer", "cross").contains(joinType.toLowerCase),
      s"saltedEquiJoin supports big-side-preserving joins only, got $joinType")
    // xxhash64 over the whole row is deterministic and spreads better than
    // monotonically_increasing_id (which is partition-correlated)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Correctness gate for [[saltedEquiJoin]] (q115): revenue per supplier
    * nation computed THROUGH the salted join. The salt must be invisible in
    * the result — an inner salted join produces exactly the plain join's
    * rows — so the DuckDB oracle is the unsalted SQL join, and the green
    * hash-match row proves salt-and-replicate is lossless end to end
    * (the no-duplicate/no-drop property the OpsSpec asserts in-memory,
    * proven here against an external engine on real tables). */
  def saltedSupplierRevenue(
      lineitem: DataFrame,
      supplier: DataFrame,
      saltFactor: Int = 8): DataFrame = {
    val small = supplier.select(
      col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    saltedEquiJoin(lineitem, small, "l_suppkey", saltFactor)
      .groupBy("s_nationkey")
      .agg(Relational.moneySum(Relational.revenue).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy("s_nationkey")
  }

  /** KEY-SKEW ADVISOR: the measurement that decides whether
    * [[saltedEquiJoin]] (or AQE skew handling) is worth engaging on a
    * key — rows-per-key max vs p50/p99, and the salt factor that would
    * level the hottest key down to a p99-sized partition share.
    *
    * Scale shape: one map-side-combinable count per key, then every
    * statistic runs over the |keys|-sized count frame (exact
    * percentiles — swap approx_percentile in at extreme key
    * cardinality, same plumbing). ceil on an IEEE divide of exact
    * counts; clamped to [1, 32].
    *
    * Output (1 row): n_rows, n_keys, max_per_key, p50, p99, skew_ratio
    * (round 6), suggested_salt. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    counts.agg(
        sum("c").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("c").as("max_per_key"),
        percentile(col("c"), array(lit(0.5), lit(0.99))).as("q"))
      .select(col("n_rows"), col("n_keys"), col("max_per_key"),
        round(element_at(col("q"), 1), 6).as("p50"),
        round(element_at(col("q"), 2), 6).as("p99"))
      .withColumn("skew_ratio",
        when(col("p50") > 0,
          round(col("max_per_key").cast(DoubleType) / col("p50"), 6)))
      .withColumn("suggested_salt",
        least(lit(32), greatest(lit(1),
          ceil(col("max_per_key").cast(DoubleType) / greatest(col("p99"), lit(1.0)))
            .cast(IntegerType))))
  }
}
