package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-provided parquet tables at a scale-factor
  * directory (TESTDATA.md). One parquet file per table; Spark's vectorized
  * parquet reader + partition-discovering file index handle the rest.
  *
  * At cluster scale the same call works on a multi-file / partitioned layout —
  * nothing here assumes a single file.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = apply(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame  = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
