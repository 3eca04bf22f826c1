package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Every operator reads through here so the scan layer stays in one place:
  * at 100 TB these become partitioned/bucketed catalog tables and this is
  * the only file that changes. Column pruning + predicate pushdown are
  * preserved because we hand back the raw `DataFrameReader` result and let
  * Catalyst prune from the final plan.
  */
object Tables {
  @inline private def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = rd(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = rd(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = rd(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = rd(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = rd(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = rd(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = rd(spark, dir, "lineitem")

  /** events.parquet carries TIMESTAMP(NANOS), which the vectorized parquet
    * reader rejects. Read the raw int64 nanos (legacy conf, runtime-settable)
    * and surface a regular microsecond TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rd(spark, dir, "events").withColumn(
      "ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "embeddings")
}
