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

  /** events.parquet's `ts` physical type varies by generator version:
    * TIMESTAMP(NANOS) (which the vectorized reader rejects — read as raw
    * int64 via the legacy conf and rescale), TIMESTAMP_NTZ, or plain
    * microsecond TIMESTAMP. Branch on the actual file schema so every
    * generation surfaces the same session-zone microsecond TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = rd(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "embeddings")
}
