package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ORC source/sink parity — the lake's second columnar format.
  *
  * The reference is format-agnostic above its loader (SQLite rows in,
  * SQL out); a 100 TB lake is not: upstream producers hand over ORC as
  * often as parquet (Hive-centric estates), and a complete engine reads
  * both without a conversion pass. Spark's built-in ORC source (native
  * vectorized reader) gives the same scan properties the parquet path
  * is spec-locked to: column pruning, predicate pushdown into stripe/
  * row-group indexes, splittable files, partition-dir pruning.
  *
  * Scale notes: `spark.sql.orc.impl=native` (default) keeps the scan
  * vectorized and codegen-friendly; pushdown reaches the ORC
  * min/max/bloom stripe indexes exactly like parquet footers
  * (OrcSourceSpec asserts PushedFilters on the physical scan). Writes
  * honor `maxRecordsPerFile` and hive partitioning the same as
  * sinks.LakeSink's parquet path — the two formats are interchangeable
  * behind the Tables facade.
  */
object OrcSource {

  /** Read an ORC dataset (schema from file footers — one driver-side
    * metadata read, no data pass). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write a frame as ORC, optionally hive-partitioned (mirrors
    * LakeSink.writeMonthlyPartitioned's layout so readers prune
    * directories identically). */
  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", 5000000)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }

  /** Convert a parquet dataset to ORC in one distributed pass (the
    * onboarding path for an ORC-consuming estate; no driver bottleneck
    * — scan → write, map-only). */
  def fromParquet(spark: SparkSession, parquetPath: String,
                  orcPath: String): Unit =
    write(spark.read.parquet(parquetPath), orcPath)
}
