package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming upsert sink: foreachBatch merge-by-key into a parquet
  * table — the stream-native form of the reference's load step
  * (/root/reference/core/database_adapter.py upsert_dataframe: new key
  * → insert, existing key → update with the newer record).
  *
  * Each micro-batch unions the current table with the batch and keeps
  * the newest version per key (row_number over version desc). Writes go
  * to a staging path first, then swap — a reader never sees a partial
  * table. At scale the same merge runs against a partitioned lake table
  * with dynamic partition overwrite so only touched partitions rewrite.
  */
object UpsertSink {

  /** Merge `updates` into the table at `tablePath` keyed by `keyCol`,
    * newest `versionCol` wins (ties: larger version col then input
    * order is irrelevant — version must be totally ordered per key). */
  def mergeBatch(spark: SparkSession, tablePath: String, updates: DataFrame,
                 keyCol: String, versionCol: String): Unit = {
    val existing =
      try spark.read.parquet(tablePath)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], updates.schema) }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc)
    val merged = existing.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .cache() // fully materialize before overwriting the source path
    merged.count()
    val staging = tablePath + "_staging"
    merged.write.mode("overwrite").parquet(staging)
    merged.unpersist()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(tablePath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
  }

  /** Attach the upsert sink to a stream: one merge per micro-batch. */
  def start(stream: DataFrame, tablePath: String,
            keyCol: String, versionCol: String) =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, tablePath, batch, keyCol, versionCol)
      }
      .start()
}
