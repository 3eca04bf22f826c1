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
    * order is irrelevant — version must be totally ordered per key).
    *
    * Commit protocol (the LakeSink.stagedRewrite contract): write the
    * merged table to a staging dir, then swap via rename(dst→backup) →
    * rename(staging→dst) → drop backup. At EVERY crash point the full
    * table exists as dst, the backup, or the completed staging copy —
    * there is no delete-before-replace window. On entry, a prior
    * mid-swap crash (dst absent) is recovered FIRST: roll forward to a
    * staging copy that finished (its _SUCCESS marker exists — an
    * incomplete write never has one), else roll back to the backup.
    * Because the merge itself is an idempotent upsert, a re-delivered
    * micro-batch after any such restart lands exactly-once —
    * UpsertSinkSpec drives each crash state. */
  def mergeBatch(spark: SparkSession, tablePath: String, updates: DataFrame,
                 keyCol: String, versionCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(tablePath)
    val staging = new Path(tablePath + "_staging")
    val backup = new Path(tablePath + "_bak")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst)) {
      // crashed between the two renames (or before the first batch —
      // then neither recovery source exists and the table is empty)
      if (fs.exists(new Path(staging, "_SUCCESS")) && fs.rename(staging, dst)) {
        // rolled forward to the completed merged copy
      } else if (fs.exists(backup) && fs.rename(backup, dst)) {
        // rolled back to the pre-merge table
      }
    }
    // dst (if any) is live — stale leftovers are now safe to clear
    fs.delete(staging, true)
    fs.delete(backup, true)
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
    merged.write.mode("overwrite").parquet(staging.toString)
    merged.unpersist()
    if (fs.exists(dst) && !fs.rename(dst, backup)) {
      throw new java.io.IOException(
        s"mergeBatch: rename($dst -> $backup) failed — table untouched")
    }
    if (!fs.rename(staging, dst)) {
      // dst is absent but staging is COMPLETE (_SUCCESS written) and
      // backup holds the previous table — the entry recovery above
      // repairs this state on the next batch; never drop data here
      throw new java.io.IOException(
        s"mergeBatch: rename($staging -> $dst) failed (backup at $backup)")
    }
    fs.delete(backup, true)
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
