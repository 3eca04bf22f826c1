package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-lake writer — the layout a 100 TB deployment of the
  * reference's load step lands on (the reference loads into SQLite
  * tables, /root/reference/core/database.py; at scale the equivalent is
  * hive-partitioned parquet so readers prune by partition key).
  *
  * Writes are `partitionBy` on a derived low-cardinality key (e.g.
  * month); readers filtering that key scan only matching directories —
  * LakeSinkSpec asserts the pruned plan. `maxRecordsPerFile` bounds
  * file sizes so a skewed partition still splits.
  */
object LakeSink {

  /** Write a frame hive-partitioned by a derived month column. */
  def writeMonthlyPartitioned(df: DataFrame, tsCol: String,
                              path: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode("overwrite")
      .partitionBy("part_month")
      .option("maxRecordsPerFile", 5000000)
      .parquet(path)

  /** Read back with a partition filter (prunes directories, not rows). */
  def readMonth(spark: SparkSession, path: String, month: String): DataFrame =
    spark.read.parquet(path).filter(col("part_month") === month)

  /** Append a micro-batch to the monthly-partitioned lake — the
    * foreachBatch landing write of a CONTINUOUS ingestion job. Each
    * batch appends its own files (small by nature of micro-batching);
    * [[compactPartition]] is the paired maintenance op that folds them
    * back to scan-friendly sizes. Only partitions the batch touches
    * gain files — cold months never churn. */
  def appendMonthlyPartitioned(df: DataFrame, tsCol: String,
                               path: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode("append")
      .partitionBy("part_month")
      .option("maxRecordsPerFile", 5000000)
      .parquet(path)

  /** In-place compaction of ONE lake partition directory — the unit of
    * the continuous maintenance loop (compact the partitions whose
    * file count crossed a threshold; recent partitions churn, old ones
    * are never rewritten). Rewrites through a staging directory, then
    * swaps via rename-to-backup → rename-staging-in → drop-backup: at
    * every crash point the full data exists as the live dir, the
    * backup, or the completed staging copy — there is no
    * delete-before-replace window that could lose the partition. On
    * entry, if a prior run died between the two renames (live dir
    * absent), the partition is recovered FIRST — roll forward to the
    * completed staging copy, else roll back to the backup — and only
    * then are leftovers deleted; deleting them while the live dir is
    * absent would destroy the only surviving copy.
    * Returns (files_before, files_after); after a roll-FORWARD
    * recovery, files_before describes the recovered (already
    * compacted) partition — the pre-crash state no longer exists to
    * count, so before==after is the expected signature of a
    * crash-recovered no-op pass.
    * File-count sizing derives from input bytes like [[compact]]. */
  def compactPartition(spark: SparkSession, lakePath: String, month: String,
                       targetFileMB: Int = 128): (Int, Int) = {
    var before = 0
    stagedRewrite(spark, lakePath, month) { (fs, dir, staging) =>
      before = fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet"))
      val df = spark.read.parquet(dir.toString)
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val nFiles = math.max(1, (bytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
      df.repartition(nFiles).write.mode("overwrite").parquet(staging.toString)
    }
    val dir = new org.apache.hadoop.fs.Path(s"$lakePath/part_month=$month")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val after = fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet"))
    (before, after)
  }

  /** Load-batch rollback of ONE lake partition — the reference's
    * undo-ETL-job semantics (/root/reference/core/app.py:1403
    * undo_etl_job deletes every record a load batch imported) on the
    * partitioned lake: rewrite the partition WITHOUT the undone batch's
    * rows, atomically through the same staged swap as
    * [[compactPartition]] (every crash point leaves the full data as
    * live dir, backup, or completed staging). `batchCol` is the load-id
    * column the ingestion writes (the lake twin of etl_metadata's
    * file/job lineage). Returns (rows_deleted, rows_kept). */
  def undoBatch(spark: SparkSession, lakePath: String, month: String,
                batchCol: String, batchId: String): (Long, Long) = {
    var deleted = 0L
    var kept = 0L
    stagedRewrite(spark, lakePath, month) { (_, dir, staging) =>
      val df = spark.read.parquet(dir.toString)
      val total = df.count()
      df.filter(col(batchCol) =!= batchId || col(batchCol).isNull)
        .write.mode("overwrite").parquet(staging.toString)
      kept = spark.read.parquet(staging.toString).count() // footer-only
      deleted = total - kept
    }
    (deleted, kept)
  }

  /** Staged atomic rewrite of one partition dir, shared by compaction
    * and batch rollback: recover any prior mid-swap crash, clear
    * leftovers, run `write` into the staging dir, then swap via
    * rename-to-backup → rename-staging-in → drop-backup. */
  private def stagedRewrite(spark: SparkSession, lakePath: String,
      month: String)(write: (org.apache.hadoop.fs.FileSystem,
        org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path) => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(s"$lakePath/part_month=$month")
    val staging = new Path(s"$lakePath/.compact_tmp_part_month=$month")
    val backup = new Path(s"$lakePath/.compact_bak_part_month=$month")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) {
      // a prior run crashed after rename(dir→backup): the staging copy
      // (written fully before that rename) is the roll-forward target,
      // the backup the roll-back target — one of them IS the partition
      if (fs.exists(staging) && fs.rename(staging, dir)) {
        // rolled forward to the completed rewritten copy
      } else if (fs.exists(backup) && fs.rename(backup, dir)) {
        // rolled back to the pre-rewrite data
      } else {
        throw new java.io.IOException(
          s"stagedRewrite: $dir absent and no recoverable staging/" +
          s"backup copy found — refusing to proceed")
      }
    }
    // live dir is present — now stale leftovers are safe to clear
    fs.delete(staging, true)
    fs.delete(backup, true)
    write(fs, dir, staging)
    if (!fs.rename(dir, backup) || !fs.rename(staging, dir)) {
      // roll forward/back is manual at this point; never drop data
      throw new java.io.IOException(
        s"stagedRewrite: rename failed for $dir (backup at $backup)")
    }
    fs.delete(backup, true)
  }

  /** Compact a directory of many small files into ~`targetFileMB`-sized
    * parquet files — the maintenance op every streaming/incremental lake
    * ingestion needs (micro-batches produce small files; scans slow down
    * with per-file overhead). Sizing derives from the input bytes, not a
    * fixed partition count, so it holds at any scale. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileMB: Int = 128): Unit = {
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1,
      (bytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
    df.repartition(nFiles).write.mode("overwrite").parquet(outPath)
  }

  /** Range-cluster a frame so each output file covers a DISJOINT slice
    * of the cluster key: repartitionByRange assigns rows to ordered
    * range buckets and sortWithinPartitions orders them inside each
    * file. Parquet then records tight per-row-group min/max for the
    * key, so any reader's predicate pushdown (Spark's row-group
    * filtering included) skips every file and row group whose range
    * cannot match — sort-based data skipping, the single biggest scan
    * lever after partition pruning at 100 TB (ZORDER-lite for one key
    * dimension). LakeSinkSpec proves the per-file key ranges are
    * pairwise disjoint. */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
                     keys: org.apache.spark.sql.Column*): Unit =
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite")
      // 32 MB row groups instead of parquet's 128 MB default: the
      // writer buffers a FULL row group of values on the heap per open
      // file (each string held as its own Binary object, ~3× the
      // encoded bytes), so a wide fan-in of concurrent clustered
      // writers at the default block size OOM'd a 64 g driver at the
      // 600M-key ladder rung — 4× smaller groups bound that heap at
      // any concurrency. Smaller groups also mean FINER min/max
      // skipping for the serves that read these tables (the IN-literal
      // verify prunes per row group), at the cost of a slightly larger
      // footer — the right trade for key-clustered state tables.
      .option("parquet.block.size", 32L * 1024 * 1024)
      .parquet(path)

  /** Z-ORDER clustered write — multi-dimensional data skipping
    * (round 5). `writeClustered` gives one key tight per-file ranges but
    * leaves a second predicate column scattered across every file; a
    * Z-curve interleaves the BITS of both columns' rank positions so
    * file locality follows BOTH dimensions at once — per-file bounding
    * boxes shrink in x AND y, and a reader's min/max pushdown on either
    * column (or both) skips most files. This is the layout Delta/Iceberg
    * expose as ZORDER BY, built from Spark primitives.
    *
    * Shape: each column maps to an 8-bit equi-depth rank via its own
    * approx-percentile cutoff table (a lazy 1-row aggregate broadcast
    * into a codegen'd cutoff fold — NO global sort to learn ranks),
    * the two ranks bit-interleave into the 16-bit z-key with shift/or
    * expressions (pure codegen), and the write is range-partitioned +
    * sorted on the z-key exactly like writeClustered. Cost is identical
    * to single-key clustering: one narrow aggregate + one range
    * exchange. LakeSinkSpec proves per-file bounding-box area shrinks
    * vs the single-key layout and that both-column predicates touch a
    * strict subset of files. */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
                    colA: String, colB: String): Unit = {
    import org.apache.spark.sql.Column
    val bits = 8 // 256 rank buckets per dimension — enough to order
                 // files (a file covers many buckets); more bits would
                 // only grow the per-row cutoff fold below
    val nb = 1 << bits
    // per-column monotone EQUI-DEPTH rank (robust to skew, unlike
    // equi-width on the raw value): approx-percentile cutoffs — a lazy
    // 1-row mergeable-sketch aggregate (bounded model parameter, same
    // contract as the k-means/PQ codebooks) — broadcast as a literal
    // array into a codegen'd fold counting cutoffs below the value
    def rank(c: String): Column = {
      val cuts = df.agg(
        expr(s"approx_percentile($c, array(${
          (1 until nb).map(i => f"${i.toDouble / nb}%.6f").mkString(",")
        }), 1000)")).head.getSeq[Any](0)
      val arr = array(cuts.map(v => lit(v)): _*)
      aggregate(arr, lit(0),
        (acc, cut) => acc + when(col(c) > cut, 1).otherwise(0))
        .cast("long")
    }
    val ra = rank(colA)
    val rb = rank(colB)
    // bit-interleave: z = Σ ((a>>i & 1) << 2i) | ((b>>i & 1) << 2i+1)
    val z = (0 until bits).map { i =>
      (shiftleft(shiftright(ra, i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(shiftright(rb, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    df.withColumn("__zkey", z)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Write a frame as a bucketed table: rows are hash-clustered and
    * sorted by the join key at write time, so repeated joins/aggs on
    * that key run with NO shuffle — the co-location layout recurring
    * 100 TB joins should land on. (Bucketed tables require the catalog,
    * hence saveAsTable; `path` keeps the data out of the default
    * warehouse.) */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
