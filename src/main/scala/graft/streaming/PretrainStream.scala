package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructType}

import graft.functions.TextFunctions.normText
import graft.operators.TextOps

/** The pretraining prep chain ON the stream — the streaming twin of the
  * batch flagship (operators.TextOps.pretrainPipeline): documents
  * arriving on a firehose pass the SAME gates the batch plan runs —
  * C4-style quality gate, Gopher repetition gate, exact content dedup,
  * deterministic holdout coin, benchmark decontamination — and the
  * accepted corpus accumulates as an append-only table whose
  * per-language accounting equals the batch pipeline's, exactly.
  *
  * == Design: all state in committed deltas, none in the state store ==
  *
  * Every stage is either per-document (gates, coin, decontamination —
  * they reuse TextOps.cleanDocs / holdoutCoin / pretrainAccounting
  * verbatim, so batch/stream parity is by construction, not by
  * re-derivation) or keyed on the content hash (the dedup). The dedup's
  * "seen" set lives in the SAME staged-commit delta layout
  * IndexMaintainStream uses (`batch=<epoch>/{hashes,docs}` + `_COMMIT`
  * marker, atomic rename): each micro-batch anti-joins its cleaned docs
  * against the union of committed hash deltas, resolves within-batch
  * groups to the min doc_id (the batch pipeline's keeper rule), and
  * commits the epoch's new hashes and accepted docs in ONE atomic
  * delta. Re-delivery of a committed epoch is a no-op (the commit
  * marker short-circuits), a crash mid-write leaves an invisible
  * staging dir — exactly-once without any Spark state store, which is
  * also the 100 TB shape: the seen-set is a parquet table that scales
  * with distinct content, partitions like any other table, and is
  * shared by restarts instead of rebuilt into executor state.
  *
  * == Dedup semantics across the stream ==
  *
  * First arrival wins across micro-batches (the only semantics a
  * stream can implement — dedupContentStream's contract) and min
  * doc_id wins inside one micro-batch (the batch keeper rule). An
  * ingest ordered by doc_id therefore reproduces the batch keeper set
  * EXACTLY; an unordered ingest differs only in which member of a
  * duplicate group survives. Held-out keepers still commit their
  * content hash: the batch pipeline drops the whole duplicate group
  * when its keeper lands in the holdout bucket, so later arrivals of
  * the same content must be suppressed, not adopted.
  *
  * Ref: the reference's ingest is batch-wise
  * (core/etl_service.py:210-246); this module is the stream-native
  * generalization of its dedup-on-load applied to the LLM-pipeline
  * gate chain. */
object PretrainStream {

  private def hashSchema =
    new StructType().add("norm_hash", StringType, nullable = true)

  /** Union of committed seen-hash deltas (empty frame before the first
    * commit). */
  private def priorHashes(spark: SparkSession, root: String): DataFrame =
    try IndexMaintainStream.readTable(spark, root, "hashes")
    catch {
      case _: IllegalArgumentException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], hashSchema)
    }

  /** One micro-batch: gate, dedup against the committed seen-set,
    * holdout + decontaminate, commit the epoch delta atomically.
    * Returns false when the epoch was already committed (re-delivery).
    *
    * `contaminated` is the static frame of training doc ids flagged by
    * benchmark decontamination (dedup.Dedup.contamination) — passed in
    * pre-materialized so the per-epoch work is one small anti-join, not
    * a re-run of the contamination plan. */
  private[graft] def processBatch(delivered: DataFrame,
                                      contaminated: DataFrame,
                                      root: String,
                                      epoch: Long): Boolean = {
    val spark = delivered.sparkSession
    IndexMaintainStream.commitBatch(spark, root, s"batch=$epoch") { staging =>
      val clean = TextOps.cleanDocs(delivered)
        .withColumn("norm_hash", md5(normText(col("text"))))
      val firstSeen = clean.join(
        priorHashes(spark, root), Seq("norm_hash"), "left_anti")
      val byHash = Window.partitionBy(col("norm_hash")).orderBy(col("doc_id"))
      // Consumed twice (hashes + docs). Recomputation is deterministic —
      // row_number over (norm_hash, doc_id) is a total order — and the
      // micro-batch plan is gate-sized, so re-evaluating beats pinning
      // checkpoint blocks that would accumulate across epochs.
      val keepers = firstSeen
        .withColumn("rk", row_number().over(byHash))
        .filter(col("rk") === 1)
      keepers.select(col("norm_hash"))
        .write.parquet(s"$staging/hashes")
      keepers
        .filter(TextOps.holdoutCoin(col("doc_id")) =!= 15)
        .join(contaminated, col("doc_id") === col("train_doc_id"),
          "left_anti")
        .select(col("doc_id"), col("lang"), col("n_words"), col("text"))
        .write.parquet(s"$staging/docs")
    }
  }

  /** Start the firehose: `docs` is a streaming frame with at least
    * (doc_id, lang, text). The accepted corpus and the seen-hash set
    * accumulate under `root`. */
  def start(docs: DataFrame, contaminated: DataFrame,
            root: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        processBatch(batch, contaminated, root, epoch); ()
      }
      .start()

  /** The accepted corpus accumulated so far. */
  def acceptedDocs(spark: SparkSession, root: String): DataFrame =
    IndexMaintainStream.readTable(spark, root, "docs")

  /** Fold accumulated per-epoch deltas into one compacted run —
    * thousands of micro-batches otherwise mean thousands of small
    * files. Same crash-safe protocol as the index roots
    * (IndexMaintainStream.compact): the `cbatch=<covers>` run commits
    * atomically before covered deltas drop, so a reader (including the
    * NEXT micro-batch's priorHashes anti-join) never double-sees or
    * misses a hash, and dedup state survives compaction unchanged. */
  def compact(spark: SparkSession, root: String): Unit =
    IndexMaintainStream.compact(spark, root,
      Seq(("hashes", Some(col("norm_hash"))), ("docs", None)))

  /** Per-language accounting over the accepted corpus — the streaming
    * counterpart of pretrainPipeline's output (PretrainStreamSpec
    * proves exact equality on an ordered ingest, and pins the
    * unordered contract — first-arrival keeper, held-out keeper
    * suppression, one-doc-per-hash — against an independent replay of
    * a shuffled ingest). */
  def accounting(spark: SparkSession, root: String): DataFrame =
    TextOps.pretrainAccounting(acceptedDocs(spark, root))
}
