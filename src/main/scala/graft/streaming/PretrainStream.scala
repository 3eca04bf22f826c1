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
  * IndexMaintainStream uses (`batch=<epoch>/{hashes,docs,bloom}` +
  * `_COMMIT` marker, atomic rename): each micro-batch dedups its
  * cleaned docs against the committed hash deltas, resolves
  * within-batch groups to the min doc_id (the batch pipeline's keeper
  * rule), and commits the epoch's new hashes, accepted docs, AND a
  * bloom sketch of the new hashes in ONE atomic delta. Re-delivery of
  * a committed epoch is a no-op (the commit marker short-circuits), a
  * crash mid-write leaves an invisible staging dir — exactly-once
  * without any Spark state store, which is also the 100 TB shape: the
  * seen-set is a parquet table that scales with distinct content,
  * partitions like any other table, and is shared by restarts instead
  * of rebuilt into executor state.
  *
  * == Per-epoch cost: O(batch), not O(state) ==
  *
  * The naive per-batch dedup — `batch LEFT ANTI JOIN all committed
  * hashes` — SHUFFLES the full seen-set every epoch (left-anti cannot
  * broadcast its left side), so per-epoch wall grows linearly with
  * committed state and total ingest cost is QUADRATIC in corpus size
  * (tools.StreamLadder measures exactly this). Instead, each delta
  * carries a bloom sidecar over its OWN new hashes (Spark's mergeable
  * BloomFilterAggregate, the dedup_bloom_incremental precedent), and a
  * micro-batch runs:
  *
  *   1. probe — a map-only pass flags batch rows whose hash ANY
  *      visible delta's bloom maybe-contains. Blooms have no false
  *      negatives, so unflagged rows are DEFINITELY new; in the
  *      steady-state firehose (mostly novel content) the flagged
  *      sliver is dup-rate + FPP of the batch.
  *   2. verify — only flagged hashes meet the state exactly: pushed as
  *      IN-literals into the hash-clustered compacted run when few
  *      (row-group min/max skip the rest of the scan — the
  *      SearchIndex literal-pushdown precedent), or a broadcast semi
  *      join (state scanned map-side, never shuffled) past the
  *      literal cap. Zero flagged rows skip the state read entirely.
  *   3. the confirmed-dup hash set (≤ flagged, tiny) broadcast
  *      anti-joins the batch — false positives are removed, so the
  *      output is EXACTLY the naive path's (`pregate = false` keeps
  *      that path runnable; PretrainStreamSpec proves equality).
  *
  * Deltas are immutable once committed, so each sidecar's
  * deserialized filter is cached EXECUTOR-side by path
  * (graft_bloom_probe → BloomFileCache): the plan carries only path
  * literals, the driver never touches filter bytes at probe time, and
  * a mature root's filter loads once per executor lifetime — the two
  * obvious alternatives both re-ship the filter every epoch and were
  * measured off the table (parse-time literal ~4 s/epoch at a 25 MB
  * filter; scalar subquery 6.5 s/epoch at 125 MB —
  * tools.PregateDiag). Compaction rebuilds ONE bloom over the folded
  * hash set
  * (sized to its count, conf clamp caps raised — the
  * bloomIncrementalOn lesson) so the probe cost stays O(#deltas)
  * bounded by compaction cadence. Pre-bloom roots (deltas without the
  * sidecar) are handled conservatively: their hashes keep the exact
  * anti-join, so upgrading a standing root never loses a hash.
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

  /** Verified-dup hashes pushed as IN-literals into the clustered state
    * scan up to this many; past it the verify falls back to a broadcast
    * semi join (still scan-only on the state side). The literal route
    * is CHUNKED (IndexMaintainStream.literalInScan — one scan per
    * ≤GraftSession.InScanChunk values), so this cap bounds total
    * literal count / union fan-out, never the depth of a single pushed
    * predicate. var only so specs can lower it to exercise the
    * fallback branch with test-sized batches. */
  private[graft] var InPushdownCap = 10000

  /** State-aware pregate gate: below this many committed keys the
    * NAIVE full anti-join is the cheaper epoch — the probe+verify
    * constant costs (an extra batch pass, the positives collect, the
    * confirm scan) only pay for themselves once the state the naive
    * path would re-shuffle is large. 50M is the locally-measured
    * break-even neighborhood (tools.StreamLadder §6.7: the seen-set
    * crossover sits near 60M keys; the gram index's own crossover is
    * later — see SubstrStream.DefaultPregateMinKeys and its round-12
    * rungs), rounded down because on a real cluster the naive arm
    * also pays the WIRE for the full state shuffle every epoch, which
    * moves the crossover earlier — calibrate per deployment class by
    * running StreamLadder's A/B rungs on the target cluster and
    * passing the measured crossover to [[start]] (README,
    * "Calibrating the streaming pregate on a cluster").
    * State only grows, so the gate flips once per root's life;
    * sidecars are WRITTEN from the first epoch regardless, so the
    * root is pregate-ready the moment it crosses. Committed size is
    * estimated from the sidecars' own bytes
    * (IndexMaintainStream.estimatedCommittedKeys — a driver-side
    * listing, no data read). */
  private[graft] val DefaultPregateMinKeys = 50000000L

  /** Whether this epoch should run the bloom-pregated path: the caller
    * wants it AND committed state is past the crossover. Both streams'
    * A/B harnesses force the arms with minKeys = 0 / pregate = false. */
  private[graft] def pregateActive(spark: SparkSession, root: String,
                                   pregate: Boolean,
                                   minKeys: Long): Boolean =
    pregate && (minKeys <= 0L ||
      IndexMaintainStream.estimatedCommittedKeys(spark, root) >= minKeys)

  /** Rows of `clean` whose norm_hash is NOT in the committed seen-set.
    * `pregate = true` is the bloom-probe path documented on the object
    * (exactly the naive result — FPs verified away, no FNs possible);
    * `false` is the naive full anti-join, kept for A/B measurement.
    *
    * The probe runs over `delivered`'s RAW content hashes (one cheap
    * map pass — md5 of the normalized text), not over `clean`: gates
    * can only SHRINK the batch, so every clean row's hash is among the
    * raw hashes and no-false-negatives is preserved, while the probe
    * job skips re-evaluating the gate chain's windows. Extra positives
    * from gate-failing docs only pad the verify sliver. */
  /** Returns the first-seen frame plus the eagerly-checkpointed
    * positives frame when the pregate path pinned one — the CALLER
    * (processBatch) releases its blocks once the epoch's writes have
    * consumed it; without the explicit release each micro-batch would
    * pin another block set reclaimed only by GC-lazy ContextCleaner
    * (Dataset.unpersist never frees checkpoint blocks — see
    * [[graft.CheckpointBlocks]]). */
  private def firstSeenOf(spark: SparkSession, root: String,
                          delivered: DataFrame, clean: DataFrame,
                          pregate: Boolean): (DataFrame, Option[DataFrame]) = {
    if (!pregate)
      return (clean.join(priorHashes(spark, root), Seq("norm_hash"),
        "left_anti"), None)
    // pregate decided by processBatch's gate; reaching here means ON
    val deltas = IndexMaintainStream.visibleDeltas(spark, root)
    if (deltas.isEmpty) return (clean, None)
    val (bloomed, legacy) = deltas.partition(d =>
      IndexMaintainStream.hasBloomSidecar(spark, d))
    graft.functions.Registry.register(spark)
    val probe = IndexMaintainStream.bloomProbe(spark,
      bloomed.map(d => s"$d/bloom"), xxhash64(col("norm_hash")))
    val (afterBloomed, pinned) = probe match {
      case None => (clean, None)
      case Some(maybeSeen) =>
        // Materialized ONCE (eager local checkpoint): the limit-collect
        // below and — past the cap — the broadcast semi branch both
        // read the same blocks, instead of the fallback re-running the
        // whole extraction+probe pass a second time.
        val positives = delivered
          .select(md5(normText(col("text"))).as("norm_hash"))
          .distinct().filter(maybeSeen)
          .localCheckpoint(true)
        val ph = positives.limit(InPushdownCap + 1)
          .collect().map(_.getString(0)).toSeq
        if (ph.isEmpty) (clean, Some(positives)) // every row definitely new
        else {
          val state = spark.read.parquet(bloomed.map(d => s"$d/hashes"): _*)
          val confirmed =
            if (ph.length <= InPushdownCap)
              // chunked: one pushed IN per ≤InScanChunk literals — a
              // single cap-sized IN is a recursive Or tree deep enough
              // to overflow the task stack (GraftSession.InScanChunk)
              IndexMaintainStream.literalInScan(state, "norm_hash", ph)
            else state.join(broadcast(positives), Seq("norm_hash"),
              "left_semi")
          (clean.join(
            broadcast(confirmed.select(col("norm_hash")).distinct()),
            Seq("norm_hash"), "left_anti"), Some(positives))
        }
    }
    val out =
      if (legacy.isEmpty) afterBloomed
      else afterBloomed.join(
        spark.read.parquet(legacy.map(d => s"$d/hashes"): _*),
        Seq("norm_hash"), "left_anti")
    (out, pinned)
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
                                  epoch: Long,
                                  pregate: Boolean = true,
                                  pregateMinKeys: Long = DefaultPregateMinKeys)
      : Boolean = {
    val spark = delivered.sparkSession
    // state-aware: below the crossover the naive anti-join is cheaper
    // (see DefaultPregateMinKeys); sidecars are still written so the
    // root is pregate-ready the moment committed state crosses
    val gated = pregateActive(spark, root, pregate, pregateMinKeys)
    // the pregate's eagerly-checkpointed positives frame is released
    // once the epoch's writes have consumed it (finally, so a failed
    // epoch doesn't leak the blocks either)
    var pinned: Option[DataFrame] = None
    try IndexMaintainStream.commitBatch(spark, root, s"batch=$epoch") {
        staging =>
      val clean = TextOps.cleanDocs(delivered)
        .withColumn("norm_hash", md5(normText(col("text"))))
      val (firstSeen, pin) = firstSeenOf(spark, root, delivered, clean, gated)
      pinned = pin
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
      if (pregate) IndexMaintainStream.writeBloomSidecar(spark,
        s"$staging/hashes", s"$staging/bloom", xxhash64(col("norm_hash")))
      keepers
        .filter(TextOps.holdoutCoin(col("doc_id")) =!= 15)
        .join(contaminated, col("doc_id") === col("train_doc_id"),
          "left_anti")
        .select(col("doc_id"), col("lang"), col("n_words"), col("text"))
        .write.parquet(s"$staging/docs")
    } finally pinned.foreach(graft.CheckpointBlocks.free)
  }

  /** Start the firehose: `docs` is a streaming frame with at least
    * (doc_id, lang, text). The accepted corpus and the seen-hash set
    * accumulate under `root`. */
  def start(docs: DataFrame, contaminated: DataFrame, root: String,
            pregate: Boolean = true,
            pregateMinKeys: Long = DefaultPregateMinKeys): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        processBatch(batch, contaminated, root, epoch, pregate,
          pregateMinKeys); ()
      }
      .start()

  /** The accepted corpus accumulated so far. */
  def acceptedDocs(spark: SparkSession, root: String): DataFrame =
    IndexMaintainStream.readTable(spark, root, "docs")

  /** Fold accumulated per-epoch deltas into one compacted run —
    * thousands of micro-batches otherwise mean thousands of small
    * files — and REBUILD the bloom sidecar over the folded hash set
    * (per-epoch blooms have differing geometries, so they fold by
    * re-aggregation, not bit-OR). Hashes are written clustered by
    * norm_hash so the verify stage's IN-literal pushdown prunes row
    * groups. Same crash-safe protocol as the index roots: the
    * `cbatch=<covers>` run commits atomically before covered deltas
    * drop, so a reader (including the NEXT micro-batch's probe) never
    * double-sees or misses a hash, and dedup state survives compaction
    * unchanged. */
  def compact(spark: SparkSession, root: String): Unit = {
    IndexMaintainStream.commitCompactedWith(spark, root) { stg =>
      graft.sinks.LakeSink.writeClustered(
        IndexMaintainStream.readTable(spark, root, "hashes"),
        s"$stg/hashes",
        // sized by input bytes — a hardcoded 1 was a single-task sort
        // of the whole seen-set (see compactedFileCount's scaladoc)
        IndexMaintainStream.compactedFileCount(spark, root, "hashes"),
        col("norm_hash"))
      IndexMaintainStream.readTable(spark, root, "docs")
        .write.parquet(s"$stg/docs")
      IndexMaintainStream.writeBloomSidecar(spark,
        s"$stg/hashes", s"$stg/bloom", xxhash64(col("norm_hash")))
    }
    IndexMaintainStream.dropCovered(spark, root)
  }

  /** [[compact]] under the deltas-count policy
    * (IndexMaintainStream.compactIfNeeded's rationale): fold when more
    * than `maxDeltas` plain deltas have accumulated. Returns true when
    * a compaction ran. */
  def compactIfNeeded(spark: SparkSession, root: String,
                      maxDeltas: Int = 64): Boolean = {
    if (IndexMaintainStream.plainDeltaCount(spark, root) <= maxDeltas) false
    else { compact(spark, root); true }
  }

  /** Per-language accounting over the accepted corpus — the streaming
    * counterpart of pretrainPipeline's output (PretrainStreamSpec
    * proves exact equality on an ordered ingest, and pins the
    * unordered contract — first-arrival keeper, held-out keeper
    * suppression, one-doc-per-hash — against an independent replay of
    * a shuffled ingest). */
  def accounting(spark: SparkSession, root: String): DataFrame =
    TextOps.pretrainAccounting(acceptedDocs(spark, root))
}
