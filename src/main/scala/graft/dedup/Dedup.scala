package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication suite for a training-data pipeline.
  *
  * The reference dedups at two levels — whole files by md5 content hash
  * (/root/reference/core/etl_service.py:364-370) and rows by
  * primary-key upsert (core/database_adapter.py). A corpus pipeline needs
  * the document-level generalizations implemented here: exact
  * (normalized-hash groupBy), n-gram Jaccard (exact set similarity over
  * shingles), MinHash+LSH banding and SimHash (sub-quadratic candidate
  * generation), and embedding-cosine near-dup.
  *
  * Scale + codegen notes (the whole point of these shapes):
  *  - exact: map-side hash + one shuffle on the 16-byte hash key.
  *  - ngram-jaccard: explode distinct shingles → self-join *on the
  *    shingle*, so only docs sharing a shingle ever meet; never an n²
  *    cross join. Shingle-frequency skew is bounded by the MaxBucket
  *    guard (exact generators drop stopword-like buckets with an
  *    observed-metric audit; approximate ones star-expand) — the LSH
  *    variants below remain the sub-quadratic scale path.
  *  - minhash-lsh / simhash: signatures are computed explode-then-
  *    aggregate (min/sum partial aggs, all whole-stage codegen) rather
  *    than per-row nested higher-order functions — HOFs are interpreted
  *    in Spark and cost ~40ms/doc for a 16-hash signature; the exploded
  *    form is >100× faster and is also the formulation that scales
  *    (map-side partial min/sum, one shuffle on doc_id).
  *  - embed-cosine: native codegen'd DotProduct expression; pair join
  *    blocked by `label` (in production: by coarse cluster/LSH bucket)
  *    so the cross join is bounded per block.
  */
object Dedup {

  /** Per-bucket doc cap for every pair generator. A bucket (shared
    * shingle / fingerprint / signature band) larger than this is
    * stopword-like: it carries almost no near-dup signal but
    * O(|bucket|²) pair cost, and ONE such bucket at corpus scale is one
    * executor's memory. Exact generators DROP the bucket (star edges
    * would corrupt their exact intersection counts) and count the drop
    * in an observed metric; approximate generators star-expand to the
    * bucket's min doc (see embedLshPairs). 4096 exceeds any bucket the
    * synthetic corpora produce, so oracle outputs are unaffected. */
  private[graft] val MaxBucket = 4096

  /** Audit for the hot-bucket guard, attached via Dataset.observe to
    * the bounded-bucket aggregate's output (one row per bucket carrying
    * the TRUE size `b.n`) — the counts ride the pair job's own
    * accumulators (no extra pass, output schema untouched) and surface
    * through `df.queryExecution.observedMetrics`.
    *
    * The metric name carries a per-invocation suffix (`name#N`):
    * Spark rejects duplicate observation names inside ONE plan
    * (DUPLICATED_METRICS_NAME), so a query composing two invocations
    * of the same generator would otherwise fail at analysis. Consumers
    * look metrics up by prefix (see DedupQualitySpec.observedMetric). */
  private val obsSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private def observeHotBuckets(agg: DataFrame, name: String,
                                maxBucket: Int): DataFrame =
    agg.observe(s"$name#${obsSeq.incrementAndGet()}",
      sum(when(col("b.n") > maxBucket, 1L).otherwise(0L))
        .as("n_hot_buckets"),
      sum(when(col("b.n") > maxBucket, col("b.n"))
        .otherwise(0L)).as("n_hot_doc_entries"))

  /** Memory-bounded bucket frame shared by every guard regime: ONE
    * aggregation pass with the native
    * [[graft.functions.expressions.BoundedBucket]] aggregate, whose
    * buffer stops appending members beyond `maxBucket + 1` while the
    * true count `n` and true min member `mn` stay exact — so a
    * pathological mass-dup bucket (a boilerplate shingle shared by 10⁹
    * docs at 100 TB) costs `maxBucket + 1` buffer entries, not
    * O(|bucket|), and no second evaluation of the member pipeline (the
    * round-8 pre-count + semi-join form bounded memory too, but
    * re-evaluated the signature-heavy member projection per branch —
    * measured 1.3–2.0× at sf0.1). Returns one row per bucket:
    * (keys..., b struct(n, mn, ds)) with `ds` complete exactly when
    * `n <= maxBucket`; the audit metrics observe this frame. */
  private def boundedBuckets(rows: DataFrame, keys: Seq[String],
                             member: Column, metric: String,
                             maxBucket: Int): DataFrame =
    observeHotBuckets(boundedBucketsRaw(rows, keys, member, maxBucket),
      metric, maxBucket)

  /** The bounded aggregate WITHOUT the audit observe — for consumers
    * that branch the bucket frame and must attach CollectMetrics to
    * exactly one branch (guardedStarPairs' structural-exactness
    * contract). */
  private def boundedBucketsRaw(rows: DataFrame, keys: Seq[String],
                                member: Column, maxBucket: Int): DataFrame = {
    graft.functions.Registry.register(rows.sparkSession)
    val kc = keys.map(col)
    rows.select(kc :+ member.as("m"): _*)
      .groupBy(kc: _*)
      .agg(call_function("graft_bounded_bucket", col("m"),
        lit(maxBucket)).as("b"))
  }

  /** DROP-regime guarded bucket collect (exact pair generators and
    * incremental index builds): over-cap buckets are dropped — their
    * truncated member list is never read — and the survivors' complete
    * lists come out of the single bounded aggregation. Outputs are
    * identical to an unguarded collect-then-filter (DedupGuardSpec
    * proves it on planted mega-bucket corpora). */
  private def guardedBuckets(rows: DataFrame, keys: Seq[String],
                             member: Column, metric: String,
                             maxBucket: Int, minSize: Int = 2): DataFrame = {
    val kc = keys.map(col)
    boundedBuckets(rows, keys, member, metric, maxBucket)
      .filter(col("b.n") <= maxBucket && col("b.n") >= minSize)
      .select(kc :+ col("b.ds").as("ds"): _*)
  }

  /** STAR-regime guarded pair space (approximate generators —
    * minhash/simhash/embed-LSH bands): under-cap buckets expand
    * all-pairs from their complete collected list; over-cap buckets
    * star-expand to the bucket's TRUE min member (tracked exactly by
    * the bounded aggregate even past truncation) by joining the
    * member rows against the tiny hot-anchor frame — O(|bucket|)
    * output rows for a hot bucket with the bucket never materialized.
    * The member pipeline is evaluated once for the aggregation and
    * once for the hot-anchor join (scan-side exchanges deduplicated by
    * ReuseExchange; with zero hot buckets AQE's empty-relation
    * propagation collapses the star branch). Returns `(a, b)` member
    * pairs with `a.idField < b.idField`; callers compute the
    * similarity measure.
    *
    * Metric exactness is structural (round 10): EACH branch carries
    * its OWN CollectMetrics node (same `metric` prefix, distinct
    * auto-suffixed names — consumers match by prefix), each below its
    * branch's filter so each sees ALL bucket rows, and each inside
    * exactly one consumer's subtree so each executes AT MOST ONCE by
    * construction — audit counts can no longer double whether or not
    * ReuseExchange deduplicates the aggregate under the branches (it
    * still does: the observes sit above the exchange). When AQE's
    * empty-relation propagation collapses one branch (all-hot or
    * zero-hot corpora), the surviving branch's observe still reports —
    * the metric is absent only when the whole output is empty, exactly
    * the pre-round-10 availability. */
  private[graft] def guardedStarPairs(rows: DataFrame, keys: Seq[String],
                               member: Column, idField: String,
                               metric: String, maxBucket: Int): DataFrame = {
    val kc = keys.map(col)
    val m = rows.select(kc :+ member.as("m"): _*)
    val buckets = boundedBucketsRaw(rows, keys, member, maxBucket)
    val allPairs = observeHotBuckets(buckets, metric, maxBucket)
      .filter(col("b.n") <= maxBucket && col("b.n") >= 2)
      .select(kc :+ col("b.ds").as("ds"): _*)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
    val hot = observeHotBuckets(buckets, metric, maxBucket)
      .filter(col("b.n") > maxBucket)
      .select(kc :+ col("b.mn").as("mn"): _*)
    val starPairs = m.join(hot, keys)
      .select(col("mn").as("a"), col("m").as("b"))
    allPairs.select(col("a"), col("b"))
      .unionByName(starPairs)
      .filter(col("a")(idField) < col("b")(idField))
  }

  /** Exact dedup on canonicalized text (whitespace/case-insensitive). */
  def exactDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(normText(col("text"))).as("norm_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))

  /** Exact n-gram Jaccard near-dup pairs.
    *
    * Pairs are generated by grouping on the shingle and exploding the
    * per-shingle doc list twice — a self-join on the shingle key would
    * recompute the whole shingle pipeline for each side (Catalyst
    * doesn't reuse exchanges across differently-aliased branches).
    * Docs never meet unless they share a shingle, and hot-shingle skew
    * is bounded by the MaxBucket drop guard (see jaccardPairsOn); the
    * LSH variants below are the sub-quadratic scale path. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))

  /** Unsorted core of ngramJaccard — consumers that don't need the
    * presentation sort (the cluster step) use this directly so the
    * global sort isn't paid twice. */
  private def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    jaccardPairsOn(Tables.documents(spark, dir))

  /** Frame-level core (docs must have doc_id + text). Hot-shingle
    * guard: shingles shared by more than maxBucket docs are DROPPED
    * before pair expansion (the `jaccard_hot_shingles` observed metric
    * counts them) — the jaccard of pairs that shared only stopword-like
    * shingles is noise, and star edges would corrupt the exact
    * intersection counts this operator promises. Deliberate bias note:
    * n_sh (the union denominator) is computed BEFORE the drop, so a
    * surviving pair that also shared a dropped hot shingle scores
    * conservatively LOW (its intersection loses the shingle, its union
    * does not) — the guard can only suppress stopword-carried
    * similarity, never inflate it, and the audit metric tells an
    * operator when that regime is active. */
  private[graft] def jaccardPairsOn(docs: DataFrame,
                                    maxBucket: Int = MaxBucket): DataFrame =
    interPairsOn(docs, maxBucket, "jaccard_hot_shingles")
      .withColumn("jaccard",
        rnd(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.02)
      .select("doc_a", "doc_b", "jaccard")

  /** Shared exact-intersection pair core: (doc_a < doc_b, |A∩B|, |A|,
    * |B|) via the shingle bucket-collect skeleton — the base for both
    * the symmetric jaccard and the asymmetric containment measures. */
  private def interPairsOn(docs: DataFrame, maxBucket: Int,
                           metric: String): DataFrame = {
    val ex = shingleRows(docs)
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val byShingle = guardedBuckets(ex, Seq("shingle"),
      struct(col("doc_id"), col("n_sh")), metric, maxBucket)
    byShingle
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("a.n_sh")).as("na"),
           first(col("b.n_sh")).as("nb"))
  }

  /** Asymmetric n-gram CONTAINMENT C(A,B) = |A∩B| / |A| — the
    * excerpt/quote detector: jaccard misses a short document fully
    * copied into a long one (the union denominator dilutes it), while
    * containment of the smaller side hits 1.0 exactly there. Same
    * sub-quadratic bucket-collect skeleton and hot-shingle guard as
    * ngram_jaccard; the contained side is the SMALLER shingle set
    * (ties → lower doc_id), so each unordered pair reports its one
    * meaningful direction. */
  private[graft] def containmentOn(docs: DataFrame,
                                   maxBucket: Int = MaxBucket): DataFrame =
    interPairsOn(docs, maxBucket, "containment_hot_shingles")
      .select(
        when(col("na") <= col("nb"), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_contained"),
        when(col("na") <= col("nb"), col("doc_b")).otherwise(col("doc_a"))
          .as("doc_container"),
        least(col("na"), col("nb")).as("n_contained"),
        rnd(col("inter") * 1.0 / least(col("na"), col("nb")), 4)
          .as("containment"))
      .filter(col("containment") >= 0.25)

  def containment(spark: SparkSession, dir: String): DataFrame =
    containmentOn(Tables.documents(spark, dir))
      .orderBy(col("containment").desc, col("doc_contained"),
               col("doc_container"))

  /** Winnowing fingerprints (the MOSS local-fingerprint scheme,
    * Schleimer et al. SIGMOD'03) — substring-overlap detection, the
    * technique that catches SHARED PASSAGES where whole-document
    * MinHash sees two different documents: hash every word-3-gram,
    * slide a w=4 window over consecutive gram hashes, and keep each
    * window's minimum as a selected fingerprint (guarantees any shared
    * run of ≥ w+k−1 tokens yields at least one shared fingerprint).
    * Pairs then form by the bucket-collect skeleton on the fingerprint
    * hash — docs meet only on shared fingerprints, never corpus².
    *
    * Relational shape: the gram build and the sliding min share ONE
    * doc-partitioned window (the four `lead`s reuse the same
    * Exchange+Sort), the sliding min is `least(h, lead(h,1..3))` — no
    * second window frame — and fingerprint selection dedups with a
    * map-side-combined distinct. Gram hashes are md5-derived (engine-
    * portable), so the whole operator is deterministic → DuckDB
    * oracle. */
  def winnow(spark: SparkSession, dir: String): DataFrame =
    winnowPairsOn(Tables.documents(spark, dir))

  /** Frame-level core (docs must have doc_id + text). Hot-fingerprint
    * guard: fingerprints shared by more than maxBucket docs (boilerplate
    * so common it fingerprints identically corpus-wide) are DROPPED
    * before pair expansion — counted in the `winnow_hot_fps` observed
    * metric; n_shared is an exact count, so star edges would corrupt
    * it. Deliberate bias: dropping can only LOWER a surviving pair's
    * n_shared (against the ≥2 cutoff) — boilerplate-carried overlap is
    * suppressed, never inflated. */
  private[graft] def winnowPairsOn(docs: DataFrame,
                                   maxBucket: Int = MaxBucket): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = docs
      .select(col("doc_id"), posexplode(reTokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("w2", lead(col("w"), 1).over(byDoc))
      .withColumn("w3", lead(col("w"), 2).over(byDoc))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(concat_ws(" ", col("w"), col("w2"), col("w3"))),
                       1, 8), 16, 10).cast("long").as("h"))
    val selected = grams
      .withColumn("h2", lead(col("h"), 1).over(byDoc))
      .withColumn("h3", lead(col("h"), 2).over(byDoc))
      .withColumn("h4", lead(col("h"), 3).over(byDoc))
      .filter(col("h4").isNotNull)
      .select(col("doc_id"),
              least(col("h"), col("h2"), col("h3"), col("h4")).as("fp"))
      .distinct()
    val byFp = guardedBuckets(selected, Seq("fp"), col("doc_id"),
      "winnow_hot_fps", maxBucket)
    byFp
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH banding: 4 bands × 4 rows; docs colliding in any band
    * become candidate pairs; est_jaccard = matching signature fraction.
    * Approximate by design → rows-only check (SURVEY §2.7).
    *
    * The 16-component signature is the single-pass native aggregate
    * graft.functions.expressions.MinHashSignature: one mutable buffer
    * per doc with explicit map-side partial merge — the property that
    * makes minhash scale. The fixed hash family lives in MinHashFamily
    * (stable across runs/partitions, as a resumable pipeline needs). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, Tables.documents(spark, dir))

  /** Frame-level core (docs must have doc_id + text): candidate pairs.
    * (Measured note: a per-row HOF shingle transform — even without
    * array_distinct — is ~3× slower than the exploded window-lead
    * builder; interpreted HOF evaluation dominates. Keep shingleRows.)
    * Oversized band buckets (mass-duplicates share every signature
    * band) star-expand to the bucket's min doc_id — O(|bucket|) rows,
    * component connectivity preserved, counted in the
    * `minhash_hot_buckets` observed metric.
    *
    * Wire shape (round 10 — found by the §6.5 ladder): the band
    * exchange used to ship struct(doc_id, sig) — 136 bytes/row with
    * the 16-long signature riding every one of the 4N band rows so
    * est_jaccard could be computed inside the bucket. At 1.5M docs
    * that exchange entered the single-box spill regime and the entry
    * left linear (9.5× wall for 3× data) with bucket occupancy
    * MEASURED flat (max 4, pair volume exactly 3.0× — tools.
    * MinhashDiag), i.e. pure wire weight, not pair growth. Now only
    * doc_id rides the band shuffle (~32 B/row) and the signatures
    * join back onto the CANDIDATE PAIRS — a frame ~N/20th the band
    * rows — from the sig frame pinned once (lazy localCheckpoint, the
    * phash decode-once pattern; also stops guardedStarPairs' two
    * branches re-running the shingle window + signature aggregate).
    * Output identical: est_jaccard is a function of the pair. */
  def minhashPairs(spark: SparkSession, docs: DataFrame,
                   maxBucket: Int = MaxBucket): DataFrame = {
    graft.functions.Registry.register(spark)
    val P = graft.functions.expressions.MinHashFamily.P
    val hashed = shingleRows(docs, distinct = false)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(P)))
    val sigs = hashed.groupBy(col("doc_id"))
      .agg(call_function("graft_minhash_sig", col("h")).as("sig"))
      .localCheckpoint(false)
    val bands = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)),
        j => struct(j.as("band_idx"),
                    xxhash64(slice(col("sig"), j * 4 + 1, lit(4))).as("band_hash"))))
        .as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
    // Bucket-collect + double explode: candidates generated per bucket
    // (a self-join would re-run the band pipeline per side — no
    // exchange reuse across aliases); pairs dedup'd across bands
    // BEFORE the signature joins so each pair scores once.
    val cand = guardedStarPairs(bands, Seq("band_idx", "band_hash"),
      struct(col("doc_id")), "doc_id", "minhash_hot_buckets", maxBucket)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        rnd(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)) / lit(16.0), 4).as("est_jaccard"))
      .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
  }

  /** Two-stage near-dup: MinHash/LSH candidate RECALL + exact-jaccard
    * VERIFY — the standard production pattern at 100 TB. The cheap
    * approximate stage bounds the candidate set sub-quadratically; the
    * exact stage then counts true shingle intersections ONLY for
    * candidates (two equi-joins keyed on the candidate pair, never
    * corpus²) and restores precision 1.0. Recall stays approximate (a
    * pair LSH never surfaces stays missed) → rows-only;
    * DedupQualitySpec asserts the precision contract: every emitted
    * pair appears in the exact ngram_jaccard output with the SAME
    * jaccard. */
  def minhashVerified(spark: SparkSession, dir: String): DataFrame =
    minhashVerifiedOn(spark, Tables.documents(spark, dir))

  /** Candidate-bounded shingle frame for the verify stage: the corpus
    * is semi-joined down to ONLY the docs that appear in a candidate
    * pair BEFORE the shingle explode. At production scale candidates
    * are a sliver of the corpus, so exploding (and checkpointing)
    * every document's shingles — the previous formulation — was a
    * corpus×shingles materialization for a join that touches almost
    * none of it. `n_sh` (the union denominator) is a per-doc count,
    * so the filter cannot change any surviving pair's jaccard. */
  private[graft] def candidateShingles(docs: DataFrame,
                                       cands: DataFrame): DataFrame = {
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id")))
      .distinct()
    shingleRows(docs.join(candIds, Seq("doc_id"), "left_semi"))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
  }

  private[graft] def minhashVerifiedOn(spark: SparkSession,
                                       docs: DataFrame): DataFrame = {
    // checkpoint the candidate set first: it feeds the semi-join AND
    // both verify-join sides, and the minhash pipeline above it must
    // run exactly once (lazy + private materialization; cache() would
    // leak into the session CacheManager)
    val cands = minhashPairs(spark, docs).select(col("doc_a"), col("doc_b"))
      .localCheckpoint(false)
    // one candidate-bounded shingle pipeline feeds both pair sides
    val ex = candidateShingles(docs, cands).localCheckpoint(false)
    val a = ex.select(col("doc_id").as("doc_a"), col("shingle"),
                      col("n_sh").as("na"))
    val b = ex.select(col("doc_id").as("b_doc"), col("shingle").as("b_shingle"),
                      col("n_sh").as("nb"))
    cands.join(a, Seq("doc_a"))
      .join(b, col("doc_b") === col("b_doc") &&
               col("shingle") === col("b_shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"),
           first(col("nb")).as("nb"))
      .withColumn("jaccard",
        rnd(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.02)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
  }

  /** Incremental MinHash-LSH near-dup — the SUB-QUADRATIC-MEMORY scale
    * variant of [[ngramIncremental]]: where the shingle-postings index
    * stores hundreds of rows per corpus doc, the standing corpus here
    * is represented by its banded signature index (16 minhash longs +
    * 4 band hashes per doc — the thing a 100 TB near-dup service
    * actually persists); the new batch's signatures probe the band
    * buckets, and ONLY the colliding (batch, corpus) candidates get
    * the exact-jaccard verify, bounded to candidate docs before any
    * shingle explode (the minhashVerified contract applied across the
    * split). Verdict contract identical to ngramIncremental
    * (near_dup_of_corpus ≥ 0.5 / similar ≥ 0.02 / new), so the two
    * entries differ ONLY in candidate recall — approximate by LSH
    * design → rows-only; DedupQualitySpec plants exact copies across
    * the split (identical signatures ⇒ guaranteed collision) and
    * pins batch-never-self-pairs. */
  def minhashIncremental(spark: SparkSession, dir: String): DataFrame =
    minhashIncrementalOn(spark, Tables.documents(spark, dir))

  private[graft] def minhashIncrementalOn(spark: SparkSession,
                                          docs: DataFrame): DataFrame = {
    graft.functions.Registry.register(spark)
    val P = graft.functions.expressions.MinHashFamily.P
    val hashed = shingleRows(docs, distinct = false)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(P)))
    val sigs = hashed.groupBy(col("doc_id"))
      .agg(call_function("graft_minhash_sig", col("h")).as("sig"))
      .withColumn("is_batch", bucket16(col("doc_id")) === 0)
    val bands = sigs.select(col("doc_id"), col("is_batch"),
      explode(transform(sequence(lit(0), lit(3)),
        j => struct(j.as("band_idx"),
          xxhash64(slice(col("sig"), j * 4 + 1, lit(4))).as("band_hash"))))
        .as("band"))
      .select(col("doc_id"), col("is_batch"),
              col("band.band_idx"), col("band.band_hash"))
    // corpus band index (the persisted structure in production;
    // hot buckets dropped at index build with the audit metric);
    // minSize = 1: a batch doc can legitimately match a singleton band
    val cIdx = guardedBuckets(bands.filter(!col("is_batch")),
      Seq("band_idx", "band_hash"), col("doc_id"),
      "minhash_incr_hot_buckets", MaxBucket, minSize = 1)
    // batch probes its 4 band values; distinct collapses multi-band hits
    val cands = bands.filter(col("is_batch"))
      .join(cIdx, Seq("band_idx", "band_hash"))
      .select(col("doc_id"), explode(col("ds")).as("corpus_doc"))
      .distinct()
      .localCheckpoint(false)
    // candidate-bounded exact verify: shingle ONLY docs in a candidate
    val candIds = cands.select(col("doc_id"))
      .unionByName(cands.select(col("corpus_doc").as("doc_id")))
      .distinct()
    val ex = shingleRows(docs.join(candIds, Seq("doc_id"), "left_semi"))
      .withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .localCheckpoint(false)
    val a = ex.select(col("doc_id"), col("shingle"), col("n_sh").as("na"))
    val b = ex.select(col("doc_id").as("b_doc"),
                      col("shingle").as("b_shingle"), col("n_sh").as("nb"))
    val scored = cands.join(a, Seq("doc_id"))
      .join(b, col("corpus_doc") === col("b_doc") &&
               col("shingle") === col("b_shingle"))
      .groupBy(col("doc_id"), col("corpus_doc"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"),
           first(col("nb")).as("nb"))
      .withColumn("jaccard",
        rnd(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.02)
    val best = scored.groupBy(col("doc_id"))
      .agg(max(struct(col("jaccard"), (-col("corpus_doc")).as("neg"))).as("m"))
      .select(col("doc_id"), (-col("m.neg")).as("matched_doc_id"),
              col("m.jaccard").as("jaccard"))
    docs.filter(bucket16(col("doc_id")) === 0).select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("jaccard") >= 0.5, lit("near_dup_of_corpus"))
          .when(col("jaccard").isNotNull, lit("similar"))
          .otherwise(lit("new")).as("verdict"),
        col("matched_doc_id"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** 64-bit SimHash fingerprint + 16-bit-band candidates + hamming
    * verification. Approximate by design → rows-only check. Per-bit
    * votes are 64 codegen'd sum aggregates over exploded tokens —
    * measured FASTER than the single-buffer SimHashSignature
    * TypedImperativeAggregate (2.4 s vs 1.75 s at sf0.1: an object
    * aggregate drops the whole pipeline out of whole-stage codegen into
    * ObjectHashAggregate, which costs more than 64 primitive buffers
    * save). The aggregate remains registered for the SQL surface, where
    * composing 64 sums is impractical, and FunctionsSpec pins the two
    * formulations to each other. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(spark, dir))

  /** Frame-level core (docs must have doc_id + text): hamming pairs.
    * Oversized band buckets (mass-duplicates hash identically in every
    * band) star-expand to the bucket's min doc_id instead of all-pairs
    * — same trade as embedLshPairs: O(|bucket|) rows, connectivity of
    * the mass-dup component preserved, counted in the
    * `simhash_hot_buckets` observed metric. */
  def simhashPairs(docs: DataFrame, maxBucket: Int = MaxBucket): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(reTokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b")
    }
    val votes = tok.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val fps = votes.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("simhash"))
    val banded = fps.select(col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
             j -> struct(j AS band_idx,
                         (shiftright(simhash, j * 16) & 65535) AS band_val))"""))
        .as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    guardedStarPairs(banded, Seq("band_idx", "band_val"),
      struct(col("doc_id"), col("simhash")), "doc_id",
      "simhash_hot_buckets", maxBucket)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
                .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 16)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
  }

  /** Connected-components clustering of near-dup pairs — the dedup
    * *decision* step: every doc in a component gets the component's min
    * doc_id as cluster id (the keeper). The CC kernel itself is the
    * reusable graft.graph.ConnectedComponents (two regimes: local
    * union-find for single-partition pair graphs, iterative min-label
    * propagation + pointer jumping beyond — see its scaladoc; GraphSpec
    * property-tests both regimes against each other). */
  private[graft] def clusterLabels(spark: SparkSession, dir: String): DataFrame =
    graft.graph.ConnectedComponents.run(
      jaccardPairs(spark, dir).select(col("doc_a"), col("doc_b")))
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))

  /** Connected-components clustering, presentation-sorted (the oracle
    * contract). Consumers that re-aggregate (canonical) use
    * clusterLabels directly so the global sort isn't paid twice. */
  def clusters(spark: SparkSession, dir: String): DataFrame =
    clusterLabels(spark, dir).orderBy(col("doc_id"))

  /** Canonical-survivor selection — the dedup *apply* step that turns
    * cluster labels into the deduplicated corpus. Every document joins
    * its cluster label (singletons become their own cluster), then one
    * keeper per cluster survives: the longest text (most training
    * signal), ties to the lowest doc_id.
    *
    * Scale: the label set is pair-graph-sized (near-dup clusters are a
    * sliver of any real corpus), so the corpus⋈labels join broadcasts
    * the labels at 100 TB — AQE decides, no hint needed. The keeper
    * choice is `max_by` over `groupBy(cluster_id)` — a hash aggregate
    * with map-side partial combine, never a per-cluster window sort. */
  def canonical(spark: SparkSession, dir: String): DataFrame =
    canonicalFrom(Tables.documents(spark, dir), clusterLabels(spark, dir))

  /** Label-APPLICATION core shared by the inline and persisted forms:
    * corpus ⋈ labels (labels broadcast — pair-graph-sized), one
    * max_by hash aggregate. `labels` may be the in-query cluster
    * pipeline (canonical) or a persisted labels table
    * (canonicalPersisted) — identical output either way
    * (PersistedLabelsSpec). */
  private[graft] def canonicalFrom(docs: DataFrame,
                                   labels: DataFrame): DataFrame = {
    docs.select(col("doc_id"), col("n_chars"))
      .join(labels, Seq("doc_id"), "left")
      .select(coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
              col("doc_id"), col("n_chars"))
      .groupBy(col("cluster_id"))
      .agg(max_by(struct(col("doc_id"), col("n_chars")),
                  struct(col("n_chars"), -col("doc_id"))).as("k"),
           count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("k.doc_id").as("keeper_doc_id"),
              col("k.n_chars").as("keeper_chars"), col("n_members"))
      .orderBy(col("cluster_id"))
  }

  /** Persist the near-dup cluster labels ONCE — the production shape
    * for every label consumer: [[canonical]] and
    * operators.Sampling.softDedup each re-derive the full pair+CC
    * pipeline inline (fine for a one-shot query, verifiable by the
    * oracle), but a pipeline that applies the same labels twice —
    * keeper selection AND mixture weighting — should pay for them
    * once. Labels are written range-clustered on doc_id (LakeSink), so
    * the consumer join's scan gets tight per-file min/max for its key.
    * PersistedLabelsSpec proves both consumers produce IDENTICAL
    * output through a persisted labels table. */
  def writeClusterLabels(spark: SparkSession, dir: String,
                         path: String): Unit =
    graft.sinks.LakeSink.writeClustered(
      clusterLabels(spark, dir), path, nFiles = 4, col("doc_id"))

  /** [[canonical]] fed from a persisted labels table instead of the
    * inline cluster pipeline. */
  def canonicalPersisted(spark: SparkSession, dir: String,
                         labelsPath: String): DataFrame =
    canonicalFrom(Tables.documents(spark, dir),
                  spark.read.parquet(labelsPath))

  /** The `dedup_canonical` ENTRY — the production path (round 7):
    * cluster labels are built and persisted ONCE per corpus
    * generation ([[writeClusterLabels]] → range-clustered parquet),
    * and the entry itself is just corpus ⋈ labels + one max_by
    * aggregate, exactly what a 100 TB deployment re-runs per batch.
    * Previously the entry re-derived the whole pair+CC pipeline
    * inline on every run, so its recorded cost conflated one-time
    * label construction with the steady-state apply (the round-6 10×
    * audit's one honest caveat). Output is IDENTICAL to [[canonical]]
    * (PersistedLabelsSpec) so the oracle is unchanged; the inline form
    * stays as the spec'd reference.
    *
    * The labels cache is keyed by the corpus file's (mtime, length)
    * fingerprint, so a driver-side testdata regeneration invalidates
    * it — stale labels can never silently answer for a new corpus. */
  def canonicalEntry(spark: SparkSession, dir: String): DataFrame =
    canonicalFrom(Tables.documents(spark, dir), labelsCached(spark, dir))

  /** Build-or-load the persisted near-dup cluster labels for `dir` —
    * the ONE label build every label consumer shares (canonicalEntry,
    * clustersEntry, Sampling.softDedup entry): built on first use per
    * corpus fingerprint (CorpusCache — testdata regeneration
    * invalidates), then a lazy read of the range-clustered table. */
  private[graft] def labelsCached(spark: SparkSession, dir: String): DataFrame = {
    val cache = graft.tools.CorpusCache.dirFor(dir, "documents", "labels")
    if (!graft.tools.CorpusCache.isBuilt(cache))
      writeClusterLabels(spark, dir, cache.getPath)
    spark.read.parquet(cache.getPath)
  }

  /** The `dedup_clusters` ENTRY — the persisted labels read back in the
    * oracle's presentation order (the labels table IS clusterLabels'
    * output, written once by [[labelsCached]]; PersistedLabelsSpec +
    * the unchanged oracle pin identity with the inline pipeline). */
  def clustersEntry(spark: SparkSession, dir: String): DataFrame =
    labelsCached(spark, dir).orderBy(col("doc_id"))

  /** First hex nibble of md5(doc_id) — the same deterministic coin as
    * operators.Sampling (content-addressed, engine-portable). */
  private[dedup] def bucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** Incremental exact dedup — the production shape at 100 TB: a NEW
    * BATCH (deterministic 1/16 md5 split stands in for today's
    * increment) dedups against the standing corpus without the corpus
    * ever pairing with itself. Each batch doc gets a verdict:
    * `dup_of_corpus` (hash already in the corpus → keeper is the
    * corpus's min doc_id), `dup_in_batch` (first seen inside this
    * batch), or `new`.
    *
    * Scale: the corpus side collapses to one hash→keeper aggregate (in
    * production this is the persistent dedup index, maintained
    * incrementally — here derived in-query), both joins co-partition
    * on the 16-byte hash, and the batch side is increment-sized. The
    * corpus never shuffles as rows — only as (hash, keeper) partial
    * aggregates. */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("norm_hash"),
              (bucket16(col("doc_id")) === 0).as("is_batch"))
    val corpusKeeper = docs.filter(!col("is_batch"))
      .groupBy(col("norm_hash")).agg(min(col("doc_id")).as("corpus_keeper"))
    val batchKeeper = docs.filter(col("is_batch"))
      .groupBy(col("norm_hash")).agg(min(col("doc_id")).as("batch_keeper"))
    docs.filter(col("is_batch")).select(col("doc_id"), col("norm_hash"))
      .join(corpusKeeper, Seq("norm_hash"), "left")
      .join(batchKeeper, Seq("norm_hash"), "left")
      .select(col("doc_id"),
        when(col("corpus_keeper").isNotNull, "dup_of_corpus")
          .when(col("batch_keeper") < col("doc_id"), "dup_in_batch")
          .otherwise("new").as("verdict"),
        coalesce(col("corpus_keeper"),
          when(col("batch_keeper") < col("doc_id"), col("batch_keeper"))
            .otherwise(col("doc_id"))).as("keeper_doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Incremental NEAR-dup — the daily-increment production shape for
    * the fuzzy family: a new batch (the same deterministic 1/16 md5
    * split as [[incremental]]) probes the STANDING CORPUS's shingle
    * postings for near-duplicates, without the corpus ever pairing
    * with itself or the batch pairing with itself. Per batch doc the
    * verdict is `near_dup_of_corpus` (best exact n-gram Jaccard
    * ≥ 0.5), `similar` (a match ≥ 0.02 exists), or `new`.
    *
    * Scale (100 TB): the corpus side collapses ONCE into a
    * shingle→postings aggregate — in production a persisted index
    * maintained incrementally (append today's accepted docs' shingles),
    * here derived in-query so the oracle can rebuild the semantics.
    * Stopword-like postings (> MaxBucket corpus docs) are dropped at
    * index build with the usual observed-metric audit, so batch probes
    * never fan out on hot shingles; the join co-partitions on the
    * shingle and the batch side is increment-sized. The best-match
    * selection is a max(struct) AGGREGATE (map-side combinable), not a
    * per-doc window sort — candidate lists per batch doc are unbounded
    * in a templated corpus and never need ordering, only a max.
    * Conservative-bias note (mirrors jaccardPairsOn): n_sh denominators
    * count ALL shingles including dropped-hot ones, so the guard can
    * only lower a surviving pair's score, never inflate it. */
  def ngramIncremental(spark: SparkSession, dir: String): DataFrame =
    ngramIncrementalOn(Tables.documents(spark, dir))

  /** Hashed-wire twin: the persisted shingle→postings index and the
    * batch probe join key on xxhash64(shingle) — 8-byte wire keys for
    * BOTH the standing index (8 bytes/posting key instead of a 3-token
    * string, a direct index-size cut) and every day's probe shuffle. A
    * collision merges two shingles' postings, inflating `inter` by at
    * most the colliding occurrences — jaccard over-estimate, i.e. the
    * conservative direction for dedup (a non-dup flagged similar, never
    * a dup missed); odds as the spans_hashed note, nil at test SF →
    * full oracle. Per-doc `n_sh` is computed on the STRING shingles
    * before hashing, so denominators are exact either way. */
  def ngramIncrementalHashed(spark: SparkSession, dir: String): DataFrame =
    ngramIncrementalOn(Tables.documents(spark, dir), hashed = true)

  /** Frame-level core (docs must have doc_id + text; the quality spec
    * plants batch/corpus near-dup fixtures through it). */
  private[graft] def ngramIncrementalOn(docs: DataFrame,
                                        hashed: Boolean = false): DataFrame = {
    val strRows = shingleRows(docs.select(col("doc_id"), col("text")))
      .withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("is_batch", bucket16(col("doc_id")) === 0)
    // hash AFTER n_sh: denominators stay exact string-shingle counts;
    // only the postings/probe key rides the wire as 8 bytes
    val ex = if (hashed)
      strRows.withColumn("shingle", xxhash64(col("shingle")))
    else strRows
    val corpus = ex.filter(!col("is_batch"))
    // minSize = 1: a batch doc can match a singleton corpus posting
    val postings = guardedBuckets(corpus, Seq("shingle"),
      struct(col("doc_id"), col("n_sh")), "ngram_incr_hot_shingles",
      MaxBucket, minSize = 1)
    val pairs = ex.filter(col("is_batch"))
      .join(postings, Seq("shingle"))
      .select(col("doc_id"), col("n_sh").as("na"), explode(col("ds")).as("c"))
      .groupBy(col("doc_id"), col("c.doc_id").as("corpus_doc"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"),
           first(col("c.n_sh")).as("nb"))
      .withColumn("jaccard",
        rnd(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.02)
    // best match = max jaccard, ties → min corpus doc: a plain agg over
    // a (jaccard, -corpus_doc) struct — no per-doc window sort
    val best = pairs
      .groupBy(col("doc_id"))
      .agg(max(struct(col("jaccard"), (-col("corpus_doc")).as("neg")))
        .as("m"))
      .select(col("doc_id"), (-col("m.neg")).as("matched_doc_id"),
              col("m.jaccard").as("jaccard"))
    docs.filter(bucket16(col("doc_id")) === 0).select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("jaccard") >= 0.5, lit("near_dup_of_corpus"))
          .when(col("jaccard").isNotNull, lit("similar"))
          .otherwise(lit("new")).as("verdict"),
        col("matched_doc_id"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered incremental dedup — the PERSISTENT-INDEX form of
    * [[incremental]] at 100 TB: the standing corpus's hash set is
    * represented as a bloom filter (10 bits/item ≈ 1% FPP; ~1.2 GB for
    * 10⁹ docs, which requires raising Spark's bloom conf caps — see
    * bloomIncrementalOn), built by Spark's own MERGEABLE
    * BloomFilterAggregate (map-side partial combine — the property that
    * lets a production pipeline maintain the index incrementally,
    * merging each day's partial instead of rebuilding). Batch rows
    * probe the filter BEFORE any join, so non-duplicate rows — the
    * overwhelming majority of a crawl increment — never shuffle; only
    * the FPP-bounded candidate sliver reaches the exact verify join,
    * which removes false positives. No false negatives (bloom
    * guarantee) + exact verify ⇒ output EXACTLY the true
    * duplicate-of-corpus set → full DuckDB oracle despite the sketch
    * in the plan. The filter rides a scalar subquery (the same shape
    * Spark's runtime row-level filtering injects, SPARK-32268); here
    * it is derived in-query so the oracle can rebuild the semantics.
    * BloomDedupSpec locks the plan (might_contain below the join) and
    * output parity with the sketch-free formulation.
    *
    * The dir entry plants cross-split duplicates via
    * [[plantCrossSplitDups]] — the synthetic corpus has no batch doc
    * whose exact content recurs in the corpus split, so without the
    * planting the oracle row was green on ZERO rows and the bloom
    * probe, the dynamic sizing, and the exact-verify join ran
    * unexercised by the hard correctness signal (the etl_quarantine
    * precedent: a trivially-empty oracle verifies nothing). */
  def bloomIncremental(spark: SparkSession, dir: String): DataFrame =
    bloomIncrementalOn(spark, plantCrossSplitDups(Tables.documents(spark, dir)))

  /** Deterministic cross-split duplicate planting for
    * [[bloomIncremental]]'s dir entry: every doc_id ≡ 0 (mod 7) has
    * its text replaced IN-PLAN (one map-only when(), no new shuffle)
    * by one of 3 canonical group texts keyed by (doc_id div 7) mod 3.
    * Each group's ~n/21 members span both md5 split buckets at every
    * test SF (verified 8 output rows at sf0.001/0.01, 53 at sf0.1),
    * so the batch members surface as true duplicates-of-corpus and
    * the whole probe→verify chain is exercised by the DuckDB hash
    * check. The planted text is its own normText normalization
    * (lowercase alnum tokens, single spaces), so the oracle CTE
    * mirrors it verbatim. Integral `div` (not `/`): doc ids must
    * group exactly at any magnitude, not through a double. */
  private[graft] def plantCrossSplitDups(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit("graft planted duplicate block "),
          pmod(expr("doc_id div 7"), lit(3)).cast("string")))
        .otherwise(col("text")))

  /** Frame-level core (docs must have doc_id + text; BloomDedupSpec
    * plants adversarial fixtures through it directly). The filter is
    * SIZED TO THE CORPUS (~10 bits/item ≈ 1% FPP) from a row count
    * read at plan build — a fixed width would saturate on a larger
    * corpus and silently stop filtering, the embedCosineLsh lesson.
    * Spark's BloomFilterAggregate additionally CLAMPS its size to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (defaults 4M items / 64M bits), which would silently re-introduce
    * exactly that saturation above ~6.7M docs — so both caps are raised
    * to the computed size before the query is built. The row count is
    * read from a doc_id-only projection (column-pruned scan — for
    * parquet a footer-metadata count); it is the ONE eager job this
    * builder runs before the returned frame executes, the same
    * plan-build statistics lookup a cost-based planner makes.
    * The temp view is uniquely named and dropped as soon as the
    * returned DataFrame is analyzed, so concurrent callers on one
    * session cannot cross-bind. */
  private[graft] def bloomIncrementalOn(spark: SparkSession,
                                        docs: DataFrame): DataFrame = {
    graft.functions.Registry.register(spark)
    val hashed = docs
      .select(col("doc_id"), md5(normText(col("text"))).as("norm_hash"),
              (bucket16(col("doc_id")) === 0).as("is_batch"))
    val estItems = math.max(docs.select(col("doc_id")).count(), 1000L)
    val numBits = estItems * 10
    // raise (never lower) the aggregate's silent clamp caps to honor
    // the dynamic sizing at any corpus size
    def raiseTo(key: String, v: Long): Unit =
      if (spark.conf.getOption(key).forall(_.toLong < v))
        spark.conf.set(key, v.toString)
    raiseTo("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", estItems)
    raiseTo("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", numBits)
    val view = "graft_bloom_docs_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    hashed.createOrReplaceTempView(view)
    try {
      val df = spark.sql(
        s"""WITH corpus AS (SELECT * FROM $view WHERE NOT is_batch),
           ck AS (SELECT norm_hash, min(doc_id) AS corpus_keeper
                  FROM corpus GROUP BY norm_hash),
           batch AS (SELECT doc_id, norm_hash FROM $view WHERE is_batch),
           cand AS (
             SELECT * FROM batch
             WHERE graft_might_contain(
               (SELECT graft_bloom_agg(xxhash64(norm_hash),
                                       CAST($estItems AS BIGINT),
                                       CAST($numBits AS BIGINT)) FROM corpus),
               xxhash64(norm_hash)))
           SELECT c.doc_id, c.norm_hash, ck.corpus_keeper
           FROM cand c JOIN ck ON c.norm_hash = ck.norm_hash
           ORDER BY c.doc_id""")
      df.queryExecution.analyzed // bind the view BEFORE it is dropped
      df
    } finally spark.catalog.dropTempView(view)
  }

  /** Benchmark decontamination — flag training documents sharing ≥10%
    * of an EVAL document's distinct 3-gram shingles (the train/test
    * overlap check every serious pretraining pipeline runs). The eval
    * set is the deterministic md5 split's last bucket, standing in for
    * a held-out benchmark.
    *
    * Same sub-quadratic skeleton as ngramJaccard: train and eval docs
    * meet ONLY on shared shingles (bucket-collect + double explode —
    * no self-join recompute, no train×eval cross product), and the
    * overlap fraction is relative to the eval doc (the thing being
    * protected). Hot-shingle skew is bounded by the same MaxBucket
    * drop guard as jaccard. */
  def contamination(spark: SparkSession, dir: String): DataFrame =
    contaminationOn(Tables.documents(spark, dir))

  /** Hashed-wire twin: the shingle bucket-collect keys on
    * xxhash64(shingle) — the one exchange this operator runs carries
    * 8-byte keys instead of 3-token strings. A collision merges two
    * shingles' buckets, inflating `inter` — overlap over-estimate, the
    * conservative direction for decontamination (suspect more, miss
    * nothing); odds as the spans_hashed note, nil at test SF → full
    * oracle. `n_sh` denominators are exact (computed pre-hash). */
  def contaminationHashed(spark: SparkSession, dir: String): DataFrame =
    contaminationOn(Tables.documents(spark, dir), hashed = true)

  /** Frame-level core (docs must have doc_id + text). Same hot-shingle
    * drop guard as jaccardPairsOn (`contamination_hot_shingles` observed
    * metric): a shingle in >maxBucket docs identifies nothing about
    * train/eval overlap, and the overlap fraction is an exact count.
    * Same conservative bias as jaccardPairsOn: n_sh_eval keeps dropped
    * shingles, so overlap can only be UNDERestimated for pairs that
    * also shared a hot shingle — for decontamination, pair the guard
    * with a maxBucket above any real benchmark's doc count (eval sets
    * are tiny; a benchmark shingle can never legitimately be hot). */
  private[graft] def contaminationOn(docs: DataFrame,
                                     maxBucket: Int = MaxBucket,
                                     hashed: Boolean = false): DataFrame = {
    val strRows = shingleRows(docs)
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("is_eval", bucket16(col("doc_id")) === 15)
    // hash AFTER n_sh (exact denominators); the bucket key is 8 bytes
    val ex = if (hashed)
      strRows.withColumn("shingle", xxhash64(col("shingle")))
    else strRows
    val byShingle = guardedBuckets(ex, Seq("shingle"),
      struct(col("doc_id"), col("is_eval"), col("n_sh")),
      "contamination_hot_shingles", maxBucket)
    byShingle
      .select(explode(col("ds")).as("t"), col("ds"))
      .filter(!col("t.is_eval"))
      .select(col("t"), explode(col("ds")).as("e"))
      .filter(col("e.is_eval"))
      .groupBy(col("t.doc_id").as("train_doc_id"),
               col("e.doc_id").as("eval_doc_id"))
      .agg(count(lit(1)).as("inter"), first(col("e.n_sh")).as("n_sh_eval"))
      .withColumn("overlap", rnd(col("inter") * 1.0 / col("n_sh_eval"), 4))
      .filter(col("overlap") >= 0.1)
      .select(col("train_doc_id"), col("eval_doc_id"), col("overlap"))
      .orderBy(col("overlap").desc, col("train_doc_id"), col("eval_doc_id"))
  }

  /** Embedding-cosine near-dup pairs, blocked by label. */
  def embedCosine(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("label"), col("vec_id").as("id_a"),
                     col("embedding").as("va"))
    val b = e.select(col("label"), col("vec_id").as("id_b"),
                     col("embedding").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
              rnd(VectorFunctions.cosine(col("va"), col("vb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
  }

  /** Incremental EMBEDDING near-dup — the daily-increment shape for the
    * semantic family, completing the incremental trio (exact hash →
    * [[incremental]], lexical n-gram → [[ngramIncremental]], semantic →
    * here): a new vector batch (the same deterministic 1/16 md5 split)
    * scores only against the STANDING CORPUS inside its label block;
    * per batch vector the verdict is `near_dup_of_corpus`
    * (best cos ≥ 0.9), `similar` (≥ 0.3), or `new`.
    *
    * Scale: the corpus side persists label-blocked (in production the
    * blocks are the hyperplane-LSH buckets of embedLshPairs / the IVF
    * cells of the ANN index — here the exact label block so the oracle
    * can rebuild the semantics); the batch probes only its own blocks,
    * corpus never self-pairs, and best-match is the same max(struct)
    * aggregate as ngramIncremental — no per-vector window sort. */
  def embedIncremental(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(spark)
    embedIncrementalOn(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding")))
  }

  /** Frame-level core (rows must have vec_id + label + embedding). */
  private[graft] def embedIncrementalOn(e: DataFrame): DataFrame = {
    val withSplit = e.withColumn("is_batch", bucket16(col("vec_id")) === 0)
    val corpus = withSplit.filter(!col("is_batch"))
      .select(col("label"), col("vec_id").as("corpus_id"),
              col("embedding").as("vc"))
    val scored = withSplit.filter(col("is_batch"))
      .select(col("label"), col("vec_id"), col("embedding").as("vb"))
      .join(corpus, Seq("label"))
      .select(col("vec_id"), col("corpus_id"),
              rnd(VectorFunctions.cosine(col("vb"), col("vc")), 4)
                .as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
    val best = scored.groupBy(col("vec_id"))
      .agg(max(struct(col("cos_sim"), (-col("corpus_id")).as("neg"))).as("m"))
      .select(col("vec_id"), (-col("m.neg")).as("matched_vec_id"),
              col("m.cos_sim").as("cos_sim"))
    withSplit.filter(col("is_batch")).select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("cos_sim") >= 0.9, lit("near_dup_of_corpus"))
          .when(col("cos_sim").isNotNull, lit("similar"))
          .otherwise(lit("new")).as("verdict"),
        col("matched_vec_id"), col("cos_sim"))
      .orderBy(col("vec_id"))
  }

  /** Embedding near-dup pairs blocked by hyperplane-LSH band buckets —
    * the 100 TB path: `label` cardinality doesn't bound the per-block
    * cross join as the corpus grows.
    *
    * The band signature width SCALES WITH THE CORPUS:
    * planesPerBand r = clamp(4, ⌈log₂ N⌉, 24), so the per-band bucket
    * space (2^r) grows at least linearly with N and expected bucket
    * occupancy stays O(1) — a fixed-width signature has a CONSTANT
    * bucket count, which turns each bucket's pair expansion into
    * O((N/2^r)²) as the corpus grows. Recall in the regime dedup cares
    * about is insensitive to the widening: at cos 0.98 the per-plane
    * agreement is p = 1−θ/π ≈ 0.936, and the 16-band collision prob
    * 1−(1−p^r)^16 stays ≥0.99 for every r ≤ 24 (DedupQualitySpec
    * asserts this with planted near-duplicates at the sf0.1-scale
    * width). N is read once at plan build — a parquet metadata count,
    * the same row-count lookup any cost-based planner makes; the width
    * is a structural plan parameter, so it cannot be a lazy column.
    *
    * Residual oversized buckets (mass-duplicates collide at ANY width)
    * star-expand to the bucket's min vec_id instead of all-pairs:
    * O(|bucket|) pairs. For the mass-duplicate case that triggers the
    * cap, the min member is similar to every other member and the star
    * preserves the component's connectivity; a near-dup pair that is
    * merely CO-BUCKETED with unrelated mass-duplicates loses this
    * band's edge (its star edges fail the threshold) and must collide
    * in one of the other 15 bands — the standard recall/cost trade of
    * capping, taken here over the O(|bucket|²) blowup. Bucket-collect +
    * double explode (no self-join recompute); approximate by design →
    * rows-only. */
  def embedCosineLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = math.max(e.count(), 2L)
    val r = math.max(4, math.min(24,
      math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt))
    embedLshPairs(spark, e, bands = 16, planesPerBand = r, threshold = 0.3)
  }

  /** Frame-level core (rows must have vec_id + embedding): banded
    * LSH near-dup pairs with the oversized-bucket star fallback. */
  def embedLshPairs(spark: SparkSession, e: DataFrame, bands: Int,
                    planesPerBand: Int, threshold: Double,
                    maxBucket: Int = 1024): DataFrame = {
    VectorFunctions.register(spark)
    val banded = e
      .select(col("vec_id"), col("embedding"),
              posexplode(VectorFunctions.hyperplaneBands(
                col("embedding"), bands, planesPerBand)))
      .select(col("vec_id"), col("embedding"),
              col("pos").as("band_idx"), col("col").as("band_hash"))
    // oversized buckets: only the min-id member expands (star), emitting
    // O(|bucket|) rows and never materializing the bucket (two-pass
    // guard; the `embed_lsh_hot_buckets` observed metric audits them)
    guardedStarPairs(banded, Seq("band_idx", "band_hash"),
      struct(col("vec_id"), col("embedding")), "vec_id",
      "embed_lsh_hot_buckets", maxBucket)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
              rnd(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")), 4)
                .as("cos_sim"))
      .distinct()
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
  }

  /** Sub-document (paragraph-level) exact dedup — the boilerplate-
    * removal stage: headers/footers/nav text repeat across millions of
    * pages while the documents as wholes stay distinct, so doc-level
    * dedup never catches them. Semantics: explode docs into paragraphs,
    * keep the first occurrence (min doc_id, para_idx) of each distinct
    * paragraph corpus-wide, report per-doc how much of it was
    * boilerplate.
    *
    * The synthetic corpus is one line of word soup per doc (no
    * paragraph structure), so the entry seeds a DETERMINISTIC FIXTURE:
    * three paragraphs per doc drawn from a 149-key pool
    * ((doc_id·3+i) mod 149 — collision-rich by construction, mirrored
    * exactly in the oracle). What's verified is the real mechanism:
    * one shuffle on the paragraph content key, per-key first-occurrence
    * ranking (bounded groups — a window over ~n/149 rows per key, the
    * same shape real boilerplate buckets have), then a per-doc
    * map-side-combined rollup. At 100 TB: paragraphs partition by
    * content hash; no step is corpus-global. */
  def paragraphs(spark: SparkSession, dir: String): DataFrame = {
    val seeded = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(sequence(lit(0), lit(2))).as("para_idx"))
      .withColumn("para_key", (col("doc_id") * 3 + col("para_idx")) % 149)
    val byPara = Window.partitionBy(col("para_key"))
      .orderBy(col("doc_id"), col("para_idx"))
    seeded
      .withColumn("is_dup", (row_number().over(byPara) > 1).cast("int"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
           sum(col("is_dup")).cast("long").as("n_dup_paras"),
           rnd(sum(col("is_dup")) / count(lit(1)).cast("double"), 4)
             .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Semantic dedup, the SemDeDup shape: k-means-cluster the embedding
    * space (similarity.KMeans, 3 Lloyd rounds), then emit near-dup
    * pairs ONLY within a cluster — the data-adaptive complement to the
    * hyperplane blocking of embedCosineLsh (clusters follow the
    * corpus's own density instead of fixed random cuts, so paraphrase
    * groups that straddle LSH band boundaries still meet).
    *
    * Scale: cluster assignment is a pure map (literal trained
    * centroids; see KMeans scaladoc), so the two join branches
    * recompute only a scan+map — no checkpoint needed. The per-cluster
    * pair expansion is O((N/k)²·k); at 100 TB k grows with the corpus
    * (SemDeDup uses ~100k clusters at web scale) and assignment
    * switches to the broadcast-codebook max_by shape
    * (Knn.assignToCentroids) — the pair stage is unchanged. The
    * production threshold is SemDeDup's ~0.99 "same meaning, different
    * tokens" band (the default); the query entry runs at 0.4, inside
    * the synthetic corpus's similarity range (its max pairwise cosine
    * is ~0.5 — there are no planted semantic dups to find at 0.99).
    * Approximate by design (cluster-boundary misses) → rows-only;
    * KMeansSpec plants an exact duplicate pair and asserts it is
    * always co-clustered and emitted. */
  def semantic(spark: SparkSession, dir: String,
               thr: Double = 0.99): DataFrame = {
    VectorFunctions.register(spark)
    semanticPairs(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      k = 16, iters = 3, thr = thr)
  }

  /** Fixture-friendly core of [[semantic]] (KMeansSpec plants exact
    * duplicates through it). */
  private[graft] def semanticPairs(e: DataFrame, k: Int, iters: Int,
                                   thr: Double): DataFrame = {
    // fit on the bounded training frame (KMeans.trainPin — the Faiss
    // train() contract: pass-through under the cap, pinned md5 sample
    // past it); the corpus-side assignment below is a pure map
    val (cents, _) = graft.similarity.KMeans.fit(
      graft.similarity.KMeans.trainPin(e), k, iters)
    val assigned = graft.similarity.KMeans.assign(e, cents)
      .select(col("cluster"), col("vec_id"), col("embedding"))
    val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
                            col("embedding").as("va"))
    val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
                            col("embedding").as("vb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cluster"), col("id_a"), col("id_b"),
              rnd(VectorFunctions.cosine(col("va"), col("vb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= thr)
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
  }

  /** URL-level dedup — the cheapest and highest-yield dedup pass a web
    * corpus runs BEFORE any content hashing: crawl frontiers revisit
    * the same page under scheme/case/tracking-parameter variants, and
    * canonicalizing the URL collapses them without touching document
    * bytes. Canonicalization: lowercase, strip scheme + www., drop
    * tracking params (utm_*, ref), strip trailing separators — all
    * codegen'd regexp/string ops, map-only over the scan; the only
    * shuffle is the final hash-agg on the canonical key (identical
    * shape to exactDocs). No backreferences in any pattern — Java and
    * RE2 replacement syntaxes differ, and the oracle must express the
    * SAME rewrite in DuckDB.
    *
    * The corpus has no URL column, so one is synthesized in-plan
    * (source → host, doc_id → path/params) with deterministic tracking
    * noise the canonicalizer must remove; docs sharing (source,
    * doc_id%40) collapse. */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val urls = Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(lit("https://WWW."), col("source"), lit(".Example.com/p/"),
        (col("doc_id") % 40).cast("string"),
        lit("/?id="), (col("doc_id") % 40).cast("string"),
        lit("&utm_source=feed&utm_campaign=c"), (col("doc_id") % 3).cast("string"),
        lit("&ref=r"), (col("doc_id") % 7).cast("string")).as("url"))
    urls
      .withColumn("c", lower(col("url")))
      .withColumn("c", regexp_replace(col("c"), "^https?://(www\\.)?", ""))
      .withColumn("c", regexp_replace(col("c"), "[&](utm_[a-z]+|ref)=[^&]*", ""))
      .withColumn("canonical", regexp_replace(col("c"), "[?&/]+$", ""))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy(col("canonical"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_url"           -> (urlDedup _),
    "dedup_semantic"      -> ((s, d) => semantic(s, d, thr = 0.4)),
    "dedup_paragraphs"    -> (paragraphs _),
    "dedup_embed_lsh"     -> (embedCosineLsh _),
    "dedup_exact_docs"    -> (exactDocs _),
    "dedup_winnow"        -> (winnow _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_containment" -> (containment _),
    "dedup_clusters"      -> (clustersEntry _),
    "dedup_canonical"     -> (canonicalEntry _),
    "dedup_incremental"   -> (incremental _),
    "dedup_ngram_incremental" -> (ngramIncremental _),
    "dedup_ngram_incremental_hashed" -> (ngramIncrementalHashed _),
    "dedup_minhash_incremental" -> (minhashIncremental _),
    "dedup_bloom_incremental" -> (bloomIncremental _),
    "dedup_contamination" -> (contamination _),
    "dedup_contamination_hashed" -> (contaminationHashed _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_minhash_verified" -> (minhashVerified _),
    "dedup_simhash"       -> (simhash _),
    "dedup_embed_cosine"  -> (embedCosine _),
    "dedup_embed_incremental" -> (embedIncremental _))

  private val baseOracles: Map[String, String] = Map(
    "dedup_url" ->
      """WITH u AS (
           SELECT doc_id,
                  'https://WWW.' || source || '.Example.com/p/' ||
                  CAST(doc_id % 40 AS VARCHAR) ||
                  '/?id=' || CAST(doc_id % 40 AS VARCHAR) ||
                  '&utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR) ||
                  '&ref=r' || CAST(doc_id % 7 AS VARCHAR) AS url
           FROM documents),
         c AS (
           SELECT doc_id,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(lower(url),
                        '^https?://(www\.)?', '', 'g'),
                      '[&](utm_[a-z]+|ref)=[^&]*', '', 'g'),
                    '[?&/]+$', '', 'g') AS canonical
           FROM u)
         SELECT canonical, count(*) AS n_dups, min(doc_id) AS keeper_doc_id
         FROM c GROUP BY 1 ORDER BY canonical""",
    "dedup_winnow" ->
      """WITH t AS (SELECT doc_id,
                           regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                    FROM documents),
         g AS (SELECT doc_id, i AS pos,
                      CAST(('0x' || substr(md5(
                        w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]), 1, 8))
                        AS BIGINT) AS h
               FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
                     FROM t WHERE len(w) >= 3)),
         s AS (SELECT doc_id, h,
                      lead(h, 1) OVER d AS h2, lead(h, 2) OVER d AS h3,
                      lead(h, 3) OVER d AS h4
               FROM g WINDOW d AS (PARTITION BY doc_id ORDER BY pos)),
         fp AS (SELECT DISTINCT doc_id, least(h, h2, h3, h4) AS fp
                FROM s WHERE h4 IS NOT NULL),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared
           FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT * FROM pairs WHERE n_shared >= 2
         ORDER BY n_shared DESC, doc_a, doc_b""",
    "dedup_paragraphs" ->
      """WITH p AS (
           SELECT doc_id, gs.i AS para_idx,
                  (doc_id * 3 + gs.i) % 149 AS para_key
           FROM documents, generate_series(0, 2) AS gs(i)),
         r AS (
           SELECT doc_id,
                  CASE WHEN row_number() OVER (PARTITION BY para_key
                         ORDER BY doc_id, para_idx) > 1
                       THEN 1 ELSE 0 END AS is_dup
           FROM p)
         SELECT doc_id, count(*) AS n_paras,
                CAST(sum(is_dup) AS BIGINT) AS n_dup_paras,
                floor(sum(is_dup) / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
                  / 10000 AS dup_frac
         FROM r GROUP BY doc_id ORDER BY doc_id""",
    "dedup_exact_docs" ->
      """SELECT md5(array_to_string(
                  regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS norm_hash,
                count(*) AS n_copies,
                min(doc_id) AS keeper_doc_id
         FROM documents GROUP BY 1""",
    "dedup_containment" ->
      """WITH toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
           FROM toks),
         ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         exq AS (
           SELECT * FROM ex WHERE shingle NOT IN (
             SELECT shingle FROM ex GROUP BY shingle
             HAVING count(*) > 4096)),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
           FROM exq a JOIN exq b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         dir AS (
           SELECT CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS doc_contained,
                  CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS doc_container,
                  CAST(least(na, nb) AS BIGINT) AS n_contained,
                  floor((inter * 1.0 / least(na, nb)) * 10000 + 0.5) / 10000
                    AS containment
           FROM pairs)
         SELECT doc_contained, doc_container, n_contained, containment
         FROM dir WHERE containment >= 0.25
         ORDER BY containment DESC, doc_contained, doc_container""",
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
           FROM toks),
         ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         exq AS (
           SELECT * FROM ex WHERE shingle NOT IN (
             SELECT shingle FROM ex GROUP BY shingle
             HAVING count(*) > 4096)),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
           FROM exq a JOIN exq b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
                floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5) / 10000 AS jaccard
         FROM pairs
         WHERE floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5) / 10000 >= 0.02
         ORDER BY jaccard DESC, doc_a, doc_b""",
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
           FROM toks),
         ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         p0 AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
                  any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         p1 AS (
           SELECT doc_a, doc_b FROM p0
           WHERE floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5) / 10000
                 >= 0.02),
         edges AS (SELECT doc_a AS u, doc_b AS v FROM p1
                   UNION ALL SELECT doc_b, doc_a FROM p1),
         cc(node, label) AS (
           SELECT u, u FROM (SELECT DISTINCT u FROM edges) n(u)
           UNION
           SELECT e.v, cc.label FROM cc JOIN edges e ON cc.node = e.u)
         SELECT node AS doc_id, min(label) AS cluster_id
         FROM cc GROUP BY node ORDER BY doc_id""",
    "dedup_bloom_incremental" ->
      """WITH d AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0
                       THEN 'graft planted duplicate block ' ||
                            CAST((doc_id // 7) % 3 AS VARCHAR)
                       ELSE text END AS text
           FROM documents),
         h AS (
           SELECT doc_id,
                  md5(array_to_string(
                    regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS norm_hash,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                       AS INTEGER) = 0 AS is_batch
           FROM d),
         ck AS (SELECT norm_hash, min(doc_id) AS corpus_keeper
                FROM h WHERE NOT is_batch GROUP BY 1)
         SELECT b.doc_id, b.norm_hash, ck.corpus_keeper
         FROM h b JOIN ck USING (norm_hash)
         WHERE b.is_batch
         ORDER BY b.doc_id""",
    "dedup_incremental" ->
      """WITH h AS (
           SELECT doc_id,
                  md5(array_to_string(
                    regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS norm_hash,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                       AS INTEGER) = 0 AS is_batch
           FROM documents),
         ck AS (SELECT norm_hash, min(doc_id) AS corpus_keeper
                FROM h WHERE NOT is_batch GROUP BY 1),
         bk AS (SELECT norm_hash, min(doc_id) AS batch_keeper
                FROM h WHERE is_batch GROUP BY 1)
         SELECT b.doc_id,
                CASE WHEN ck.corpus_keeper IS NOT NULL THEN 'dup_of_corpus'
                     WHEN bk.batch_keeper < b.doc_id THEN 'dup_in_batch'
                     ELSE 'new' END AS verdict,
                coalesce(ck.corpus_keeper,
                         CASE WHEN bk.batch_keeper < b.doc_id
                              THEN bk.batch_keeper ELSE b.doc_id END)
                  AS keeper_doc_id
         FROM h b
         LEFT JOIN ck ON b.norm_hash = ck.norm_hash
         LEFT JOIN bk ON b.norm_hash = bk.norm_hash
         WHERE b.is_batch
         ORDER BY b.doc_id""",
    "dedup_ngram_incremental" ->
      """WITH toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
           FROM toks),
         ex AS (
           SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                       AS INTEGER) = 0 AS is_batch
           FROM sh),
         corpus AS (SELECT * FROM ex WHERE NOT is_batch),
         cq AS (
           SELECT * FROM corpus WHERE shingle NOT IN (
             SELECT shingle FROM corpus GROUP BY shingle
             HAVING count(*) > 4096)),
         pairs AS (
           SELECT b.doc_id AS doc_id, c.doc_id AS corpus_doc,
                  count(*) AS inter,
                  any_value(b.n_sh) AS na, any_value(c.n_sh) AS nb
           FROM ex b JOIN cq c ON b.shingle = c.shingle
           WHERE b.is_batch
           GROUP BY 1, 2),
         scored AS (
           SELECT doc_id, corpus_doc,
                  floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5)
                    / 10000 AS jaccard
           FROM pairs
           WHERE floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5)
                   / 10000 >= 0.02),
         best AS (
           SELECT doc_id, corpus_doc, jaccard FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY jaccard DESC, corpus_doc) AS rn
             FROM scored) WHERE rn = 1)
         SELECT d.doc_id,
                CASE WHEN b.jaccard >= 0.5 THEN 'near_dup_of_corpus'
                     WHEN b.jaccard IS NOT NULL THEN 'similar'
                     ELSE 'new' END AS verdict,
                b.corpus_doc AS matched_doc_id, b.jaccard
         FROM (SELECT doc_id FROM documents
               WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                          AS INTEGER) = 0) d
         LEFT JOIN best b USING (doc_id)
         ORDER BY d.doc_id""",
    "dedup_contamination" ->
      """WITH toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
           FROM toks),
         ex AS (SELECT doc_id, len(s) AS n_sh,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                            AS INTEGER) = 15 AS is_eval,
                       unnest(s) AS shingle
                FROM sh),
         pairs AS (
           SELECT t.doc_id AS train_doc_id, e.doc_id AS eval_doc_id,
                  count(*) AS inter, any_value(e.n_sh) AS n_sh_eval
           FROM ex t JOIN ex e ON t.shingle = e.shingle
           WHERE NOT t.is_eval AND e.is_eval
           GROUP BY 1, 2)
         SELECT train_doc_id, eval_doc_id,
                floor((inter * 1.0 / n_sh_eval) * 10000 + 0.5) / 10000 AS overlap
         FROM pairs
         WHERE floor((inter * 1.0 / n_sh_eval) * 10000 + 0.5) / 10000 >= 0.1
         ORDER BY overlap DESC, train_doc_id, eval_doc_id""",
    "dedup_canonical" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
           FROM toks),
         ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         p0 AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
                  any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         p1 AS (
           SELECT doc_a, doc_b FROM p0
           WHERE floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5) / 10000
                 >= 0.02),
         edges AS (SELECT doc_a AS u, doc_b AS v FROM p1
                   UNION ALL SELECT doc_b, doc_a FROM p1),
         cc(node, label) AS (
           SELECT u, u FROM (SELECT DISTINCT u FROM edges) n(u)
           UNION
           SELECT e.v, cc.label FROM cc JOIN edges e ON cc.node = e.u),
         lab AS (SELECT node AS doc_id, min(label) AS cluster_id
                 FROM cc GROUP BY node),
         sel AS (
           SELECT coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                  d.doc_id, d.n_chars
           FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         r AS (
           SELECT cluster_id, doc_id, n_chars,
                  row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY n_chars DESC, doc_id) AS rk,
                  count(*) OVER (PARTITION BY cluster_id) AS n_members
           FROM sel)
         SELECT cluster_id, doc_id AS keeper_doc_id,
                CAST(n_chars AS BIGINT) AS keeper_chars,
                CAST(n_members AS BIGINT) AS n_members
         FROM r WHERE rk = 1 ORDER BY cluster_id""",
    "dedup_embed_cosine" ->
      """WITH e AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings)
         SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
                floor((list_dot_product(a.v, b.v) /
                      (sqrt(list_dot_product(a.v, a.v)) *
                       sqrt(list_dot_product(b.v, b.v)))) * 10000 + 0.5) / 10000 AS cos_sim
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE floor((list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v)) *
                      sqrt(list_dot_product(b.v, b.v)))) * 10000 + 0.5) / 10000 >= 0.3
         ORDER BY cos_sim DESC, id_a, id_b""",
    "dedup_embed_incremental" ->
      """WITH e AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                  CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 1))
                       AS INTEGER) = 0 AS is_batch
           FROM embeddings),
         scored AS (
           SELECT b.vec_id, c.vec_id AS corpus_id,
                  floor((list_dot_product(b.v, c.v) /
                        (sqrt(list_dot_product(b.v, b.v)) *
                         sqrt(list_dot_product(c.v, c.v)))) * 10000 + 0.5)
                    / 10000 AS cos_sim
           FROM e b JOIN e c ON b.label = c.label
           WHERE b.is_batch AND NOT c.is_batch),
         kept AS (SELECT * FROM scored WHERE cos_sim >= 0.3),
         best AS (
           SELECT vec_id, corpus_id, cos_sim FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY cos_sim DESC, corpus_id) AS rn
             FROM kept) WHERE rn = 1)
         SELECT e.vec_id,
                CASE WHEN b.cos_sim >= 0.9 THEN 'near_dup_of_corpus'
                     WHEN b.cos_sim IS NOT NULL THEN 'similar'
                     ELSE 'new' END AS verdict,
                b.corpus_id AS matched_vec_id, b.cos_sim
         FROM e LEFT JOIN best b USING (vec_id)
         WHERE e.is_batch
         ORDER BY e.vec_id""")

  /** Hashed-wire twins carry their string form's FULL oracle — rows are
    * identical absent an xxhash64 collision (the spans_hashed
    * precedent; odds in the twin scaladocs, nil at any test SF). */
  val oracles: Map[String, String] = baseOracles ++ Map(
    "dedup_ngram_incremental_hashed" ->
      baseOracles("dedup_ngram_incremental"),
    "dedup_contamination_hashed" -> baseOracles("dedup_contamination"))
}
