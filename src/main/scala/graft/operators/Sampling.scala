package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Deterministic sampling & dataset splitting.
  *
  * A reproducible training pipeline can't use `rand()`-based sampling —
  * re-runs must select the same rows on any cluster layout. Selection
  * here keys off md5 of the stable id (content-addressed, identical in
  * every engine), so samples and train/val/test splits are pure
  * functions of the data. Both ops are map-only (predicate/projection
  * on the scan, no shuffle).
  */
object Sampling {

  /** First hex nibble of md5(id) as 0..15 — the deterministic "coin". */
  private def bucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** ~25% deterministic sample per language (stratification key kept in
    * the output so downstream can verify per-stratum rates). */
  def sampleDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(bucket16(col("doc_id")) < 4)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Deterministic 80/10/10 train/val/test assignment. */
  def splitDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("b", bucket16(col("doc_id")))
      .withColumn("split",
        when(col("b") < 13, "train")       // 13/16 ≈ 81%
          .when(col("b") < 14, "val")      // 1/16
          .otherwise("test"))              // 2/16
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))

  /** GROUP-aware (leakage-safe) train/val/test split: the md5 coin
    * keys on the SOURCE, not the doc, so an entire domain lands in one
    * split — per-doc splitting (split_train_test) lets near-duplicates
    * and templated siblings from the same crawl domain straddle
    * train/test, inflating eval (the leakage every serious LLM data
    * pipeline splits by group/domain/url-host to avoid). Same 13/1/2
    * nibble bands as the per-doc split; map-only assignment (the coin
    * is a row-local function of the source column — no group table,
    * no join), one partial-agg shuffle for the audit rollup. */
  def splitGroupAware(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("b",
        conv(substring(md5(col("source")), 1, 1), 16, 10).cast("int"))
      .withColumn("split",
        when(col("b") < 13, "train")
          .when(col("b") < 14, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(countDistinct(col("source")).as("n_sources"),
           count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("n_chars"))
      .orderBy(col("split"))

  /** Deterministic k-fold cross-validation assignment (k=5): fold =
    * md5-derived value mod k — a pure function of the id, so every
    * re-run (and every engine) deals the same folds; map-only plus one
    * tiny rollup. Emits the (fold × lang) audit counts an eval
    * pipeline checks for balance before trusting CV numbers. */
  def kfold(spark: SparkSession, dir: String): DataFrame = {
    val K = 5
    Tables.documents(spark, dir)
      .withColumn("fold",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
           .cast("long") % K).cast("long"))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("fold"), col("lang"))
  }

  /** Stratified class balancing: deterministically downsample every
    * language to the smallest class's size (rank within stratum by the
    * md5 coin, keep rank ≤ min class count). The min count is a lazy
    * 1-row aggregate broadcast into the filter — no driver-side count.
    * One shuffle on the stratum key; the per-stratum window sort is the
    * standard price of exact balancing (approximate balancing would
    * sampleBy instead). */
  def stratifiedBalance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val minCnt = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .agg(min(col("c")).as("min_c"))
    docs.withColumn("rk", row_number().over(byLang))
      .crossJoin(broadcast(minCnt))
      .filter(col("rk") <= col("min_c"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget shard packing (sequence-packing lite): assign docs to
    * shards so each shard holds ≈`Budget` chars, in deterministic md5
    * order. Two-phase-scan formulation so it scales: the only GLOBAL
    * running sum is over 256 bucket subtotals (first two md5 nibbles);
    * per-doc cumulative sums run inside each bucket's partition. A
    * single global-order window would funnel the corpus through one
    * task. The offsets branch re-scans two pruned columns — cheaper
    * than caching the corpus at 100 TB. */
  def shardByBudget(spark: SparkSession, dir: String): DataFrame = {
    val Budget = 10000.0
    val w = org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
              md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val inBucket = w.partitionBy(col("bucket"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val withCum = docs.withColumn("cum_in", sum(col("n_chars")).over(inBucket))
    val offsets = docs.groupBy(col("bucket")).agg(sum(col("n_chars")).as("btot"))
      .withColumn("offset",
        coalesce(sum(col("btot")).over(
          w.orderBy(col("bucket"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                         -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    withCum.join(broadcast(offsets), Seq("bucket"))
      .withColumn("shard",
        floor((col("offset") + col("cum_in") - col("n_chars")) / Budget)
          .cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("shard"))
  }

  /** Per-domain cap (the RefinedWeb/C4-style guard against one crawl
    * domain dominating the corpus): keep at most `Cap` docs per source,
    * selected in deterministic md5 order. Routed through the custom
    * TopKPerKey operator (graft.plans) — per-key bounded heaps with a
    * map-side partial pass, so a 100 TB corpus with a million-doc hot
    * domain shuffles ≤ Cap rows per source per input partition instead
    * of sorting whole domains under a window. The md5 "score" makes the
    * cap a reproducible uniform sample of each domain, not a
    * first-k-seen bias. Oracle = the equivalent window formulation. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val Cap = 15
    // first 13 md5 nibbles as a number: 52 bits, exact in double
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("double").as("coin"))
    graft.plans.TopKPerKey(docs, "source", "coin", Cap,
        tiebreak = Some("doc_id"))
      .select(col("source"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Mixture reweighting: deterministic per-language keep rates
    * (downsample the dominant language to 4/16, keep low-resource
    * languages at 12/16) — the source-mixture step that turns a raw
    * crawl into a training mix. Pure map-side predicate (the rate
    * threshold is a row-local CASE on the stratum), one partial-agg
    * shuffle for the accounting. */
  def mixture(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("b", bucket16(col("doc_id")))
      .filter(col("b") < when(col("lang") === "en", 4).otherwise(12))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis–
    * Spirakis A-ES): each doc draws key u^(1/w) from its md5-uniform
    * coin u and weight w; the N largest keys are distributed exactly
    * as sequential weighted draws without replacement — the one-pass,
    * shuffle-free answer to "sample 100 docs proportional to length/
    * quality" (sample_importance reweights but keeps everything;
    * sample_deterministic is unweighted). Global top-N executes as
    * TakeOrderedAndProject (per-partition heads, driver merges N rows)
    * so nothing corpus-global ever sorts; the md5 coin keeps the draw
    * reproducible on any cluster layout and in the oracle. The raw
    * libm pow key stays INTERNAL (last-ulp drift across engines would
    * poison a hash check) — membership is decided by the key, output
    * carries only the sampled rows. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val N = 100
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("double") + 0.5) / lit(4503599627370496.0) // (i+0.5)/2^52 ∈ (0,1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
              pow(u, lit(1.0) / col("n_chars").cast("double")).as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(N)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-based language rebalancing (the mT5/XLM-R mixture
    * rule): sample languages proportionally to p_l^α (α = 0.5) instead
    * of p_l, boosting low-resource languages without flattening the mix
    * entirely — the principled generalization of `mixture`'s hand-set
    * rates. Per-language keep rate r_l = min(1, S·q_l/n_l) with
    * q_l ∝ n_l^α and target sample size S = N/2; the md5 coin (first 6
    * nibbles → uniform [0,1)) makes selection reproducible and
    * engine-portable, and rates round to 6 dp on both engines so
    * boundary docs can't flip.
    *
    * Scale: the rate table is one map-side-combined count per language
    * (O(langs) rows — its window normalization runs on that tiny frame,
    * never the corpus), broadcast back; selection is a row-local
    * predicate, accounting one partial-agg shuffle. */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // O(langs) frame: the empty-partition window is a deliberate
    // single-task pass over ~5 rows, not a corpus-global sort
    val W = org.apache.spark.sql.expressions.Window
    val all = W.partitionBy()
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val rates = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", pow(col("n_docs").cast("double"), 0.5))
      .withColumn("keep_rate", rnd(
        least(lit(1.0),
          sum(col("n_docs")).over(all) * 0.5 *
            (col("w") / sum(col("w")).over(all)) / col("n_docs")), 6))
      .select(col("lang"), col("n_docs"), col("keep_rate"))
    val coin = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("double") / lit(16777216.0)
    docs.join(broadcast(rates), Seq("lang"))
      .filter(coin < col("keep_rate"))
      .groupBy(col("lang"))
      .agg(first(col("n_docs")).as("n_docs"),
           first(col("keep_rate")).as("keep_rate"),
           count(lit(1)).as("n_kept"),
           sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("lang"))
  }

  /** Soft dedup — down-WEIGHT duplicate clusters instead of dropping
    * them (the mixing-stage alternative to dedup_canonical: repeated
    * content contributes one "effective copy" of training signal
    * spread across its variants, so weight = 1/cluster_size). Every
    * doc joins its near-dup cluster label (singletons weight 1.0);
    * the output is the per-doc sampling weight a mixture builder
    * consumes.
    *
    * Scale: identical join shape to dedup_canonical — the label set is
    * pair-graph-sized, so the corpus⋈labels join broadcasts the labels
    * at 100 TB (AQE decides); the cluster-size rollup is a map-side-
    * combined count over the labels alone, never the corpus. */
  def softDedup(spark: SparkSession, dir: String): DataFrame =
    softDedupFrom(Tables.documents(spark, dir),
                  graft.dedup.Dedup.clusterLabels(spark, dir))

  /** The `sample_soft_dedup` ENTRY — fed from the shared persisted
    * labels cache (Dedup.labelsCached; built once per corpus
    * fingerprint, shared with dedup_canonical/dedup_clusters), so the
    * recorded cost is the production label-apply join. Output
    * identical to [[softDedup]] (PersistedLabelsSpec + the unchanged
    * oracle). */
  def softDedupEntry(spark: SparkSession, dir: String): DataFrame =
    softDedupFrom(Tables.documents(spark, dir),
                  graft.dedup.Dedup.labelsCached(spark, dir))

  /** Label-application core shared by the inline and persisted forms
    * (labels written once via Dedup.writeClusterLabels feed this AND
    * canonical — PersistedLabelsSpec proves output identity). */
  private[graft] def softDedupFrom(docs: DataFrame,
                                   labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .join(sizes, Seq("cluster_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
              coalesce(col("n_members"), lit(1L)).as("n_members"),
              rnd(lit(1.0) / coalesce(col("n_members"), lit(1L)), 4)
                .as("weight"))
      .orderBy(col("doc_id"))
  }

  /** [[softDedup]] fed from a persisted labels table (see
    * Dedup.writeClusterLabels) instead of the inline cluster
    * pipeline. */
  def softDedupPersisted(spark: SparkSession, dir: String,
                         labelsPath: String): DataFrame =
    softDedupFrom(Tables.documents(spark, dir),
                  spark.read.parquet(labelsPath))

  /** Deterministic global shuffle-shard — the last step before a corpus
    * is handed to a trainer: every doc gets a pseudo-random but
    * REPRODUCIBLE position (md5 of its id), sharded for parallel
    * readers, ordered within shard. Hash-ordering is the distributed
    * form of "shuffle the dataset": no global sort of the corpus, just
    * a hash partition (the shard key IS the shuffle) and a per-shard
    * sort that at scale is the trainer-file write order. row_number
    * runs per shard partition — parallel, never a single global sort.
    *
    * md5-hex → first 8 nibbles → bigint keeps the key engine-portable
    * (Spark hash() and DuckDB hash() disagree; md5 is md5 everywhere).
    */
  def shardShuffle(spark: SparkSession, dir: String): DataFrame = {
    val S = 16
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("hkey"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
          .as("hkey"))
      .withColumn("shard", pmod(col("hkey"), lit(S)).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_shard_shuffle" -> (shardShuffle _),
    "sample_temperature"   -> (temperatureMixture _),
    "sample_weighted"      -> (weightedSample _),
    "sample_soft_dedup"    -> (softDedupEntry _),
    "sample_domain_cap"    -> (domainCap _),
    "sample_mixture"       -> (mixture _),
    "sample_deterministic" -> (sampleDocs _),
    "sample_stratified"    -> (stratifiedBalance _),
    "shard_by_budget"      -> (shardByBudget _),
    "split_train_test"     -> (splitDocs _),
    "split_group_aware"    -> (splitGroupAware _),
    "split_kfold"          -> (kfold _))

  val oracles: Map[String, String] = Map(
    "sample_weighted" ->
      """SELECT doc_id, lang, n_chars FROM (
           SELECT doc_id, lang, n_chars,
                  pow((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 13)) AS BIGINT) + 0.5)
                        / 4503599627370496.0,
                      1.0 / n_chars) AS es_key
           FROM documents
           ORDER BY es_key DESC, doc_id LIMIT 100)
         ORDER BY doc_id""",
    "sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         r AS (
           SELECT lang, n_docs,
                  floor(least(1.0,
                    (SELECT sum(n_docs) FROM c) * 0.5 *
                    (pow(CAST(n_docs AS DOUBLE), 0.5) /
                     (SELECT sum(pow(CAST(n_docs AS DOUBLE), 0.5)) FROM c))
                    / n_docs) * 1000000 + 0.5) / 1000000 AS keep_rate
           FROM c)
         SELECT d.lang, any_value(r.n_docs) AS n_docs,
                any_value(r.keep_rate) AS keep_rate,
                count(*) AS n_kept,
                CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
         FROM documents d JOIN r ON d.lang = r.lang
         WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))
                    AS BIGINT) / 16777216.0 < r.keep_rate
         GROUP BY d.lang ORDER BY d.lang""",
    "sample_shard_shuffle" ->
      """WITH h AS (
           SELECT doc_id,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS hkey
           FROM documents)
         SELECT doc_id, hkey % 16 AS shard,
                CAST(row_number() OVER (PARTITION BY hkey % 16
                  ORDER BY hkey, doc_id) AS BIGINT) AS pos
         FROM h ORDER BY doc_id""",
    "sample_soft_dedup" ->
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
         m AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
               FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         s AS (SELECT cluster_id, count(*) AS n_members FROM lab GROUP BY 1)
         SELECT m.doc_id, m.cluster_id,
                CAST(coalesce(s.n_members, 1) AS BIGINT) AS n_members,
                floor((1.0 / coalesce(s.n_members, 1)) * 10000 + 0.5) / 10000
                  AS weight
         FROM m LEFT JOIN s USING (cluster_id)
         ORDER BY m.doc_id""",
    "split_kfold" ->
      """SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                     AS BIGINT) % 5 AS fold,
                lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS n_chars
         FROM documents GROUP BY 1, 2 ORDER BY fold, lang""",
    "sample_domain_cap" ->
      """WITH r AS (
           SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source
                    ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                  1, 13)) AS BIGINT) DESC,
                             doc_id) AS rk
           FROM documents)
         SELECT source, doc_id, n_chars FROM r WHERE rk <= 15
         ORDER BY source, doc_id""",
    "sample_mixture" ->
      """WITH b AS (
           SELECT lang, n_chars,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                       AS INTEGER) AS bk
           FROM documents)
         SELECT lang, count(*) AS n_kept,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM b WHERE bk < CASE WHEN lang = 'en' THEN 4 ELSE 12 END
         GROUP BY lang ORDER BY lang""",
    "sample_stratified" ->
      """WITH r AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents),
         m AS (SELECT min(c) AS min_c
               FROM (SELECT count(*) AS c FROM documents GROUP BY lang))
         SELECT doc_id, lang FROM r, m WHERE rk <= min_c
         ORDER BY doc_id""",
    // the two-phase (bucket offsets + in-bucket cumsum) Spark plan sums
    // in exactly (h, doc_id) order because the bucket IS h's prefix, so
    // the oracle's single global window is the same running sum
    "shard_by_budget" ->
      """WITH d AS (
           SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (
           SELECT doc_id, n_chars,
                  SUM(n_chars) OVER (ORDER BY h, doc_id ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum
           FROM d)
         SELECT CAST(floor((gcum - n_chars) / 10000.0) AS BIGINT) AS shard,
                count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM c GROUP BY 1 ORDER BY shard""",
    "sample_deterministic" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                    AS INTEGER) < 4
         ORDER BY doc_id""",
    "split_group_aware" ->
      """WITH b AS (
           SELECT source, n_chars,
                  CAST(('0x' || substr(md5(source), 1, 1)) AS INTEGER) AS bk
           FROM documents)
         SELECT CASE WHEN bk < 13 THEN 'train'
                     WHEN bk < 14 THEN 'val'
                     ELSE 'test' END AS split,
                count(DISTINCT source) AS n_sources,
                count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS n_chars
         FROM b GROUP BY 1 ORDER BY split""",
    "split_train_test" ->
      """WITH b AS (
           SELECT lang,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                       AS INTEGER) AS bk
           FROM documents)
         SELECT CASE WHEN bk < 13 THEN 'train'
                     WHEN bk < 14 THEN 'val'
                     ELSE 'test' END AS split,
                count(*) AS n_docs,
                count(DISTINCT lang) AS n_langs
         FROM b GROUP BY 1 ORDER BY split""")
}
