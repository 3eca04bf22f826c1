package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd
import graft.functions.TextFunctions.fixMojibake

/** ETL / ingestion-shape operators.
  *
  * Re-expresses the reference's file-ingest pipeline semantics
  * (cleaning, dedup/upsert, PHI hashing, schema validation, load stats)
  * as declarative Spark plans. References:
  *  - cleaning: /root/reference/core/etl_service.py:659-762
  *  - upsert-by-primary-key: /root/reference/core/database_adapter.py
  *    (insert/update/skip decision per key)
  *  - content-hash duplicate skip: /root/reference/core/etl_service.py:364-370
  *  - PHI hashing on import: /root/reference/core/etl_service.py:721-739
  *  - schema/quality validation: /root/reference/core/schema_validator.py
  *  - per-file load statistics: /root/reference/core/etl_service.py (ETL metadata)
  *
  * Scale notes: cleaning/hash/validate are map-only (no shuffle);
  * `etl_dedup_latest` shuffles once on the entity key (high-cardinality,
  * uniform → no salting needed); `etl_ingest_stats` is a low-cardinality
  * partial agg.
  */
object Etl {

  /** Trim / null-normalize / derive — the reference's _clean_data pass. */
  def cleanNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select(
      col("doc_id"),
      length(trim(fixMojibake(col("text")))).cast("long").as("clean_len"),
      coalesce(when(trim(col("source")) === "", null)
        .otherwise(trim(col("source"))), lit("unknown")).as("source_norm"),
      coalesce(when(trim(col("lang")) === "", null)
        .otherwise(trim(col("lang"))), lit("unknown")).as("lang_norm"))
  }

  /** Upsert-by-key semantics: keep only the newest record per key.
    * One shuffle on the key; window instead of self-join (single pass). */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey").as("latest_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_orderdate"))
  }

  /** Exact duplicate detection via content hash (map-side hash + agg). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))
  }

  /** PHI hashing: irreversible sha-256 of identifying columns on import. */
  def phiHash(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(
      col("c_custkey"),
      sha2(col("c_name"), 256).as("name_hash"),
      col("c_mktsegment"))
  }

  /** Rule-based quality audit: one row of violation counters (map-only + final agg). */
  def schemaValidate(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def viol(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    li.agg(
      count(lit(1)).as("n_rows"),
      viol(col("l_quantity") <= 0).as("bad_quantity"),
      viol(col("l_extendedprice") < 0).as("bad_price"),
      viol(!col("l_discount").between(0.0, 1.0)).as("bad_discount"),
      viol(!col("l_returnflag").isin("A", "N", "R")).as("bad_returnflag"),
      viol(col("l_shipdate").isNull).as("null_shipdate"))
  }

  /** Per-source load statistics (counts / distincts / size stats). */
  def ingestStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        rnd(avg(col("n_chars")), 2).as("avg_chars"),
        max(col("n_chars")).as("max_chars"))
  }

  /** Quarantine split: rows failing any validation rule, one row per
    * (record, violated rule) — the relational form of the reference's
    * data_quality_issues log (schema_validator.log_schema_error). The
    * rule column unpivots via a literal rules array + filter (map-only).
    *
    * The synthetic lineitem violates NONE of the rules (the generator
    * emits clean rows), which made this a trivially-empty oracle — the
    * unpivot machinery was never exercised against data. So violations
    * are PLANTED deterministically in-plan on a stride key (the
    * derived-partsupp / pii-scrub precedent): residues 0..4 of
    * (l_orderkey·5 + l_linenumber) mod 199 each corrupt ONE field so
    * every rule fires ~n/199 times at any SF, mirrored exactly in the
    * oracle CTE. The planting is a when() per column — map-only, no
    * new shuffle — and the operator's real shape (rules-array unpivot
    * + filter) is unchanged. */
  def quarantine(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val k = pmod(col("l_orderkey") * 5 + col("l_linenumber"), lit(199))
    val planted = li.select(
      col("l_orderkey"), col("l_linenumber"),
      when(k === 0, -col("l_quantity"))
        .otherwise(col("l_quantity")).as("l_quantity"),
      when(k === 1, -col("l_extendedprice"))
        .otherwise(col("l_extendedprice")).as("l_extendedprice"),
      when(k === 2, col("l_discount") + 2.0)
        .otherwise(col("l_discount")).as("l_discount"),
      when(k === 3, lit("X"))
        .otherwise(col("l_returnflag")).as("l_returnflag"),
      when(k =!= 4, col("l_shipdate")).as("l_shipdate"))
    val rules = array(
      when(col("l_quantity") <= 0, "bad_quantity"),
      when(col("l_extendedprice") < 0, "bad_price"),
      when(!col("l_discount").between(0.0, 1.0), "bad_discount"),
      when(!col("l_returnflag").isin("A", "N", "R"), "bad_returnflag"),
      when(col("l_shipdate").isNull, "null_shipdate"))
    planted.select(col("l_orderkey"),
                   col("l_linenumber").cast("long").as("lineno"),
                   explode(filter(rules, r => r.isNotNull)).as("violation"))
  }

  /** Incremental-load bookkeeping: the reference skips a discovered file
    * when its (name, md5) is already in the etl_metadata ledger
    * (etl_service.py:216-229 get_processed_files + file_key check,
    * database_schema.py:22 etl_metadata). Relationally: incoming file
    * hashes LEFT JOIN the processed-ledger on file name →
    * load (never seen) / skip (name+hash match) / reload (name seen,
    * content changed). The ledger here is synthesized deterministically
    * from `documents` (ids ≡ 0 mod 3 unchanged, ≡ 1 stale hash, ≡ 2
    * absent) so the oracle can rebuild it. One hash-partitioned join on
    * the file name — both sides shuffle once; at 100 TB the ledger is
    * tiny relative to the corpus and AQE broadcasts it. */
  def loadLedger(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def fileName = concat(lit("doc_"), col("doc_id").cast("string"), lit(".txt"))
    val incoming = docs.select(fileName.as("file_name"),
                               md5(col("text")).as("file_hash"))
    val ledger = docs
      .filter(pmod(col("doc_id"), lit(3)) < 2)
      .select(fileName.as("file_name"),
        when(pmod(col("doc_id"), lit(3)) === 0, md5(col("text")))
          .otherwise(md5(concat(col("text"), lit(":v0")))).as("ledger_hash"))
    incoming.join(ledger, Seq("file_name"), "left")
      .select(col("file_name"), col("file_hash"),
        when(col("ledger_hash").isNull, "load")
          .when(col("ledger_hash") === col("file_hash"), "skip")
          .otherwise("reload").as("decision"))
  }

  /** Blocked entity matching — the record-linkage step of every
    * ingest pipeline (the reference's person-matching intent,
    * relationally): candidate pairs form ONLY within a blocking key
    * (name prefix — one equi-join shuffle per side on the block,
    * sub-quadratic by construction, the same reason dedup buckets by
    * shingle), then Levenshtein ≤ 1 verifies within the block. One
    * block key trades recall for cost like any blocking scheme — the
    * standard recall path is a second pass with a different key
    * (suffix or sorted-digit prefix), unioned. Integer edit distance →
    * identical in both engines → oracle. */
  def entityMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"),
              substring(col("c_name"), 1, 17).as("blk"))
    val a = c.select(col("blk"), col("c_custkey").as("custkey_a"),
                     col("c_name").as("name_a"))
    val b = c.select(col("blk"), col("c_custkey").as("custkey_b"),
                     col("c_name").as("name_b"))
    a.join(b, Seq("blk"))
      .filter(col("custkey_a") < col("custkey_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= 1)
      .select(col("custkey_a"), col("custkey_b"), col("name_a"),
              col("name_b"), col("lev"))
      .orderBy(col("custkey_a"), col("custkey_b"))
      .limit(100)
  }

  /** Load-batch rollback over an upsert table — the reference's undo-ETL
    * semantics (/root/reference/core/app.py:1403 undo_etl_job: delete
    * every record a load batch imported) made upsert-aware: when the
    * undone batch UPDATED a key that existed before, deletion must
    * restore the key's previous version, not just remove a row. Orders
    * model the per-key version stream (each customer's orders are
    * successive upserts; `etl_dedup_latest` is the current-state view);
    * the undone batch is a deterministic md5 1/16 split of orderkeys —
    * the same content-addressed coin as dedup.incremental. Verdicts per
    * key: `unchanged` (current version not from the batch), `restored`
    * (batch row removed, previous version becomes current —
    * restored_orderkey says which), `removed` (the key existed only in
    * the undone batch). The physical delete mechanism is
    * sinks.LakeSink.undoBatch (staged partition swap).
    *
    * Scale: ONE hash aggregate on the key with map-side partial combine
    * — `max(struct(date, key))` picks the current and the pre-batch
    * version in the same pass; no window sort, no self-join, the fact
    * table shuffles once. */
  def undoBatch(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      (conv(substring(md5(col("o_orderkey").cast("string")), 1, 1), 16, 10)
        .cast("int") === 0).as("in_batch"))
    o.groupBy(col("o_custkey"))
      .agg(
        max(struct(col("o_orderdate"), col("o_orderkey"))).as("cur"),
        max(when(!col("in_batch"),
          struct(col("o_orderdate"), col("o_orderkey")))).as("prev"))
      .select(
        col("o_custkey").as("custkey"),
        col("cur.o_orderkey").as("current_orderkey"),
        when(col("cur.o_orderkey") === col("prev.o_orderkey"), "unchanged")
          .when(col("prev").isNotNull, "restored")
          .otherwise("removed").as("verdict"),
        when(col("cur.o_orderkey") =!= col("prev.o_orderkey"),
          col("prev.o_orderkey")).as("restored_orderkey"))
      .orderBy(col("custkey"))
  }

  /** Load-job history page — the reference's ETL job log
    * (/root/reference/core/app.py:1390 get_etl_history,
    * etl_service.get_job_history) as a relational rollup: one row per
    * load batch with its record/key counts, value total, and covered
    * date range. The batch id is the same md5 1/16 content-addressed
    * split as etl_undo_batch, so history and rollback agree on
    * lineage. One map-side-combined aggregate on the batch key. */
  def jobHistory(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 1), 16, 10)
          .cast("long").as("job_id"),
        col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
      .groupBy(col("job_id"))
      .agg(count(lit(1)).as("n_records"),
           countDistinct(col("o_custkey")).as("n_keys"),
           date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_date"),
           date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_date"),
           rnd(sum(col("o_totalprice")), 2).as("total_value"))
      .orderBy(col("job_id"))

  /** SCD Type-2 history build — the lake-production upsert variant:
    * instead of keeping only the newest version per key
    * (etl_dedup_latest ≡ the reference's destructive upsert,
    * database_adapter.py), every version becomes a history row with a
    * [valid_from, valid_to) validity interval and an is_current flag —
    * the dimension-table form every warehouse joins facts against "as
    * of" a date. Orders model the per-key version stream exactly as in
    * etl_undo_batch. valid_to = next version's valid_from (open
    * interval; current rows get the 9999-12-31 sentinel).
    *
    * Scale: one shuffle on the entity key + one window pass (lead and
    * row_number share the same (key, date) sort — Catalyst plans a
    * single Exchange+Sort); keys are high-cardinality and uniform, so
    * per-key version chains are short and no salting is needed. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("next_from", lead(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        col("version"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("next_from"), "yyyy-MM-dd"),
                 lit("9999-12-31")).as("valid_to"),
        col("next_from").isNull.as("is_current"),
        rnd(col("o_totalprice"), 2).as("price"))
      .orderBy(col("custkey"), col("version"))
  }

  /** Point-in-time-correct feature join (the leakage-safe enrichment
    * every feature-store / training-data pipeline needs): each fact
    * line is enriched with the customer's SCD2 version state AS OF its
    * ship date — never a later version, which would leak the future
    * into training features. Composition: the scd2 history collapses
    * to one end-of-day state per (custkey, date) — making the as-of
    * timestamp UNIQUE per key, the documented Joins.asOf determinism
    * contract — then Joins.asOf attaches the latest state with
    * from_days ≤ ship_days in ONE custkey shuffle + shared Sort (no
    * per-row subquery, no range-predicate nested-loop join). Facts
    * whose ship date precedes the customer's first version surface
    * NULL state (no history yet), exactly what a leakage-safe backfill
    * must produce. Bounded to custkey < 50 so the dumped result stays
    * comparison-sized; the filter reaches both parquet scans. */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val epochDays = (c: org.apache.spark.sql.Column) =>
      datediff(to_date(c), lit("1970-01-01")).cast("long")
    val o = Tables.orders(spark, dir).filter(col("o_custkey") < 50L)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    // end-of-day SCD2 state: the max version per (custkey, date)
    val states = o
      .withColumn("version", row_number().over(w).cast("long"))
      .groupBy(col("o_custkey").as("custkey"),
               epochDays(col("o_orderdate")).as("from_days"))
      .agg(max_by(struct(col("version"),
                         rnd(col("o_totalprice"), 2).as("price")),
                  col("version")).as("s"))
      .select(col("custkey"), col("from_days"),
              col("s.version").as("version"), col("s.price").as("price"))
    val facts = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(o.select(col("o_orderkey"), col("o_custkey").as("custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("orderkey"),
              col("l_linenumber").as("linenumber"), col("custkey"),
              date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
              epochDays(col("l_shipdate")).as("ship_days"))
    Joins.asOf(facts, states, key = "custkey",
        leftTs = "ship_days", rightTs = "from_days",
        rightVals = Seq("version", "price"))
      .select(col("orderkey"), col("linenumber"), col("custkey"),
              col("ship_day"), col("version"), col("price"))
      .orderBy(col("orderkey"), col("linenumber"))
  }

  /** CDC merge-apply: collapse a change stream of I/U/D operations to
    * final table state — the batch core of every lake CDC pipeline
    * (Debezium→merge, Delta/Iceberg MERGE INTO). The op code is
    * synthesized deterministically from the orderkey's md5 (10/16 U,
    * 4/16 I, 2/16 D) so the oracle can rebuild the stream; orders are
    * the per-key event sequence as in etl_undo_batch. Per key the LAST
    * event decides liveness (D ⇒ deleted, else active with that
    * version) — the same max-struct single-aggregate trick as
    * etl_undo_batch: no window sort, no self-join, ONE map-side-
    * combined hash aggregate carries the latest event AND the I/U/D
    * tallies, so the change stream shuffles once at any scale. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val nib = conv(substring(md5(col("o_orderkey").cast("string")), 1, 1), 16, 10)
      .cast("int")
    val ops = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      when(nib < 10, "U").when(nib < 14, "I").otherwise("D").as("op"))
    ops.groupBy(col("o_custkey"))
      .agg(
        max(struct(col("o_orderdate"), col("o_orderkey"), col("op"))).as("last"),
        sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_inserts"),
        sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updates"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"))
      .select(
        col("o_custkey").as("custkey"),
        col("last.o_orderkey").as("last_orderkey"),
        col("last.op").as("last_op"),
        when(col("last.op") === "D", "deleted").otherwise("active").as("state"),
        col("n_inserts"), col("n_updates"), col("n_deletes"))
      .orderBy(col("custkey"))
  }

  /** Distribution-drift audit between load batches via the population
    * stability index — tbl_diff catches KEY-level drift, this catches
    * DISTRIBUTION drift (a retrained upstream model or a changed
    * upstream filter shifts the value mix with zero key churn; PSI
    * > 0.1 investigate / > 0.25 act is the standard monitoring rule).
    * Batches are the md5 1/16 lineage split (current = nibble 0, the
    * round's load; baseline = the rest); values bin into fixed
    * equi-width price buckets so bin boundaries are engine-exact
    * (quantile bins would be the data-adaptive variant —
    * rpt_percentiles shows the machinery). PSI per bucket =
    * (p_cur − p_base)·ln(p_cur/p_base) with add-half Laplace smoothing
    * against empty bins, all from ONE map-side-combined (bucket ×
    * split) count — O(buckets) everything after the scan. */
  def psiDrift(spark: SparkSession, dir: String): DataFrame =
    psiDriftOn(Tables.orders(spark, dir))

  /** Frame-level core ((o_orderkey, o_totalprice) rows; OracleEdgeSpec
    * drives the one-side-entirely-empty fixture through it — the
    * add-half smoothing keeps every psi_term finite and non-null even
    * when a whole split is absent, so PSI needs no nullif guard). */
  private[graft] def psiDriftOn(orders: DataFrame): DataFrame = {
    val nib = conv(substring(md5(col("o_orderkey").cast("string")), 1, 1), 16, 10)
      .cast("int")
    val binned = orders.select(
      least(floor(col("o_totalprice") / 50000.0), lit(5.0)).cast("long")
        .as("bucket"),
      (nib === 0).as("is_cur"))
    val counts = binned.groupBy(col("bucket"))
      .agg(sum(when(col("is_cur"), 1L).otherwise(0L)).as("n_cur"),
           sum(when(!col("is_cur"), 1L).otherwise(0L)).as("n_base"))
    // totals as windows over the O(buckets) AGGREGATE (single-task pass
    // over ≤6 rows) — a separate total branch would re-scan orders
    val W = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // add-half smoothing keeps ln() finite when a bin is empty on one side
    val pCur = (col("n_cur") + 0.5) / (col("t_cur") + 3.0)
    val pBase = (col("n_base") + 0.5) / (col("t_base") + 3.0)
    counts
      .withColumn("t_cur", sum(col("n_cur")).over(W))
      .withColumn("t_base", sum(col("n_base")).over(W))
      .select(col("bucket"), col("n_cur"), col("n_base"),
        rnd(pCur, 6).as("p_cur"), rnd(pBase, 6).as("p_base"),
        rnd((pCur - pBase) * log(pCur / pBase), 6).as("psi_term"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_psi_drift" -> (psiDrift _),
    "etl_scd2" -> (scd2 _),
    "etl_pit_join" -> (pitJoin _),
    "etl_cdc_apply" -> (cdcApply _),
    "etl_job_history" -> (jobHistory _),
    "etl_undo_batch" -> (undoBatch _),
    "etl_entity_match" -> (entityMatch _),
    "etl_load_ledger"     -> (loadLedger _),
    "etl_quarantine"      -> (quarantine _),
    "etl_clean_normalize" -> (cleanNormalize _),
    "etl_dedup_latest"    -> (dedupLatest _),
    "etl_dedup_exact"     -> (dedupExact _),
    "etl_phi_hash"        -> (phiHash _),
    "etl_schema_validate" -> (schemaValidate _),
    "etl_ingest_stats"    -> (ingestStats _))

  val oracles: Map[String, String] = Map(
    "etl_psi_drift" ->
      """WITH b AS (
           SELECT CAST(least(floor(o_totalprice / 50000.0), 5.0) AS BIGINT)
                    AS bucket,
                  CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                       AS INTEGER) = 0 AS is_cur
           FROM orders),
         c AS (
           SELECT bucket,
                  CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_cur,
                  CAST(sum(CASE WHEN NOT is_cur THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_base
           FROM b GROUP BY 1),
         t AS (SELECT CAST(sum(n_cur) AS BIGINT) AS t_cur,
                      CAST(sum(n_base) AS BIGINT) AS t_base FROM c)
         SELECT bucket, n_cur, n_base,
                floor(((n_cur + 0.5) / (t_cur + 3.0)) * 1000000 + 0.5)
                  / 1000000 AS p_cur,
                floor(((n_base + 0.5) / (t_base + 3.0)) * 1000000 + 0.5)
                  / 1000000 AS p_base,
                floor((((n_cur + 0.5) / (t_cur + 3.0)
                        - (n_base + 0.5) / (t_base + 3.0))
                       * ln((n_cur + 0.5) / (t_cur + 3.0)
                            / ((n_base + 0.5) / (t_base + 3.0))))
                      * 1000000 + 0.5) / 1000000 AS psi_term
         FROM c, t ORDER BY bucket""",
    "etl_pit_join" ->
      """WITH o AS (SELECT * FROM orders WHERE o_custkey < 50),
         v AS (SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
                      CAST(date_diff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE)) AS BIGINT)
                        AS from_days,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS version
               FROM o),
         states AS (SELECT custkey, from_days,
                           CAST(max_by(version, version) AS BIGINT) AS version,
                           max_by(floor(o_totalprice * 100 + 0.5) / 100,
                                  version) AS price
                    FROM v GROUP BY custkey, from_days),
         facts AS (SELECT l.l_orderkey AS orderkey,
                          l.l_linenumber AS linenumber,
                          o.o_custkey AS custkey,
                          strftime(l.l_shipdate, '%Y-%m-%d') AS ship_day,
                          CAST(date_diff('day', DATE '1970-01-01',
                                         CAST(l.l_shipdate AS DATE)) AS BIGINT)
                            AS ship_days
                   FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey),
         m AS (SELECT f.orderkey, f.linenumber, f.custkey, f.ship_day,
                      max(s.from_days) AS mfrom
               FROM facts f
               LEFT JOIN states s
                 ON s.custkey = f.custkey AND s.from_days <= f.ship_days
               GROUP BY f.orderkey, f.linenumber, f.custkey, f.ship_day)
         SELECT m.orderkey, m.linenumber, m.custkey, m.ship_day,
                s2.version, s2.price
         FROM m LEFT JOIN states s2
           ON s2.custkey = m.custkey AND s2.from_days = m.mfrom
         ORDER BY m.orderkey, m.linenumber""",
    "etl_scd2" ->
      """WITH v AS (
           SELECT o_custkey AS custkey, o_orderkey AS orderkey,
                  CAST(row_number() OVER w AS BIGINT) AS version,
                  o_orderdate,
                  lead(o_orderdate) OVER w AS next_from,
                  o_totalprice
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey))
         SELECT custkey, orderkey, version,
                strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
                coalesce(strftime(next_from, '%Y-%m-%d'), '9999-12-31')
                  AS valid_to,
                next_from IS NULL AS is_current,
                floor(o_totalprice * 100 + 0.5) / 100 AS price
         FROM v ORDER BY custkey, version""",
    "etl_cdc_apply" ->
      """WITH s AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  CASE WHEN nib < 10 THEN 'U'
                       WHEN nib < 14 THEN 'I' ELSE 'D' END AS op
           FROM (SELECT *, CAST(('0x' || substr(md5(CAST(o_orderkey AS
                   VARCHAR)), 1, 1)) AS INTEGER) AS nib FROM orders)),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM s),
         c AS (
           SELECT o_custkey,
                  CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_inserts,
                  CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_updates,
                  CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_deletes
           FROM s GROUP BY o_custkey)
         SELECT r.o_custkey AS custkey, r.o_orderkey AS last_orderkey,
                r.op AS last_op,
                CASE WHEN r.op = 'D' THEN 'deleted' ELSE 'active' END AS state,
                c.n_inserts, c.n_updates, c.n_deletes
         FROM r JOIN c ON r.o_custkey = c.o_custkey
         WHERE r.rn = 1 ORDER BY custkey""",
    "etl_job_history" ->
      """SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                     AS BIGINT) AS job_id,
                count(*) AS n_records,
                count(DISTINCT o_custkey) AS n_keys,
                strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
                strftime(max(o_orderdate), '%Y-%m-%d') AS last_date,
                floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_value
         FROM orders GROUP BY 1 ORDER BY job_id""",
    "etl_undo_batch" ->
      """WITH o AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                       AS INTEGER) = 0 AS in_batch
           FROM orders),
         cur AS (
           SELECT o_custkey, o_orderkey AS current_orderkey, in_batch
           FROM o
           QUALIFY row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1),
         prev AS (
           SELECT o_custkey, o_orderkey AS prev_orderkey
           FROM o WHERE NOT in_batch
           QUALIFY row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1)
         SELECT c.o_custkey AS custkey, c.current_orderkey,
                CASE WHEN NOT c.in_batch THEN 'unchanged'
                     WHEN p.prev_orderkey IS NOT NULL THEN 'restored'
                     ELSE 'removed' END AS verdict,
                CASE WHEN c.in_batch THEN p.prev_orderkey END
                  AS restored_orderkey
         FROM cur c LEFT JOIN prev p ON c.o_custkey = p.o_custkey
         ORDER BY custkey""",
    "etl_entity_match" ->
      """WITH c AS (SELECT c_custkey, c_name,
                           substr(c_name, 1, 17) AS blk
                    FROM customer)
         SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
                a.c_name AS name_a, b.c_name AS name_b,
                CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
         FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY custkey_a, custkey_b LIMIT 100""",
    "etl_load_ledger" ->
      """WITH incoming AS (
           SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS file_name,
                  md5(text) AS file_hash
           FROM documents),
         ledger AS (
           SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS file_name,
                  CASE WHEN doc_id % 3 = 0 THEN md5(text)
                       ELSE md5(text || ':v0') END AS ledger_hash
           FROM documents WHERE doc_id % 3 < 2)
         SELECT i.file_name, i.file_hash,
                CASE WHEN l.ledger_hash IS NULL THEN 'load'
                     WHEN l.ledger_hash = i.file_hash THEN 'skip'
                     ELSE 'reload' END AS decision
         FROM incoming i LEFT JOIN ledger l USING (file_name)""",
    "etl_quarantine" ->
      """WITH planted AS (
           SELECT l_orderkey, l_linenumber,
                  (l_orderkey * 5 + l_linenumber) % 199 AS kk,
                  CASE WHEN (l_orderkey * 5 + l_linenumber) % 199 = 0
                       THEN -l_quantity ELSE l_quantity END AS l_quantity,
                  CASE WHEN (l_orderkey * 5 + l_linenumber) % 199 = 1
                       THEN -l_extendedprice ELSE l_extendedprice
                       END AS l_extendedprice,
                  CASE WHEN (l_orderkey * 5 + l_linenumber) % 199 = 2
                       THEN l_discount + 2.0 ELSE l_discount
                       END AS l_discount,
                  CASE WHEN (l_orderkey * 5 + l_linenumber) % 199 = 3
                       THEN 'X' ELSE l_returnflag END AS l_returnflag,
                  CASE WHEN (l_orderkey * 5 + l_linenumber) % 199 = 4
                       THEN NULL ELSE l_shipdate END AS l_shipdate
           FROM lineitem)
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS lineno,
                'bad_quantity' AS violation
         FROM planted WHERE l_quantity <= 0
         UNION ALL
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'bad_price'
         FROM planted WHERE l_extendedprice < 0
         UNION ALL
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'bad_discount'
         FROM planted WHERE l_discount NOT BETWEEN 0.0 AND 1.0
         UNION ALL
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'bad_returnflag'
         FROM planted WHERE l_returnflag NOT IN ('A','N','R')
         UNION ALL
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'null_shipdate'
         FROM planted WHERE l_shipdate IS NULL""",
    "etl_clean_normalize" ->
      """SELECT doc_id,
         CAST(length(trim(replace(replace(replace(replace(text, 'â€™', ''''), 'â€œ', '"'), 'â€“', '-'), 'â€', '"'))) AS BIGINT) AS clean_len,
         coalesce(nullif(trim(source), ''), 'unknown') AS source_norm,
         coalesce(nullif(trim(lang), ''), 'unknown') AS lang_norm
         FROM documents""",
    "etl_dedup_latest" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate
         FROM orders
         QUALIFY row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""",
    "etl_dedup_exact" ->
      """SELECT md5(text) AS content_hash,
                count(*) AS n_copies,
                min(doc_id) AS keeper_doc_id
         FROM documents GROUP BY 1""",
    "etl_phi_hash" ->
      """SELECT c_custkey, sha256(c_name) AS name_hash, c_mktsegment
         FROM customer""",
    "etl_schema_validate" ->
      """SELECT count(*) AS n_rows,
         CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
         CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
         CAST(SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
         CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS bad_returnflag,
         CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate
         FROM lineitem""",
    "etl_ingest_stats" ->
      """SELECT source,
                count(*) AS n_docs,
                count(DISTINCT lang) AS n_langs,
                floor((avg(n_chars)) * 100 + 0.5) / 100 AS avg_chars,
                max(n_chars) AS max_chars
         FROM documents GROUP BY source""")
}
