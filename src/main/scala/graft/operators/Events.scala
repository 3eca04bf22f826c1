package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Event-stream operators (batch twins of the streaming module).
  *
  * The reference ingests activity logs and reports period aggregates
  * (core/reports/handlers.py:776-880); here the same shapes run over the
  * `events` table plus the stream-native extras a large pipeline needs:
  * tumbling windows, gap-based sessionization, and semi-structured JSON
  * prop extraction. The Structured Streaming variants live in
  * graft.streaming.EventStream; these batch forms are the oracle-checked
  * semantics.
  *
  * Scale notes: windowed agg is a partial agg on (hour, type) — tiny
  * shuffle. Sessionization shuffles once on user_id (high-cardinality,
  * uniform); the two window functions share that single partitioning, so
  * Catalyst plans one Exchange + one Sort. JSON extraction is map-only.
  * Timestamps are compared in integer microseconds (no float time math).
  */
object Events {

  /** Batch entry for the streaming PSI drift monitor (round 7): the
    * per-6h-window value-distribution PSI against the whole-corpus
    * baseline, computed by the SAME code the stream runs
    * (streaming.DriftStream.windowedPsi — withWatermark is a no-op in
    * batch), so the oracle checking this entry checks the streaming
    * math too. Baseline fractions are a B-double model parameter
    * (bounded collect, the codebook contract); the aggregate is one
    * map-side-combined pass with PSI assembled in-row. */
  def psiWindows(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("ts"), col("value"))
      .filter(col("value").isNotNull)
    val baseline = graft.streaming.DriftStream.baselineFromStatic(e)
    graft.streaming.DriftStream.windowedPsi(e, baseline)
      .orderBy(col("window_start"))
  }

  /** Tumbling 1-hour window × event_type aggregation. */
  def windowHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** SLIDING-window aggregation (1 h windows every 15 min) through the
    * native `window()` generator — the overlapping-window twin of
    * windowHourly (tumbling): each event lands in size/slide = 4
    * windows, the smoothed load curve a dashboard plots. The explode
    * is map-side (4 rows per event BEFORE the partial agg, so the
    * shuffle carries only per-(window, partition) partials — O(windows)
    * wire bytes, never 4× the events); this exact formulation carries
    * to Structured Streaming verbatim (same window() call under a
    * watermark). Oracle: DuckDB rebuilds the window set with
    * time_bucket − k·15 min, k ∈ 0..3 (both engines' grids are
    * epoch-aligned, so the buckets coincide exactly). */
  def slidingHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), rnd(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
              col("n_events"), col("sum_value"))
      .orderBy(col("win_start"))

  /** Top event trigram paths — the sequence-mining rollup behind "what
    * do users do next" product analytics (the reference's journey
    * report one step deeper: order matters, not just stage counts).
    * Two lead()s on the SAME (user, ts) window the sessionizer uses
    * (one Exchange+Sort serves both), map-side-combined path counts,
    * TakeOrderedAndProject top-15 with a full tiebreak. At 100 TB the
    * shuffle is one user-keyed pass and the count's group space is
    * |event_types|³ — tiny. */
  def userPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(byUser))
      .withColumn("e3", lead(col("event_type"), 2).over(byUser))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(15)
  }

  /** Distinct-set OVERLAP between audience segments via KMV sketches
    * (k-minimum-values, the theta-sketch family) — the question HLL
    * cannot answer: approx_count_distinct unions but never INTERSECTS,
    * while "how many click-users also purchase" needs |A∩B|. Each
    * segment keeps only its k=64 smallest md5 hashes — built through
    * the custom TopKPerKey operator (bounded per-key heaps, so a
    * billion-user segment ships ≤ k rows per partition, the user set
    * never shuffles); the pair stage then runs entirely on the
    * O(segments × k) sketch rows: union sketch = k smallest of the two
    * sketches merged, D̂ = (k−1)/h₍k₎, intersection via the standard
    * c/k · D̂_union estimator, exact-count fallback when a segment
    * holds fewer than k users (the sketch IS the set then).
    *
    * md5 is deterministic and h₍k₎ is a dyadic rational (13 nibbles /
    * 2⁵²), so unlike HLL the whole ESTIMATE is reproducible bit-exact
    * across engines — a sketch entry with a full DuckDB oracle. */
  /** KMV sketch size shared by the batch and streaming forms. */
  private[graft] val KmvK = 64

  /** Per-segment KMV sketch: the k smallest md5 user-hashes, built
    * through TopKPerKey's bounded heaps (shared by segmentOverlap and
    * the streaming parity spec). */
  private[graft] def kmvSketch(events: DataFrame): DataFrame = {
    val users = events
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
          .cast("double") / lit(4503599627370496.0)) // 16^13 = 2^52, exact
    graft.plans.TopKPerKey(
        users.withColumn("neg", -col("h")), "event_type", "neg", KmvK,
        tiebreak = Some("user_id"))
      .select(col("event_type"), col("user_id"), col("h"))
  }

  /** Per-segment distinct estimates off the KMV sketch (exact when the
    * segment holds fewer than k users — the sketch IS the set then). */
  private[graft] def kmvEstimates(sk: DataFrame): DataFrame = {
    val est = when(col("n") < KmvK, col("n").cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) / col("hk"))
    sk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(col("event_type"), rnd(est, 2).as("est"))
  }

  def segmentOverlap(spark: SparkSession, dir: String): DataFrame = {
    val K = KmvK
    val sk = kmvSketch(Tables.events(spark, dir))
    val perSeg = kmvEstimates(sk)
    val segs = sk.select(col("event_type")).distinct()
    val pairs = segs.select(col("event_type").as("seg_a"))
      .crossJoin(segs.select(col("event_type").as("seg_b")))
      .filter(col("seg_a") < col("seg_b"))
    val tagged = pairs.join(sk,
        col("event_type") === col("seg_a") ||
        col("event_type") === col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"), col("h"))
      .agg(max(when(col("event_type") === col("seg_a"), 1).otherwise(0))
             .as("in_a"),
           max(when(col("event_type") === col("seg_b"), 1).otherwise(0))
             .as("in_b"))
    val byPair = Window.partitionBy(col("seg_a"), col("seg_b"))
      .orderBy(col("h"))
    val unionEst = when(col("ku") < K, col("ku").cast("double"))
      .otherwise(lit((K - 1).toDouble) / col("hk"))
    tagged.withColumn("rn", row_number().over(byPair))
      .filter(col("rn") <= K)
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("ku"), max(col("h")).as("hk"),
           sum(col("in_a") * col("in_b")).cast("long").as("c"))
      .join(broadcast(perSeg.select(col("event_type").as("seg_a"),
                                    col("est").as("est_a"))), Seq("seg_a"))
      .join(broadcast(perSeg.select(col("event_type").as("seg_b"),
                                    col("est").as("est_b"))), Seq("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("est_a"), col("est_b"),
        rnd(unionEst, 2).as("est_union"),
        rnd(col("c").cast("double") / col("ku") * unionEst, 2)
          .as("est_intersect"),
        rnd(col("c").cast("double") / col("ku"), 4).as("jaccard_est"))
      .orderBy(col("seg_a"), col("seg_b"))
  }

  /** Gap-based sessionization: a >30-min silence starts a new session.
    * lag + running-sum over one user_id partitioning (single shuffle). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeFrame(Tables.events(spark, dir))

  /** Frame-level core (events must have event_id/ts/user_id). */
  def sessionizeFrame(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 1800L * 1000000L
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
           count(lit(1)).as("n_events"))
      .withColumn("avg_events_per_session",
        rnd(col("n_events") * 1.0 / col("n_sessions"), 2))
  }

  /** Native session-window twin of sessionize: `session_window(ts,
    * gap)` merges events whose gaps stay under 30 min — the SAME
    * semantics as the lag+cumsum formulation, executed as a gap-merge
    * aggregate instead of two window passes, and the formulation that
    * carries over verbatim to Structured Streaming. Hash-checked
    * against the sessionize oracle, which pins the two formulations to
    * each other. */
  def sessionizeSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("n_ev")).as("n_events"))
      .withColumn("avg_events_per_session",
        rnd(col("n_events") * 1.0 / col("n_sessions"), 2))

  /** As-of join of two event streams through the general operator
    * (graft.operators.Joins.asOf): each purchase is enriched with the
    * user's most recent click at-or-before it. Oracle is DuckDB's
    * native ASOF LEFT JOIN — an independent implementation of the same
    * semantics. (The single-table marker variant below composes a
    * conditional window instead, which scans the table once.) */
  def asofJoinPurchases(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("click_us"))
    Joins.asOf(purchases, clicks, key = "user_id",
               leftTs = "us", rightTs = "click_us",
               rightVals = Seq("click_us"))
      .select(col("event_id"), col("user_id"),
              ((col("us") - col("click_us")) / lit(1000000L)).cast("long")
                .as("secs_since_click"))
      .orderBy(col("event_id"))
  }

  /** As-of enrichment: attach each event's most recent 'signup' event
    * (at or before it) for the same user — the as-of-join shape,
    * composed from built-ins per the preference order (a conditional
    * last_value over the user partitioning; one shuffle, shared with any
    * other per-user window in the stage). Emits the lag in seconds. */
  def asofEnrich(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("signup_us",
        last(when(col("event_type") === "signup", col("us")),
             ignoreNulls = true).over(byUser))
      .select(col("event_id"), col("user_id"), col("event_type"),
              ((col("us") - col("signup_us")) / lit(1000000L)).cast("long")
                .as("secs_since_signup"))
  }

  /** Sequential conversion funnel: of users who ever signed up, how
    * many later purchased (strictly after their first signup)? One
    * groupBy user with conditional min/max aggregates — no self-join,
    * single shuffle on the high-cardinality key. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame =
    funnelConversionOn(Tables.events(spark, dir))

  /** Frame-level core ((user_id, event_type, ts) rows; OracleEdgeSpec
    * plants the signup-free fixture through it). A corpus with no
    * signups has no conversion base — conv_pct NULL by construction
    * (and via nullif in the oracle), never an ANSI DIVIDE_BY_ZERO. */
  private[graft] def funnelConversionOn(events: DataFrame): DataFrame = {
    val perUser = events
      .withColumn("us", unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("us"))).as("first_signup"),
        max(when(col("event_type") === "purchase", col("us"))).as("last_purchase"))
      .filter(col("first_signup").isNotNull)
    perUser.agg(
      count(lit(1)).as("n_signed_up"),
      sum(when(col("last_purchase") > col("first_signup"), 1L).otherwise(0L))
        .as("n_converted"))
      .withColumn("conv_pct",
        rnd(col("n_converted") * 100.0 /
            nullif(col("n_signed_up").cast("double"), lit(0.0)), 1))
  }

  /** Batch click→purchase attribution: for each purchase, the clicks
    * the same user made in the preceding 30 minutes — the batch twin of
    * streaming.EventStream.purchaseAttribution (same join predicate).
    * User-keyed equi-join with the time window as a riding range
    * predicate: shuffles once on user_id; time math in integer micros
    * per the cross-engine parity rule. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"),
              col("event_id").as("purchase_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"),
              col("event_id").as("click_id"))
    p.join(c, col("p_user") === col("c_user") &&
              col("c_us") >= col("p_us") - lit(1800000000L) &&
              col("c_us") <= col("p_us"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"),
           min(col("click_id")).as("first_click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Semi-structured extraction: pull a JSON prop, aggregate per type. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           rnd(avg(col("k")), 2).as("avg_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Active-user rollup (DAU + MAU side by side) — the engagement
    * dashboard every event pipeline serves. Each granularity is one
    * two-phase distinct-count aggregation on a low-cardinality period
    * key (partial sets map-side, tiny shuffle); the two granularities
    * union rather than join (no cross-period alignment needed). At
    * 100 TB the swap-in for exact distinct is approx_count_distinct —
    * the rpt_approx_distinct pattern; exact keeps the DuckDB oracle
    * here. */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("ts"), col("user_id"))
    def roll(fmt: String, gran: String) = ev
      .groupBy(date_format(col("ts"), fmt).as("period"))
      .agg(countDistinct(col("user_id")).as("active_users"),
           count(lit(1)).as("n_events"))
      .withColumn("granularity", lit(gran))
    roll("yyyy-MM-dd", "day").unionByName(roll("yyyy-MM", "month"))
      .select(col("granularity"), col("period"), col("active_users"),
              col("n_events"))
      .orderBy(col("granularity"), col("period"))
  }

  /** Per-type z-score anomaly flags — monitoring's classic outlier
    * sweep: each event's value scored against its type's mean/stddev
    * (population stddev, Welford partial merge — one map-side-combined
    * pass), then the scored join broadcasts the tiny per-type stats
    * frame back over the scan. Flag compares the ROUNDED |z| (both
    * engines) so float jitter can't flip the boundary. Emits only the
    * anomalies — the result is alert-sized, not corpus-sized. */
  def anomalies(spark: SparkSession, dir: String): DataFrame =
    anomaliesOn(Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value")))

  /** Frame-level core ((event_id, event_type, value) rows;
    * OracleEdgeSpec plants the zero-variance fixture through it).
    * Domain-edge argument: the σ > 0 filter precedes the z division on
    * the SAME frame (WHERE sigma > 0 in the oracle), so a
    * zero-variance type — constant values, or a single event, where
    * stddev_pop is exactly 0, never NULL for n ≥ 1 — contributes no
    * rows and the division never executes in either engine. */
  private[graft] def anomaliesOn(ev: DataFrame): DataFrame = {
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sigma"))
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(col("sigma") > 0)
      .withColumn("z", rnd((col("value") - col("mu")) / col("sigma"), 4))
      .filter(abs(col("z")) >= 3.0)
      .select(col("event_id"), col("event_type"),
              rnd(col("value"), 2).as("value"), col("z"))
      .orderBy(col("event_id"))
  }

  /** RFM user segmentation — recency / frequency / monetary, the
    * engagement-tiering evergreen: one user-keyed aggregation builds
    * the three metrics (recency against a FIXED reference date — no
    * now()), then the three median cutoffs are a LAZY 1-row exact-
    * percentile aggregate broadcast into a row-local CASE — the
    * perplexity-buckets pattern: no ntile, no global rank window
    * funneling every user through one sort (approx_percentile is the
    * 100 TB cutoff swap-in). Monetary is rounded BEFORE the cutoff
    * compare so partial-sum float jitter can't flip a boundary user.
    * Output is the segment rollup (bounded rows). */
  def rfm(spark: SparkSession, dir: String): DataFrame =
    rfmWith(spark, dir, approxAccuracy = None)

  /** [[rfm]] with the cutoff strategy explicit: None = exact
    * interpolated percentile (single-buffer, the oracle-checkable
    * form); Some(a) = approx_percentile with accuracy `a` — the
    * Greenwald–Khanna mergeable sketch whose map-side partials make
    * the cutoff row scale to 100 TB. Rank error ≤ N/a per cutoff, so a
    * segment's count can move by at most 3·N/a users (one flip per
    * metric comparison) — ApproxCutoffSpec asserts that bound. */
  private[graft] def rfmWith(spark: SparkSession, dir: String,
                             approxAccuracy: Option[Int]): DataFrame = {
    val ref = "2024-02-01"
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(datediff(lit(ref), max(col("ts"))).cast("long").as("recency_days"),
           count(lit(1)).as("frequency"),
           rnd(sum(col("value")), 2).as("monetary"))
    val cuts = approxAccuracy match {
      case None => users.agg(
        expr("percentile(recency_days, CAST(0.5 AS DOUBLE))").as("r_med"),
        expr("percentile(frequency, CAST(0.5 AS DOUBLE))").as("f_med"),
        expr("percentile(monetary, CAST(0.5 AS DOUBLE))").as("m_med"))
      case Some(a) => users.agg(
        expr(s"approx_percentile(recency_days, CAST(0.5 AS DOUBLE), $a)")
          .cast("double").as("r_med"),
        expr(s"approx_percentile(frequency, CAST(0.5 AS DOUBLE), $a)")
          .cast("double").as("f_med"),
        expr(s"approx_percentile(monetary, CAST(0.5 AS DOUBLE), $a)")
          .as("m_med"))
    }
    users.crossJoin(broadcast(cuts))
      .withColumn("segment",
        when(col("recency_days") <= col("r_med") &&
             col("frequency") >= col("f_med") &&
             col("monetary") >= col("m_med"), "champion")
          .when(col("recency_days") <= col("r_med"), "recent")
          .when(col("frequency") >= col("f_med") ||
                col("monetary") >= col("m_med"), "at_risk")
          .otherwise("hibernating"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"),
           rnd(avg(col("recency_days")), 2).as("avg_recency"),
           rnd(avg(col("frequency")), 2).as("avg_frequency"),
           rnd(avg(col("monetary")), 2).as("avg_monetary"))
      .orderBy(col("segment"))
  }

  /** Event-type transition matrix — first-order Markov view of user
    * behavior (what users do NEXT after each action): one lead() over
    * the per-user timeline (the same user_id Exchange+Sort shape as
    * sessionize), then a map-side-combined count per (from, to) and a
    * row-share against the per-from total via a partial-agg join of
    * two tiny aggregates (|event_types|² rows — never a window over
    * the facts). Ties in ts break on event_id for a deterministic
    * sequence. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
               col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("from_n"))
    pairs.join(broadcast(fromTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
              rnd(col("n") * 1.0 / col("from_n"), 4).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Day-of-week × hour activity heatmap — the ops-dashboard staple:
    * one map-side-combined count on a 168-key composite (long format;
    * the UI pivots). dayofweek is emitted 1=Sunday..7=Saturday in both
    * engines via the same strftime-style derivation. */
  def heatmap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
               hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("dow"), col("hour"))

  /** Inter-event gap profile per event type — the arrival-cadence
    * stats behind session-gap and watermark tuning (how long until the
    * same user acts again, by what they just did): one lead() on the
    * sessionize partitioning, gap math in INTEGER MICROSECONDS (the
    * no-float-time rule), then a map-side-combined rollup per type. */
  def gaps(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .filter(col("next_ts").isNotNull)
      .withColumn("gap_s",
        expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000000"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
           rnd(avg(col("gap_s")), 2).as("avg_gap_s"),
           min(col("gap_s")).as("min_gap_s"),
           max(col("gap_s")).as("max_gap_s"))
      .orderBy(col("event_type"))
  }

  /** Audit-trail activity report — the reference's audit-statistics
    * endpoint (audit_logger.py:284-332, get_statistics) re-expressed
    * over the events stream: total event count, counts by category,
    * top-10 most-active users, and the success/failure split, as one
    * long-format (dim, key, n_events) frame the UI pivots. Category =
    * event_type; failure = the 'error' type (the stream's failed-action
    * analog). The same shape serves database.py:570-577's
    * data-quality-issues rollup (issues by type / by table).
    *
    * Scale: ONE map-side-combined count per dimension; the success
    * split and the grand total DERIVE from the O(categories) aggregate
    * (no second scan — at 100 TB the category rollup is bytes). The
    * user dimension is its own count + a global top-10
    * (TakeOrderedAndProject — O(k) per partition, never a full sort). */
  def auditActivity(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    // the O(categories) rollup feeds three output branches; pin it
    // (lazy localCheckpoint — rows, not lineage) so the corpus scan
    // behind it runs once, not once per branch (PlanQualitySpec locks
    // the two-scan shape: this rollup + the user rollup)
    val byCat = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      .localCheckpoint(false)
    val cat = byCat.select(lit("category").as("dim"),
      col("event_type").as("key"), col("n_events"))
    val user = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id")).limit(10)
      .select(lit("user").as("dim"), col("user_id").cast("string").as("key"),
              col("n_events"))
    val success = byCat
      .groupBy(when(col("event_type") === "error", "failure")
        .otherwise("success").as("key"))
      .agg(sum(col("n_events")).as("n_events"))
      .select(lit("success").as("dim"), col("key"), col("n_events"))
    val total = byCat.agg(sum(col("n_events")).as("n_events"))
      .select(lit("total").as("dim"), lit("all").as("key"), col("n_events"))
    cat.union(user).union(success).union(total)
      .orderBy(col("dim"), col("n_events").desc, col("key"))
  }

  /** Failed-login burst detector — the security-ops tail of the same
    * endpoint (audit_logger.py:316-332: per-user failed-login count +
    * MAX(timestamp), top offenders first): users with ≥2 'error'
    * events in the TRAILING 24 h window ending at the corpus max ts
    * (the reference anchors on NOW; a static corpus anchors on its own
    * frontier), worst first, top 5 — the evt_slo_burn shape pointed at
    * auth failures. Last-attempt emitted as integer MICROSECONDS (the
    * no-float-time rule). Scale: the frontier is a 1-row broadcast;
    * the filter cuts to one day of one event type before the per-user
    * count, so the agg is increment-sized however old the corpus. */
  def failedLoginBurst(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val frontier = e.agg(max(col("ts")).as("mx"))
    e.filter(col("event_type") === "error")
      .crossJoin(broadcast(frontier))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_failed"), max(col("ts")).as("la"))
      .filter(col("n_failed") >= 2)
      .orderBy(col("n_failed").desc, col("user_id"))
      .limit(5)
      .select(col("user_id"), col("n_failed"),
              expr("unix_micros(la)").as("last_attempt_us"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_audit_activity" -> (auditActivity _),
    "evt_failed_login_burst" -> (failedLoginBurst _),
    "evt_gaps"          -> (gaps _),
    "evt_heatmap"       -> (heatmap _),
    "evt_transitions"   -> (transitions _),
    "evt_rfm"           -> (rfm _),
    "evt_active_users"  -> (activeUsers _),
    "evt_anomalies"     -> (anomalies _),
    "evt_window_hourly" -> (windowHourly _),
    "evt_psi_windows"   -> (psiWindows _),
    "evt_sliding_hourly" -> (slidingHourly _),
    "evt_user_paths" -> (userPaths _),
    "evt_segment_overlap" -> (segmentOverlap _),
    "evt_sessionize"    -> (sessionize _),
    "evt_sessionize_sw" -> (sessionizeSessionWindow _),
    "evt_asof_enrich"   -> (asofEnrich _),
    "evt_asof_join"     -> (asofJoinPurchases _),
    "evt_funnel_conversion" -> (funnelConversion _),
    "evt_attribution"   -> (attribution _),
    "evt_json_extract"  -> (jsonExtract _))

  val oracles: Map[String, String] = Map(
    "evt_audit_activity" ->
      """WITH cat AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         u AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1
           ORDER BY n DESC, user_id LIMIT 10),
         unioned AS (
           SELECT 'category' AS dim, event_type AS key, n AS n_events
           FROM cat
           UNION ALL
           SELECT 'user', CAST(user_id AS VARCHAR), n FROM u
           UNION ALL
           SELECT 'success',
                  CASE WHEN event_type = 'error' THEN 'failure'
                       ELSE 'success' END,
                  CAST(sum(n) AS BIGINT)
           FROM cat GROUP BY 2
           UNION ALL
           SELECT 'total', 'all', CAST(sum(n) AS BIGINT) FROM cat)
         SELECT dim, key, n_events FROM unioned
         ORDER BY dim, n_events DESC, key""",
    "evt_failed_login_burst" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events),
         b AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_failed,
                  max(ts) AS la
           FROM events, m
           WHERE event_type = 'error' AND ts >= mx - INTERVAL 24 HOUR
           GROUP BY 1 HAVING count(*) >= 2
           ORDER BY n_failed DESC, user_id LIMIT 5)
         SELECT user_id, n_failed, epoch_us(la) AS last_attempt_us
         FROM b ORDER BY n_failed DESC, user_id""",
    "evt_gaps" ->
      """WITH s AS (
           SELECT user_id, event_type, ts,
                  lead(ts, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_ts
           FROM events),
         g AS (SELECT event_type,
                      date_diff('microsecond', ts, next_ts) // 1000000 AS gap_s
               FROM s WHERE next_ts IS NOT NULL)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
                floor(avg(gap_s) * 100 + 0.5) / 100 AS avg_gap_s,
                CAST(min(gap_s) AS BIGINT) AS min_gap_s,
                CAST(max(gap_s) AS BIGINT) AS max_gap_s
         FROM g GROUP BY 1 ORDER BY event_type""",
    // DuckDB dayofweek() is 0=Sunday; Spark's is 1=Sunday — shift +1
    "evt_heatmap" ->
      """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                CAST(hour(ts) AS BIGINT) AS hour,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY 1, 2 ORDER BY dow, hour""",
    "evt_transitions" ->
      """WITH s AS (
           SELECT user_id, event_type,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_type
           FROM events),
         p AS (SELECT event_type AS from_type, next_type AS to_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_n
               FROM p GROUP BY 1)
         SELECT from_type, to_type, n,
                floor((n * 1.0 / from_n) * 10000 + 0.5) / 10000 AS p
         FROM p JOIN t USING (from_type)
         ORDER BY from_type, to_type""",
    "evt_rfm" ->
      """WITH u AS (
           SELECT user_id,
                  CAST(date_diff('day', CAST(max(ts) AS DATE),
                                 DATE '2024-02-01') AS BIGINT) AS recency_days,
                  CAST(count(*) AS BIGINT) AS frequency,
                  floor(sum(value) * 100 + 0.5) / 100 AS monetary
           FROM events GROUP BY 1),
         c AS (SELECT quantile_cont(CAST(recency_days AS DOUBLE), 0.5) AS r_med,
                      quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f_med,
                      quantile_cont(monetary, 0.5) AS m_med
               FROM u),
         seg AS (
           SELECT u.*,
                  CASE WHEN recency_days <= r_med AND frequency >= f_med
                            AND monetary >= m_med THEN 'champion'
                       WHEN recency_days <= r_med THEN 'recent'
                       WHEN frequency >= f_med OR monetary >= m_med
                         THEN 'at_risk'
                       ELSE 'hibernating' END AS segment
           FROM u CROSS JOIN c)
         SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
                floor(avg(recency_days) * 100 + 0.5) / 100 AS avg_recency,
                floor(avg(frequency) * 100 + 0.5) / 100 AS avg_frequency,
                floor(avg(monetary) * 100 + 0.5) / 100 AS avg_monetary
         FROM seg GROUP BY 1 ORDER BY segment""",
    "evt_active_users" ->
      """WITH d AS (
           SELECT 'day' AS granularity, strftime(ts, '%Y-%m-%d') AS period,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 2),
         m AS (
           SELECT 'month' AS granularity, strftime(ts, '%Y-%m') AS period,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 2)
         SELECT * FROM d UNION ALL SELECT * FROM m
         ORDER BY granularity, period""",
    "evt_anomalies" ->
      """WITH stats AS (
           SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
           FROM events GROUP BY 1),
         z AS (
           SELECT e.event_id, e.event_type, e.value,
                  floor(((e.value - mu) / sigma) * 10000 + 0.5) / 10000 AS z
           FROM events e JOIN stats USING (event_type)
           WHERE sigma > 0)
         SELECT event_id, event_type,
                floor(value * 100 + 0.5) / 100 AS value, z
         FROM z WHERE abs(z) >= 3.0
         ORDER BY event_id""",
    "evt_psi_windows" ->
      """WITH v AS (
           SELECT CAST(ts AS TIMESTAMP) AS ts,
                  CAST(greatest(least(floor(value / 2000.0), 5.0), 0.0)
                       AS INTEGER) AS b
           FROM events WHERE value IS NOT NULL),
         base AS (SELECT b, count(*) AS n FROM v GROUP BY 1),
         btot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM base),
         q AS (
           SELECT gs.i AS b,
                  (coalesce(base.n, 0) + 0.5) / (btot.t + 3.0) AS qf
           FROM (SELECT unnest(range(6)) AS i) gs
           LEFT JOIN base ON base.b = gs.i CROSS JOIN btot),
         wc AS (
           SELECT time_bucket(INTERVAL 6 HOUR, ts) AS ws, b, count(*) AS n
           FROM v GROUP BY 1, 2),
         wt AS (SELECT ws, CAST(sum(n) AS BIGINT) AS n_rows
                FROM wc GROUP BY 1),
         grid AS (
           SELECT wt.ws, wt.n_rows, q.b, q.qf, coalesce(wc.n, 0) AS n
           FROM wt CROSS JOIN q
           LEFT JOIN wc ON wc.ws = wt.ws AND wc.b = q.b),
         p AS (
           SELECT ws, n_rows,
                  floor(sum(((n + 0.5) / (n_rows + 3.0) - qf) *
                            ln(((n + 0.5) / (n_rows + 3.0)) / qf))
                        * 1000000 + 0.5) / 1000000 AS psi
           FROM grid GROUP BY 1, 2)
         SELECT strftime(ws, '%Y-%m-%d %H:00') AS window_start, n_rows, psi,
                CASE WHEN psi > 0.25 THEN 'act'
                     WHEN psi > 0.1 THEN 'investigate'
                     ELSE 'ok' END AS alert
         FROM p ORDER BY window_start""",
    "evt_window_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, event_type,
                count(*) AS n, floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "evt_segment_overlap" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         hh AS (
           SELECT event_type, user_id,
                  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
                       AS BIGINT) / 4503599627370496.0 AS h
           FROM du),
         sk AS (
           SELECT event_type, user_id, h FROM (
             SELECT hh.*, row_number() OVER (PARTITION BY event_type
                            ORDER BY h, user_id) AS rn
             FROM hh)
           WHERE rn <= 64),
         seg AS (
           SELECT event_type,
                  floor((CASE WHEN count(*) < 64
                         THEN count(*) * 1.0
                         ELSE 63.0 / max(h) END) * 100 + 0.5) / 100 AS est
           FROM sk GROUP BY 1),
         p AS (
           SELECT a.event_type AS seg_a, b.event_type AS seg_b
           FROM (SELECT DISTINCT event_type FROM sk) a,
                (SELECT DISTINCT event_type FROM sk) b
           WHERE a.event_type < b.event_type),
         t AS (
           SELECT p.seg_a, p.seg_b, s.h,
                  max(CASE WHEN s.event_type = p.seg_a THEN 1 ELSE 0 END)
                    AS in_a,
                  max(CASE WHEN s.event_type = p.seg_b THEN 1 ELSE 0 END)
                    AS in_b
           FROM p JOIN sk s
             ON s.event_type = p.seg_a OR s.event_type = p.seg_b
           GROUP BY 1, 2, 3),
         km AS (
           SELECT * FROM (
             SELECT t.*, row_number() OVER (PARTITION BY seg_a, seg_b
                           ORDER BY h) AS rn
             FROM t)
           WHERE rn <= 64),
         st AS (
           SELECT seg_a, seg_b, count(*) AS ku, max(h) AS hk,
                  CAST(sum(in_a * in_b) AS BIGINT) AS c
           FROM km GROUP BY 1, 2)
         SELECT st.seg_a, st.seg_b, ea.est AS est_a, eb.est AS est_b,
                floor((CASE WHEN ku < 64 THEN ku * 1.0
                       ELSE 63.0 / hk END) * 100 + 0.5) / 100 AS est_union,
                floor((c * 1.0 / ku *
                       CASE WHEN ku < 64 THEN ku * 1.0
                            ELSE 63.0 / hk END) * 100 + 0.5) / 100
                  AS est_intersect,
                floor((c * 1.0 / ku) * 10000 + 0.5) / 10000 AS jaccard_est
         FROM st
         JOIN seg ea ON ea.event_type = st.seg_a
         JOIN seg eb ON eb.event_type = st.seg_b
         ORDER BY seg_a, seg_b""",
    "evt_user_paths" ->
      """WITH s AS (
           SELECT event_type,
                  lead(event_type, 1) OVER w AS e2,
                  lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT event_type || '>' || e2 || '>' || e3 AS path,
                count(*) AS n
         FROM s WHERE e3 IS NOT NULL
         GROUP BY 1 ORDER BY n DESC, path LIMIT 15""",
    "evt_sliding_hourly" ->
      """WITH w AS (
           SELECT time_bucket(INTERVAL '15 minutes', ts)
                    - k.k * INTERVAL '15 minutes' AS ws,
                  value
           FROM events
           CROSS JOIN (SELECT unnest(range(4)) AS k) k)
         SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start,
                count(*) AS n_events,
                floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
         FROM w GROUP BY 1 ORDER BY win_start""",
    "evt_sessionize" ->
      """WITH t AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev_us
           FROM events),
         s AS (
           SELECT user_id, us, event_id,
                  CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM t),
         g AS (
           SELECT user_id,
                  SUM(is_new) OVER (PARTITION BY user_id
                    ORDER BY us, event_id ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM s)
         SELECT user_id,
                CAST(max(session_id) AS BIGINT) AS n_sessions,
                count(*) AS n_events,
                floor((count(*) * 1.0 / CAST(max(session_id) AS BIGINT)) * 100 + 0.5) / 100
                  AS avg_events_per_session
         FROM g GROUP BY user_id""",
    // identical semantics to evt_sessionize through the native
    // session_window aggregate — same oracle pins both formulations
    "evt_sessionize_sw" ->
      """WITH t AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev_us
           FROM events),
         s AS (
           SELECT user_id, us, event_id,
                  CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM t),
         g AS (
           SELECT user_id,
                  SUM(is_new) OVER (PARTITION BY user_id
                    ORDER BY us, event_id ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM s)
         SELECT user_id,
                CAST(max(session_id) AS BIGINT) AS n_sessions,
                count(*) AS n_events,
                floor((count(*) * 1.0 / CAST(max(session_id) AS BIGINT)) * 100 + 0.5) / 100
                  AS avg_events_per_session
         FROM g GROUP BY user_id""",
    // oracle is DuckDB's native ASOF LEFT JOIN — an independent
    // implementation of the as-of semantics the union+window operator
    // computes
    "evt_asof_join" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id, epoch_us(ts) AS click_us
           FROM events WHERE event_type = 'click')
         SELECT p.event_id, p.user_id,
                CAST((p.us - c.click_us) // 1000000 AS BIGINT)
                  AS secs_since_click
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.us >= c.click_us
         ORDER BY p.event_id""",
    "evt_asof_enrich" ->
      """WITH t AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
                  last_value(CASE WHEN event_type = 'signup'
                                  THEN epoch_us(ts) END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS signup_us
           FROM events)
         SELECT event_id, user_id, event_type,
                CAST((us - signup_us) // 1000000 AS BIGINT) AS secs_since_signup
         FROM t""",
    "evt_attribution" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS p_us,
                           event_id AS purchase_id
                    FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_us(ts) AS c_us, event_id AS click_id
               FROM events WHERE event_type = 'click')
         SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_clicks,
                min(click_id) AS first_click_id
         FROM p JOIN c ON p.user_id = c.user_id
                      AND c.c_us >= p.p_us - 1800000000
                      AND c.c_us <= p.p_us
         GROUP BY purchase_id ORDER BY purchase_id""",
    "evt_funnel_conversion" ->
      """WITH u AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'signup'
                           THEN epoch_us(ts) END) AS first_signup,
                  max(CASE WHEN event_type = 'purchase'
                           THEN epoch_us(ts) END) AS last_purchase
           FROM events GROUP BY user_id),
         s AS (SELECT * FROM u WHERE first_signup IS NOT NULL)
         SELECT count(*) AS n_signed_up,
                CAST(SUM(CASE WHEN last_purchase > first_signup
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
                floor((CAST(SUM(CASE WHEN last_purchase > first_signup
                                     THEN 1 ELSE 0 END) AS BIGINT)
                       * 100.0 / nullif(count(*), 0)) * 10 + 0.5) / 10
                  AS conv_pct
         FROM s""",
    "evt_json_extract" ->
      """SELECT event_type, count(*) AS n,
                floor((avg(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 100 + 0.5) / 100 AS avg_k,
                max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""")
}
