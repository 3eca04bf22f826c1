package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Statistical analyses the reference surfaces as one-off report
  * endpoints (outcome rates, resolution-time summaries —
  * reports/handlers.py) completed into the standard inferential forms:
  * a declarative data-quality expectation suite (the Deequ shape),
  * Kaplan–Meier time-to-event survival with right-censoring, and a
  * two-proportion A/B z-test.
  *
  * Scale notes (100 TB):
  *  - etl_expectations: ALL six constraint metrics ship in ONE
  *    aggregate pass over the fact (one scan, map-side combined); the
  *    stack() to constraint rows operates on the 1-row result. The
  *    only non-streaming metric is the exact PK count_distinct — a
  *    single distinct aggregate (no Expand multiplication; the
  *    documented approx swap-in is tbl_profile_approx's pattern).
  *  - rpt_kaplan_meier: the event table collapses to one row per
  *    DISTINCT duration (bounded: days, not rows) before any window
  *    runs; the at-risk/survival windows therefore order a frame of
  *    ~hundreds of rows regardless of fact size. The single-partition
  *    window is safe for the same reason rpt_running_total's is — the
  *    frame is post-aggregate and bounded by the value domain.
  *  - rpt_ab_test: two-stage aggregate — per-user conversion flags
  *    (one shuffle on user_id, map-side combined), then a 1-row
  *    conditional aggregate; z-statistic arithmetic happens on the
  *    1-row frame.
  */
object Stats {

  /** Declarative expectation suite over `orders` — completeness,
    * PK uniqueness, value range, set membership, format regex, date
    * sanity — evaluated in a single scan, emitted as one row per
    * constraint with the observed metric, threshold, and verdict. */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("nn"),
      countDistinct(col("o_orderkey")).as("dk"),
      sum(when(col("o_totalprice") > 0.0 && col("o_totalprice") <= 1000000.0,
               1L).otherwise(0L)).as("rng"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("st"),
      sum(when(col("o_orderpriority").rlike("^[1-5]-"), 1L).otherwise(0L))
        .as("pri"),
      sum(when(to_date(col("o_orderdate"))
                 .between(lit("1992-01-01").cast("date"),
                          lit("2002-12-31").cast("date")), 1L).otherwise(0L))
        .as("dt"))
    val n = col("n").cast("double")
    val m = a.select(
      rnd(col("nn").cast("double") / n, 6).as("m_comp"),
      rnd(col("dk").cast("double") / n, 6).as("m_uniq"),
      rnd(col("rng").cast("double") / n, 6).as("m_rng"),
      rnd(col("st").cast("double") / n, 6).as("m_set"),
      rnd(col("pri").cast("double") / n, 6).as("m_re"),
      rnd(col("dt").cast("double") / n, 6).as("m_dt"))
    m.selectExpr(
      """stack(6,
           'completeness:o_custkey',  m_comp, CAST(1.0  AS DOUBLE),
           'unique_pk:o_orderkey',    m_uniq, CAST(1.0  AS DOUBLE),
           'range:o_totalprice',      m_rng,  CAST(0.99 AS DOUBLE),
           'set:o_orderstatus',       m_set,  CAST(1.0  AS DOUBLE),
           'regex:o_orderpriority',   m_re,   CAST(1.0  AS DOUBLE),
           'range:o_orderdate',       m_dt,   CAST(1.0  AS DOUBLE))
         AS (expectation, observed, threshold)""")
      .withColumn("passed", col("observed") >= col("threshold"))
      .orderBy(col("expectation"))
  }

  /** Kaplan–Meier survival over order→ship latency: duration =
    * days(o_orderdate → l_shipdate) per line, event = line FINISHED
    * (l_linestatus = 'F'), right-censored = still open ('O'). The
    * product-limit estimator is computed as exp(Σ ln(1 − d/n)) so the
    * oracle can express the running product with a window sum; the
    * terminal d == n_risk factor (KM S=0) is special-cased in BOTH
    * engines because ln(0) diverges (DuckDB throws, Spark yields NULL
    * which sum() would silently skip — survival > 0 where KM says 0). */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"))
    val base = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("t"),
        when(col("l_linestatus") === "F", 1L).otherwise(0L).as("ev"))
      // the synthetic ship/order dates are uncorrelated; the cohort is
      // the well-ordered half (shipped on/after order) — documented
      .filter(col("t") >= 0L)
    // one row per distinct duration: d = events, c = censored
    val g = base.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"), (count(lit(1)) - sum(col("ev"))).as("c"))
    val total = g.agg(sum(col("d") + col("c")).as("total"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      // terminal factor: when d == n_risk (all remaining at-risk rows
      // are events — necessarily the last distinct duration) the KM
      // product is exactly 0; log(1 - d/n) would be log(0). Sum only
      // the d < n_risk factors and special-case S=0, mirrored in the
      // oracle's CASE so both expression trees stay identical.
      .withColumn("survival",
        when(col("d") === col("n_risk"), lit(0.0)).otherwise(
          exp(sum(when(col("d") < col("n_risk"),
            log(lit(1.0) -
              col("d").cast("double") / col("n_risk").cast("double"))))
            .over(wCum))))
      .filter(col("d") > 0)
      .select(col("t").as("t_days"), col("n_risk"),
              col("d").as("d_events"), rnd(col("survival"), 6).as("survival"))
      .orderBy(col("t_days"))
  }

  /** Two-proportion A/B test on user conversion: variant = user_id
    * parity (a deterministic hash-bucket assignment), conversion =
    * user fired ≥14 `purchase` events (the corpus median — "ever
    * purchased" saturates at 100% in this event stream). Pooled
    * z-statistic, 5% two-sided significance. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    abTestOn(ev.groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                  >= 14L, 1L).otherwise(0L)
        .as("conv")))
  }

  /** Frame-level core ((user_id, conv) rows; OracleEdgeSpec plants the
    * degenerate fixtures through it). An empty arm has no rate, and a
    * pooled rate of exactly 0 or 1 zeroes the z denominator (no
    * variance to test against) — NULL by construction here and via
    * nullif in the oracle, never an engine-dependent IEEE 0/0. */
  private[graft] def abTestOn(u: DataFrame): DataFrame = {
    val a = u.agg(
      sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("user_id") % 2 === 0, col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("user_id") % 2 === 1, col("conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") /
      nullif(col("n_a").cast("double"), lit(0.0))
    val pb = col("conv_b").cast("double") /
      nullif(col("n_b").cast("double"), lit(0.0))
    val p = (col("conv_a") + col("conv_b")).cast("double") /
            nullif((col("n_a") + col("n_b")).cast("double"), lit(0.0))
    val z = (pa - pb) /
      nullif(sqrt(p * (lit(1.0) - p) *
           (lit(1.0) / nullif(col("n_a").cast("double"), lit(0.0)) +
            lit(1.0) / nullif(col("n_b").cast("double"), lit(0.0)))),
        lit(0.0))
    a.select(col("n_a"), col("conv_a"), rnd(pa, 6).as("rate_a"),
             col("n_b"), col("conv_b"), rnd(pb, 6).as("rate_b"),
             rnd(z, 4).as("z_score"),
             (abs(rnd(z, 4)) >= 1.96).as("significant"))
  }

  /** Chi-square independence test over the priority × status
    * contingency table: are order priority and status independent?
    * The fact collapses to the O(|P|×|S|) cell frame in ONE
    * map-side-combined count; expected counts derive from broadcast
    * row/column marginals; χ² = Σ(o−e)²/e on the bounded frame. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("p"), col("o_orderstatus").as("s"))
    val cells = o.groupBy(col("p"), col("s")).agg(count(lit(1)).as("c"))
    val rowT = cells.groupBy(col("p")).agg(sum(col("c")).as("rt"))
    val colT = cells.groupBy(col("s")).agg(sum(col("c")).as("ct"))
    val tot  = cells.agg(sum(col("c")).as("n"),
                         countDistinct(col("p")).as("np"),
                         countDistinct(col("s")).as("ns"))
    val e = col("rt").cast("double") * col("ct").cast("double") /
            col("n").cast("double")
    cells.join(broadcast(rowT), Seq("p"))
      .join(broadcast(colT), Seq("s"))
      .crossJoin(broadcast(tot))
      .select(((col("c").cast("double") - e) * (col("c").cast("double") - e) / e)
                .as("term"),
              col("n"), col("np"), col("ns"))
      .groupBy(col("n"), col("np"), col("ns"))
      .agg(rnd(sum(col("term")), 4).as("chi2"))
      .select(col("n").as("n_rows"),
              ((col("np") - 1) * (col("ns") - 1)).as("dof"),
              col("chi2"),
              // chi2 critical value at alpha=0.05 for dof=8 is 15.507;
              // emit the comparison only for the fixed 5x3 table shape
              (col("chi2") >= 15.507).as("significant"))
  }

  /** Two-sample Kolmogorov–Smirnov distance on a value GRID — the
    * distribution-shift test between the even/odd order-key
    * populations. Exact KS needs a corpus-global sort; the grid form
    * (prices bucketed to 10k-wide bins — rpt_histogram's CDF
    * machinery) bounds the ECDF frame at O(bins) at any scale and is
    * the PSI-dashboard companion: PSI scores overall drift, grid-KS
    * locates the worst single gap. */
  def ksTest(spark: SparkSession, dir: String): DataFrame =
    ksTestOn(Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / 10000.0).cast("long").as("bin"),
              (col("o_orderkey") % 2 === 0).as("isA")))

  /** Frame-level core ((bin, isA) rows; OracleEdgeSpec plants the
    * one-empty-population fixture through it). An empty population
    * zeroes an ECDF denominator (no distribution to compare against)
    * — ks_d/critical/significant NULL by construction here and via
    * nullif in the oracle, never an engine-dependent IEEE x/0. */
  private[graft] def ksTestOn(o: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val g = o.groupBy(col("bin"))
      .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("na"),
           sum(when(!col("isA"), 1L).otherwise(0L)).as("nb"))
    val wCum = W.orderBy(col("bin")).rowsBetween(W.unboundedPreceding, 0)
    val wAll = W.orderBy(col("bin"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val d = g
      .withColumn("ta", sum(col("na")).over(wAll))
      .withColumn("tb", sum(col("nb")).over(wAll))
      .withColumn("gap", abs(
        sum(col("na")).over(wCum).cast("double") /
          nullif(col("ta").cast("double"), lit(0.0)) -
        sum(col("nb")).over(wCum).cast("double") /
          nullif(col("tb").cast("double"), lit(0.0))))
      .groupBy(col("ta"), col("tb"))
      .agg(rnd(max(col("gap")), 6).as("ks_d"))
    // two-sided alpha=0.05: reject if D > 1.358*sqrt((na+nb)/(na*nb))
    val crit = lit(1.358) * sqrt(
      (col("ta") + col("tb")).cast("double") /
      nullif(col("ta").cast("double") * col("tb").cast("double"), lit(0.0)))
    d.select(col("ta").as("n_a"), col("tb").as("n_b"), col("ks_d"),
             rnd(crit, 6).as("critical_05"),
             (col("ks_d") > rnd(crit, 6)).as("significant"))
  }

  /** Deterministic Poisson bootstrap CI for the mean order value — the
    * BIG-DATA bootstrap: classic resampling needs n draws per
    * replicate (a corpus-global shuffle per replicate); the Poisson
    * form gives every row an independent Poisson(1) weight per
    * replicate. The B replicate weights are PER-ROW expressions, so
    * all B weighted sums compute as 2B aggregate expressions in ONE
    * un-exploded map-side-combined pass — scan cost identical to a
    * plain mean, aggregate input N rows (not B·N: the earlier
    * explode(B) form multiplied aggregate input 32×), wire exactly
    * one 2B+2-column partial row per partition. The Poisson draw
    * inverts the CDF on the library's standard md5 13-nibble/2⁵²
    * uniform (the evt_segment_overlap coin), so the entire bootstrap
    * is bit-reproducible — a resampling procedure with a FULL
    * cross-engine oracle. Replicate means round numerator before the
    * divide (the corr_measures discipline); the 2.5/97.5 percentiles
    * interpolate the sorted B-element replicate array at fixed
    * indices — the same lower+(higher−lower)·frac form Spark's
    * `percentile` and DuckDB's `quantile_cont` share, with
    * pos = p·(B−1) constant-folded at plan build. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val B = 32
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    def weight(b: Int): Column = {
      val u = conv(substring(md5(concat(
          col("o_orderkey").cast("string"), lit(":"), lit(b.toString))),
          1, 13), 16, 10).cast("double") / lit(4503599627370496.0)
      when(u < 0.367879441, 0.0)
        .when(u < 0.735758882, 1.0)
        .when(u < 0.919698603, 2.0)
        .when(u < 0.981011843, 3.0)
        .when(u < 0.996340153, 4.0)
        .otherwise(5.0)
    }
    // One projection evaluates each replicate weight once per row.
    // The weight kernel is compute-dominated (B md5+conv per row), so
    // the 2-column input is spread to full cluster parallelism first —
    // the BinaryPipeline decode precedent: a narrow exchange Catalyst
    // can't know to insert because it can't cost the B-hash projection
    // (on a coarse-partitioned scan the kernel would otherwise run in
    // as few tasks as the file has row groups).
    val withW = o.repartition(spark.sparkContext.defaultParallelism).select(
      col("o_totalprice") +: (0 until B).map(b => weight(b).as(s"w$b")): _*)
    // … then ONE aggregate carries the base stats and all B
    // (Σ w·x, Σ w) pairs as partial-combinable expressions.
    val aggs =
      Seq(count(lit(1)).as("n_rows"),
          rnd(avg(col("o_totalprice")), 2).as("mean")) ++
      (0 until B).flatMap(b => Seq(
        sum(col(s"w$b") * col("o_totalprice")).as(s"s$b"),
        sum(col(s"w$b")).as(s"c$b")))
    val one = withW.agg(aggs.head, aggs.tail: _*)
    val means = array_sort(array(
      (0 until B).map(b => rnd(rnd(col(s"s$b"), 2) / col(s"c$b"), 2)): _*))
    def quantile(p: Double): Column = {
      val pos = p * (B - 1)
      val lo = math.floor(pos).toInt
      val frac = pos - lo
      element_at(col("ms"), lo + 1) +
        (element_at(col("ms"), lo + 2) - element_at(col("ms"), lo + 1)) *
        lit(frac)
    }
    one.withColumn("ms", means)
      .select(col("n_rows"), col("mean"),
              rnd(quantile(0.025), 2).as("ci_lo"),
              rnd(quantile(0.975), 2).as("ci_hi"),
              lit(B.toLong).as("b_replicates"))
  }

  /** One-way ANOVA F-test: does mean order value differ across the
    * five priorities? F = (SSB/(k−1)) / (SSW/(n−k)) derived entirely
    * from per-group moment sums — ONE map-side-combined pass over the
    * fact, then arithmetic on the O(groups) frame. Values are in
    * THOUSANDS so Σx² stays inside double's exact-integer range at
    * any SF (the rpt_trend_forecast discipline); group sums round
    * 2 dp before the F arithmetic. The 0.05 critical value 2.372 is
    * F(4, ∞) — valid for this fixed 5-group shape with large n. */
  def anova(spark: SparkSession, dir: String): DataFrame =
    anovaOn(Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice")))

  /** Frame-level core ((o_orderpriority, o_totalprice) rows;
    * OracleEdgeSpec plants the degenerate fixtures through it). A
    * single group (no between dof), one row per group (no within
    * dof), and zero within-group variance each zero a term of F's
    * denominator — NULL by construction here and via nullif in the
    * oracle, never an engine-dependent IEEE 0/0. */
  private[graft] def anovaOn(orders: DataFrame): DataFrame = {
    val x = col("o_totalprice") / 1000.0
    val g = orders
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_g"),
           rnd(sum(x), 2).as("s_g"),
           rnd(sum(x * x), 2).as("ss_g"))
    val t = g.agg(
      count(lit(1)).as("k"),
      sum(col("n_g")).as("n"),
      sum(col("s_g")).as("s"),
      sum(col("ss_g")).as("ss"),
      sum(col("s_g") * col("s_g") / col("n_g").cast("double")).as("a"))
    val ssb = col("a") - col("s") * col("s") / col("n").cast("double")
    val ssw = col("ss") - col("a")
    val f = (ssb / nullif((col("k") - 1).cast("double"), lit(0.0))) /
            nullif(ssw / nullif((col("n") - col("k")).cast("double"),
                                lit(0.0)), lit(0.0))
    t.select(col("k").as("k_groups"), col("n").as("n_rows"),
             rnd(f, 4).as("f_stat"),
             (col("k") - 1).as("dof_between"),
             (col("n") - col("k")).as("dof_within"),
             (rnd(f, 4) >= 2.372).as("significant"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_expectations" -> (expectations _),
    "rpt_kaplan_meier" -> (kaplanMeier _),
    "rpt_ab_test"      -> (abTest _),
    "rpt_chi_square"   -> (chiSquare _),
    "rpt_ks_test"      -> (ksTest _),
    "rpt_bootstrap_ci" -> (bootstrapCi _),
    "rpt_anova"        -> (anova _))

  val oracles: Map[String, String] = Map(
    "etl_expectations" ->
      """WITH a AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(count(o_custkey) AS DOUBLE) AS nn,
                  CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS dk,
                  CAST(sum(CASE WHEN o_totalprice > 0.0
                                 AND o_totalprice <= 1000000.0
                                THEN 1 ELSE 0 END) AS DOUBLE) AS rng,
                  CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
                                THEN 1 ELSE 0 END) AS DOUBLE) AS st,
                  CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                                THEN 1 ELSE 0 END) AS DOUBLE) AS pri,
                  CAST(sum(CASE WHEN CAST(o_orderdate AS DATE)
                                     BETWEEN DATE '1992-01-01'
                                         AND DATE '2002-12-31'
                                THEN 1 ELSE 0 END) AS DOUBLE) AS dt
           FROM orders),
         rows AS (
           SELECT 'completeness:o_custkey' AS expectation,
                  floor((nn / n) * 1000000 + 0.5) / 1000000 AS observed,
                  CAST(1.0 AS DOUBLE) AS threshold FROM a
           UNION ALL SELECT 'unique_pk:o_orderkey',
                  floor((dk / n) * 1000000 + 0.5) / 1000000,
                  CAST(1.0 AS DOUBLE) FROM a
           UNION ALL SELECT 'range:o_totalprice',
                  floor((rng / n) * 1000000 + 0.5) / 1000000,
                  CAST(0.99 AS DOUBLE) FROM a
           UNION ALL SELECT 'set:o_orderstatus',
                  floor((st / n) * 1000000 + 0.5) / 1000000,
                  CAST(1.0 AS DOUBLE) FROM a
           UNION ALL SELECT 'regex:o_orderpriority',
                  floor((pri / n) * 1000000 + 0.5) / 1000000,
                  CAST(1.0 AS DOUBLE) FROM a
           UNION ALL SELECT 'range:o_orderdate',
                  floor((dt / n) * 1000000 + 0.5) / 1000000,
                  CAST(1.0 AS DOUBLE) FROM a)
         SELECT expectation, observed, threshold,
                observed >= threshold AS passed
         FROM rows ORDER BY expectation""",
    "rpt_kaplan_meier" ->
      """WITH base AS (
           SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) AS BIGINT) AS t,
                  CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS ev
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) >= 0),
         g AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
                      CAST(count(*) - sum(ev) AS BIGINT) AS c
               FROM base GROUP BY t),
         r AS (SELECT t, d, c,
                      (SELECT CAST(sum(d + c) AS BIGINT) FROM g) -
                      coalesce(CAST(sum(d + c) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS BIGINT), 0) AS n_risk
               FROM g),
         s AS (SELECT t, n_risk, d,
                      CASE WHEN d = n_risk THEN 0.0 ELSE
                        exp(sum(CASE WHEN d < n_risk THEN
                                  ln(1.0 - CAST(d AS DOUBLE)
                                           / CAST(n_risk AS DOUBLE)) END)
                            OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)) END AS surv
               FROM r)
         SELECT t AS t_days, n_risk, d AS d_events,
                floor(surv * 1000000 + 0.5) / 1000000 AS survival
         FROM s WHERE d > 0 ORDER BY t_days""",
    "rpt_anova" ->
      """WITH g AS (
           SELECT o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n_g,
                  floor(sum(o_totalprice / 1000.0) * 100 + 0.5) / 100 AS s_g,
                  floor(sum((o_totalprice / 1000.0) * (o_totalprice / 1000.0))
                        * 100 + 0.5) / 100 AS ss_g
           FROM orders GROUP BY 1),
         t AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(n_g) AS BIGINT) AS n,
                  sum(s_g) AS s, sum(ss_g) AS ss,
                  sum(s_g * s_g / CAST(n_g AS DOUBLE)) AS a
           FROM g),
         f AS (
           SELECT k, n,
                  floor((((a - s * s / CAST(n AS DOUBLE)) /
                          nullif(CAST(k - 1 AS DOUBLE), 0))
                         / nullif((ss - a) /
                                  nullif(CAST(n - k AS DOUBLE), 0), 0))
                        * 10000 + 0.5) / 10000 AS f_stat
           FROM t)
         SELECT k AS k_groups, n AS n_rows, f_stat,
                k - 1 AS dof_between, n - k AS dof_within,
                f_stat >= 2.372 AS significant
         FROM f""",
    "rpt_bootstrap_ci" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
         reps AS (SELECT o.o_orderkey, o.o_totalprice, t.b
                  FROM o CROSS JOIN generate_series(0, 31) AS t(b)),
         uu AS (SELECT o_totalprice, b,
                       CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                                || ':' ||
                                                CAST(b AS VARCHAR)), 1, 13))
                            AS BIGINT) / 4503599627370496.0 AS u
                FROM reps),
         ww AS (SELECT b, o_totalprice,
                       CASE WHEN u < 0.367879441 THEN 0.0
                            WHEN u < 0.735758882 THEN 1.0
                            WHEN u < 0.919698603 THEN 2.0
                            WHEN u < 0.981011843 THEN 3.0
                            WHEN u < 0.996340153 THEN 4.0
                            ELSE 5.0 END AS w
                FROM uu),
         rm AS (SELECT b,
                       floor((floor(sum(w * o_totalprice) * 100 + 0.5) / 100)
                             / sum(w) * 100 + 0.5) / 100 AS m
                FROM ww GROUP BY b),
         base AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                         floor(avg(o_totalprice) * 100 + 0.5) / 100 AS mean
                  FROM o),
         ci AS (SELECT CAST(count(*) AS BIGINT) AS b_replicates,
                       floor(quantile_cont(m, 0.025) * 100 + 0.5) / 100 AS ci_lo,
                       floor(quantile_cont(m, 0.975) * 100 + 0.5) / 100 AS ci_hi
                FROM rm)
         SELECT n_rows, mean, ci_lo, ci_hi, b_replicates
         FROM base CROSS JOIN ci""",
    "rpt_chi_square" ->
      """WITH cells AS (
           SELECT o_orderpriority AS p, o_orderstatus AS s,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1, 2),
         rt AS (SELECT p, CAST(sum(c) AS BIGINT) AS rt FROM cells GROUP BY 1),
         ct AS (SELECT s, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                        CAST(count(DISTINCT p) AS BIGINT) AS np,
                        CAST(count(DISTINCT s) AS BIGINT) AS ns
                 FROM cells),
         terms AS (
           SELECT (CAST(cl.c AS DOUBLE) -
                   CAST(r.rt AS DOUBLE) * CAST(co.ct AS DOUBLE)
                     / CAST(t.n AS DOUBLE)) *
                  (CAST(cl.c AS DOUBLE) -
                   CAST(r.rt AS DOUBLE) * CAST(co.ct AS DOUBLE)
                     / CAST(t.n AS DOUBLE)) /
                  (CAST(r.rt AS DOUBLE) * CAST(co.ct AS DOUBLE)
                     / CAST(t.n AS DOUBLE)) AS term,
                  t.n, t.np, t.ns
           FROM cells cl
           JOIN rt r ON r.p = cl.p
           JOIN ct co ON co.s = cl.s
           CROSS JOIN tot t),
         agg AS (
           SELECT n, np, ns,
                  floor(sum(term) * 10000 + 0.5) / 10000 AS chi2
           FROM terms GROUP BY n, np, ns)
         SELECT n AS n_rows, (np - 1) * (ns - 1) AS dof, chi2,
                chi2 >= 15.507 AS significant
         FROM agg""",
    "rpt_ks_test" ->
      """WITH o AS (
           SELECT CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
                  o_orderkey % 2 = 0 AS isa
           FROM orders),
         g AS (SELECT bin,
                      CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT)
                        AS na,
                      CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT)
                        AS nb
               FROM o GROUP BY 1),
         w AS (SELECT bin, na, nb,
                      CAST(sum(na) OVER () AS BIGINT) AS ta,
                      CAST(sum(nb) OVER () AS BIGINT) AS tb,
                      CAST(sum(na) OVER (ORDER BY bin ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
                      CAST(sum(nb) OVER (ORDER BY bin ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
               FROM g),
         d AS (SELECT ta, tb,
                      floor(max(abs(CAST(ca AS DOUBLE) /
                                      nullif(CAST(ta AS DOUBLE), 0) -
                                    CAST(cb AS DOUBLE) /
                                      nullif(CAST(tb AS DOUBLE), 0)))
                            * 1000000 + 0.5) / 1000000 AS ks_d
               FROM w GROUP BY ta, tb),
         cr AS (SELECT ta, tb, ks_d,
                       floor((1.358 * sqrt(CAST(ta + tb AS DOUBLE) /
                               nullif(CAST(ta AS DOUBLE) *
                                      CAST(tb AS DOUBLE), 0)))
                             * 1000000 + 0.5) / 1000000 AS critical_05
                FROM d)
         SELECT ta AS n_a, tb AS n_b, ks_d, critical_05,
                ks_d > critical_05 AS significant
         FROM cr""",
    "rpt_ab_test" ->
      """WITH u AS (
           SELECT user_id,
                  CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) >= 14
                       THEN 1 ELSE 0 END AS conv
           FROM events GROUP BY user_id),
         a AS (
           SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
                       AS BIGINT) AS conv_a,
                  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_b,
                  CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)
                       AS BIGINT) AS conv_b
           FROM u),
         d AS (
           SELECT n_a, conv_a, n_b, conv_b,
                  CAST(conv_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0) AS pa,
                  CAST(conv_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0) AS pb,
                  CAST(conv_a + conv_b AS DOUBLE)
                    / nullif(CAST(n_a + n_b AS DOUBLE), 0) AS p
           FROM a),
         zc AS (
           SELECT *,
                  floor(((pa - pb) /
                         nullif(sqrt(p * (1.0 - p) *
                              (1.0 / nullif(CAST(n_a AS DOUBLE), 0) +
                               1.0 / nullif(CAST(n_b AS DOUBLE), 0))), 0))
                        * 10000 + 0.5) / 10000 AS z_score
           FROM d)
         SELECT n_a, conv_a,
                floor(pa * 1000000 + 0.5) / 1000000 AS rate_a,
                n_b, conv_b,
                floor(pb * 1000000 + 0.5) / 1000000 AS rate_b,
                z_score,
                abs(z_score) >= 1.96 AS significant
         FROM zc""")
}
