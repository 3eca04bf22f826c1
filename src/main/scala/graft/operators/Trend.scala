package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Trend and engagement analytics over the monthly rollups — the
  * forecasting/robust-stats layer the reference's timeline endpoints
  * (handlers.py TimelineReports) stop short of: exponential smoothing,
  * per-group OLS trend + projection, DAU/MAU stickiness, and
  * winsorized/trimmed robust means.
  *
  * Scale notes (100 TB):
  *  - Everything here runs on a MONTHLY (or per-group) aggregate the
  *    fact collapses to first — one map-side-combined shuffle — so the
  *    quadratic EWMA weight join and the OLS moment arithmetic touch
  *    O(months) / O(groups) rows at any fact size.
  *  - rpt_ewma's weighted self-join is O(months²) BY DESIGN on the
  *    bounded monthly frame (~80 rows → 6.4k pairs): the recursive
  *    S_t = αx_t + (1−α)S_{t−1} cannot be a plain window sum (weights
  *    depend on t−i), and the explicit pair sum avoids the
  *    pow(α,−i)-rescaling trick whose 1e12-magnitude intermediates
  *    would cost the cross-engine digits we hash on.
  *  - rpt_trend_forecast mirrors rpt_corr_measures' numeric discipline:
  *    month indexes are CENTERED per group (x − min x) before the
  *    moment sums so the n·Σxy − Σx·Σy cancellation stays small, and
  *    sums round to 2 dp before the slope arithmetic so both engines
  *    derive identical doubles.
  *  - evt_stickiness is two distinct-aggregates (per-day, per-month
  *    users) joined on the O(months) frame; at 100 TB the exact
  *    count_distincts swap to approx_count_distinct exactly as
  *    rpt_approx_distinct demonstrates.
  *  - rpt_winsorized is the standard two-pass robust mean: exact
  *    per-group percentile cutoffs (tiny frame) broadcast back over
  *    the fact for one clamp/filter aggregate; cutoffs round to 2 dp
  *    first so the clamp boundary is bit-identical cross-engine.
  */
object Trend {

  private val Alpha = 0.3 // EWMA smoothing factor

  /** rpt_ewma: exponentially weighted moving average of monthly order
    * revenue (α=0.3, S₁=x₁ initialization). */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(rnd(sum(col("o_totalprice")), 2).as("rev"))
    val r = m.withColumn("t",
      row_number().over(Window.orderBy(col("month"))).cast("long"))
    val a = r.select(col("month"), col("rev"), col("t"))
    val b = r.select(col("t").as("i"), col("rev").as("rev_i"))
    // S_t = 0.7^(t-1)·x₁ + Σ_{i=2..t} 0.3·0.7^(t-i)·x_i  (exact
    // unrolling of the recursion; the join frame is O(months²))
    val term = when(col("i") === 1L, pow(lit(1 - Alpha), col("t") - 1))
      .otherwise(lit(Alpha) * pow(lit(1 - Alpha), col("t") - col("i"))) *
      col("rev_i")
    a.join(b, col("i") <= col("t"))
      .groupBy(col("month"), col("rev"))
      .agg(rnd(sum(term), 2).as("ewma"))
      .orderBy(col("month"))
  }

  /** rpt_trend_forecast: per-priority OLS trend over monthly revenue —
    * slope, intercept, R², and the next-month projection, all derived
    * from one moment pass over the monthly rollup. Revenue is in
    * MILLIONS: with raw dollars the Σy² moment at large SF exceeds
    * 2^53/100 and the floor-rounding that guarantees cross-engine hash
    * equality silently becomes a no-op; million-units keep every
    * moment in the exactly-representable range at any realistic SF. */
  def trendForecast(spark: SparkSession, dir: String): DataFrame =
    trendForecastOn(Tables.orders(spark, dir))

  /** Frame-level core (orders must have o_orderpriority, o_orderdate,
    * o_totalprice; OracleEdgeSpec plants degenerate groups through it).
    * Domain guards: a single-month group zeroes det = nΣx²−(Σx)² (no
    * slope is defined through one point) and a zero-variance-revenue
    * group zeroes R²'s denominator — both NULL by construction here
    * and via nullif in the oracle, never an engine-dependent IEEE
    * 0/0; slope's NULL propagates to intercept and forecast. */
  private[graft] def trendForecastOn(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(col("o_orderpriority"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"))
      .agg(rnd(sum(col("o_totalprice")) / lit(1000000.0), 4).as("rev"))
    // center the month index per group: x = mi − min(mi) keeps the
    // n·Σxy − Σx·Σy cancellation at O(months²·rev), not O(epoch²·rev)
    val centered = monthly.withColumn("x",
      (col("mi") - min(col("mi"))
        .over(Window.partitionBy(col("o_orderpriority")))).cast("double"))
    val mo = centered.groupBy(col("o_orderpriority")).agg(
      count(lit(1)).cast("double").as("n"),
      rnd(sum(col("x")), 2).as("sx"),
      rnd(sum(col("rev")), 2).as("sy"),
      rnd(sum(col("x") * col("x")), 2).as("sxx"),
      rnd(sum(col("x") * col("rev")), 2).as("sxy"),
      rnd(sum(col("rev") * col("rev")), 2).as("syy"),
      max(col("x")).as("xmax"))
    val det   = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      nullif(det, lit(0.0))
    val icept = (col("sy") - slope * col("sx")) / col("n")
    val r2num = col("n") * col("sxy") - col("sx") * col("sy")
    val r2    = (r2num * r2num) / nullif(
      det * (col("n") * col("syy") - col("sy") * col("sy")), lit(0.0))
    mo.select(col("o_orderpriority"),
        col("n").cast("long").as("n_months"),
        rnd(slope, 4).as("slope_musd"),
        rnd(icept, 2).as("intercept_musd"),
        rnd(r2, 6).as("r2"),
        rnd(icept + slope * (col("xmax") + 1), 2).as("forecast_next_musd"))
      .orderBy(col("o_orderpriority"))
  }

  /** evt_stickiness: monthly DAU/MAU engagement ratio — avg daily
    * distinct users over monthly distinct users. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("ts"), col("user_id"))
    val daily = ev
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("du"))
    val dau = daily
      .groupBy(substring(col("day"), 1, 7).as("month"))
      .agg(rnd(avg(col("du")), 4).as("dau_avg"))
    val mau = ev
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, Seq("month"))
      .select(col("month"), col("dau_avg"), col("mau"),
              rnd(col("dau_avg") / col("mau").cast("double"), 4)
                .as("stickiness"))
      .orderBy(col("month"))
  }

  /** rpt_winsorized: robust per-status means — p05/p95 cutoffs, the
    * winsorized mean (values clamped to the cutoffs), and the trimmed
    * mean (values outside dropped). */
  def winsorized(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_totalprice"))
    val cuts = o.groupBy(col("o_orderstatus"))
      .agg(rnd(expr("percentile(o_totalprice, 0.05)"), 2).as("p05"),
           rnd(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"))
    val clamped = greatest(least(col("o_totalprice"), col("p95")), col("p05"))
    o.join(broadcast(cuts), Seq("o_orderstatus"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
           first(col("p05")).as("p05"),
           first(col("p95")).as("p95"),
           rnd(avg(clamped), 2).as("mean_winsorized"),
           rnd(avg(when(col("o_totalprice").between(col("p05"), col("p95")),
                        col("o_totalprice"))), 2).as("mean_trimmed"))
      .orderBy(col("o_orderstatus"))
  }

  /** evt_retention_days: classic day-N retention — cohort users by
    * first-seen day, report the share still active 1/7/14 days later.
    * The (user, day) frame is DISTINCT by construction, so each
    * offset's "retained" count is a plain conditional count (one row
    * per user per day — no Expand-multiplying conditional distincts),
    * and the whole curve is two user-keyed aggregates + one user-keyed
    * join before an O(days) rollup. */
  def retentionDays(spark: SparkSession, dir: String): DataFrame = {
    val ua = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = ua.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    val j = ua.join(first, Seq("user_id"))
      .select(col("d0"), datediff(col("day"), col("d0")).as("off"))
    j.groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"))
      .agg(count(when(col("off") === 0, 1)).as("cohort_users"),
           count(when(col("off") === 1, 1)).as("d1"),
           count(when(col("off") === 7, 1)).as("d7"),
           count(when(col("off") === 14, 1)).as("d14"))
      .select(col("cohort_day"), col("cohort_users"),
        rnd(col("d1").cast("double") / col("cohort_users").cast("double"), 4)
          .as("d1_rate"),
        rnd(col("d7").cast("double") / col("cohort_users").cast("double"), 4)
          .as("d7_rate"),
        rnd(col("d14").cast("double") / col("cohort_users").cast("double"), 4)
          .as("d14_rate"))
      .orderBy(col("cohort_day"))
  }

  /** rpt_seasonality: month-of-year seasonal index — each calendar
    * month's average monthly revenue over the all-months average
    * (index > 1 = seasonally strong). Runs entirely on the O(months)
    * monthly rollup; the grand mean rides a broadcast 1-row agg. */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(rnd(sum(col("o_totalprice")) / lit(1000000.0), 4).as("rev"))
    val byMoy = monthly
      .groupBy(substring(col("ym"), 6, 2).as("moy"))
      .agg(count(lit(1)).as("n_months"), rnd(avg(col("rev")), 4).as("avg_rev_musd"))
    val overall = monthly.agg(rnd(avg(col("rev")), 4).as("grand_avg"))
    byMoy.crossJoin(broadcast(overall))
      .select(col("moy"), col("n_months"), col("avg_rev_musd"),
        rnd(col("avg_rev_musd") / col("grand_avg"), 4).as("seasonal_index"))
      .orderBy(col("moy"))
  }

  /** evt_slo_burn: SLO error-budget burn monitoring (the SRE
    * multiwindow shape): hourly error rate vs a 20% budget, plus the
    * 6-hour rolling burn rate that pages before a single bad hour
    * does. The stream collapses to the O(hours) hourly frame in one
    * map-side-combined pass; the rolling window runs over that frame
    * only (ROWS frame — the synthetic stream has no empty hours;
    * production gaps would use a RANGE frame as in rpt_rolling_7d). */
  def sloBurn(spark: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"))
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("event_type") === "error", 1L).otherwise(0L))
             .as("n_errors"))
    val w6 = W.orderBy(col("hour")).rowsBetween(-5, 0)
    val roll = sum(col("n_errors")).over(w6).cast("double") /
               sum(col("n_events")).over(w6).cast("double")
    hourly
      .withColumn("err_rate",
        rnd(col("n_errors").cast("double") / col("n_events").cast("double"), 6))
      .withColumn("roll_rate_6h", rnd(roll, 6))
      .withColumn("burn_rate", rnd(col("roll_rate_6h") / 0.20, 4))
      .withColumn("breach", col("burn_rate") >= 1.2)
      .orderBy(col("hour"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_slo_burn"       -> (sloBurn _),
    "rpt_ewma"           -> (ewma _),
    "rpt_trend_forecast" -> (trendForecast _),
    "evt_stickiness"     -> (stickiness _),
    "rpt_winsorized"     -> (winsorized _),
    "evt_retention_days" -> (retentionDays _),
    "rpt_seasonality"    -> (seasonality _))

  val oracles: Map[String, String] = Map(
    "evt_slo_burn" ->
      """WITH hourly AS (
           SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_errors
           FROM events GROUP BY 1),
         r AS (
           SELECT hour, n_events, n_errors,
                  floor((CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE))
                        * 1000000 + 0.5) / 1000000 AS err_rate,
                  floor((CAST(sum(n_errors) OVER w6 AS DOUBLE) /
                         CAST(sum(n_events) OVER w6 AS DOUBLE))
                        * 1000000 + 0.5) / 1000000 AS roll_rate_6h
           FROM hourly
           WINDOW w6 AS (ORDER BY hour ROWS BETWEEN 5 PRECEDING
                         AND CURRENT ROW)),
         b AS (
           SELECT *, floor((roll_rate_6h / 0.20) * 10000 + 0.5) / 10000
                       AS burn_rate
           FROM r)
         SELECT hour, n_events, n_errors, err_rate, roll_rate_6h,
                burn_rate, burn_rate >= 1.2 AS breach
         FROM b ORDER BY hour""",
    "rpt_ewma" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
                    FROM orders GROUP BY 1),
         r AS (SELECT month, rev,
                      CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
               FROM m),
         e AS (SELECT a.month, a.rev,
                      sum(CASE WHEN b.t = 1 THEN pow(0.7, a.t - 1)
                               ELSE 0.3 * pow(0.7, a.t - b.t) END
                          * b.rev) AS s
               FROM r a JOIN r b ON b.t <= a.t
               GROUP BY a.month, a.rev)
         SELECT month, rev, floor(s * 100 + 0.5) / 100 AS ewma
         FROM e ORDER BY month""",
    "rpt_trend_forecast" ->
      """WITH monthly AS (
           SELECT o_orderpriority,
                  (CAST(strftime(o_orderdate, '%Y') AS BIGINT) - 1995) * 12 +
                  CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS mi,
                  floor((sum(o_totalprice) / 1000000.0) * 10000 + 0.5) / 10000
                    AS rev
           FROM orders GROUP BY 1, 2),
         centered AS (
           SELECT o_orderpriority, rev,
                  CAST(mi - min(mi) OVER (PARTITION BY o_orderpriority)
                       AS DOUBLE) AS x
           FROM monthly),
         mo AS (
           SELECT o_orderpriority,
                  CAST(count(*) AS DOUBLE) AS n,
                  floor(sum(x) * 100 + 0.5) / 100 AS sx,
                  floor(sum(rev) * 100 + 0.5) / 100 AS sy,
                  floor(sum(x * x) * 100 + 0.5) / 100 AS sxx,
                  floor(sum(x * rev) * 100 + 0.5) / 100 AS sxy,
                  floor(sum(rev * rev) * 100 + 0.5) / 100 AS syy,
                  max(x) AS xmax
           FROM centered GROUP BY 1),
         d AS (
           SELECT o_orderpriority, n, sx, sy, sxx, sxy, syy, xmax,
                  (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) AS slope
           FROM mo),
         d2 AS (
           SELECT *, (sy - slope * sx) / n AS icept,
                  ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
                  nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0) AS r2
           FROM d)
         SELECT o_orderpriority,
                CAST(n AS BIGINT) AS n_months,
                floor(slope * 10000 + 0.5) / 10000 AS slope_musd,
                floor(icept * 100 + 0.5) / 100 AS intercept_musd,
                floor(r2 * 1000000 + 0.5) / 1000000 AS r2,
                floor((icept + slope * (xmax + 1)) * 100 + 0.5) / 100
                  AS forecast_next_musd
         FROM d2 ORDER BY o_orderpriority""",
    "evt_stickiness" ->
      """WITH daily AS (
           SELECT strftime(ts, '%Y-%m-%d') AS day,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS du
           FROM events GROUP BY 1),
         dau AS (
           SELECT substr(day, 1, 7) AS month,
                  floor(avg(du) * 10000 + 0.5) / 10000 AS dau_avg
           FROM daily GROUP BY 1),
         mau AS (
           SELECT strftime(ts, '%Y-%m') AS month,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS mau
           FROM events GROUP BY 1)
         SELECT d.month, d.dau_avg, m.mau,
                floor((d.dau_avg / CAST(m.mau AS DOUBLE)) * 10000 + 0.5)
                  / 10000 AS stickiness
         FROM dau d JOIN mau m ON m.month = d.month
         ORDER BY d.month""",
    "rpt_winsorized" ->
      """WITH cuts AS (
           SELECT o_orderstatus,
                  floor(quantile_cont(o_totalprice, 0.05) * 100 + 0.5) / 100
                    AS p05,
                  floor(quantile_cont(o_totalprice, 0.95) * 100 + 0.5) / 100
                    AS p95
           FROM orders GROUP BY 1)
         SELECT o.o_orderstatus,
                count(*) AS n_rows,
                first(c.p05) AS p05,
                first(c.p95) AS p95,
                floor(avg(greatest(least(o.o_totalprice, c.p95), c.p05))
                      * 100 + 0.5) / 100 AS mean_winsorized,
                floor(avg(CASE WHEN o.o_totalprice BETWEEN c.p05 AND c.p95
                               THEN o.o_totalprice END) * 100 + 0.5) / 100
                  AS mean_trimmed
         FROM orders o JOIN cuts c ON c.o_orderstatus = o.o_orderstatus
         GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""",
    "evt_retention_days" ->
      """WITH ua AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                     FROM events),
         f AS (SELECT user_id, min(day) AS d0 FROM ua GROUP BY 1),
         j AS (SELECT f.d0, date_diff('day', f.d0, ua.day) AS off
               FROM ua JOIN f ON f.user_id = ua.user_id),
         g AS (SELECT strftime(d0, '%Y-%m-%d') AS cohort_day,
                      count(CASE WHEN off = 0 THEN 1 END) AS cohort_users,
                      count(CASE WHEN off = 1 THEN 1 END) AS d1,
                      count(CASE WHEN off = 7 THEN 1 END) AS d7,
                      count(CASE WHEN off = 14 THEN 1 END) AS d14
               FROM j GROUP BY 1)
         SELECT cohort_day, cohort_users,
                floor((CAST(d1 AS DOUBLE) / CAST(cohort_users AS DOUBLE))
                      * 10000 + 0.5) / 10000 AS d1_rate,
                floor((CAST(d7 AS DOUBLE) / CAST(cohort_users AS DOUBLE))
                      * 10000 + 0.5) / 10000 AS d7_rate,
                floor((CAST(d14 AS DOUBLE) / CAST(cohort_users AS DOUBLE))
                      * 10000 + 0.5) / 10000 AS d14_rate
         FROM g ORDER BY cohort_day""",
    "rpt_seasonality" ->
      """WITH monthly AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS ym,
                  floor((sum(o_totalprice) / 1000000.0) * 10000 + 0.5) / 10000
                    AS rev
           FROM orders GROUP BY 1),
         bym AS (
           SELECT substr(ym, 6, 2) AS moy,
                  count(*) AS n_months,
                  floor(avg(rev) * 10000 + 0.5) / 10000 AS avg_rev_musd
           FROM monthly GROUP BY 1),
         o AS (SELECT floor(avg(rev) * 10000 + 0.5) / 10000 AS grand_avg
               FROM monthly)
         SELECT b.moy, b.n_months, b.avg_rev_musd,
                floor((b.avg_rev_musd / o.grand_avg) * 10000 + 0.5) / 10000
                  AS seasonal_index
         FROM bym b CROSS JOIN o
         ORDER BY b.moy""")
}
