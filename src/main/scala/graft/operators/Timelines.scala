package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Time-series and lifecycle-metric operators.
  *
  * References (file:line in /root/reference):
  *  - period time series: core/reports/handlers.py:776-816
  *  - period × status matrix: core/reports/handlers.py:818-880
  *  - resolution-time avg/min/max by group: core/reports/router.py:341-385
  *  - funnel via SUM(CASE): core/reports/router.py:512-608
  *  - UNION ALL multi-stage timing: core/reports/router.py:611-666
  *  - per-entity performance metrics: core/reports/router.py:669-730
  *  - drop-off ranking by computed rate: core/reports/router.py:733-789
  *  - journey stages (count/distinct/datediff): core/reports/router.py:792-831
  *
  * The reference computes "days since now" with julianday('now'); for a
  * deterministic oracle we pin the reference date to 2001-09-01 (just past
  * the data's max order date) — same operator, reproducible output.
  *
  * Scale notes: every query below is a single scan + partial agg on a
  * low-cardinality key (period, status, priority). The only join
  * (resolution/perf) shuffles both facts on the natural join key once;
  * supplier grows linearly with SF (10k×SF rows), so it carries no
  * broadcast hint — AQE broadcasts it while it fits and shuffle-joins
  * beyond that. Periods are emitted as strings so plans stay
  * whole-stage-codegen and outputs are engine-portable.
  */
object Timelines {

  private val RefDate = "2001-09-01"

  /** Period bucket for a timestamp column, as a sortable string. The
    * reference's timeline endpoints take grouping ∈ {day, week, month}
    * (handlers.py:776-816 date_formats map); weeks are represented by
    * their Monday start date (date_trunc), which is engine-portable —
    * SQLite's %W week-number label is not. */
  def periodOf(c: org.apache.spark.sql.Column, period: String)
      : org.apache.spark.sql.Column = period match {
    case "day"   => date_format(c, "yyyy-MM-dd")
    case "week"  => date_format(date_trunc("week", c), "yyyy-MM-dd")
    case "month" => date_format(c, "yyyy-MM")
    case other   => throw new IllegalArgumentException(
      s"period must be day|week|month, got $other")
  }

  /** Orders per period (timeline shape, parameterized granularity). */
  def timeline(spark: SparkSession, dir: String, period: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .groupBy(periodOf(col("o_orderdate"), period).as("period"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("period"))

  def timelineMonth(spark: SparkSession, dir: String): DataFrame =
    timeline(spark, dir, "month")

  /** Period × status counts (cases-over-time shape, parameterized). */
  def statusOverTimeBy(spark: SparkSession, dir: String,
                       period: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderstatus").isNotNull)
      .groupBy(periodOf(col("o_orderdate"), period).as("period"),
               col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("period"), col("o_orderstatus"))

  def statusOverTime(spark: SparkSession, dir: String): DataFrame =
    statusOverTimeBy(spark, dir, "month")

  /** Resolution time avg/min/max by group with HAVING floor. Days from
    * order date to line ship date, via the natural-key join. */
  def resolutionTime(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    val o  = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val days = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
           rnd(avg(days), 1).as("avg_days"),
           min(days).cast("long").as("min_days"),
           max(days).cast("long").as("max_days"))
      .filter(col("n_lines") >= 3)
      .orderBy(col("avg_days").desc, col("o_orderpriority"))
  }

  /** Single-row multi-stage funnel (SUM(CASE) per lifecycle stage). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    def stage(v: String) = sum(when(col("o_orderstatus") === v, 1L).otherwise(0L))
    Tables.orders(spark, dir).agg(
      count(lit(1)).as("total_orders"),
      stage("O").as("open_orders"),
      stage("P").as("partial_orders"),
      stage("F").as("final_orders"))
  }

  /** UNION ALL of per-stage timing metrics (timing-analysis shape).
    *
    * The reference runs one SELECT per stage over the same join; naively
    * mirroring that (two agg branches unioned) makes Catalyst recompute
    * the lineitem⋈orders join per branch — exchanges are not reused
    * across aliased branches. Instead: one groupBy(l_linestatus) over a
    * single join, filtered to the two stages and relabeled — the fact
    * join runs exactly once.
    *
    * The grouped form emits no row for a stage with zero lines, but the
    * reference's per-stage SELECTs (and the UNION ALL oracle) always
    * emit both stages (n=0, NULL aggs) — so the aggregate right-joins a
    * 2-row literal stage frame and empty stages coalesce to the
    * ungrouped-aggregate defaults. */
  def unionTiming(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val lag = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    val stages = Seq(("F", "finished-lines"), ("O", "open-lines"))
      .toDF("ls", "stage")
    li.select("l_orderkey", "l_shipdate", "l_linestatus")
      .filter(col("l_linestatus").isin("F", "O"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           rnd(avg(lag), 1).as("avg_days"),
           min(lag).cast("long").as("min_days"),
           max(lag).cast("long").as("max_days"))
      .join(stages, col("l_linestatus") === col("ls"), "right")
      .select(col("stage"), coalesce(col("n"), lit(0L)).as("n"),
              col("avg_days"), col("min_days"), col("max_days"))
      .orderBy(col("stage"))
  }

  /** Per-supplier performance: conditional aggs + derived rates + floor +
    * top-N (provider-performance shape). */
  def perfSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_returnflag", "l_quantity")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    li.join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("total_lines"),
           sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned"),
           sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("accepted"),
           rnd(avg(col("l_quantity")), 2).as("avg_qty"))
      .filter(col("total_lines") >= 5)
      .withColumn("return_rate",
        rnd(col("returned") * 100.0 / col("total_lines"), 1))
      .orderBy(col("total_lines").desc, col("s_name"))
      .limit(15)
  }

  /** Rank groups by computed drop-off rate (high-risk-drop-off shape). */
  def dropoff(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("total_lines"),
           sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("dropped"))
      .filter(col("total_lines") >= 10)
      .withColumn("drop_rate",
        rnd(col("dropped") * 100.0 / col("total_lines"), 1))
      .orderBy(col("drop_rate").desc, col("l_returnflag"), col("l_linestatus"))

  /** Journey stages: count + distinct entities + avg days-in-stage
    * against the pinned reference date. */
  def journey(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isNotNull)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           countDistinct(col("o_custkey")).as("unique_customers"),
           rnd(avg(datediff(to_date(lit(RefDate)), to_date(col("o_orderdate")))), 1)
             .as("avg_days_in_stage"))
      .orderBy(col("n").desc, col("o_orderstatus"))

  /** Cumulative monthly volume (running-total window over the monthly
    * rollup — the aggregation shrinks data to O(months) first, so the
    * unpartitioned window sorts a tiny frame, not the fact table). */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("period"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, 0)
    monthly.withColumn("cumulative_n", sum(col("n")).over(w))
      .orderBy(col("period"))
  }

  /** Monthly new-vs-returning customer mix — the acquisition/retention
    * split every growth dashboard opens with: a customer is "new" in
    * their first-ever order month, "returning" after. Both sides of
    * the decision aggregate BEFORE joining — per-(customer, month)
    * activity and per-customer first month are each one
    * map-side-combined agg, and their join is custkey-keyed partial
    * aggregates, never fact rows (the vw_employee_workload lesson);
    * the monthly rollup is then O(months × 2). */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val byMonth = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"),
               date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"))
    val firstMonth = byMonth.groupBy(col("o_custkey"))
      .agg(min(col("month")).as("first_month"))
    byMonth.join(firstMonth, Seq("o_custkey"))
      .withColumn("kind",
        when(col("month") === col("first_month"), "new").otherwise("returning"))
      .groupBy(col("month"), col("kind"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           sum(col("n_orders")).as("n_orders"))
      .orderBy(col("month"), col("kind"))
  }

  /** Pareto revenue concentration — "how much of the book do the top
    * 20 customers carry": per-customer revenue rollup, top-20 via
    * sort-limit (TakeOrderedAndProject — per-partition heaps, no
    * global sort), then the cumulative window runs over the 20
    * SURVIVORS only and the denominator is a lazy 1-row total
    * broadcast. Revenue is rounded before ranking/cumsum so the
    * 20-row running sum is bit-stable; the unpartitioned window frame
    * is bounded at k rows regardless of customer count. */
  def pareto(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(rnd(sum(col("o_totalprice")), 2).as("revenue"))
    val total = byCust.agg(sum(col("revenue")).as("t"))
    val top = byCust
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20)
    val w = Window.orderBy(col("revenue").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("revenue").desc, col("o_custkey"))).cast("long"))
      .withColumn("cum_revenue", rnd(sum(col("revenue")).over(w), 2))
      .select(col("rank"), col("o_custkey").as("custkey"), col("revenue"),
              col("cum_revenue"),
              rnd(col("cum_revenue") / col("t") * 100, 4).as("cum_share_pct"))
      .orderBy(col("rank"))
  }

  /** 7-day rolling order volume — a RANGE-frame window (value-based:
    * calendar gaps shrink the frame to the days actually present in
    * the last week, unlike a ROWS frame which would always grab 7
    * physical rows). Same scale shape as runningTotal: the rollup
    * shrinks the fact table to O(days) rows first, so the
    * unpartitioned window sorts thousands of rows, never the facts. */
  def rolling7d(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("day_num",
        datediff(to_date(col("day")), to_date(lit("1970-01-01"))))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("roll7_n", sum(col("n")).over(w))
      .withColumn("roll7_avg", rnd(avg(col("n")).over(w), 2))
      .select(col("day"), col("n"), col("roll7_n"), col("roll7_avg"))
      .orderBy(col("day"))
  }

  /** Year-over-year growth per month (lag-12 over the monthly rollup;
    * growth% via the cross-engine-stable rounding). */
  def yoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("period"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("period"))
    monthly
      .withColumn("prev_year_n", lag(col("n"), 12).over(w))
      .filter(col("prev_year_n").isNotNull)
      .withColumn("yoy_pct",
        rnd((col("n") - col("prev_year_n")) * 100.0 / col("prev_year_n"), 1))
      .orderBy(col("period"))
  }

  /** Hierarchical subtotals: year × priority with ROLLUP (subtotal rows
    * carry an explicit 'ALL' marker instead of NULL so the output is
    * unambiguous and engine-portable). */
  def rollupYearPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(date_format(col("o_orderdate"), "yyyy").as("year"),
              col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("year"), lit("ALL")).as("year"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n"))
      .orderBy(col("year"), col("priority"))

  /** Cohort retention: customers bucketed by first-order month, counted
    * per months-since-cohort offset. Two aggregations — cohort
    * assignment (one shuffle on custkey) then the (cohort, offset)
    * rollup — no self-join. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
              (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
                .as("ym"))
    val w = Window.partitionBy(col("o_custkey"))
    o.withColumn("cohort_ym", min(col("ym")).over(w))
      .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("offset_m"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
      .filter(col("offset_m") <= 6)
      .withColumn("cohort",
        concat_ws("-",
          format_string("%04d", ((col("cohort_ym") - 1) / 12).cast("int")),
          format_string("%02d",
            (pmod(col("cohort_ym") - 1, lit(12)) + 1).cast("int"))))
      .select(col("cohort"), col("offset_m").cast("long").as("offset_m"),
              col("n_customers"))
      .orderBy(col("cohort"), col("offset_m"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rpt_rollup"           -> (rollupYearPriority _),
    "rpt_cohort_retention" -> (cohortRetention _),
    "rpt_running_total"    -> (runningTotal _),
    "rpt_pareto"           -> (pareto _),
    "rpt_new_vs_returning" -> (newVsReturning _),
    "rpt_rolling_7d"       -> (rolling7d _),
    "rpt_yoy_growth"       -> (yoyGrowth _),
    "rpt_timeline_month"   -> (timelineMonth _),
    "rpt_timeline_week"    -> ((s, d) => timeline(s, d, "week")),
    "rpt_timeline_day"     -> ((s, d) => timeline(s, d, "day")),
    "rpt_status_over_time" -> (statusOverTime _),
    "rpt_status_over_time_week" -> ((s, d) => statusOverTimeBy(s, d, "week")),
    "rpt_resolution_time"  -> (resolutionTime _),
    "rpt_funnel"           -> (funnel _),
    "rpt_union_timing"     -> (unionTiming _),
    "rpt_perf_suppliers"   -> (perfSuppliers _),
    "rpt_dropoff"          -> (dropoff _),
    "rpt_journey"          -> (journey _))

  val oracles: Map[String, String] = Map(
    "rpt_rollup" ->
      """SELECT coalesce(y, 'ALL') AS year,
                coalesce(o_orderpriority, 'ALL') AS priority,
                count(*) AS n
         FROM (SELECT strftime(o_orderdate, '%Y') AS y, o_orderpriority
               FROM orders)
         GROUP BY ROLLUP(y, o_orderpriority)
         ORDER BY year, priority""",
    "rpt_cohort_retention" ->
      """WITH o AS (
           SELECT o_custkey,
                  year(o_orderdate) * 12 + month(o_orderdate) AS ym
           FROM orders),
         c AS (
           SELECT o_custkey, ym,
                  min(ym) OVER (PARTITION BY o_custkey) AS cohort_ym
           FROM o)
         SELECT printf('%04d-%02d', (cohort_ym - 1) // 12,
                       (cohort_ym - 1) % 12 + 1) AS cohort,
                CAST(ym - cohort_ym AS BIGINT) AS offset_m,
                count(DISTINCT o_custkey) AS n_customers
         FROM c WHERE ym - cohort_ym <= 6
         GROUP BY 1, 2 ORDER BY cohort, offset_m""",
    "rpt_new_vs_returning" ->
      """WITH bm AS (
           SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1, 2),
         fm AS (SELECT o_custkey, min(month) AS first_month
                FROM bm GROUP BY 1)
         SELECT month,
                CASE WHEN month = first_month
                     THEN 'new' ELSE 'returning' END AS kind,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
                CAST(sum(n_orders) AS BIGINT) AS n_orders
         FROM bm JOIN fm USING (o_custkey)
         GROUP BY 1, 2 ORDER BY month, kind""",
    "rpt_pareto" ->
      """WITH bc AS (
           SELECT o_custkey,
                  floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
           FROM orders GROUP BY 1),
         t AS (SELECT sum(revenue) AS t FROM bc),
         top AS (SELECT * FROM bc ORDER BY revenue DESC, o_custkey LIMIT 20),
         r AS (SELECT o_custkey, revenue,
                      row_number() OVER w AS rank,
                      floor(sum(revenue) OVER (w ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100
                        AS cum_revenue
               FROM top
               WINDOW w AS (ORDER BY revenue DESC, o_custkey))
         SELECT CAST(rank AS BIGINT) AS rank, o_custkey AS custkey, revenue,
                cum_revenue,
                floor((cum_revenue / t * 100) * 10000 + 0.5) / 10000
                  AS cum_share_pct
         FROM r CROSS JOIN t ORDER BY rank""",
    "rpt_running_total" ->
      """WITH m AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS period, count(*) AS n
           FROM orders GROUP BY 1)
         SELECT period, n,
                CAST(SUM(n) OVER (ORDER BY period ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_n
         FROM m ORDER BY period""",
    "rpt_yoy_growth" ->
      """WITH m AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS period, count(*) AS n
           FROM orders GROUP BY 1),
         l AS (
           SELECT period, n, lag(n, 12) OVER (ORDER BY period) AS prev_year_n
           FROM m)
         SELECT period, n, prev_year_n,
                floor(((n - prev_year_n) * 100.0 / prev_year_n) * 10 + 0.5) / 10
                  AS yoy_pct
         FROM l WHERE prev_year_n IS NOT NULL ORDER BY period""",
    "rpt_timeline_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS period, count(*) AS n
         FROM orders WHERE o_orderdate IS NOT NULL
         GROUP BY 1 ORDER BY period""",
    "rpt_timeline_week" ->
      """SELECT strftime(date_trunc('week', CAST(o_orderdate AS DATE)),
                         '%Y-%m-%d') AS period,
                count(*) AS n
         FROM orders WHERE o_orderdate IS NOT NULL
         GROUP BY 1 ORDER BY period""",
    "rpt_timeline_day" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS period, count(*) AS n
         FROM orders WHERE o_orderdate IS NOT NULL
         GROUP BY 1 ORDER BY period""",
    "rpt_rolling_7d" ->
      """WITH d AS (
           SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                  CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num,
                  count(*) AS n
           FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2)
         SELECT day, n,
                CAST(sum(n) OVER w AS BIGINT) AS roll7_n,
                floor(avg(n) OVER w * 100 + 0.5) / 100 AS roll7_avg
         FROM d
         WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING
                      AND CURRENT ROW)
         ORDER BY day""",
    "rpt_status_over_time_week" ->
      """SELECT strftime(date_trunc('week', CAST(o_orderdate AS DATE)),
                         '%Y-%m-%d') AS period,
                o_orderstatus, count(*) AS n
         FROM orders
         WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL
         GROUP BY 1, 2 ORDER BY period, o_orderstatus""",
    "rpt_status_over_time" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS period, o_orderstatus,
                count(*) AS n
         FROM orders
         WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL
         GROUP BY 1, 2 ORDER BY period, o_orderstatus""",
    "rpt_resolution_time" ->
      """SELECT o_orderpriority,
                count(*) AS n_lines,
                floor((avg(date_diff('day', CAST(o_orderdate AS DATE),
                                    CAST(l_shipdate AS DATE)))) * 10 + 0.5) / 10 AS avg_days,
                min(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE))) AS min_days,
                max(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE))) AS max_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
         GROUP BY o_orderpriority HAVING count(*) >= 3
         ORDER BY avg_days DESC, o_orderpriority""",
    "rpt_funnel" ->
      """SELECT count(*) AS total_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS final_orders
         FROM orders""",
    "rpt_union_timing" ->
      """WITH j AS (
           SELECT l_linestatus,
                  date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) AS lag
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         SELECT 'finished-lines' AS stage, count(*) AS n,
                floor((avg(lag)) * 10 + 0.5) / 10 AS avg_days,
                min(lag) AS min_days, max(lag) AS max_days
         FROM j WHERE l_linestatus = 'F'
         UNION ALL
         SELECT 'open-lines' AS stage, count(*) AS n,
                floor((avg(lag)) * 10 + 0.5) / 10 AS avg_days,
                min(lag) AS min_days, max(lag) AS max_days
         FROM j WHERE l_linestatus = 'O'""",
    "rpt_perf_suppliers" ->
      """SELECT s_name,
                count(*) AS total_lines,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned,
                CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS accepted,
                floor((avg(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
                floor((CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                      * 100.0 / count(*)) * 10 + 0.5) / 10 AS return_rate
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_name HAVING count(*) >= 5
         ORDER BY total_lines DESC, s_name LIMIT 15""",
    "rpt_dropoff" ->
      """SELECT l_returnflag, l_linestatus,
                count(*) AS total_lines,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
                floor((CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                      * 100.0 / count(*)) * 10 + 0.5) / 10 AS drop_rate
         FROM lineitem
         GROUP BY 1, 2 HAVING count(*) >= 10
         ORDER BY drop_rate DESC, l_returnflag, l_linestatus""",
    "rpt_journey" ->
      """SELECT o_orderstatus,
                count(*) AS n,
                count(DISTINCT o_custkey) AS unique_customers,
                floor((avg(date_diff('day', CAST(o_orderdate AS DATE),
                                    DATE '2001-09-01'))) * 10 + 0.5) / 10 AS avg_days_in_stage
         FROM orders WHERE o_orderstatus IS NOT NULL
         GROUP BY o_orderstatus ORDER BY n DESC, o_orderstatus""")
}
