package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Analytical-core showcases in TPC-H shapes.
  *
  * The reference's report engine is SQL-over-facts; these three queries
  * exercise the same machinery at its heaviest: a full-scan wide
  * aggregation, a selective 3-way join with top-N, and a star join.
  * They double as the scale/bench anchors (see SURVEY §4, §6).
  *
  * Scale notes:
  *  - q1: map-side partial agg over 4 measures, 6 output groups — shuffle
  *    is O(groups), scan-bound at any SF. Filter pushed to parquet.
  *  - q3: filters pushed below the joins (Catalyst), both fact joins on
  *    natural keys; AQE picks broadcast for the filtered customer side
  *    when it fits, else shuffle-hash.
  *  - q5: fixed-size dims (region→nation) broadcast; supplier grows
  *    linearly with SF (10k×SF rows — ~1B at 100 TB) so it is NOT force
  *    broadcast: AQE picks broadcast while it fits and falls back to a
  *    shuffle join beyond that. Facts shuffle once each on the join key.
  */
object Tpch {

  /** TPC-H Q1 shape: pricing summary over lineitem. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) <= lit("2001-06-30"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        rnd(sum(col("l_quantity")), 2).as("sum_qty"),
        rnd(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        rnd(avg(col("l_quantity")), 2).as("avg_qty"),
        rnd(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 shape: segment revenue top-N. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c  = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o  = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) < lit("1998-06-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) > lit("1998-06-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
               date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: revenue by supplier nation within a region/year. */
  def q5RegionVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    val n = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
              to_date(col("o_orderdate")) < lit("1997-01-01"))
      .select("o_orderkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6 shape: forecast revenue — pure filter + sum, the
    * predicate-pushdown showcase (all three filters reach the scan). */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
              to_date(col("l_shipdate")) < lit("1997-01-01") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(rnd(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q10 shape: returned-item reporting — which customers drove
    * the most revenue in returned lines over a quarter. Fact side
    * filters (returnflag, date window) push to the scans; the
    * lineitem⋈orders join is the only fact-fact shuffle; customer
    * joins the AGGREGATED per-customer revenue (partial aggs below the
    * join — the vw_employee_workload lesson), and nation broadcasts.
    * Top-20 is a TakeOrderedAndProject. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .as("rev"))
    val ord = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1996-10-01") &&
              to_date(col("o_orderdate")) < lit("1997-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(rnd(sum(col("rev")), 2).as("revenue"), count(lit(1)).as("n_lines"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
              col("c_acctbal"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    perCust.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
              col("n_name").as("nation"), rnd(col("c_acctbal"), 2).as("acctbal"),
              col("revenue"), col("n_lines"))
      .orderBy(col("revenue").desc, col("custkey"))
      .limit(20)
  }

  /** TPC-H Q4 shape: EXISTS semi-join — how many orders per priority
    * had at least one late-shipping line (>90 days after the order).
    * A LEFT SEMI join keeps the fact side at most once per order (no
    * row multiplication, no post-join distinct — the plan Spark emits
    * for EXISTS); the date window pushes to the orders scan and the
    * rollup is a tiny partial agg. */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
              to_date(col("o_orderdate")) < lit("1996-07-01"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
        to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 90),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose total line
    * quantity exceeds a threshold, with their customer. The HAVING
    * aggregate runs FIRST and alone on lineitem (map-side partial
    * combine, one orderkey shuffle) — the survivors are a tiny frame
    * that then drives the orders/customer joins, so the fact-fact join
    * is survivor-sized, not corpus-sized (the IN-subquery plan SQL
    * engines pick for Q18). Top-100 is a TakeOrderedAndProject. */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(rnd(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 300.0)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderdate"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name").as("name"), col("c_custkey").as("custkey"),
              col("o_orderkey").as("orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
              rnd(col("o_totalprice"), 2).as("totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("orderkey"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_big_orders"   -> (q18BigOrders _),
    "q4_priority"      -> (q4Priority _),
    "q10_returns"      -> (q10Returns _),
    "q6_forecast"      -> (q6Forecast _),
    "q1_pricing"       -> (q1Pricing _),
    "q3_shipping"      -> (q3Shipping _),
    "q5_region_volume" -> (q5RegionVolume _))

  val oracles: Map[String, String] = Map(
    "q18_big_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
                  floor((sum(l_quantity)) * 100 + 0.5) / 100 AS total_qty
           FROM lineitem GROUP BY 1
           HAVING floor((sum(l_quantity)) * 100 + 0.5) / 100 > 300.0)
         SELECT c_name AS name, c_custkey AS custkey,
                o_orderkey AS orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                floor(o_totalprice * 100 + 0.5) / 100 AS totalprice,
                total_qty
         FROM big
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY total_qty DESC, orderkey LIMIT 100""",
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
         FROM orders o
         WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
           AND EXISTS (
             SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
               AND CAST(l.l_shipdate AS DATE) >
                   CAST(o.o_orderdate AS DATE) + INTERVAL 90 DAY)
         GROUP BY 1 ORDER BY o_orderpriority""",
    "q10_returns" ->
      """WITH pc AS (
           SELECT o_custkey,
                  floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5)
                    / 100 AS revenue,
                  count(*) AS n_lines
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_returnflag = 'R'
             AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
             AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
           GROUP BY 1)
         SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
                floor(c_acctbal * 100 + 0.5) / 100 AS acctbal,
                revenue, n_lines
         FROM pc
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         ORDER BY revenue DESC, custkey LIMIT 20""",
    "q6_forecast" ->
      """SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100
                  AS revenue,
                count(*) AS n_lines
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07
           AND l_quantity < 24""",
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
                floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
                floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
                floor((avg(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
                floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-30'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping" ->
      """SELECT o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
           AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
         GROUP BY o_orderkey, orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q5_region_volume" ->
      """SELECT n_name,
                floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""")
}
