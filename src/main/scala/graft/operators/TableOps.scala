package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Generic table operations + SQL passthrough — the admin/data-browser
  * surface of the reference (/root/reference/core/app.py): paginated
  * table pages (:1795), column search with LIKE (:1848), sorted pages
  * (:2224), a guarded SELECT-only raw SQL runner (:2253-2256), and the
  * named analytical views of core/database_schema.py:475-484.
  *
  * Scale notes: browse/search/sort are scan + total-order top-N — Spark
  * executes global sort-limit as per-partition top-N + single-partition
  * merge (TakeOrderedAndProject), no full sort at 100 TB. The SQL
  * runner is `spark.sql` over temp views, so ad-hoc SQL gets the same
  * Catalyst pushdown as the DataFrame API.
  */
object TableOps {

  /** Paginated ordered page of a table (browse shape: LIMIT/OFFSET). */
  def browse(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("o_orderkey"))
      .offset(100)
      .limit(50)

  /** LIKE search across a text column, ordered page (search shape). */
  def search(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_name").like("%1%"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
      .limit(25)

  /** Guarded raw-SQL runner: registers the star schema as temp views and
    * executes a SELECT-only statement (the reference's admin SQL runner
    * rejects anything else the same way). */
  def runSql(spark: SparkSession, dir: String, sql: String): DataFrame = {
    require(sql.trim.toUpperCase.startsWith("SELECT"),
      "only SELECT statements are allowed")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        val df = t match {
          case "events" => Tables.events(spark, dir)
          case _        => spark.read.parquet(s"$dir/$t.parquet")
        }
        df.createOrReplaceTempView(s"v_$t")
      }
    spark.sql(sql)
  }

  /** Fixed instantiation of the SQL runner for the driver contract. */
  def sqlRunnerDefault(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir,
      """SELECT o_orderpriority, count(*) AS n,
                floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_price
         FROM v_orders
         WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority
         ORDER BY n DESC, o_orderpriority""")

  /** Client-journey view (v_client_journey shape,
    * database_schema.py:483): per-customer lifetime rollup registered as
    * a named temp view and queried relationally. */
  def clientJourney(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_order"),
           date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_order"),
           rnd(sum(col("o_totalprice")), 2).as("lifetime_value"))
    v.createOrReplaceTempView("v_client_journey")
    spark.table("v_client_journey")
      .filter(col("n_orders") >= 3)
      .orderBy(col("lifetime_value").desc, col("o_custkey"))
      .limit(25)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tbl_browse"        -> (browse _),
    "tbl_search"        -> (search _),
    "sql_runner"        -> (sqlRunnerDefault _),
    "vw_client_journey" -> (clientJourney _))

  val oracles: Map[String, String] = Map(
    "tbl_browse" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                strftime(o_orderdate, '%Y-%m-%d') AS orderdate
         FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "tbl_search" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer WHERE c_name LIKE '%1%'
         ORDER BY c_custkey LIMIT 25""",
    "sql_runner" ->
      """SELECT o_orderpriority, count(*) AS n,
                floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_price
         FROM orders
         WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority
         ORDER BY n DESC, o_orderpriority""",
    "vw_client_journey" ->
      """WITH v AS (
           SELECT o_custkey,
                  count(*) AS n_orders,
                  strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
                  strftime(max(o_orderdate), '%Y-%m-%d') AS last_order,
                  floor(sum(o_totalprice) * 100 + 0.5) / 100 AS lifetime_value
           FROM orders GROUP BY o_custkey)
         SELECT * FROM v WHERE n_orders >= 3
         ORDER BY lifetime_value DESC, o_custkey LIMIT 25""")
}
