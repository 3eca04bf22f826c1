package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Composable report filters — the Spark re-expression of the
  * reference's WHERE-clause builder
  * (/root/reference/core/reports/filters.py: build_date_filter,
  * build_report_where_clause). Instead of string-assembled SQL with
  * bound params, filters are optional predicates composed into one
  * Column; Catalyst pushes the conjunction into the parquet scan, so a
  * narrow date range prunes row groups before any join/agg.
  */
object Filters {

  /** Optional-filter spec (None/empty = no constraint), AND-composed.
    *
    * `columnIn` is the general demographic-style composition of the
    * reference (filters.py:134 apply_demographics_filter, :161
    * build_query_with_filters): any column name → allowed-values set,
    * each compiled to an IN predicate. Every piece is a plain
    * column-vs-literal comparison, so the whole conjunction reaches the
    * parquet scan as PushedFilters (asserted in FiltersSpec).
    */
  case class ReportFilter(
      startDate: Option[String] = None,
      endDate: Option[String] = None,
      status: Option[String] = None,
      priority: Option[String] = None,
      columnIn: Map[String, Seq[String]] = Map.empty) {

    def toPredicate(dateCol: Column, statusCol: Column,
                    priorityCol: Column): Column =
      (Seq(
        startDate.map(d => to_date(dateCol) >= lit(d)),
        endDate.map(d => to_date(dateCol) <= lit(d)),
        status.map(s => statusCol === lit(s)),
        priority.map(p => priorityCol === lit(p)))
        .flatten ++
        columnIn.toSeq.sortBy(_._1).map { case (c, vs) => col(c).isin(vs: _*) })
        .foldLeft(lit(true))(_ && _)
  }

  /** Status rollup under a composed filter set (the reference's
    * date+status-filtered report shape, with pushdown-checked plans). */
  def filteredRates(spark: SparkSession, dir: String,
                    f: ReportFilter): DataFrame =
    Tables.orders(spark, dir)
      .filter(f.toPredicate(col("o_orderdate"), col("o_orderstatus"),
                            col("o_orderpriority")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           rnd(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("n").desc, col("o_orderpriority"))

  /** Fixed instantiation for the driver contract: a one-year window. */
  def filteredRatesDefault(spark: SparkSession, dir: String): DataFrame =
    filteredRates(spark, dir,
      ReportFilter(startDate = Some("1997-01-01"), endDate = Some("1997-12-31")))

  /** 3-way composition for the driver contract: date window AND status
    * AND a column→values IN set — the reference's fully-composed report
    * query (build_query_with_filters). All predicates push to the scan. */
  def filteredRatesComposed(spark: SparkSession, dir: String): DataFrame =
    filteredRates(spark, dir,
      ReportFilter(
        startDate = Some("1996-01-01"),
        endDate   = Some("1998-12-31"),
        status    = Some("F"),
        columnIn  = Map("o_orderpriority" ->
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))))

  /** Wide period × status matrix via pivot (the reference renders the
    * same matrix client-side from long rows; pivot emits it relationally
    * with pinned columns so the schema is deterministic). */
  def pivotStatusWide(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("period"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("period"))

  /** Exact vs approximate distinct (HLL++) — the cardinality-sketch
    * shape every 100 TB pipeline needs. Sketch estimates differ between
    * engines by design → rows-only; the spec asserts the error bound
    * against the exact count instead. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
           approx_count_distinct(col("l_orderkey"), 0.05).as("approx_orders"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rpt_filtered_rates"    -> (filteredRatesDefault _),
    "rpt_filtered_composed" -> (filteredRatesComposed _),
    "rpt_pivot_status_wide" -> (pivotStatusWide _),
    "rpt_approx_distinct"   -> (approxDistinct _))

  val oracles: Map[String, String] = Map(
    "rpt_filtered_rates" ->
      """SELECT o_orderpriority, count(*) AS n,
                floor((avg(o_totalprice)) * 100 + 0.5) / 100 AS avg_price
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
           AND CAST(o_orderdate AS DATE) <= DATE '1997-12-31'
         GROUP BY o_orderpriority
         ORDER BY n DESC, o_orderpriority""",
    "rpt_filtered_composed" ->
      """SELECT o_orderpriority, count(*) AS n,
                floor((avg(o_totalprice)) * 100 + 0.5) / 100 AS avg_price
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o_orderdate AS DATE) <= DATE '1998-12-31'
           AND o_orderstatus = 'F'
           AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
         GROUP BY o_orderpriority
         ORDER BY n DESC, o_orderpriority""",
    "rpt_pivot_status_wide" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS period,
                CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
                CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
                CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
         FROM orders GROUP BY 1 ORDER BY period""")
}
