package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Report-shape operators: distributions, rollups, buckets, networks.
  *
  * Re-expresses the reference's report endpoints over the testdata star
  * schema. References (file:line in /root/reference):
  *  - summary counts: core/reports/handlers.py:25-74
  *  - status distribution: core/reports/handlers.py:76-125
  *  - top-N category rollup: core/reports/handlers.py:127-151
  *  - pair-wise provider network (HAVING + top-N):
  *    core/reports/handlers.py:191-226 and core/reports/router.py:434-509
  *  - CASE bucketing (age distribution): core/reports/handlers.py:235-300
  *  - CASE brackets w/ bracket-order sort (income):
  *    core/reports/handlers.py:491-561
  *  - conditional-agg acceptance rates (top programs):
  *    core/reports/router.py:268-306
  *
  * Scale notes: all group keys are low-cardinality → map-side partial
  * aggregation shrinks the shuffle to O(groups × partitions). The network
  * query joins facts on their natural keys (shuffle once each) and
  * broadcasts only the genuinely small dims (nation). Top-N is computed
  * after full aggregation with a total order (deterministic under ties).
  */
object Reports {

  /** Multi-table scalar summary — four counts in one row. Each input is a
    * separately-aggregated single row; the final cross join is trivial. */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("total_orders"),
           countDistinct(col("o_custkey")).as("active_customers"))
    val li = Tables.lineitem(spark, dir).agg(count(lit(1)).as("total_lineitems"))
    val ev = Tables.events(spark, dir).agg(count(lit(1)).as("total_events"))
    o.crossJoin(li).crossJoin(ev)
  }

  /** Status distribution, count-descending (referral-status shape). */
  def statusDist(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isNotNull)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("o_orderstatus"))

  /** Top-N category rollup with deterministic tiebreak (service-types shape). */
  def topTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p_type"))
      .limit(10)

  /** Pair-wise network rollup (provider-collaboration / sankey shape):
    * who sends volume to whom, HAVING a floor, top-N. Fact tables join on
    * natural keys; the 25-row nation dim is broadcast twice. */
  def pairNetwork(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c  = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s  = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val cn = Tables.nation(spark, dir).select(col("n_nationkey").as("cn_key"),
                                              col("n_name").as("cust_nation"))
    val sn = Tables.nation(spark, dir).select(col("n_nationkey").as("sn_key"),
                                              col("n_name").as("supp_nation"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n_links"))
      .filter(col("n_links") >= 3)
      .orderBy(col("n_links").desc, col("cust_nation"), col("supp_nation"))
      .limit(20)
  }

  private def balanceBucket(c: Column): Column =
    when(c < 0, "negative")
      .when(c < 2500, "low")
      .when(c < 5000, "mid")
      .when(c < 7500, "high")
      .otherwise("top")

  private def balanceBucketOrder(c: Column): Column =
    when(c === "negative", 0).when(c === "low", 1).when(c === "mid", 2)
      .when(c === "high", 3).otherwise(4)

  /** CASE bucketing with custom bucket ordering (age-distribution shape). */
  def bucketBalance(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(balanceBucket(col("c_acctbal")).as("balance_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(balanceBucketOrder(col("balance_bucket")))

  private def priceBracket(c: Column): Column =
    when(c < 100000, "under-100k")
      .when(c < 200000, "100k-200k")
      .when(c < 300000, "200k-300k")
      .otherwise("300k-plus")

  private def priceBracketOrder(c: Column): Column =
    when(c === "under-100k", 0).when(c === "100k-200k", 1)
      .when(c === "200k-300k", 2).otherwise(3)

  /** CASE brackets ordered by bracket (income-distribution shape). */
  def priceBrackets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(priceBracket(col("o_totalprice")).as("price_bracket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(priceBracketOrder(col("price_bracket")))

  /** Conditional-aggregation rates (top-programs-with-acceptance-rate
    * shape): totals + SUM(CASE) + derived percentage, HAVING floor, top-N. */
  def conditionalRates(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_returnflag")
    val p  = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("total_lines"),
           sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned"))
      .filter(col("total_lines") >= 5)
      .withColumn("return_rate",
        rnd(col("returned") * 100.0 / col("total_lines"), 1))
      .orderBy(col("total_lines").desc, col("p_brand"))
      .limit(15)
  }

  /** Percentile metrics per group (exact interpolated percentiles —
    * Spark's `percentile` and DuckDB's `quantile_cont` share the linear
    * interpolation formula, so results hash-match; at 100 TB swap in
    * approx_percentile with a documented error bound). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(rnd(expr("percentile(o_totalprice, 0.5)"), 2).as("p50_price"),
           rnd(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"),
           count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Gini concentration index over customer revenue — the one-number
    * inequality summary behind rpt_pareto's curve (how concentrated is
    * revenue across the customer base): G = 2·Σrᵢxᵢ/(n·Σx) − (n+1)/n
    * over ascending value ranks. The global VALUE rank uses the same
    * two-phase trick as shard_by_budget: coarse value bins give
    * O(bins) offsets (running count over the tiny bin frame), ranks
    * complete per-bin under a partitioned window — no corpus-global
    * single-task sort; everything runs on the per-customer AGGREGATE
    * (customers-sized), never order rows. Revenue is rounded before
    * ranking so rank order (ties → custkey) is bit-stable across
    * engines; the final moments round at 6 dp, far above float
    * summation-order noise. */
  def giniRevenue(spark: SparkSession, dir: String): DataFrame =
    giniFrom(Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(rnd(sum(col("o_totalprice")), 2).as("rev")))

  /** Frame-level core ((o_custkey, rev) rows; OracleEdgeSpec plants
    * degenerate fixtures through it). Domain edges are NULL by
    * construction, mirrored with nullif in the oracle: an all-zero
    * revenue frame zeroes the n·s denominator (IEEE 0/0 diverges
    * across engines — Spark NaN, DuckDB error/NULL depending on
    * flags), and an empty frame zeroes n. */
  private[graft] def giniFrom(perCust: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val per = perCust
      .withColumn("bin", floor(col("rev") / 10000.0).cast("long"))
    val offsets = per.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(W.orderBy(col("bin"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("bin"), col("offset"))
    val inBin = W.partitionBy(col("bin")).orderBy(col("rev"), col("o_custkey"))
    per.withColumn("r", row_number().over(inBin))
      .join(broadcast(offsets), Seq("bin"))
      .select(col("rev"), (col("offset") + col("r")).as("rank"))
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("s"),
           sum(col("rank") * col("rev")).as("rs"))
      .select(
        col("n").as("n_customers"),
        rnd(col("s"), 2).as("total_revenue"),
        rnd(lit(2.0) * col("rs") / when(col("n") * col("s") =!= 0.0,
              col("n") * col("s"))
              - (col("n") + lit(1.0)) / when(col("n") =!= 0L, col("n")), 6)
          .as("gini"))
  }

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * a finance/claims pipeline runs over amount columns: naturally
    * occurring multi-scale amounts follow P(d) = log10(1 + 1/d); a flat
    * or spiked first-digit histogram flags synthetic or tampered data.
    * The first digit comes from the INTEGER part's string form (exact
    * and engine-identical — deriving it via floor(log10) risks libm
    * last-ulp drift at powers of ten), one map-side-combined count, the
    * share against a lazy 1-row total broadcast, expected mass computed
    * on the 9 literal digits. O(9) output at any scale. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
                        1, 1).as("digit"))
    val total = o.agg(count(lit(1)).as("total"))
    o.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        rnd(col("n") / col("total").cast("double"), 4).as("observed"),
        rnd(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 4)
          .as("benford"),
        rnd(abs(col("n") / col("total").cast("double") -
                log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))), 4)
          .as("abs_dev"))
      .orderBy(col("digit"))
  }

  /** Robust outlier sweep via median absolute deviation — the
    * outlier-detection twin of evt_anomalies that a heavy-tailed value
    * column needs (z-scores break when the mean/stddev are themselves
    * dragged by the outliers; median/MAD are 50%-breakdown robust).
    * Per priority group: med = median(price), MAD = median(|price −
    * med|), outlier ⇔ |price − med| > 3·1.4826·MAD (1.4826 scales MAD
    * to σ under normality — the standard consistency constant). Two
    * exact percentile passes with the tiny per-group stats broadcast
    * back between them; both deviation and threshold are rounded to
    * 4 dp on BOTH engines before the compare so boundary rows can't
    * flip on float noise. approx_percentile is the documented 100 TB
    * swap-in exactly as for rpt_percentiles. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))
    val med = o.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    val withDev = o.join(broadcast(med), Seq("o_orderpriority"))
      .withColumn("adev", abs(col("o_totalprice") - col("med")))
    val mad = withDev.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(
        rnd(first(col("med")), 2).as("median_price"),
        rnd(first(col("mad")), 2).as("mad_price"),
        sum(when(rnd(col("adev"), 4) > rnd(col("mad") * 3 * 1.4826, 4), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Approximate percentiles — the 100 TB swap-in for rpt_percentiles
    * that SURVEY §2 promises: exact `percentile` buffers every value per
    * group, while `approx_percentile` (Greenwald–Khanna sketch) is a
    * single-pass mergeable summary — map-side partial sketches, one
    * shuffle of sketch buffers, bounded memory per group. Sketch results
    * are engine-specific by design → rows-only; QueriesSpec asserts the
    * approx values stay within the configured rank-error bound of the
    * exact interpolated percentiles (the rpt_approx_distinct pattern). */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(rnd(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2)
             .as("p50_approx"),
           rnd(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 2)
             .as("p90_approx"),
           count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Lines-per-order profile — the fact-table shape statistic behind
    * join-strategy choices (how wide is an order on average; how heavy
    * is the tail): per-order line counts (one map-side-combined agg on
    * the already-clustered key) rolled into an O(sizes) histogram. */
  def orderSizeProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_lines"))

  /** Join-key skew audit — the operational profile run BEFORE choosing
    * a strategy for a recurring 100 TB join (broadcast / AQE skew
    * split / salting / bucketing): per-key row counts bucketed by
    * DIGIT COUNT (order of magnitude; integer-exact in every engine,
    * unlike float log2 at power boundaries), so a heavy tail is
    * visible as occupied high buckets. The per-key count is one
    * map-side-combined aggregate; the histogram is a second tiny agg
    * over |keys| rows; row_share comes from a global window over the
    * O(digits) bucket frame — no percentile buffer, no second scan,
    * nothing corpus-global. */
  def skewAudit(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
    val hist = perKey
      .groupBy(length(col("n").cast("string")).cast("long").as("magnitude"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
           min(col("n")).as("min_rows"), max(col("n")).as("max_rows"))
    hist
      .withColumn("row_share",
        rnd(col("n_rows") / sum(col("n_rows")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()), 4))
      .orderBy(col("magnitude"))
  }

  /** Faceted filter options — the option lists (with counts) behind the
    * reference's composable report filters (filters.py
    * build_report_where_clause consumes status/priority/date params;
    * the UI needs the distinct values + facet counts to offer them).
    * ONE scan: both facet columns explode to (filter_name, value) rows
    * in the map, then a single map-side-combined count — not one
    * groupBy job per facet. */
  def filterOptions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(explode(array(
        struct(lit("status").as("filter_name"),
               col("o_orderstatus").as("option_value")),
        struct(lit("priority").as("filter_name"),
               col("o_orderpriority").as("option_value")))).as("f"))
      .groupBy(col("f.filter_name").as("filter_name"),
               col("f.option_value").as("option_value"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("filter_name"), col("option_value"))

  /** Equi-width CDF histogram over order value (distribution page with
    * the cumulative curve): one map-side-combined count on the bucket
    * key, then the running total as a window over the O(buckets)
    * aggregate — the window's single-partition sort touches bucket
    * rows, never orders, so the shape survives any corpus size. */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val W = 25000.0
    val byBucket = Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / W).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_orders"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byBucket
      .withColumn("bucket_lo", (col("bucket") * W).cast("double"))
      .withColumn("cum_orders", sum(col("n_orders")).over(w))
      .withColumn("cum_frac",
        rnd(col("cum_orders") / sum(col("n_orders")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()), 4))
      .select("bucket", "bucket_lo", "n_orders", "cum_orders", "cum_frac")
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rpt_histogram"         -> (priceHistogram _),
    "rpt_filter_options"    -> (filterOptions _),
    "rpt_skew_audit"        -> (skewAudit _),
    "rpt_order_size_profile" -> (orderSizeProfile _),
    "rpt_percentiles"       -> (percentiles _),
    "rpt_mad_outliers"      -> (madOutliers _),
    "rpt_benford"           -> (benford _),
    "rpt_gini"              -> (giniRevenue _),
    "rpt_approx_percentiles" -> (approxPercentiles _),
    "rpt_summary"           -> (summary _),
    "rpt_status_dist"       -> (statusDist _),
    "rpt_top_types"         -> (topTypes _),
    "rpt_pair_network"      -> (pairNetwork _),
    "rpt_bucket_balance"    -> (bucketBalance _),
    "rpt_price_brackets"    -> (priceBrackets _),
    "rpt_conditional_rates" -> (conditionalRates _))

  val oracles: Map[String, String] = Map(
    "rpt_histogram" ->
      """WITH b AS (
           SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
                  count(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT bucket,
                CAST(bucket * 25000.0 AS DOUBLE) AS bucket_lo,
                n_orders,
                CAST(sum(n_orders) OVER (ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_orders,
                floor((sum(n_orders) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * 1.0 / sum(n_orders) OVER ()) * 10000 + 0.5) / 10000
                  AS cum_frac
         FROM b ORDER BY bucket""",
    "rpt_filter_options" ->
      """SELECT * FROM (
           SELECT 'status' AS filter_name, o_orderstatus AS option_value,
                  count(*) AS n_rows
           FROM orders GROUP BY 2
           UNION ALL
           SELECT 'priority', o_orderpriority, count(*)
           FROM orders GROUP BY 2)
         ORDER BY filter_name, option_value""",
    "rpt_skew_audit" ->
      """WITH k AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
                    FROM lineitem GROUP BY 1),
         h AS (SELECT CAST(strlen(CAST(n AS VARCHAR)) AS BIGINT) AS magnitude,
                      count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
                      min(n) AS min_rows, max(n) AS max_rows
               FROM k GROUP BY 1)
         SELECT magnitude, n_keys, n_rows, min_rows, max_rows,
                floor((n_rows * 1.0 / sum(n_rows) OVER ()) * 10000 + 0.5)
                  / 10000 AS row_share
         FROM h ORDER BY magnitude""",
    "rpt_order_size_profile" ->
      """WITH po AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
                     FROM lineitem GROUP BY 1)
         SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
         FROM po GROUP BY 1 ORDER BY n_lines""",
    "rpt_gini" ->
      """WITH per AS (
           SELECT o_custkey,
                  floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS rev
           FROM orders GROUP BY 1),
         r AS (
           SELECT rev,
                  row_number() OVER (ORDER BY rev, o_custkey) AS rnk
           FROM per),
         m AS (
           SELECT count(*) AS n, sum(rev) AS s, sum(rnk * rev) AS rs
           FROM r)
         SELECT n AS n_customers,
                floor(s * 100 + 0.5) / 100 AS total_revenue,
                floor((2.0 * rs / nullif(n * s, 0)
                       - (n + 1.0) / nullif(n, 0)) * 1000000 + 0.5)
                  / 1000000 AS gini
         FROM m""",
    "rpt_benford" ->
      """WITH d AS (
           SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS digit
           FROM orders),
         t AS (SELECT count(*) AS total FROM d)
         SELECT digit, count(*) AS n,
                floor((count(*) * 1.0 / any_value(t.total)) * 10000 + 0.5)
                  / 10000 AS observed,
                floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 10000 + 0.5)
                  / 10000 AS benford,
                floor(abs(count(*) * 1.0 / any_value(t.total) -
                          log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                      * 10000 + 0.5) / 10000 AS abs_dev
         FROM d, t GROUP BY digit ORDER BY digit""",
    "rpt_mad_outliers" ->
      """WITH med AS (
           SELECT o_orderpriority,
                  quantile_cont(o_totalprice, 0.5) AS med
           FROM orders GROUP BY 1),
         dev AS (
           SELECT o.o_orderpriority, o.o_totalprice, med.med,
                  abs(o.o_totalprice - med.med) AS adev
           FROM orders o JOIN med USING (o_orderpriority)),
         mad AS (
           SELECT o_orderpriority, quantile_cont(adev, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT dev.o_orderpriority,
                floor((any_value(dev.med)) * 100 + 0.5) / 100 AS median_price,
                floor((any_value(mad.mad)) * 100 + 0.5) / 100 AS mad_price,
                CAST(sum(CASE WHEN floor(dev.adev * 10000 + 0.5) / 10000 >
                       floor(mad.mad * 3 * 1.4826 * 10000 + 0.5) / 10000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                count(*) AS n_orders
         FROM dev JOIN mad USING (o_orderpriority)
         GROUP BY dev.o_orderpriority ORDER BY o_orderpriority""",
    "rpt_percentiles" ->
      """SELECT o_orderstatus,
                floor((quantile_cont(o_totalprice, 0.5)) * 100 + 0.5) / 100 AS p50_price,
                floor((quantile_cont(o_totalprice, 0.9)) * 100 + 0.5) / 100 AS p90_price,
                count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "rpt_summary" ->
      """SELECT
           (SELECT count(*) FROM orders) AS total_orders,
           (SELECT count(DISTINCT o_custkey) FROM orders) AS active_customers,
           (SELECT count(*) FROM lineitem) AS total_lineitems,
           (SELECT count(*) FROM events) AS total_events""",
    "rpt_status_dist" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
         WHERE o_orderstatus IS NOT NULL
         GROUP BY o_orderstatus ORDER BY n DESC, o_orderstatus""",
    "rpt_top_types" ->
      """SELECT p_type, count(*) AS n FROM part
         GROUP BY p_type ORDER BY n DESC, p_type LIMIT 10""",
    "rpt_pair_network" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                count(*) AS n_links
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey  = c_custkey
         JOIN supplier ON l_suppkey  = s_suppkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         WHERE cn.n_name <> sn.n_name
         GROUP BY 1, 2 HAVING count(*) >= 3
         ORDER BY n_links DESC, cust_nation, supp_nation LIMIT 20""",
    "rpt_bucket_balance" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                     WHEN c_acctbal < 2500 THEN 'low'
                     WHEN c_acctbal < 5000 THEN 'mid'
                     WHEN c_acctbal < 7500 THEN 'high'
                     ELSE 'top' END AS balance_bucket,
                count(*) AS n
         FROM customer GROUP BY 1
         ORDER BY CASE balance_bucket WHEN 'negative' THEN 0 WHEN 'low' THEN 1
                  WHEN 'mid' THEN 2 WHEN 'high' THEN 3 ELSE 4 END""",
    "rpt_price_brackets" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'under-100k'
                     WHEN o_totalprice < 200000 THEN '100k-200k'
                     WHEN o_totalprice < 300000 THEN '200k-300k'
                     ELSE '300k-plus' END AS price_bracket,
                count(*) AS n
         FROM orders GROUP BY 1
         ORDER BY CASE price_bracket WHEN 'under-100k' THEN 0
                  WHEN '100k-200k' THEN 1 WHEN '200k-300k' THEN 2 ELSE 3 END""",
    "rpt_conditional_rates" ->
      """SELECT p_brand,
                count(*) AS total_lines,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned,
                floor((CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) * 100.0
                      / count(*)) * 10 + 0.5) / 10 AS return_rate
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand HAVING count(*) >= 5
         ORDER BY total_lines DESC, p_brand LIMIT 15""")
}
