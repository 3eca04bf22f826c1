package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Referential-integrity and statistical-relationship audits — the
  * warehouse-health checks the reference runs at load time
  * (schema_validator.py's FK checks, database_adapter.py's
  * validate-on-ingest) re-expressed as set operations over the star.
  *
  * Scale notes:
  *  - etl_fk_integrity: each FK edge is ONE left join on the (unique)
  *    parent key with total + missing counted in the same aggregate —
  *    a single fact pass per edge, no row multiplication; the per-edge
  *    result is 1 row, so the union is 4 rows however big the facts.
  *    Dim-sided keys (custkey→customer, suppkey→supplier) let AQE
  *    broadcast the dim; the fact-fact edge (lineitem→orders) shuffles
  *    once on orderkey.
  *  - rpt_corr_measures: all 9 moment sums ship in ONE pass over
  *    lineitem (single partial-aggregated scan); the 3 pairwise
  *    Pearson correlations are derived from the 1-row moment frame via
  *    stack() — no second scan, no per-pair jobs. The sums are rounded
  *    before the corr arithmetic so both engines derive the SAME
  *    doubles (the cancellation in n·Sxy − Sx·Sy would otherwise
  *    amplify last-ulp summation-order drift into visible digits).
  */
object Integrity {

  /** Orphan audit over the star's four FK edges: rows whose FK has no
    * parent. Healthy data ⇒ zero orphans, but the COUNT shape is the
    * operator: a left-anti join per edge, 1-row result each. */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val n  = Tables.nation(spark, dir)
    // one scan per edge: left join on the (unique) parent PK, then
    // count total + parent-missing in the same aggregate — two counts
    // for the price of one fact pass (an anti join would need a second
    // scan for the denominator)
    def audit(name: String, child: DataFrame, key: String,
              parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key).as("k"))
        .join(parent.select(col(pkey).as("pk"), lit(1).as("present")),
              col("k") === col("pk"), "left_outer")
        .agg(count(lit(1)).as("child_rows"),
             count(when(col("present").isNull, lit(1))).as("orphan_rows"))
        .select(lit(name).as("fk_edge"), col("child_rows"), col("orphan_rows"))
    audit("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionAll(audit("lineitem.suppkey->supplier", li, "l_suppkey", s, "s_suppkey"))
      .unionAll(audit("orders.custkey->customer", o, "o_custkey", c, "c_custkey"))
      .unionAll(audit("customer.nationkey->nation", c, "c_nationkey", n, "n_nationkey"))
      .orderBy(col("fk_edge"))
  }

  /** Pairwise Pearson correlations of the lineitem measures, from one
    * moment pass. Sums are rounded to 2 decimals BEFORE the corr
    * arithmetic — see the class note on cancellation. */
  def corrMeasures(spark: SparkSession, dir: String): DataFrame =
    corrMeasuresOn(Tables.lineitem(spark, dir)
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"),
              col("l_discount").as("z")))

  /** Frame-level core ((x, y, z) rows; OracleEdgeSpec plants the
    * degenerate fixtures through it). A constant measure zeroes its
    * variance term — Pearson r against a constant is undefined — NULL
    * by construction here and via nullif in the oracle, never an
    * engine-dependent IEEE 0/0; an empty frame NULL-propagates through
    * the moment sums the same way on both engines. */
  private[graft] def corrMeasuresOn(li: DataFrame): DataFrame = {
    val m = li.agg(
      count(lit(1)).cast("double").as("n"),
      rnd(sum(col("x")), 2).as("sx"),  rnd(sum(col("y")), 2).as("sy"),
      rnd(sum(col("z")), 2).as("sz"),
      rnd(sum(col("x") * col("x")), 2).as("sxx"),
      rnd(sum(col("y") * col("y")), 2).as("syy"),
      rnd(sum(col("z") * col("z")), 2).as("szz"),
      rnd(sum(col("x") * col("y")), 2).as("sxy"),
      rnd(sum(col("x") * col("z")), 2).as("sxz"),
      rnd(sum(col("y") * col("z")), 2).as("syz"))
    def corr(sab: String, sa: String, sb: String,
             saa: String, sbb: String) =
      rnd((col("n") * col(sab) - col(sa) * col(sb)) /
          nullif(sqrt((col("n") * col(saa) - col(sa) * col(sa)) *
                      (col("n") * col(sbb) - col(sb) * col(sb))),
                 lit(0.0)), 4)
    m.withColumn("c_qty_price", corr("sxy", "sx", "sy", "sxx", "syy"))
      .withColumn("c_qty_disc",  corr("sxz", "sx", "sz", "sxx", "szz"))
      .withColumn("c_price_disc", corr("syz", "sy", "sz", "syy", "szz"))
      .selectExpr(
        """stack(3,
             'quantity~extendedprice', c_qty_price,
             'quantity~discount',      c_qty_disc,
             'extendedprice~discount', c_price_disc) AS (pair, pearson_r)""")
      .orderBy(col("pair"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_fk_integrity"  -> (fkIntegrity _),
    "rpt_corr_measures" -> (corrMeasures _))

  val oracles: Map[String, String] = Map(
    "etl_fk_integrity" ->
      """SELECT * FROM (
           SELECT 'lineitem.orderkey->orders' AS fk_edge,
                  (SELECT count(*) FROM lineitem) AS child_rows,
                  (SELECT count(*) FROM lineitem
                   WHERE NOT EXISTS (SELECT 1 FROM orders
                                     WHERE o_orderkey = l_orderkey)) AS orphan_rows
           UNION ALL
           SELECT 'lineitem.suppkey->supplier',
                  (SELECT count(*) FROM lineitem),
                  (SELECT count(*) FROM lineitem
                   WHERE NOT EXISTS (SELECT 1 FROM supplier
                                     WHERE s_suppkey = l_suppkey))
           UNION ALL
           SELECT 'orders.custkey->customer',
                  (SELECT count(*) FROM orders),
                  (SELECT count(*) FROM orders
                   WHERE NOT EXISTS (SELECT 1 FROM customer
                                     WHERE c_custkey = o_custkey))
           UNION ALL
           SELECT 'customer.nationkey->nation',
                  (SELECT count(*) FROM customer),
                  (SELECT count(*) FROM customer
                   WHERE NOT EXISTS (SELECT 1 FROM nation
                                     WHERE n_nationkey = c_nationkey)))
         ORDER BY fk_edge""",
    "rpt_corr_measures" ->
      """WITH m AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
                  floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sx,
                  floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sy,
                  floor((sum(l_discount)) * 100 + 0.5) / 100 AS sz,
                  floor((sum(l_quantity * l_quantity)) * 100 + 0.5) / 100 AS sxx,
                  floor((sum(l_extendedprice * l_extendedprice)) * 100 + 0.5) / 100 AS syy,
                  floor((sum(l_discount * l_discount)) * 100 + 0.5) / 100 AS szz,
                  floor((sum(l_quantity * l_extendedprice)) * 100 + 0.5) / 100 AS sxy,
                  floor((sum(l_quantity * l_discount)) * 100 + 0.5) / 100 AS sxz,
                  floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS syz
           FROM lineitem)
         SELECT pair, pearson_r FROM (
           SELECT 'quantity~extendedprice' AS pair,
                  floor(((n * sxy - sx * sy) /
                    nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0))
                    * 10000 + 0.5) / 10000 AS pearson_r FROM m
           UNION ALL
           SELECT 'quantity~discount',
                  floor(((n * sxz - sx * sz) /
                    nullif(sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)), 0))
                    * 10000 + 0.5) / 10000 FROM m
           UNION ALL
           SELECT 'extendedprice~discount',
                  floor(((n * syz - sy * sz) /
                    nullif(sqrt((n * syy - sy * sy) * (n * szz - sz * sz)), 0))
                    * 10000 + 0.5) / 10000 FROM m)
         ORDER BY pair""")
}
