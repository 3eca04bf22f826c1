package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape checks for the TPC-H completion wave
  * (operators/TpchExtra.scala). Value parity vs DuckDB is the driver's
  * job; these pin the semantics the oracle can't see locally and the
  * join shapes that decide 100 TB viability. */
class TpchExtraSpec extends AnyFunSuite {
  import TestSpark._

  test("q13_custdist covers every customer, including zero-order ones") {
    val df = operators.TpchExtra.q13CustDist(spark, Sf)
    val total = df.agg(sum(col("custdist"))).collect().head.getLong(0)
    val nCust = Tables.customer(spark, Sf).count()
    assert(total === nCust, "left join must keep zero-order customers")
  }

  test("q15_top_supplier returns exactly the max-revenue supplier(s)") {
    val df = operators.TpchExtra.q15TopSupplier(spark, Sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length === 1, "all returned suppliers tie at the max")
    // independently recompute the max from the raw fact
    val manual = Tables.lineitem(spark, Sf)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
              to_date(col("l_shipdate")) < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(functions.Num.rnd(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("r"))
      .agg(max(col("r"))).collect().head.getDouble(0)
    assert(revs.head === manual)
  }

  test("q21_late_solo plans EXISTS/NOT-EXISTS as semi/anti joins (no row multiplication)") {
    val plan = operators.TpchExtra.q21LateSolo(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(plan.contains("LeftAnti"), plan.take(2000))
  }

  test("q22_dormant only counts above-average balances with no recent orders") {
    val out = operators.TpchExtra.q22Dormant(spark, Sf)
    val numcust = out.agg(sum(col("numcust"))).collect().head.getLong(0)
    val c = Tables.customer(spark, Sf)
    val ab = c.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal"))).collect().head.getDouble(0)
    val recent = Tables.orders(spark, Sf)
      .filter(to_date(col("o_orderdate")) >= lit("1999-01-01"))
      .select("o_custkey")
    val manual = c.filter(col("c_acctbal") > ab)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(numcust === manual)
  }

  test("q12_ship_delay partitions every joined line into exactly one bucket") {
    val df = operators.TpchExtra.q12ShipDelay(spark, Sf)
    val sums = df.agg(sum(col("high_line_count") + col("low_line_count")))
      .collect().head.getLong(0)
    val manual = Tables.lineitem(spark, Sf)
      .filter(to_date(col("l_shipdate")).between("1996-01-01", "1996-12-31"))
      .join(Tables.orders(spark, Sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(sums === manual)
  }

  test("q14_promo_share is a percentage in (0, 100)") {
    val v = operators.TpchExtra.q14PromoShare(spark, Sf)
      .collect().head.getAs[Double]("promo_revenue")
    assert(v > 0.0 && v < 100.0, s"promo share $v")
  }

  test("q8_market_share is a fraction in [0, 1] for both years") {
    val rows = operators.TpchExtra.q8MarketShare(spark, Sf).collect()
    assert(rows.length === 2) // 1996, 1997
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share $s")
    }
  }

  test("q7_trade_volume keeps only cross-nation pairs and matches a naive recount") {
    // sf0.001 has ~10 suppliers over 25 nations, so the two picked
    // nations may have no trade at this SF — the invariant must hold
    // for whatever rows exist, and the row count must equal a naive
    // SQL recomputation (nonemptiness is asserted by the sf0.01 oracle).
    val rows = operators.TpchExtra.q7TradeVolume(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
    }
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(t => spark.read.parquet(s"$Sf/$t.parquet")
        .createOrReplaceTempView(s"q7_$t"))
    val naive = spark.sql(
      """SELECT count(*) FROM (
           SELECT n1.n_name, n2.n_name, year(to_date(l_shipdate))
           FROM q7_lineitem
           JOIN q7_supplier ON l_suppkey = s_suppkey
           JOIN q7_nation n1 ON s_nationkey = n1.n_nationkey
           JOIN q7_orders   ON l_orderkey = o_orderkey
           JOIN q7_customer ON o_custkey = c_custkey
           JOIN q7_nation n2 ON c_nationkey = n2.n_nationkey
           WHERE n1.n_name IN ('NATION_1','NATION_2')
             AND n2.n_name IN ('NATION_1','NATION_2')
             AND n1.n_name <> n2.n_name
             AND to_date(l_shipdate)
                 BETWEEN '1996-01-01' AND '1997-12-31'
           GROUP BY 1, 2, 3)""").collect().head.getLong(0)
    assert(rows.length.toLong === naive)
  }

  test("derived partsupp: exactly 4 distinct in-range suppliers per part") {
    val ps = operators.TpchExtra.partsupp(spark, Sf)
    val nPart = Tables.part(spark, Sf).count()
    val nSupp = Tables.supplier(spark, Sf).count()
    assert(ps.count() === nPart * 4)
    assert(ps.select(col("ps_partkey"), col("ps_suppkey")).distinct().count()
      === nPart * 4, "the stride formula must never collide within a part")
    val bad = ps.filter(col("ps_suppkey") < 0 || col("ps_suppkey") >= nSupp ||
                        col("ps_availqty") < 1 || col("ps_cost_cents") < 100)
      .count()
    assert(bad === 0L, "suppkeys in [0, S), availqty ≥ 1, cost ≥ 100 cents")
  }

  test("q2_min_cost_supp rows are exactly their part's regional cost floor") {
    val out = operators.TpchExtra.q2MinCostSupplier(spark, Sf).collect()
    assert(out.nonEmpty)
    // every returned (part, cost) must equal the independently
    // recomputed min over ASIA-region suppliers of that part
    val asiaSupp = Tables.supplier(spark, Sf)
      .join(broadcast(Tables.nation(spark, Sf)
        .join(broadcast(Tables.region(spark, Sf)
          .filter(col("r_name") === "ASIA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val mins = operators.TpchExtra.partsupp(spark, Sf)
      .join(asiaSupp, col("ps_suppkey") === col("s_suppkey"))
      .groupBy(col("ps_partkey"))
      .agg((min(col("ps_cost_cents")).cast("double") / 100.0).as("floor_cost"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Double]("ps_supplycost")
        === mins(r.getAs[Long]("p_partkey")))
    }
  }

  test("q11_important_stock: every row clears 2x the mean per-part share") {
    val out = operators.TpchExtra.q11ImportantStock(spark, Sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Double]("value"))
    assert(vals.sameElements(vals.sortBy(-_)), "sorted by value desc")
    // independent recount of the threshold on the exact cents frame
    val nat = Tables.nation(spark, Sf)
      .filter(col("n_name").isin("NATION_2", "NATION_7", "NATION_12"))
      .select("n_nationkey")
    val nps = operators.TpchExtra.partsupp(spark, Sf)
      .join(Tables.supplier(spark, Sf)
              .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
              .select("s_suppkey"),
            col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
              (col("ps_cost_cents") * col("ps_availqty")).as("v"))
    val (total, nparts) = {
      val r = nps.agg(sum(col("v")), countDistinct(col("ps_partkey")))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    val expect = nps.groupBy(col("ps_partkey"))
      .agg(sum(col("v")).as("vc"))
      .filter(col("vc") * nparts > total * 2)
      .count()
    assert(rows.length.toLong === expect)
  }

  test("q2_min_cost_supp pushes the part filter to the scan and broadcasts dims") {
    val plan = operators.TpchExtra.q2MinCostSupplier(spark, Sf)
      .queryExecution.executedPlan.toString
    // the p_size/p_type slice must reach the part parquet scan
    assert(plan.contains("LessThanOrEqual(p_size,15"), plan.take(3000))
    assert(plan.contains("EqualTo(p_type,ECONOMY)"), plan.take(3000))
    // region-chain dims ride broadcast joins, never a shuffle
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q11_important_stock aggregates in exact BIGINT with map-side partials") {
    val df = operators.TpchExtra.q11ImportantStock(spark, Sf)
    // the value column must be derived from LONG sums (exact integer
    // cents), surfacing as double only in the final /100.0 projection
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan.take(3000))
    import org.apache.spark.sql.types.DoubleType
    assert(df.schema("value").dataType === DoubleType)
  }

  test("q20_promotion_supp plans the membership test as a left-semi join") {
    val plan = operators.TpchExtra.q20PromotionSupp(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
  }
}
