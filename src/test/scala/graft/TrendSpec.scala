package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the trend/engagement wave (operators/Trend).
  * Value parity vs DuckDB is the driver's job; these pin the actual
  * math (recursive EWMA, OLS vs Spark's builtin regression aggs) and
  * the plan shapes. */
class TrendSpec extends AnyFunSuite {
  import TestSpark._

  test("rpt_ewma matches the recursive definition S_t = a*x_t + (1-a)*S_(t-1)") {
    val rows = operators.Trend.ewma(spark, Sf)
      .orderBy(col("month")).collect()
    assert(rows.length > 10)
    var s = rows.head.getAs[Double]("rev")
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) s = 0.3 * r.getAs[Double]("rev") + 0.7 * s
      assert(math.abs(r.getAs[Double]("ewma") - s) < 0.02,
        s"month ${r.getAs[String]("month")}: got ${r.getAs[Double]("ewma")}, want $s")
      s = r.getAs[Double]("ewma") // re-anchor on the rounded value
    }
  }

  test("rpt_trend_forecast slope/intercept agree with Spark's regr_* builtins") {
    val out = operators.Trend.trendForecast(spark, Sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("slope_musd"), r.getAs[Double]("intercept_musd"))).toMap
    val monthly = Tables.orders(spark, Sf)
      .groupBy(col("o_orderpriority"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"))
      .agg((sum(col("o_totalprice")) / 1000000.0).as("rev"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderpriority"))
    val ref = monthly
      .withColumn("x", (col("mi") - min(col("mi")).over(w)).cast("double"))
      .groupBy(col("o_orderpriority"))
      .agg(expr("regr_slope(rev, x)").as("s"), expr("regr_intercept(rev, x)").as("i"))
      .collect()
    ref.foreach { r =>
      val (s, i) = out(r.getAs[String]("o_orderpriority"))
      assert(math.abs(s - r.getAs[Double]("s")) < 0.01, s"slope mismatch: $r")
      assert(math.abs(i - r.getAs[Double]("i")) < 0.5, s"intercept mismatch: $r")
    }
  }

  test("rpt_trend_forecast r2 lies in [0,1]") {
    operators.Trend.trendForecast(spark, Sf).collect().foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r")
    }
  }

  test("evt_stickiness is bounded by 1 and mau matches an independent count") {
    val rows = operators.Trend.stickiness(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("dau_avg") <= r.getAs[Long]("mau").toDouble + 1e-9)
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
    val ev = Tables.events(spark, Sf)
    val mau0 = ev.groupBy(date_format(col("ts"), "yyyy-MM").as("m"))
      .agg(countDistinct(col("user_id")).as("u")).collect()
      .map(r => r.getAs[String]("m") -> r.getAs[Long]("u")).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("mau") === mau0(r.getAs[String]("month"))))
  }

  test("rpt_winsorized means sit inside the cutoffs and cover all rows") {
    val rows = operators.Trend.winsorized(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      assert(p05 < p95)
      val mw = r.getAs[Double]("mean_winsorized")
      val mt = r.getAs[Double]("mean_trimmed")
      assert(mw >= p05 && mw <= p95, s"winsorized mean outside cutoffs: $r")
      assert(mt >= p05 && mt <= p95, s"trimmed mean outside cutoffs: $r")
    }
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === Tables.orders(spark, Sf).count())
  }

  test("evt_retention_days rates are bounded and day-0 defines the cohort") {
    val rows = operators.Trend.retentionDays(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cohort_users") > 0)
      Seq("d1_rate", "d7_rate", "d14_rate").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range in $r")
      }
    }
    // cohorts partition the user base: Σ cohort_users = distinct users
    val users = Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("cohort_users")).sum === users)
  }

  test("rpt_seasonality indexes average to ~1 weighted by month counts") {
    val rows = operators.Trend.seasonality(spark, Sf).collect()
    assert(rows.length === 12)
    val wsum = rows.map(r =>
      r.getAs[Long]("n_months") * r.getAs[Double]("seasonal_index")).sum
    val n = rows.map(_.getAs[Long]("n_months")).sum
    assert(math.abs(wsum / n - 1.0) < 0.01,
      s"weighted mean seasonal index should be ~1, got ${wsum / n}")
  }

  test("evt_slo_burn accounts for every event and flags breaches consistently") {
    val rows = operators.Trend.sloBurn(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, Sf)
    assert(rows.map(_.getAs[Long]("n_events")).sum === ev.count())
    assert(rows.map(_.getAs[Long]("n_errors")).sum ===
      ev.filter(col("event_type") === "error").count())
    rows.foreach { r =>
      val roll = r.getAs[Double]("roll_rate_6h")
      assert(roll >= 0.0 && roll <= 1.0)
      assert(r.getAs[Boolean]("breach") ===
        (r.getAs[Double]("burn_rate") >= 1.2), r.toString)
    }
  }

  test("rpt_winsorized broadcasts the per-group cutoffs (no fact shuffle for the join)") {
    val plan = operators.Trend.winsorized(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }
}
