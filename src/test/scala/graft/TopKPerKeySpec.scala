package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k-per-key operator must agree with the window-function
  * formulation on the order-value multiset per key (ties at the k
  * boundary make row identity ambiguous in both, but the value multiset
  * is deterministic). Runs on a session with GraftExtensions so the
  * hint→Rule→Strategy→Exec pipeline is exercised end to end. */
class TopKPerKeySpec extends AnyFunSuite {

  private def extendedSession(): SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    (prior, s) match { case _ => s }
  }

  private def restore(prior: Option[SparkSession]): Unit =
    prior.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }

  test("hint-driven top-k-per-key matches the window formulation") {
    val prior = SparkSession.getDefaultSession
    val spark = extendedSession()
    try {
      val li = Tables.lineitem(spark, TestSpark.Sf)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val custom = li.hint("topk_per_key", "l_returnflag", "l_extendedprice", 5)
      // the custom exec must actually be in the plan
      assert(custom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val gotVals = custom.collect()
        .groupBy(_.getString(0))
        .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted.toSeq }
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc)
      val expVals = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).drop("rn").collect()
        .groupBy(_.getString(0))
        .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted.toSeq }
      assert(gotVals === expVals)
    } finally restore(prior)
  }

  test("plain-session entry point with tiebreak matches window rows exactly") {
    // no extensions: TopKPerKey() registers its strategy via
    // spark.experimental and builds the node directly — and with a
    // tiebreak the kept ROWS (not just value multisets) must match the
    // (v DESC, tb ASC) window formulation
    val spark = TestSpark.spark
    val li = Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
              col("l_linenumber"))
    val custom = plans.TopKPerKey(li, "l_returnflag", "l_extendedprice", 7,
      tiebreak = Some("l_orderkey"))
    assert(custom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val expected = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).drop("rn")
    // compare (flag, price, orderkey) multisets: exact ties on both the
    // order value and the tiebreak are interchangeable rows in both
    // formulations, and identical triples compare equal anyway
    val got = custom.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    val exp = expected.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    assert(got === exp)
  }

  test("map-side partial pass bounds pre-exchange rows to k·|keys|·|input partitions|") {
    val spark = TestSpark.spark
    val prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = Tables.lineitem(spark, TestSpark.Sf)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val k = 5
      val custom = plans.TopKPerKey(li, "l_returnflag", "l_extendedprice", k)
      val plan = custom.queryExecution.executedPlan
      // both heap passes present, exchange between them
      val s = plan.toString
      assert(s.contains("TopKPerKeyPartial"), s)
      assert(s.indexOf("TopKPerKey") < s.indexOf("Exchange") &&
             s.indexOf("Exchange") < s.indexOf("TopKPerKeyPartial"), s)
      val partial = plan.collectFirst {
        case p: plans.TopKPerKeyPartialExec => p
      }.getOrElse(fail("partial exec not found in plan"))
      val nKeys = li.select(col("l_returnflag")).distinct().count()
      val inputParts = partial.child.execute().getNumPartitions
      val postPartial = partial.execute().count()
      assert(postPartial <= k * nKeys * inputParts,
        s"$postPartial rows survived the partial pass " +
        s"(bound ${k * nKeys * inputParts})")
      // and the final output still matches the window formulation
      assert(custom.count() === k * nKeys)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("non-numeric order or tiebreak columns are rejected at entry") {
    val spark = TestSpark.spark
    val li = Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_shipdate"))
    val e1 = intercept[IllegalArgumentException] {
      plans.TopKPerKey(li, "l_returnflag", "l_returnflag", 5)
    }
    assert(e1.getMessage.contains("must be numeric"))
    val e2 = intercept[IllegalArgumentException] {
      plans.TopKPerKey(li, "l_returnflag", "l_extendedprice", 5,
        tiebreak = Some("l_shipdate"))
    }
    assert(e2.getMessage.contains("must be numeric"))
  }

  test("unknown columns in the hint fail analysis with a clear message") {
    val prior = SparkSession.getDefaultSession
    val spark = extendedSession()
    try {
      val li = Tables.lineitem(spark, TestSpark.Sf)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val e = intercept[Exception] {
        li.hint("topk_per_key", "no_such_col", "l_extendedprice", 5).collect()
      }
      assert(e.getMessage.contains("no_such_col"))
    } finally restore(prior)
  }
}
