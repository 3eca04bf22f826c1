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
