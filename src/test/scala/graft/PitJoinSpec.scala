package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Leakage-safety contract for the point-in-time-correct feature join
  * (operators/Etl.pitJoin): a fact row may only ever see dimension
  * state from its past. Value parity vs DuckDB is the driver's job. */
class PitJoinSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val out = operators.Etl.pitJoin(spark, Sf).collect()

  private lazy val firstOrderDay: Map[Long, String] =
    Tables.orders(spark, Sf).filter(col("o_custkey") < 50L)
      .groupBy(col("o_custkey"))
      .agg(date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("d0"))
      .collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[String]("d0")).toMap

  test("facts before the customer's first version carry NULL state (no future leak-in)") {
    assert(out.nonEmpty)
    out.foreach { r =>
      val ship = r.getAs[String]("ship_day")
      val d0 = firstOrderDay(r.getAs[Long]("custkey"))
      if (ship < d0)
        assert(r.isNullAt(r.fieldIndex("version")),
          s"pre-history fact must have null state: $r")
      else
        assert(!r.isNullAt(r.fieldIndex("version")),
          s"fact on/after first version must match state: $r")
    }
  }

  test("matched state never postdates the fact (as-of, not nearest)") {
    // version v of customer c starts on the c's v-th order date
    // (ordered by date, orderkey); assert that date <= ship_day
    val vDates = Tables.orders(spark, Sf).filter(col("o_custkey") < 50L)
      .withColumn("v", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long"))
      .select(col("o_custkey"), col("v"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("vd"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("v")) ->
                 r.getAs[String]("vd")).toMap
    out.filter(r => !r.isNullAt(r.fieldIndex("version"))).foreach { r =>
      val vd = vDates((r.getAs[Long]("custkey"), r.getAs[Long]("version")))
      assert(vd <= r.getAs[String]("ship_day"),
        s"state postdates the fact: version date $vd, row $r")
    }
  }

  test("every fact line of the filtered customers appears exactly once") {
    val expected = Tables.lineitem(spark, Sf)
      .join(Tables.orders(spark, Sf).filter(col("o_custkey") < 50L),
            col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(out.length.toLong === expected)
  }
}
