package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.OrcSource

/** ORC must behave like a drop-in peer of the parquet path: identical
  * round-tripped rows, pruned reads (column + predicate pushdown), and
  * partition-dir pruning. */
class OrcSourceSpec extends AnyFunSuite {
  import TestSpark._

  test("parquet→orc round-trip preserves rows and schema") {
    val base = Files.createTempDirectory("graft_orc").toString
    val src = Tables.orders(spark, Sf)
    OrcSource.fromParquet(spark, s"$Sf/orders.parquet", s"$base/orders_orc")
    val back = OrcSource.read(spark, s"$base/orders_orc")
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    val a = src.agg(sum(col("o_orderkey")), sum(col("o_totalprice"))).head
    val b = back.agg(sum(col("o_orderkey")), sum(col("o_totalprice"))).head
    assert(a.getLong(0) === b.getLong(0))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
  }

  test("orc scans prune columns and push predicates to the stripe index") {
    val base = Files.createTempDirectory("graft_orc_p").toString
    OrcSource.write(Tables.orders(spark, Sf), s"$base/o")
    val q = OrcSource.read(spark, s"$base/o")
      .filter(col("o_orderkey") === 42L)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)"),
      s"no ORC predicate pushdown in:\n${plan.take(2000)}")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>"),
      s"no column pruning in:\n${plan.take(2000)}")
  }

  test("hive-partitioned orc prunes partition directories") {
    val base = Files.createTempDirectory("graft_orc_part").toString
    val df = Tables.orders(spark, Sf)
      .withColumn("part_month", date_format(col("o_orderdate"), "yyyy-MM"))
    OrcSource.write(df, s"$base/lake", partitionBy = Seq("part_month"))
    val month = "1997-03"
    val got = OrcSource.read(spark, s"$base/lake")
      .filter(col("part_month") === month)
    val expected = df.filter(col("part_month") === month).count()
    assert(got.count() === expected)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part_month"),
      s"no partition pruning in:\n${plan.take(2000)}")
  }
}
