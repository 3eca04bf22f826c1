package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** tbl_catalog contract (r14: the 10 per-table counts are submitted as
  * concurrent jobs — guide §2.6 — instead of sequential AQE stage
  * materializations of one union plan; the page itself must be
  * value-identical to the per-table ground truth and keep its sort). */
class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("catalog page rows equal per-table ground truth, sorted by size") {
    val rows = operators.TableOps.catalogPage(spark, Sf).collect()
    val loaders: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> Tables.region(spark, Sf),
      "nation" -> Tables.nation(spark, Sf),
      "customer" -> Tables.customer(spark, Sf),
      "supplier" -> Tables.supplier(spark, Sf),
      "part" -> Tables.part(spark, Sf),
      "orders" -> Tables.orders(spark, Sf),
      "lineitem" -> Tables.lineitem(spark, Sf),
      "events" -> Tables.events(spark, Sf),
      "documents" -> Tables.documents(spark, Sf),
      "embeddings" -> Tables.embeddings(spark, Sf))
    val truth = loaders.map { case (n, df) =>
      n -> ((df.count(), df.schema.fields.length.toLong)) }.toMap
    assert(rows.length === truth.size)
    rows.foreach { r =>
      val n = r.getAs[String]("table_name")
      assert(r.getAs[Long]("record_count") === truth(n)._1, s"count of $n")
      assert(r.getAs[Long]("n_columns") === truth(n)._2, s"n_columns of $n")
    }
    val expectedOrder = truth.toSeq
      .sortBy { case (n, (c, _)) => (-c, n) }.map(_._1)
    assert(rows.map(_.getAs[String]("table_name")).toSeq === expectedOrder)
  }
}
