package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-graph properties for the triangle kernel plus the integrity
  * audits' local invariants (value parity vs DuckDB is the driver's
  * gate; these prove the kernel on graphs with KNOWN answers). */
class TrianglesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  test("complete K6 has C(6,3)=20 triangles, star K1,5 has none") {
    val k6 = edges((for { a <- 0L to 5L; b <- 0L to 5L if a < b }
      yield (a, b)): _*)
    assert(graph.Triangles.triangleList(k6).count() === 20L)
    val star = edges((1L to 5L).map(i => (0L, i)): _*)
    assert(graph.Triangles.triangleList(star).count() === 0L)
  }

  test("orientation counts each triangle once regardless of edge direction/duplication") {
    // same triangle given twice with flipped directions + a self-loop
    val messy = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L))
    val tris = graph.Triangles.triangleList(messy).collect()
    assert(tris.length === 1)
    val r = tris.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 2L, 3L)))
  }

  test("two disjoint triangles sharing no node count independently") {
    val two = edges((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L))
    assert(graph.Triangles.triangleList(two).count() === 2L)
    // every node has degree 2 in this graph
    val degs = graph.Triangles.degrees(two).collect()
    assert(degs.length === 6 && degs.forall(_.getAs[Long]("degree") == 2L))
  }

  test("nation clustering coefficient is a valid ratio on the sparsified graph") {
    val r = graph.Triangles.nationTriangles(spark, Sf).collect().head
    val cl = r.getAs[Double]("clustering")
    assert(cl >= 0.0 && cl <= 1.0, s"clustering $cl")
    assert(r.getAs[Long]("n_edges") > 0L)
  }

  test("etl_fk_integrity: the synthetic star has zero orphans on all four edges") {
    val rows = operators.Integrity.fkIntegrity(spark, Sf).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("orphan_rows") === 0L, r.getAs[String]("fk_edge"))
      assert(r.getAs[Long]("child_rows") > 0L)
    }
  }

  test("etl_fk_integrity detects planted orphans") {
    // a child frame with 2 rows pointing at a missing parent — run the
    // same one-pass audit shape directly on in-memory frames
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 98L)).toDF("id", "fk")
    val parent = Seq(10L).toDF("pk")
    val out = child.select(col("fk").as("k"))
      .join(parent.select(col("pk"), lit(1).as("present")),
            col("k") === col("pk"), "left_outer")
      .agg(count(lit(1)).as("child_rows"),
           count(when(col("present").isNull, lit(1))).as("orphan_rows"))
      .collect().head
    assert(out.getAs[Long]("child_rows") === 4L)
    assert(out.getAs[Long]("orphan_rows") === 2L)
  }

  test("rpt_corr_measures matches Spark's builtin corr() within rounding error") {
    val rows = operators.Integrity.corrMeasures(spark, Sf).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Double]("pearson_r")).toMap
    assert(rows.size === 3)
    rows.values.foreach(v => assert(v >= -1.0 && v <= 1.0))
    // the moment-formula result (cross-engine-stable via rounded sums)
    // must agree with Spark's Welford-style corr aggregate — the
    // rounded sums cost at most ~1e-3 here
    val ref = Tables.lineitem(spark, Sf).agg(
      corr(col("l_quantity"), col("l_extendedprice")).as("qp"),
      corr(col("l_quantity"), col("l_discount")).as("qd"),
      corr(col("l_extendedprice"), col("l_discount")).as("pd"))
      .collect().head
    assert(math.abs(rows("quantity~extendedprice") - ref.getAs[Double]("qp")) < 1e-3)
    assert(math.abs(rows("quantity~discount") - ref.getAs[Double]("qd")) < 1e-3)
    assert(math.abs(rows("extendedprice~discount") - ref.getAs[Double]("pd")) < 1e-3)
  }
}
