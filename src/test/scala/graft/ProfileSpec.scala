package graft

import org.scalatest.funsuite.AnyFunSuite

/** tbl_profile / tbl_profile_approx contracts: the approx page must be
  * within the HLL++ error bound of the exact page on every column, its
  * plan must be Expand-free (the whole point of the swap-in — N exact
  * distincts in one pass multiply scan output by N through Expand),
  * and the explicit value rendering must be engine-neutral. */
class ProfileSpec extends AnyFunSuite {
  import TestSpark._

  test("profileApprox cardinalities sit within the HLL error bound of exact") {
    def byCol(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct"))
      .toMap
    val exact = byCol(operators.TableOps.profile(spark, Sf))
    val approx = byCol(operators.TableOps.profileApprox(spark, Sf))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // default rsd 0.05; 4σ + small-cardinality slack
      val tol = math.max(4, (0.20 * e).ceil.toLong)
      assert(math.abs(a - e) <= tol,
        s"column $c: approx=$a exact=$e tolerance=$tol")
    }
  }

  test("BOTH profile forms plan WITHOUT Expand; exact prunes per leg") {
    val approxPlan = operators.TableOps.profileApprox(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"approx profile must be a plain hash aggregate:\n$approxPlan")
    // exact: one single-distinct aggregate leg per column
    // (planAggregateWithOneDistinct) — no Expand anywhere, and every
    // leg's parquet scan reads ONLY its own column
    val exactQe = operators.TableOps.profile(spark, Sf).queryExecution
    val exactPlan = exactQe.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      s"per-column-leg exact profile must not Expand:\n$exactPlan")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(exactPlan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty &&
           readSchemas.forall(s => !s.contains(",")),
      s"each profile leg must scan exactly one column, got: $readSchemas")
  }

  test("min/max render with explicit fixed formats, not engine defaults") {
    val rows = operators.TableOps.profile(spark, Sf).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[String]("min_value"), r.getAs[String]("max_value"))).toMap
    val (pMin, pMax) = rows("o_totalprice")
    // fixed 6-decimal rendering — never scientific notation
    assert(pMin.matches("""-?\d+\.\d{6}""") && pMax.matches("""-?\d+\.\d{6}"""),
      s"o_totalprice rendered as ($pMin, $pMax)")
    val (dMin, dMax) = rows("o_orderdate")
    assert(dMin.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}""") &&
           dMax.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""),
      s"o_orderdate rendered as ($dMin, $dMax)")
  }
}
