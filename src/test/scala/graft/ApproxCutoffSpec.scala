package graft

import org.scalatest.funsuite.AnyFunSuite

/** The exact `percentile` cutoffs in evt_rfm and text_perplexity_buckets
  * buffer the full value set in one aggregation buffer — fine for the
  * oracle-checkable form, not for 100 TB. This spec proves the
  * documented swap-in (approx_percentile, a mergeable Greenwald–Khanna
  * sketch with map-side partials) preserves the segmentation within the
  * sketch's rank-error bound: rank error ≤ N/accuracy per cutoff, so a
  * segment bounded by k cutoff comparisons can gain/lose at most k·N/a
  * members. */
class ApproxCutoffSpec extends AnyFunSuite {
  import TestSpark._

  private def counts(df: org.apache.spark.sql.DataFrame, key: String,
                     n: String): Map[String, Long] =
    df.collect().map(r => r.getAs[String](key) -> r.getAs[Long](n)).toMap

  test("rfm approx-cutoff swap-in stays within the rank-error bound") {
    val exact = counts(operators.Events.rfm(spark, Sf), "segment", "n_users")
    val nUsers = exact.values.sum.toDouble
    // high accuracy: the sketch is exact below `accuracy` items — the
    // swap-in is a drop-in replacement at any N where exact would fit
    val tight = counts(
      operators.Events.rfmWith(spark, Sf, Some(100000)), "segment", "n_users")
    assert(tight === exact)
    // deliberately coarse sketch: deltas must respect 3·N/a per segment
    val a = 25
    val coarse = counts(
      operators.Events.rfmWith(spark, Sf, Some(a)), "segment", "n_users")
    val bound = 3.0 * nUsers / a + 1
    (exact.keySet ++ coarse.keySet).foreach { seg =>
      val d = math.abs(exact.getOrElse(seg, 0L) - coarse.getOrElse(seg, 0L))
      assert(d <= bound, s"segment $seg delta $d exceeds bound $bound")
    }
  }

  test("perplexity-bucket approx swap-in stays within the rank-error bound") {
    def key(r: org.apache.spark.sql.Row) =
      s"${r.getAs[String]("lang")}/${r.getAs[String]("bucket")}"
    def bcounts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => key(r) -> r.getAs[Long]("n_docs")).toMap
    val exact = bcounts(operators.TextOps.perplexityBuckets(spark, Sf))
    val nDocs = exact.values.sum.toDouble
    val tight = bcounts(
      operators.TextOps.perplexityBucketsWith(spark, Sf, Some(100000)))
    assert(tight === exact)
    val a = 25
    val coarse = bcounts(
      operators.TextOps.perplexityBucketsWith(spark, Sf, Some(a)))
    val bound = 2.0 * nDocs / a + 1
    (exact.keySet ++ coarse.keySet).foreach { b =>
      val d = math.abs(exact.getOrElse(b, 0L) - coarse.getOrElse(b, 0L))
      assert(d <= bound, s"bucket $b delta $d exceeds bound $bound")
    }
  }
}
