package graft

import org.scalatest.funsuite.AnyFunSuite

/** The IVF centroid assignment ships as a map-side-combined
  * `groupBy(vec_id).agg(max_by(...))`; this spec proves it row-identical
  * to the rank-1-window formulation it replaced (which shuffles the
  * expanded corpus×codebook product). */
class IvfAssignmentSpec extends AnyFunSuite {
  import TestSpark._

  test("max_by centroid assignment matches the rank-1 window formulation") {
    val (fast, ref) = similarity.Knn.assignmentPair(spark, Sf)
    val a = fast.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id")))
      .sorted.toSeq
    val b = ref.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id")))
      .sorted.toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }
}
