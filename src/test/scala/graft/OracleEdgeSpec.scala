package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Domain-edge sweep for the division/log-bearing oracle pairs (the
  * Kaplan–Meier d == n_risk class from round 7, generalized): on
  * degenerate data every guarded expression must yield NULL — the one
  * value both engines produce identically — never an engine-dependent
  * IEEE 0/0 (Spark NaN vs DuckDB error/NULL), and never crash. Each
  * operator's oracle mirrors the guard with nullif, so the pair stays
  * hash-identical at any SF, including one that produces the edge. */
class OracleEdgeSpec extends AnyFunSuite {
  import TestSpark._

  test("gini: zero total revenue and empty frames are NULL, equality is 0") {
    import spark.implicits._
    // all-zero revenue: n·s = 0 — undefined concentration, not NaN
    val zero = operators.Reports.giniFrom(
      Seq((1L, 0.0), (2L, 0.0)).toDF("o_custkey", "rev")).head
    assert(zero.getAs[Long]("n_customers") === 2L)
    assert(zero.isNullAt(zero.fieldIndex("gini")))
    // empty frame: the aggregate still emits its one row, all-NULL stats
    val empty = operators.Reports.giniFrom(
      Seq.empty[(Long, Double)].toDF("o_custkey", "rev")).head
    assert(empty.getAs[Long]("n_customers") === 0L)
    assert(empty.isNullAt(empty.fieldIndex("gini")))
    // perfectly equal (nonzero) revenue is NOT an edge: gini = 0 exactly
    val equal = operators.Reports.giniFrom(
      Seq((1L, 50.0), (2L, 50.0), (3L, 50.0)).toDF("o_custkey", "rev")).head
    assert(equal.getAs[Double]("gini") === 0.0)
  }

  test("auc: a single-class frame is NULL, perfect separation is 1.0") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Long)]): Row =
      operators.TextOps.aucFrom(rows.toDF("prob", "label")).head
    val allPos = auc(Seq((0.9, 1L), (0.4, 1L), (0.2, 1L)))
    assert(allPos.getAs[Long]("n_pos") === 3L &&
           allPos.getAs[Long]("n_neg") === 0L)
    assert(allPos.isNullAt(allPos.fieldIndex("auc")))
    val allNeg = auc(Seq((0.9, 0L), (0.4, 0L)))
    assert(allNeg.isNullAt(allNeg.fieldIndex("auc")))
    val empty = auc(Seq.empty)
    assert(empty.isNullAt(empty.fieldIndex("auc")))
    // sanity away from the edge: separable scores rank perfectly
    assert(auc(Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L)))
      .getAs[Double]("auc") === 1.0)
  }

  test("zipf fit: tiny/flat vocabularies degrade to NULL, never NaN") {
    import spark.implicits._
    def fit(texts: Seq[String]): Row =
      operators.TextOps.zipfFitOn(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")).head
    // single-term vocabulary: no x spread, det = 0 → slope/r² undefined
    val one = fit(Seq("aaa aaa aaa aaa"))
    assert(one.getAs[Long]("n_terms") === 1L)
    Seq("zipf_slope", "intercept", "r2")
      .foreach(c => assert(one.isNullAt(one.fieldIndex(c)), c))
    // empty corpus: n = 0
    val none = fit(Seq(""))
    assert(none.getAs[Long]("n_terms") === 0L)
    assert(none.isNullAt(none.fieldIndex("zipf_slope")))
    // all-singleton counts: x varies but y is constant — the fit line
    // is exactly flat (slope 0, intercept ln 1 = 0) and r² undefined
    val flat = fit(Seq("alpha beta gamma delta epsilon"))
    assert(flat.getAs[Long]("n_terms") === 5L)
    assert(flat.getAs[Double]("zipf_slope") === 0.0)
    assert(flat.getAs[Double]("intercept") === 0.0)
    assert(flat.isNullAt(flat.fieldIndex("r2")))
  }

  test("anomalies: zero-variance types contribute nothing; real outliers still flag") {
    import spark.implicits._
    val ev = (
      // constant type: σ = 0 exactly → filtered before the division
      (0 until 20).map(i => (i.toLong, "flat", 7.5)) ++
      // single-event type: stddev_pop = 0 (not NULL) for n = 1
      Seq((100L, "lonely", 3.0)) ++
      // varying type with one planted extreme value
      (0 until 29).map(i => (200L + i, "vary", 0.0)) :+ (500L, "vary", 100.0)
    ).toDF("event_id", "event_type", "value")
    val out = operators.Events.anomaliesOn(ev).collect()
    assert(out.map(_.getAs[String]("event_type")).toSet === Set("vary"))
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(500L))
    assert(out.head.getAs[Double]("z") > 3.0)
  }
}
