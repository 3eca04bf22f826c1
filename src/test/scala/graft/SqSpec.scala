package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-quantization (SQ8) ANN contracts — similarity/Knn.sq8TopK.
  * ann_sq8 is approximate by design (rows-only in the driver check), so
  * the invariants live here: a planted exact duplicate must win its
  * query, and the ADC score must sit within the analytic quantization
  * error bound of the true dot product. */
class SqSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val corpus = {
    val e = Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
    val dup = e.filter(col("vec_id") === 3L)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    e.union(dup)
  }
  private lazy val planted = similarity.Knn.sq8TopK(spark, corpus, 10).collect()

  test("planted duplicate attains the maximum ADC score for its query") {
    val q3 = planted.filter(_.getAs[Long]("query_id") == 3L)
    assert(q3.nonEmpty)
    val dupScore = q3.find(_.getAs[Long]("neighbor_id") == 9999L)
      .map(_.getAs[Double]("adc_score"))
    val maxScore = q3.map(_.getAs[Double]("adc_score")).max
    assert(dupScore.contains(maxScore),
      s"duplicate scored $dupScore, max was $maxScore")
  }

  test("ranks are contiguous 1..n per query and bounded by k") {
    planted.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.size.toLong))
      assert(ranks.size <= 10)
    }
  }

  test("ADC score sits within the analytic quantization error bound") {
    // Uniform 8-bit grid ⇒ per-dim reconstruction error ≤ step_d/2, so
    // |adc(q, dup-of-q) − q·q| ≤ Σ_d |q_d|·step_d/2. Recompute the grid
    // the operator fits and check the planted self-pair against it.
    import spark.implicits._
    val vecs = corpus.select(col("embedding")).as[Seq[Float]].collect()
    val dim = vecs.head.length
    val lo = (0 until dim).map(d => vecs.map(_(d)).min.toDouble)
    val hi = (0 until dim).map(d => vecs.map(_(d)).max.toDouble)
    val step = (0 until dim).map { d =>
      val s = (hi(d) - lo(d)) / 255.0; if (s == 0.0) 1.0 else s
    }
    val q = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding")).as[Seq[Float]].collect().head
    val trueDot = q.map(x => x.toDouble * x.toDouble).sum
    val bound = (0 until dim).map(d => math.abs(q(d).toDouble) * step(d) / 2).sum
    val adc = planted.filter(_.getAs[Long]("query_id") == 3L)
      .find(_.getAs[Long]("neighbor_id") == 9999L)
      .map(_.getAs[Double]("adc_score")).get
    assert(math.abs(adc - trueDot) <= bound + 1e-4, // 1e-4 = output rounding
      s"adc=$adc true=$trueDot bound=$bound")
  }
}
