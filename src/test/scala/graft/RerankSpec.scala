package graft

import org.scalatest.funsuite.AnyFunSuite

/** Two-stage retrieval contract: the exact rerank of an ANN shortlist
  * (a) reports TRUE cosine scores (not ADC approximations), and (b) its
  * overlap with the exact brute-force top-k dominates the raw ADC
  * ordering of the same shortlist — selecting by true cosine from a
  * shortlist is the best any k-subset of it can do. */
class RerankSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.col

  test("rerank scores are exact and dominate raw ADC ordering") {
    val exact = similarity.Knn.topK(spark, Sf)
      .filter(col("rank") <= 5).collect()
    val exactSets = exact.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exactScores = exact.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap

    val rr = similarity.Knn.rerank(spark, Sf).collect()
    assert(rr.nonEmpty)
    // (a) any reranked pair that IS in the exact top-5 carries the
    // identical exact cosine (both paths round to 4 decimals)
    rr.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactScores.get(key).foreach { s =>
        assert(r.getAs[Double]("cos_sim") === s, s"score drift for $key")
      }
    }
    // (b) recall@5 of rerank >= recall@5 of taking the ADC top-5 raw
    def recall(pairs: Map[Long, Set[Long]]): Int =
      pairs.map { case (q, s) => exactSets(q).intersect(s).size }.sum
    val rrSets = rr.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
    val adcTop5 = similarity.Knn.pqTopK(spark, e, 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(recall(rrSets) >= recall(adcTop5),
      s"rerank recall ${recall(rrSets)} < ADC-top5 recall ${recall(adcTop5)}")
  }
}
