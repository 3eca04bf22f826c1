package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming similarity search — the stream-native twin of
  * similarity.Knn.topK: an unbounded stream of embedding vectors is
  * scored against a FIXED query set (a bounded model parameter, carried
  * in the closure like the literal codebooks of the batch ANN family),
  * and each query maintains a live top-k leaderboard of its nearest
  * neighbors seen so far.
  *
  * Scoring is per-row map-side work (|Q| cosines per incoming vector —
  * no join, no state), and the leaderboard is the existing
  * TopKStream bounded-heap state: O(|Q| × k) state forever, Update-mode
  * emission. This is the "match new documents against standing
  * queries" production shape (alerting, routing, dedup-against-catalog)
  * — the dual of batch retrieval, where queries stream and the corpus
  * stands. Rows-only per SURVEY §2.5 (streaming output has no SQL
  * oracle); AnnStreamSpec pins multi-batch results to the batch
  * brute-force top-k on the same rows.
  */
object AnnStream {

  case class Vec(vec_id: Long, embedding: Seq[Float])

  private[graft] def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    // a silent min-length truncation would score malformed stream
    // vectors with a plausible-looking number; surface them instead
    require(a.length == b.length,
      s"AnnStream.cosine: dimension mismatch ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Live top-k nearest stream vectors per standing query. */
  def nearest(vecs: Dataset[Vec], queries: Map[Long, Seq[Float]], k: Int)
      : Dataset[TopKStream.Leader] = {
    import vecs.sparkSession.implicits._
    val scored = vecs.flatMap { v =>
      queries.iterator.map { case (qid, qv) =>
        TopKStream.Scored(qid.toString, v.vec_id, cosine(qv, v.embedding))
      }
    }
    TopKStream.topKPerKey(scored, k)
  }
}
