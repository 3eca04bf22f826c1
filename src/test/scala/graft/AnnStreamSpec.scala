package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AnnStream
import graft.streaming.AnnStream.Vec
import graft.streaming.TopKStream.Leader

/** The streaming standing-query leaderboard must converge to the batch
  * brute-force top-k on the same vectors, however the stream is
  * batched. */
class AnnStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("dimension-mismatched vectors are surfaced, not silently scored") {
    val e = intercept[IllegalArgumentException] {
      AnnStream.cosine(Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))
    }
    assert(e.getMessage.contains("dimension mismatch"))
    assert(AnnStream.cosine(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)) === 1.0)
  }

  test("multi-batch streaming top-3 per standing query matches batch brute force") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(5)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val corpus = (1L to 60L).map(i => Vec(i, vec()))
    val queries = Map(100L -> vec(), 200L -> vec())
    val k = 3

    val out = scala.collection.mutable.ArrayBuffer[(Long, Leader)]()
    val input = MemoryStream[Vec]
    val q = AnnStream.nearest(input.toDS(), queries, k).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Leader], id: Long) =>
        out.synchronized { out ++= df.collect().map(id -> _) }; ()
      }
      .start()
    corpus.grouped(17).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    // latest emission per (query, rank)
    val streamed = out.sortBy(_._1)
      .map { case (_, l) => (l.key, l.rank) -> l.id }.toMap
    queries.foreach { case (qid, qv) =>
      val expected = corpus.map(v => (v.vec_id, cosine(qv, v.embedding)))
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
      expected.zipWithIndex.foreach { case (id, i) =>
        assert(streamed((qid.toString, i + 1)) === id,
          s"query $qid rank ${i + 1}")
      }
    }
  }
}
