package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopKStream
import graft.streaming.TopKStream.{Leader, Scored}

/** The streaming leaderboard must converge to the batch TopKPerKey
  * answer on the same rows, regardless of how the stream is batched. */
class TopKStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val rows = Seq(
    Scored("a", 1L, 5.0), Scored("a", 2L, 9.0), Scored("a", 3L, 1.0),
    Scored("a", 4L, 9.0), // tie with id 2 -> lower id first
    Scored("b", 5L, 2.0), Scored("b", 6L, 7.0),
    Scored("a", 7L, 6.0), Scored("b", 8L, 3.0), Scored("b", 9L, 8.0))

  /** Drive batches through the stream, returning (batchId, leader)
    * pairs in commit order via foreachBatch. */
  private def run(batches: Seq[Seq[Scored]], k: Int): Seq[(Long, Leader)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = scala.collection.mutable.ArrayBuffer[(Long, Leader)]()
    val input = MemoryStream[Scored]
    val q = TopKStream.topKPerKey(input.toDS(), k).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Leader], id: Long) =>
        out.synchronized { out ++= df.collect().map(id -> _) }; ()
      }
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    out.toSeq
  }

  test("multi-batch streaming top-2 matches batch TopKPerKey") {
    import spark.implicits._
    // final standing per (key, rank) = the latest batch's emission
    val streamed = run(rows.grouped(3).toSeq, 2)
      .sortBy(_._1)
      .map { case (_, l) => (l.key, l.rank) -> (l.id, l.score) }
      .toMap
    val batchTop = graft.plans.TopKPerKey(
        rows.toDF("key", "id", "score"), "key", "score", 2,
        tiebreak = Some("id"))
      .collect()
      .map(r => (r.getAs[String]("key"),
        (r.getAs[Long]("id"), r.getAs[Double]("score"))))
      .groupBy(_._1)
      .map { case (key, vs) =>
        key -> vs.map(_._2).sortBy { case (id, s) => (-s, id) }.toSeq }
    assert(batchTop.nonEmpty)
    batchTop.foreach { case (key, expected) =>
      expected.zipWithIndex.foreach { case ((id, score), i) =>
        assert(streamed((key, i + 1)) == ((id, score)),
          s"key=$key rank=${i + 1}")
      }
    }
  }

  test("state stays bounded: a 100-row hot key emits exactly k rows") {
    val emitted = run(Seq((1 to 100).map(i => Scored("hot", i.toLong, i.toDouble))), 2)
    assert(emitted.map(_._2).map(l => (l.id, l.rank)).toSet ==
      Set((100L, 1), (99L, 2)))
  }
}
