package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FreqItemsStream
import graft.streaming.FreqItemsStream.{Candidate, Item}

/** The sharded streaming Misra–Gries sketch must keep the superset
  * guarantee — every item with global frequency > N/k survives —
  * across any batching of the stream, with state bounded by
  * shards × (k−1). */
class FreqItemsStreamSpec extends AnyFunSuite {
  import TestSpark._

  /** Drive batches through the stream; return the LAST emission per
    * (shard, item) — update-mode standings. */
  private def run(batches: Seq[Seq[Item]], k: Int, shards: Int): Map[String, Long] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = scala.collection.mutable.ArrayBuffer[(Long, Candidate)]()
    val input = MemoryStream[Item]
    val q = FreqItemsStream.freqItems(input.toDS(), k, shards).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Candidate], id: Long) =>
        out.synchronized { out ++= df.collect().map(id -> _) }; ()
      }
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    // a shard's later emission replaces its earlier one wholesale, so
    // keep only items present in the shard's LAST emitting batch
    val lastBatchOfShard = out.groupBy(_._2.shard)
      .map { case (s, rows) => s -> rows.map(_._1).max }
    out.collect {
      case (bid, c) if bid == lastBatchOfShard(c.shard) => c.item -> c.min_count
    }.toMap
  }

  test("superset guarantee holds across batches and shardings") {
    val rnd = new Random(11)
    // Zipf-ish: item_i appears 4000/i times
    val stream = rnd.shuffle((1 to 30).flatMap(i => Seq.fill(4000 / i)(s"item_$i")))
    val n = stream.size
    val k = 8
    val exactHot = stream.groupBy(identity)
      .collect { case (it, occ) if occ.size.toLong * k > n => it }.toSet
    assert(exactHot.nonEmpty)
    for (shards <- Seq(1, 4); nBatches <- Seq(1, 5)) {
      val batches = stream.grouped((n + nBatches - 1) / nBatches)
        .map(_.map(Item)).toSeq
      val candidates = run(batches, k, shards)
      assert(candidates.size <= shards * (k - 1),
        s"shards=$shards batches=$nBatches: state overflow")
      assert(exactHot.subsetOf(candidates.keySet),
        s"shards=$shards batches=$nBatches: missing ${exactHot -- candidates.keySet}")
    }
  }

  test("min_count is a lower bound on the true frequency") {
    val stream = (1 to 40).flatMap(i => Seq.fill(i * 5)(s"w$i"))
    val exact = stream.groupBy(identity).map { case (it, occ) => it -> occ.size.toLong }
    val candidates = run(Seq(stream.map(Item)), 10, 2)
    candidates.foreach { case (item, lo) =>
      assert(lo <= exact(item), s"$item: $lo > ${exact(item)}")
    }
  }
}
