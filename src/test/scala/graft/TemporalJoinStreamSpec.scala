package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TemporalJoinStream
import graft.streaming.TemporalJoinStream.Tagged

/** Streaming temporal-join semantics: events see the latest dimension
  * version with ts ≤ event ts — in-batch ordering, cross-batch state
  * carry, stale-update rejection, and the no-history null. */
class TemporalJoinStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def dim(uid: Long, ts: Long, v: String) =
    Tagged(uid, ts, isDim = true, v, event_id = -1L, value = 0.0)
  private def ev(id: Long, uid: Long, ts: Long) =
    Tagged(uid, ts, isDim = false, null, event_id = id, value = 1.0)

  private def run(batches: Seq[Seq[Tagged]], name: String): Map[Long, Option[String]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val q = TemporalJoinStream.joined(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("dim_value"))).toMap
  }

  test("in-batch: an event sees the same-batch update at or before its ts") {
    val got = run(Seq(Seq(
      dim(1L, 100L, "v1"),
      ev(10L, 1L, 100L),  // equal ts: update visible (inclusive as-of)
      ev(11L, 1L, 50L),   // BEFORE the update: no history yet
      ev(12L, 1L, 200L))), "tj_inbatch")
    assert(got === Map(10L -> Some("v1"), 11L -> None, 12L -> Some("v1")))
  }

  test("cross-batch: state carries and advances with new versions") {
    val got = run(Seq(
      Seq(dim(1L, 100L, "v1"), ev(10L, 1L, 150L)),
      Seq(ev(11L, 1L, 160L)),                        // old state still held
      Seq(dim(1L, 200L, "v2"), ev(12L, 1L, 250L)),   // version advances
      Seq(ev(13L, 1L, 260L))), "tj_crossbatch")
    assert(got === Map(10L -> Some("v1"), 11L -> Some("v1"),
                       12L -> Some("v2"), 13L -> Some("v2")))
  }

  test("a stale late update never regresses the state") {
    val got = run(Seq(
      Seq(dim(1L, 200L, "v2"), ev(10L, 1L, 250L)),
      Seq(dim(1L, 100L, "v1"), ev(11L, 1L, 260L))), "tj_stale")
    assert(got === Map(10L -> Some("v2"), 11L -> Some("v2")),
      "the older-ts update must not overwrite the newer state")
  }

  test("keys without any dimension history enrich to null") {
    val got = run(Seq(Seq(dim(1L, 100L, "v1"), ev(10L, 2L, 150L))), "tj_nodim")
    assert(got === Map(10L -> None))
  }
}
