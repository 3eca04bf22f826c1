package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream.Ev
import graft.streaming.QualityMonitor

/** Streaming data-quality monitor parity: the windowed constraint
  * metrics must equal the identical batch aggregation over the same
  * events; the stateful lifetime tallies must equal a driver-side
  * recomputation. */
class QualityMonitorSpec extends AnyFunSuite {
  import TestSpark._

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
  }

  test("windowed expectations match the batch aggregation on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(loadEvents())
    val q = QualityMonitor.windowedExpectations(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("qm_windowed").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("qm_windowed")
      .orderBy("window_start").collect().toSeq
    // identical math, batch path
    val batch = QualityMonitor.windowedExpectations(
        Tables.events(spark, Sf)
          .select("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("window_start").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("windowed expectations pass on the clean synthetic stream") {
    val batch = QualityMonitor.windowedExpectations(
        Tables.events(spark, Sf)
          .select("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
    assert(batch.nonEmpty)
    batch.foreach(r => assert(r.getAs[Boolean]("passed"), r.toString))
  }

  test("running per-type tallies equal a driver-side recomputation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = loadEvents()
    val input = MemoryStream[QualityMonitor.Rec]
    input.addData(evs.map(e => QualityMonitor.Rec(e.event_type, e.value)))
    val q = QualityMonitor.runningCounts(input.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("qm_running").start()
    q.processAllAvailable(); q.stop()
    // Update mode: the LAST row per key is the lifetime tally
    val got = spark.table("qm_running").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_range_violations")))
      .toMap
    val want = evs.groupBy(_.event_type).map { case (t, es) =>
      t -> (es.size.toLong,
            es.count(e => e.value < 0.0 || e.value > 10000.0).toLong)
    }
    assert(got === want)
  }

  test("a planted out-of-range batch flips the window verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, v: Double) = Ev(id,
      java.sql.Timestamp.valueOf("2024-06-01 01:00:00"), 1L, "click", v)
    val input = MemoryStream[Ev]
    input.addData(Seq(ev(1, 5.0), ev(2, 99999.0), ev(3, -3.0), ev(4, 7.0)))
    val q = QualityMonitor.windowedExpectations(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("qm_planted").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("qm_planted").collect()
    assert(rows.length === 1)
    assert(!rows.head.getAs[Boolean]("passed"))
    assert(rows.head.getAs[Double]("value_range_frac") === 0.5)
  }
}
