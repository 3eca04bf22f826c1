package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream
import graft.streaming.EventStream.Ev

/** Streaming PSI drift monitor: streamed windows must equal the
  * identical batch aggregation; a planted concentrated window must
  * cross the act threshold while in-distribution windows stay ok. */
class DriftStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(h: Int, i: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:00:${i % 60}%02d")

  // reference distribution: values spread uniformly over all buckets
  private def refValues(n: Int): Seq[Double] =
    (0 until n).map(i => (i % 6) * 2000.0 + 400.0 + (i % 7) * 100.0)

  private def mkEv(id: Long, t: Timestamp, v: Double): Ev =
    Ev(id, t, id % 50, "view", v)

  test("streamed PSI equals batch; planted shift alerts, clean window ok") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ref = refValues(600).toDF("value")
    val baseline = DriftStream.baselineFromStatic(ref)
    assert(math.abs(baseline.sum - 1.0) < 1e-9)

    // window A (00:00-06:00): in-distribution; window B (06:00-12:00):
    // every value in bucket 0 — a collapsed mix that must page
    val evs =
      refValues(300).zipWithIndex.map { case (v, i) =>
        mkEv(i.toLong, ts(1, i), v) } ++
      (0 until 300).map(i => mkEv(1000L + i, ts(7, i), 123.0))

    val input = MemoryStream[Ev]
    input.addData(evs)
    val q = DriftStream.windowedPsi(input.toDF(), baseline)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("drift_w").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("drift_w")
      .orderBy("window_start").collect().toSeq

    // parity with the identical batch aggregation
    val batch = DriftStream.windowedPsi(evs.toDF(), baseline)
      .orderBy("window_start").collect().toSeq
    assert(streamed === batch)

    assert(streamed.size === 2)
    val Seq(clean, shifted) = streamed
    assert(clean.getAs[String]("alert") === "ok",
      s"in-distribution window flagged: $clean")
    assert(shifted.getAs[String]("alert") === "act",
      s"collapsed window not flagged: $shifted")
    assert(shifted.getAs[Double]("psi") > clean.getAs[Double]("psi"))
  }
}
