package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.Ev

/** Structured Streaming parity: the streaming operators must agree with
  * their oracle-checked batch twins on the same sf0.001 events. */
class EventStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
  }

  test("streaming hourly window agg matches batch evt_window_hourly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(loadEvents())
    EventStream.runHourlyToMemory(spark, input.toDF(), "stream_hourly")
    val streamed = spark.table("stream_hourly")
      .select("hour", "event_type", "n", "sum_value")
      .orderBy("hour", "event_type").collect().toSeq
    val batch = operators.Events.windowHourly(spark, Sf)
      .select("hour", "event_type", "n", "sum_value")
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed === batch)
  }

  test("stateful sessionizer matches batch evt_sessionize") {
    import spark.implicits._
    // One micro-batch: per-user final state must equal the batch result.
    val ds = spark.createDataset(loadEvents())
    val streamed = EventStream.sessionize(ds)
      .toDF().orderBy("user_id").collect().toSeq
    val batch = operators.Events.sessionize(spark, Sf)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
      .orderBy("user_id").collect().toSeq
    assert(streamed === batch)
  }
}
