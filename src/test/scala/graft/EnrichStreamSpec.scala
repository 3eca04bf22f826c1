package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EnrichStream
import graft.streaming.EventStream.Ev

/** Stream-static join parity: per-micro-batch enrichment must equal
  * the identical batch join, keep unmatched facts (left join), and
  * pick up dimension refreshes on the next trigger. */
class EnrichStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
  }

  test("streaming enrichment matches the batch left join row for row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(loadEvents())
    val dim = Tables.customer(spark, Sf)
    val q = EnrichStream.enrich(input.toDF(), dim)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enrich_stream")
      .select("event_id", "user_id", "customer_name", "nation_key")
      .orderBy("event_id").collect().toSeq
    val batch = EnrichStream.enrich(
        Tables.events(spark, Sf)
          .select("event_id", "ts", "user_id", "event_type", "value"), dim)
      .select("event_id", "user_id", "customer_name", "nation_key")
      .orderBy("event_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("unmatched events keep NULL dimension columns instead of dropping") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long) = Ev(id,
      java.sql.Timestamp.valueOf("2024-06-01 01:00:00"), uid, "click", 1.0)
    val input = MemoryStream[Ev]
    input.addData(Seq(ev(1, 1L), ev(2, 999999999L))) // uid 999999999 has no dim row
    val q = EnrichStream.enrich(input.toDF(), Tables.customer(spark, Sf))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_nulls").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enrich_nulls").orderBy("event_id").collect()
    assert(rows.length === 2, "left join must not drop facts")
    assert(!rows(0).isNullAt(rows(0).fieldIndex("customer_name")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("customer_name")))
  }

  test("the static plan is a snapshot: a temp-view swap is NOT visible mid-stream") {
    // Pins the semantics a user must know: the static side's plan is
    // bound when the stream STARTS — swapping the temp view underneath
    // does not rebind it. Refreshable dimensions need a table format
    // with snapshot-per-batch semantics (a lake table), not a view swap.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long) = Ev(id,
      java.sql.Timestamp.valueOf("2024-06-01 01:00:00"), uid, "click", 1.0)
    Seq((7L, "early-cust", 1)).toDF("c_custkey", "c_name", "c_nationkey")
      .createOrReplaceTempView("dim_live")
    val input = MemoryStream[Ev]
    val q = EnrichStream.enrich(input.toDF(), spark.table("dim_live"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_refresh").start()
    input.addData(Seq(ev(1, 7L), ev(2, 8L)))
    q.processAllAvailable()
    Seq((7L, "early-cust", 1), (8L, "late-cust", 2))
      .toDF("c_custkey", "c_name", "c_nationkey")
      .createOrReplaceTempView("dim_live")
    input.addData(Seq(ev(3, 8L)))
    q.processAllAvailable(); q.stop()
    val byId = spark.table("enrich_refresh").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("customer_name"))).toMap
    assert(byId(1L) === Some("early-cust"))
    assert(byId(2L) === None)
    assert(byId(3L) === None,
      "the swapped view must NOT be visible — the plan is a snapshot")
  }
}
