package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.LakeSink
import graft.streaming.EventStream.Ev
import graft.streaming.UpsertSink

/** End-to-end ingestion path: stream → merge-by-key upsert table →
  * hive-partitioned lake with pruned reads — the full landing pipeline
  * a production deployment runs, wired from the already-spec'd pieces. */
class IngestionPipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("stream → upsert merge → partitioned lake lands exactly-once rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq.take(100)
    val dir = Files.createTempDirectory("ingest_e2e").toFile.getPath
    val tablePath = s"$dir/merged"

    val input = MemoryStream[Ev]
    val q = UpsertSink.start(input.toDF(), tablePath, "event_id", "ts")
    input.addData(evs)
    q.processAllAvailable()
    input.addData(evs.take(50)) // at-least-once re-delivery of old keys
    q.processAllAvailable()
    q.stop()

    val merged = spark.read.parquet(tablePath)
    assert(merged.count() === 100) // upsert kept one row per key
    assert(merged.select("event_id").distinct().count() === 100)

    LakeSink.writeMonthlyPartitioned(merged, "ts", s"$dir/lake")
    val jan = LakeSink.readMonth(spark, s"$dir/lake", "2024-01")
    assert(jan.count() === 100) // the synthetic feed is all January 2024
    // the month filter prunes partition directories, not data rows: no
    // data filter survives into the scan
    val plan = jan.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedFilters: [IsNotNull(part_month)"), plan)
  }
}
