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

  test("continuous ingestion: micro-batch appends then in-place partition compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq.take(90)
    val dir = Files.createTempDirectory("ingest_loop").toFile.getPath
    val lake = s"$dir/lake"

    // the landing job: every micro-batch appends to the lake
    val input = MemoryStream[Ev]
    val q = input.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        LakeSink.appendMonthlyPartitioned(df, "ts", lake); ()
      }
      .start()
    evs.grouped(10).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val expected = evs.map(_.event_id).toSet
    val (before, after) =
      LakeSink.compactPartition(spark, lake, "2024-01", targetFileMB = 128)
    // 9 micro-batches left >= 9 small files; tiny data folds to 1
    assert(before >= 9, s"expected small-file buildup, saw $before")
    assert(after === 1, s"expected size-derived single file, saw $after")
    // content survives the staged swap bit-for-bit...
    val back = LakeSink.readMonth(spark, lake, "2024-01")
    assert(back.count() === 90)
    assert(back.select("event_id").as[Long].collect().toSet === expected)
    // ...and the partition-pruned read path still prunes
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedFilters: [IsNotNull(part_month)"), plan)
  }
}
