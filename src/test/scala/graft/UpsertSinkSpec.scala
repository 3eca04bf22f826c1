package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.UpsertSink

class UpsertSinkSpec extends AnyFunSuite {
  import TestSpark._

  case class Rec(id: Long, version: Long, payload: String)

  test("streamed micro-batches upsert by key, newest version wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft_upsert").toString + "/t"
    val input = MemoryStream[Rec]
    val q = UpsertSink.start(input.toDF(), path, "id", "version")

    input.addData(Rec(1, 1, "a"), Rec(2, 1, "b"))
    q.processAllAvailable()
    input.addData(Rec(2, 2, "b2"), Rec(3, 1, "c"))
    q.processAllAvailable()
    input.addData(Rec(2, 1, "stale-late-arrival"))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("version"),
                           r.getAs[String]("payload"))).toSeq
    assert(got === Seq((1L, 1L, "a"), (2L, 2L, "b2"), (3L, 1L, "c")))
  }

  /** Failure injection for the staged-swap commit protocol: construct
    * each crash state the swap can die in, restart (= call mergeBatch
    * again with the micro-batch the checkpoint would re-deliver), and
    * prove the table comes back with neither loss nor duplicates. */
  test("mid-swap crash + re-delivered batch recovers exactly-once") {
    import spark.implicits._
    // sorted Seq, not Set: a duplicated row must FAIL the compare
    def rows(path: String): Seq[(Long, Long, String)] =
      spark.read.parquet(path).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("version"),
                   r.getAs[String]("payload"))).toSeq.sorted

    val path = Files.createTempDirectory("graft_upsert_crash").toString + "/t"
    val batchA = Seq((1L, 1L, "a"), (2L, 1L, "b"))
      .toDF("id", "version", "payload")
    val batchB = Seq((2L, 2L, "b2"), (3L, 1L, "c"))
      .toDF("id", "version", "payload")
    val want = Seq((1L, 1L, "a"), (2L, 2L, "b2"), (3L, 1L, "c"))

    UpsertSink.mergeBatch(spark, path, batchA, "id", "version")
    UpsertSink.mergeBatch(spark, path, batchB, "id", "version")
    assert(rows(path) === want)

    val dst = new java.io.File(path)
    val staging = new java.io.File(path + "_staging")
    val backup = new java.io.File(path + "_bak")

    // crash state 1: died between rename(dst->backup) and
    // rename(staging->dst) — dst ABSENT, completed staging (with
    // _SUCCESS) + backup both present. Restart must roll FORWARD to
    // the completed copy, and the re-delivered batch must not dup.
    assert(dst.renameTo(staging)) // staging := the completed merged table
    // backup := some older table state (batch-A-only)
    UpsertSink.mergeBatch(spark, backup.getPath, batchA, "id", "version")
    assert(!dst.exists() && new java.io.File(staging, "_SUCCESS").exists())
    UpsertSink.mergeBatch(spark, path, batchB, "id", "version")
    assert(rows(path) === want, "roll-forward recovery lost or duped rows")
    assert(!staging.exists() && !backup.exists())

    // crash state 2: died DURING the staging write — dst absent,
    // staging incomplete (no _SUCCESS), backup holds the table.
    // Restart must roll BACK, ignore the torn staging copy, and the
    // re-delivered batch must restore the full state.
    assert(dst.renameTo(backup))
    staging.mkdirs()
    java.nio.file.Files.writeString(
      staging.toPath.resolve("part-torn.parquet"), "torn write")
    UpsertSink.mergeBatch(spark, path, batchB, "id", "version")
    assert(rows(path) === want, "roll-back recovery lost or duped rows")
    assert(!staging.exists() && !backup.exists())

    // crash state 3: died after the staging write but BEFORE any
    // rename — dst still live, stale completed staging lying around.
    // Restart must clear it and merge normally.
    UpsertSink.mergeBatch(spark, staging.getPath, batchA, "id", "version")
    assert(new java.io.File(staging, "_SUCCESS").exists())
    UpsertSink.mergeBatch(spark, path, batchB, "id", "version")
    assert(rows(path) === want, "stale-staging restart lost or duped rows")
    assert(!staging.exists() && !backup.exists())
  }
}
