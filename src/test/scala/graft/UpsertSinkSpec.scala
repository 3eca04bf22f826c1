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
}
