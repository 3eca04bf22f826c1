package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SampleStream

/** Top-level for encoder derivation (see PiiMonitorSpec). */
case class SampleDoc(ts: Timestamp, doc_id: Long, text: String)

/** The streaming sampler's contract is determinism: the kept set is a
  * pure function of the data — equal to the batch computation and
  * invariant under micro-batch boundary placement (the property a
  * rand()-based sampler fails twice). */
class SampleStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(n: Int): Seq[SampleDoc] =
    (1 to n).map { i =>
      SampleDoc(Timestamp.valueOf(s"2024-02-0${1 + (i % 2)} ${"%02d".format((i * 5) % 24)}:30:00"),
        i.toLong, s"doc $i") }

  private def runStream(data: Seq[Seq[SampleDoc]], name: String,
                        f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: OutputMode = OutputMode.Append) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SampleDoc]
    val q = f(input.toDF()).writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    data.foreach { batch => input.addData(batch); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("streamed sample equals the batch sample row for row") {
    import spark.implicits._
    val d = docs(400)
    val streamed = runStream(Seq(d), "samp_all", SampleStream.sampleStream(_))
      .orderBy("doc_id").collect().toSeq
    val batch = SampleStream.sampleStream(d.toDF()).orderBy("doc_id").collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // genuinely a sample: strictly between 0 and all
    assert(streamed.size > 0 && streamed.size < d.size)
  }

  test("kept set is invariant under micro-batch boundary placement") {
    val d = docs(400)
    val oneBatch = runStream(Seq(d), "samp_one", SampleStream.sampleStream(_))
      .orderBy("doc_id").collect().toSeq
    val chopped = runStream(d.grouped(37).toSeq, "samp_chop", SampleStream.sampleStream(_))
      .orderBy("doc_id").collect().toSeq
    assert(oneBatch === chopped)
  }

  test("split routing matches the batch bands and covers every row exactly once") {
    import spark.implicits._
    val d = docs(400)
    val routed = runStream(Seq(d), "split_route", SampleStream.splitStream(_))
    assert(routed.count() === d.size.toLong)
    val bySplit = routed.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // 13/1/2 bands: train must dominate
    assert(bySplit("train") > bySplit("test") && bySplit("test") > 0L)
    // identical to the batch assignment
    val batch = SampleStream.splitStream(d.toDF())
      .orderBy("doc_id").collect().toSeq
    assert(routed.orderBy("doc_id").collect().toSeq === batch)
  }

  test("windowed rate audit matches batch and flags a degenerate id space") {
    import spark.implicits._
    val d = docs(400)
    val streamed = runStream(Seq(d), "rate_ok_t",
      SampleStream.windowedRateAudit(_), OutputMode.Complete)
      .orderBy("window_start").collect().toSeq
    val batch = SampleStream.windowedRateAudit(d.toDF())
      .orderBy("window_start").collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // constant ids -> every row gets the same coin -> rate 0 or 1,
    // far outside tol: the audit must page
    val degenerate = d.map(_.copy(doc_id = 7L))
    val rows = runStream(Seq(degenerate), "rate_degen",
      SampleStream.windowedRateAudit(_), OutputMode.Complete).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(!r.getAs[Boolean]("rate_ok"), r.toString))
  }

  test("sample and split plans are stateless — no state store operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SampleDoc]
    input.addData(docs(50))
    val q = SampleStream.splitStream(SampleStream.sampleStream(input.toDF()))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("samp_stateless").start()
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    assert(progress.stateOperators.isEmpty,
      s"sampler must hold no state: ${progress.prettyJson}")
  }
}
