package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PiiMonitor

/** Top-level so Spark can derive its encoder (inner classes capture the
  * suite's scope and the analyzer rejects them). */
case class PiiDoc(ts: Timestamp, doc_id: Long, text: String)

/** Streaming PII layer parity: the stateless scrub and the windowed
  * incidence monitor must equal the identical batch computation over
  * the same rows (the operators are the SAME Catalyst expressions, so
  * inequality would mean the streaming planner changed semantics). */
class PiiMonitorSpec extends AnyFunSuite {
  import TestSpark._

  

  /** PII-bearing docs: the batch entries' derived notes, spread over a
    * two-day synthetic event-time axis (4 windows' worth). */
  private def loadDocs(): Seq[PiiDoc] = {
    import spark.implicits._
    operators.Pii.notes(spark, Sf)
      .select(col("c_custkey"), col("note")).as[(Long, String)]
      .collect().toSeq
      .map { case (k, note) =>
        PiiDoc(Timestamp.valueOf(s"2024-01-0${1 + (k % 2)} ${"%02d".format((k * 7) % 24)}:15:00"),
            k, note) }
  }

  test("streamed scrub equals the batch scrub row for row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = loadDocs()
    val input = MemoryStream[PiiDoc]
    input.addData(docs)
    val q = PiiMonitor.scrubStream(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pii_scrub_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("pii_scrub_stream")
      .orderBy("doc_id").collect().toSeq
    val batch = PiiMonitor.scrubStream(docs.toDF())
      .orderBy("doc_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streamed scrub leaves no residual PII and counts what it removed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PiiDoc]
    input.addData(loadDocs())
    val q = PiiMonitor.scrubStream(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pii_scrub_resid").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("pii_scrub_resid")
    val pats = Seq(operators.Pii.PhonePat, operators.Pii.SsnPat,
                   operators.Pii.EmailPat, operators.Pii.IpPat)
    pats.foreach { p =>
      assert(out.filter(
        size(regexp_extract_all(col("text_redacted"), lit(p), lit(0))) > 0)
        .count() === 0L, s"residual $p")
    }
    // every doc in the fixture carries at least the phone token
    assert(out.filter(col("pii_found") < 1L).count() === 0L)
  }

  test("windowed incidence matches the batch aggregation and alerts on a leak") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = loadDocs()
    val input = MemoryStream[PiiDoc]
    input.addData(docs)
    val q = PiiMonitor.windowedIncidence(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("pii_windowed").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("pii_windowed")
      .orderBy("window_start").collect().toSeq
    val batch = PiiMonitor.windowedIncidence(docs.toDF())
      .orderBy("window_start").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // the note fixture is 100% PII-bearing: every window must page
    streamed.foreach(r => assert(r.getAs[Boolean]("alert"), r.toString))
  }

  test("a clean stream stays quiet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = loadDocs().map(d => d.copy(
      text = d.text.replaceAll("[0-9]", "x").replaceAll("@", " at ")))
    val input = MemoryStream[PiiDoc]
    input.addData(clean)
    val q = PiiMonitor.windowedIncidence(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("pii_quiet").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("pii_quiet").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_with_pii") === 0L)
      assert(!r.getAs[Boolean]("alert"))
    }
  }

  test("the scrub stream plan is stateless — no state store operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PiiDoc]
    input.addData(loadDocs().take(5))
    val q = PiiMonitor.scrubStream(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pii_stateless").start()
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    // a stateless projection registers zero stateful operators
    assert(progress.stateOperators.isEmpty,
      s"scrub must hold no state: ${progress.prettyJson}")
  }
}
