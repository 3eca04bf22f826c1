package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.PretrainStream

object PretrainStreamSpec {
  case class Doc(doc_id: Long, lang: String, text: String)
}

/** The streaming pretrain chain must account EXACTLY what the batch
  * flagship accounts when the ingest is doc_id-ordered — gates, dedup
  * keeper choice, holdout coin, decontamination, all of it — across
  * micro-batching and re-delivery, with a held-out keeper suppressing
  * its whole duplicate group. */
class PretrainStreamSpec extends AnyFunSuite {
  import TestSpark._
  import PretrainStreamSpec.Doc

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("lang").collect().map(_.toString).toSeq

  private lazy val contaminated =
    dedup.Dedup.contamination(spark, TestSpark.Sf)
      .select(col("train_doc_id")).distinct()
      .localCheckpoint(true)

  test("ordered ingest over sf docs ≡ batch pretrainPipeline, exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("pretrainstream")

    val all = Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[Doc].collect().sortBy(_.doc_id).toSeq

    val input = MemoryStream[Doc]
    val q = PretrainStream.start(input.toDF(), contaminated, root)
    all.grouped(97).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val batchSide = rows(operators.TextOps.pretrainPipeline(spark, TestSpark.Sf))
    assert(rows(PretrainStream.accounting(spark, root)) === batchSide)

    // re-delivery of a committed epoch is a no-op
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    assert(!streaming.PretrainStream.processBatch(
      all.take(97).toDF(), contaminated, root, epoch = 0L))
    assert(rows(PretrainStream.accounting(spark, root)) === batchSide)
  }

  test("cross-batch duplicate content is accepted once, first arrival wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("pretrainxdup")

    // gate-passing and NON-repetitive: unique words + a few distinct
    // stopwords (a repeated stopword frame would trip the Gopher gate)
    val body = (0 until 40).map(j => s"word$j").mkString(" ") + " the of and a"
    val input = MemoryStream[Doc]
    val empty = spark.emptyDataset[Doc].select(col("doc_id").as("train_doc_id"))
    val q = PretrainStream.start(input.toDF(), empty, root)
    input.addData(Seq(Doc(10L, "en", body))); q.processAllAvailable()
    input.addData(Seq(Doc(3L, "en", body), Doc(11L, "fr", "short junk")))
    q.processAllAvailable()
    q.stop()

    val kept = PretrainStream.acceptedDocs(spark, root)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(10L)) // doc 3 is later-arriving duplicate content
  }

  test("compaction preserves accounting AND the dedup seen-set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("pretraincompact")

    def doc(i: Long) =
      Doc(i, "en",
        (0 until 40).map(j => s"c${i}w$j").mkString(" ") + " the of and a")

    val input = MemoryStream[Doc]
    val empty = spark.emptyDataset[Doc].select(col("doc_id").as("train_doc_id"))
    val q = PretrainStream.start(input.toDF(), empty, root)
    (0L until 3L).foreach { b =>
      input.addData(Seq(doc(b * 2), doc(b * 2 + 1)))
      q.processAllAvailable()
    }
    val before = rows(PretrainStream.accounting(spark, root))
    PretrainStream.compact(spark, root)
    assert(rows(PretrainStream.accounting(spark, root)) === before)
    // the seen-set survived: re-sent content (new id) is still suppressed
    input.addData(Seq(Doc(999L, "en", doc(0).text)))
    q.processAllAvailable()
    q.stop()
    assert(rows(PretrainStream.accounting(spark, root)) === before)
  }

  test("a held-out keeper suppresses its entire duplicate group") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("pretrainholdout")

    // find a doc_id in the holdout bucket (md5 first hex digit == f)
    // and a later id that is NOT held out, so suppression can only come
    // from the committed hash, not the second doc's own coin
    def coin(id: Long): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.charAt(0)
    val heldOut = (0L until 1000L).find(coin(_) == 'f').get
    val later = (heldOut + 1 until heldOut + 1000L).find(coin(_) != 'f').get
    val body = (0 until 40).map(j => s"token$j").mkString(" ") + " the of and a"

    val input = MemoryStream[Doc]
    val empty = spark.emptyDataset[Doc].select(col("doc_id").as("train_doc_id"))
    val q = PretrainStream.start(input.toDF(), empty, root)
    input.addData(Seq(Doc(heldOut, "en", body))); q.processAllAvailable()
    // same content arrives later under a non-held-out id: must stay out
    input.addData(Seq(Doc(later, "en", body)))
    q.processAllAvailable()
    q.stop()

    assert(PretrainStream.acceptedDocs(spark, root).count() === 0L)
  }
}
