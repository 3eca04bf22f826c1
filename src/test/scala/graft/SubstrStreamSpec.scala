package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.SubstrStream

object SubstrStreamSpec {
  case class Doc(doc_id: Long, text: String)
}

/** Streaming exact-substring dedup: spans measured against the corpus
  * SO FAR (incrementalSpansOn's contract made continuous) — a run first
  * seen in epoch N flags arrivals from epoch N+1 on, batch-internal
  * duplication stays out of scope, re-delivery is a no-op, and
  * compaction (which dedups the gram set) changes nothing probed. */
class SubstrStreamSpec extends AnyFunSuite {
  import TestSpark._
  import SubstrStreamSpec.Doc

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def words(prefix: String, n: Int) =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def spans(root: String): Set[(Long, Long, Long, Long)] =
    SubstrStream.spansSoFar(spark, root)
      .select("doc_id", "span_start", "span_end", "epoch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("spans flag against prior epochs only; the index grows on the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("substrstream")

    val runA = words("aa", 10)
    val runC = words("cc", 10)
    val input = MemoryStream[Doc]
    val q = SubstrStream.start(input.toDF(), root)

    // epoch 0: A introduces runA; E & F share a run INSIDE the batch
    val runEF = words("ef", 10)
    input.addData(Seq(
      Doc(1L, words("p", 3) + " " + runA),
      Doc(50L, runEF + " " + words("e", 3)),
      Doc(51L, runEF + " " + words("f", 3))))
    q.processAllAvailable()
    assert(spans(root).isEmpty) // nothing prior; batch-internal excluded

    // epoch 1: C quotes runA (prior) and introduces runC
    input.addData(Seq(Doc(2L, runC + " " + runA)))
    q.processAllAvailable()
    assert(spans(root) === Set((2L, 10L, 19L, 1L)))

    // epoch 2: D quotes runC (first seen in epoch 1) and runEF (epoch 0)
    input.addData(Seq(Doc(3L, runC + " zz0 " + runEF)))
    q.processAllAvailable()
    q.stop()
    assert(spans(root) === Set(
      (2L, 10L, 19L, 1L),
      (3L, 0L, 9L, 2L), (3L, 11L, 20L, 2L)))

    // re-delivery of a committed epoch is a no-op
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    assert(!SubstrStream.processBatch(
      Seq(Doc(2L, runC + " " + runA)).toDF(), root, epoch = 1L))
    val before = spans(root)

    // compaction: dedups grams, preserves spans and future probes
    SubstrStream.compact(spark, root)
    assert(spans(root) === before)
    assert(SubstrStream.processBatch(
      Seq(Doc(9L, runA)).toDF(), root, epoch = 3L))
    assert(spans(root).contains((9L, 0L, 9L, 3L)))
  }

  test("pregate epochs release their checkpointed positives — no " +
       "block accumulation across micro-batches") {
    import spark.implicits._
    val root = tmp("substrblocks")
    val runA = words("ba", 12)
    // epoch 0 commits grams + sidecar
    SubstrStream.processBatch(Seq(Doc(1L, runA)).toDF(), root, 0L,
      pregate = true, pregateMinKeys = 0L)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // epochs 1-3 probe with non-empty positives (each quotes runA)
    (1 to 3).foreach { ep =>
      SubstrStream.processBatch(
        Seq(Doc(ep + 1L, words(s"n$ep", 3) + " " + runA)).toDF(),
        root, ep.toLong, pregate = true, pregateMinKeys = 0L)
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "each epoch's eagerly-checkpointed positives must be released")
  }

  test("hashed wire: same ingest flags identical spans, index stores longs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val strRoot = tmp("substrstr")
    val khRoot = tmp("substrkh")

    val runA = words("aa", 10)
    val runC = words("cc", 10)
    val batches = Seq(
      Seq(Doc(1L, words("p", 3) + " " + runA)),
      Seq(Doc(2L, runC + " " + runA)),
      Seq(Doc(3L, runC + " zz0 " + runA)))
    // drive BOTH wire forms through the identical epoch sequence
    Seq((strRoot, false), (khRoot, true)).foreach { case (root, hashed) =>
      val input = MemoryStream[Doc]
      val q = SubstrStream.start(input.toDF(), root, hashed)
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
    }
    assert(spans(strRoot).nonEmpty)
    assert(spans(khRoot) === spans(strRoot))

    // the hashed index is 8-byte longs, never the gram string
    val grams = streaming.IndexMaintainStream.readTable(spark, khRoot, "grams")
    assert(grams.schema.fields.map(f => (f.name, f.dataType.typeName))
      .toSeq === Seq(("kh", "long")))

    // compaction under the hashed key preserves spans and future probes
    SubstrStream.compact(spark, khRoot, hashed = true)
    assert(spans(khRoot) === spans(strRoot))
    assert(SubstrStream.processBatch(
      Seq(Doc(9L, runA)).toDF(), khRoot, epoch = 3L, hashed = true))
    assert(spans(khRoot).contains((9L, 0L, 9L, 3L)))
  }

  test("established root keeps its committed wire form over a wrong flag") {
    import spark.implicits._
    val root = tmp("substrwire")
    val runA = words("aa", 10)

    // first batch of an empty root: the flag decides → hashed wire
    assert(SubstrStream.processBatch(
      Seq(Doc(1L, runA)).toDF(), root, epoch = 0L, hashed = true))

    // a misconfigured restart passes hashed=false — the committed gram
    // schema (kh) wins: the batch probes AND appends in the hashed form,
    // so the prior-epoch run is still flagged and the index stays longs
    assert(SubstrStream.processBatch(
      Seq(Doc(2L, words("q", 2) + " " + runA)).toDF(),
      root, epoch = 1L, hashed = false))
    assert(spans(root).contains((2L, 2L, 11L, 1L)))
    val grams = streaming.IndexMaintainStream.readTable(spark, root, "grams")
    assert(grams.schema.fields.map(f => (f.name, f.dataType.typeName))
      .toSeq === Seq(("kh", "long")))

    // compact with the wrong flag clusters on the ESTABLISHED key —
    // no analysis error, schema unchanged, future probes intact
    SubstrStream.compact(spark, root, hashed = false)
    assert(streaming.IndexMaintainStream.readTable(spark, root, "grams")
      .columns.toSeq === Seq("kh"))
    assert(SubstrStream.processBatch(
      Seq(Doc(3L, runA)).toDF(), root, epoch = 2L, hashed = false))
    assert(spans(root).contains((3L, 0L, 9L, 2L)))
  }

  test("verify fallback past InPushdownCap (broadcast semi branch) ≡ " +
       "naive probe, both wire forms") {
    import spark.implicits._
    // a 20-word repeated run → 13 confirmed gram keys in epoch 1; with
    // the cap lowered to 2 the positives collect overflows and the
    // verify takes the broadcast left-semi branch (never reached by
    // test-sized batches at the production cap of 10k)
    val runL = words("LL", 20)
    val batches = Seq(
      Seq(Doc(1L, runL)),
      Seq(Doc(2L, words("q", 2) + " " + runL), Doc(3L, words("n", 12))))
    val prior = SubstrStream.InPushdownCap
    try {
      SubstrStream.InPushdownCap = 2
      Seq(false, true).foreach { hashed =>
        val roots = Seq(true, false).map { pregate =>
          val root = tmp(s"substrcap$hashed$pregate")
          batches.zipWithIndex.foreach { case (b, ep) =>
            SubstrStream.processBatch(b.toDF(), root, ep.toLong, hashed,
              pregate, pregateMinKeys = 0L)
          }
          root
        }
        assert(spans(roots.head).contains((2L, 2L, 21L, 1L)),
          s"run must flag through the broadcast branch (hashed=$hashed)")
        assert(spans(roots.head) === spans(roots(1)),
          s"fallback must not change spans (hashed=$hashed)")
      }
    } finally SubstrStream.InPushdownCap = prior
  }

  test("bloom pregate ≡ naive probe; sidecar rides deltas; pre-bloom " +
       "deltas fall back exact") {
    import spark.implicits._
    val runA = words("aa", 10)
    val runC = words("cc", 10)
    val batches = Seq(
      Seq(Doc(1L, words("p", 3) + " " + runA)),
      Seq(Doc(2L, runC + " " + runA), Doc(10L, words("n", 12))),
      Seq(Doc(3L, runC + " zz0 " + runA)))

    // A/B: both wire forms, pregate vs naive — span sets identical
    Seq(false, true).foreach { hashed =>
      val roots = Seq(true, false).map { pregate =>
        val root = tmp(s"substrab$hashed$pregate")
        batches.zipWithIndex.foreach { case (b, ep) =>
          // minKeys = 0: force the labeled arm — the default state
          // gate would (correctly) pick naive at test-sized state
          SubstrStream.processBatch(b.toDF(), root, ep.toLong, hashed,
            pregate, pregateMinKeys = 0L)
        }
        root
      }
      assert(spans(roots.head).nonEmpty)
      assert(spans(roots.head) === spans(roots(1)),
        s"pregate must not change spans (hashed=$hashed)")
    }

    // sidecar presence + pre-bloom fallback (hashed form)
    val root = tmp("substrbloomfb")
    batches.zipWithIndex.foreach { case (b, ep) =>
      SubstrStream.processBatch(b.toDF(), root, ep.toLong, hashed = true,
        pregateMinKeys = 0L)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    Seq(0, 1, 2).foreach { ep =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/batch=$ep/bloom")), s"epoch $ep delta must carry a bloom")
    }
    // a pre-upgrade delta loses its sidecar: its grams must still probe
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/batch=0/bloom"), true)
    assert(SubstrStream.processBatch(
      Seq(Doc(9L, runA)).toDF(), root, epoch = 3L, hashed = true,
      pregateMinKeys = 0L))
    assert(spans(root).contains((9L, 0L, 9L, 3L)),
      "a run known only to the bloom-less delta must still flag")
    // compaction rebuilds ONE bloom over the folded gram set
    SubstrStream.compact(spark, root, hashed = true)
    val cbatch = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("cbatch=")).head
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/$cbatch/bloom")))
    assert(SubstrStream.processBatch(
      Seq(Doc(11L, runC)).toDF(), root, epoch = 4L, hashed = true,
      pregateMinKeys = 0L))
    assert(spans(root).contains((11L, 0L, 9L, 4L)),
      "the compacted bloom + clustered grams must still probe")
  }
}
