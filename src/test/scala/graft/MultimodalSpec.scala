package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.BinaryPipeline

/** The image/audio decode paths run REAL JDK codecs (ImageIO PNG,
  * sampled-audio WAV). Payloads are synthesized from closed-form pixel/
  * sample formulas, so the decoded features have exact (image — PNG is
  * lossless) or tight-tolerance (audio — sine identities) expectations
  * computed here independently of the pipeline. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("PNG decode reproduces the closed-form channel means exactly") {
    val rows = BinaryPipeline.imageFeatures(spark, Sf).collect()
    assert(rows.length === 500)
    def r4(v: Double) = math.floor(v * 10000 + 0.5) / 10000
    rows.take(25).foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("width") === 8 && r.getAs[Int]("height") === 8)
      // expected channel means straight from the pixel formula
      def mean(mul: Long, cx: Long, cy: Long): Double =
        (for { y <- 0 until 8; x <- 0 until 8 }
          yield ((d * mul + cx * x + cy * y) % 256).toDouble).sum / 64.0
      val (er, eg, eb) = (mean(31, 7, 13), mean(17, 11, 3), mean(23, 5, 19))
      assert(r.getAs[Double]("mean_r") === r4(er), s"doc $d mean_r")
      assert(r.getAs[Double]("mean_g") === r4(eg), s"doc $d mean_g")
      assert(r.getAs[Double]("mean_b") === r4(eb), s"doc $d mean_b")
      assert(r.getAs[Double]("mean_luma") ===
        r4(0.299 * er + 0.587 * eg + 0.114 * eb), s"doc $d luma")
    }
  }

  test("Y4M video decode reproduces the closed-form luma sums exactly") {
    val rows = BinaryPipeline.features(spark, Sf).collect()
    assert(rows.length === 500)
    rows.take(25).foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val frames = 3 + d % 5
      assert(r.getAs[Int]("width") === 8 && r.getAs[Int]("height") === 8)
      assert(r.getAs[Long]("n_frames") === frames)
      assert(r.getAs[Long]("duration_ms") === frames * 40) // 25 fps exact
      // container size from the format grammar: 35-byte header + per
      // frame a 6-byte marker and raw Y+Cb+Cr planes (C444 even ids
      // → 3·64 bytes, C420 odd → 64 + 2·16)
      val planes = if (d % 2 == 0) 192 else 96
      assert(r.getAs[Long]("n_bytes") === 35 + frames * (6 + planes))
      // luma mass + motion straight from the pixel formula
      def yv(x: Int, y: Int, f: Long): Long = (d * 31 + 7 * x + 13 * y + 29 * f) % 256
      val px = for { f <- 0L until frames; y <- 0 until 8; x <- 0 until 8 }
        yield (x, y, f)
      assert(r.getAs[Long]("sum_luma") === px.map { case (x, y, f) => yv(x, y, f) }.sum)
      assert(r.getAs[Long]("motion_abs") ===
        px.filter(_._3 > 0).map { case (x, y, f) =>
          math.abs(yv(x, y, f) - yv(x, y, f - 1)) }.sum, s"doc $d motion")
    }
  }

  test("Y4M parser: defaults, frame parameters, and malformed containers") {
    def y4m(header: String, frames: Array[Byte]*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write((header + "\n").getBytes("US-ASCII"))
      frames.foreach(bos.write)
      bos.toByteArray
    }
    def frame(marker: String, planeBytes: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write((marker + "\n").getBytes("US-ASCII"))
      bos.write(Array.fill(planeBytes)(10.toByte))
      bos.toByteArray
    }
    // absent C parameter defaults to 4:2:0 (4×4 chroma planes at 8×8),
    // and FRAME markers may carry parameters
    val dflt = BinaryPipeline.decodeY4m(0L,
      y4m("YUV4MPEG2 W8 H8 F30:1", frame("FRAME Xinterlaced", 64 + 32)))
    assert(dflt.n_frames === 1L && dflt.sum_luma === 640L)
    assert(dflt.duration_ms === 33L) // 1 frame at 30 fps, integer ms
    // 4:2:2 geometry: half-width full-height chroma
    val c422 = BinaryPipeline.decodeY4m(0L,
      y4m("YUV4MPEG2 W8 H8 F25:1 C422", frame("FRAME", 64 + 64)))
    assert(c422.n_frames === 1L)
    // malformed inputs throw, never mis-decode
    intercept[IllegalArgumentException] { // bad magic
      BinaryPipeline.decodeY4m(0L, y4m("RIFFXXXX W8 H8 F25:1"))
    }
    intercept[IllegalArgumentException] { // truncated frame payload
      BinaryPipeline.decodeY4m(0L,
        y4m("YUV4MPEG2 W8 H8 F25:1 C444", frame("FRAME", 100)))
    }
    intercept[IllegalArgumentException] { // unknown colorspace
      BinaryPipeline.decodeY4m(0L, y4m("YUV4MPEG2 W8 H8 F25:1 Cmono"))
    }
    intercept[IllegalArgumentException] { // missing frame rate
      BinaryPipeline.decodeY4m(0L, y4m("YUV4MPEG2 W8 H8"))
    }
  }

  test("WAV decode recovers sine RMS and zero-crossing rate") {
    val rows = BinaryPipeline.audioFeatures(spark, Sf).collect()
    assert(rows.length === 500)
    rows.take(25).foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_samples") === 400L)
      assert(r.getAs[Double]("sample_rate") === 8000.0)
      assert(r.getAs[Double]("duration_ms") === 50.0)
      // sine at amplitude 0.5 FS: RMS = 0.5/sqrt(2) ≈ 0.3536
      assert(math.abs(r.getAs[Double]("rms") - 0.5 / math.sqrt(2)) < 0.01,
        s"doc $d rms ${r.getAs[Double]("rms")}")
      // crossings ≈ 2 · freq · duration (±2 boundary effects)
      val freq = 200.0 + (d % 20) * 50.0
      val expected = 2.0 * freq * 0.05
      assert(math.abs(r.getAs[Long]("zero_crossings") - expected) <= 2,
        s"doc $d crossings ${r.getAs[Long]("zero_crossings")} vs $expected")
    }
  }

  test("phash dedup recovers every planted duplicate pair at hamming 0") {
    val pairs = BinaryPipeline.phashDedup(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
                 r.getAs[Long]("hamming")))
    // payloads are doc_id % 250: docs 250..499 re-encode 0..249
    val planted = pairs.filter { case (a, b, _) => b == a + 250 }
    assert(planted.length === 250, s"recovered ${planted.length}/250")
    planted.foreach { case (_, _, h) => assert(h === 0L) }
    // precision on this corpus: identical pixels ⇔ same %250 class
    pairs.foreach { case (a, b, h) =>
      if (h == 0L) assert(a % 250 === b % 250, s"false dup ($a,$b)")
    }
  }

  test("phash mega-bucket: star edges only, bounded plan, exact audit") {
    import spark.implicits._
    // 240 docs share ONE phash (a blank-thumbnail mass duplicate): all
    // 4 band buckets go hot at cap 32. Docs 900/901 are a genuine
    // near-dup pair (hamming 1, the flipped bit inside band 1) on band
    // values disjoint from the mega hash.
    val h900 = (0x1555L << 42) | (0x1555L << 28) | (0x1555L << 14) | 0x1555L
    val hashes = ((0 until 240).map(i => (i.toLong, 0L)) ++
      Seq((900L, h900), (901L, h900 ^ (1L << 20)))).toDF("doc_id", "phash")
    val pairs = BinaryPipeline.phashPairsOn(hashes)
    val got = pairs.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
                 r.getAs[Long]("hamming"))).toSet
    // mega bucket contributes EXACTLY the star from its true min member
    val want = (1 until 240).map(i => (0L, i.toLong, 0L)).toSet + ((900L, 901L, 1L))
    assert(got === want)
    // audit metric carries the TRUE bucket sizes: 4 hot bands × 240 docs
    val m = pairs.queryExecution.observedMetrics.collectFirst {
      case (k, row) if k.startsWith("phash_hot_bands") => row
    }.getOrElse(fail("no phash_hot_bands observed metric"))
    assert(m.getAs[Long]("n_hot_buckets") === 4L)
    assert(m.getAs[Long]("n_hot_doc_entries") === 960L)
    // plan shape: membership collected through the bounded aggregate —
    // no unbounded collect_list may remain in the image pair generator
    val plan = pairs.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_bounded_bucket"), plan)
    assert(!plan.contains("collect_list"), plan)
  }

  test("decode kernels are deterministic across runs") {
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(sig(BinaryPipeline.imageFeatures(spark, Sf)) ===
           sig(BinaryPipeline.imageFeatures(spark, Sf)))
    assert(sig(BinaryPipeline.audioFeatures(spark, Sf)) ===
           sig(BinaryPipeline.audioFeatures(spark, Sf)))
    assert(sig(BinaryPipeline.features(spark, Sf)) ===
           sig(BinaryPipeline.features(spark, Sf)))
  }
}
