package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring span dedup (dedup/SubstrDedup.scala) on planted
  * partial-overlap corpora — the shapes the synthetic sf tables don't
  * exercise (their planted duplicates are whole-doc, so every span
  * degenerates to [0, n-1]). Semantics locked here:
  *
  *  - a shared run of exactly K tokens is found, and the reported span
  *    is MAXIMAL — it covers the whole shared run, not just one K-gram;
  *  - a shared run of K-1 tokens is NOT flagged;
  *  - two shared runs separated by one private token stay two spans;
  *    runs whose coverage touches fuse into one;
  *  - repetition INSIDE one document is not a duplicate (cross-doc
  *    distinct-count semantics);
  *  - scrub removes exactly the span tokens and keeps everything else
  *    in order.
  */
class SubstrDedupSpec extends AnyFunSuite {
  import TestSpark._

  private val K = 8 // must mirror SubstrDedup.MinRun

  private def df(docs: (Long, String)*) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  private def spans(docs: org.apache.spark.sql.DataFrame) =
    dedup.SubstrDedup.spansOf(docs, K)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private def words(prefix: String, n: Int) =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a shared K-token run yields one maximal span in both docs") {
    val shared = words("s", 12) // 12 > K: span must cover all 12
    val d = df(
      (1L, words("a", 5) + " " + shared + " " + words("b", 4)),
      (2L, words("c", 3) + " " + shared))
    assert(spans(d).toSeq === Seq(
      (1L, 5L, 16L, 12L),
      (2L, 3L, 14L, 12L)))
  }

  test("a shared run one token short of K is not flagged") {
    val shared = words("s", K - 1)
    val d = df(
      (1L, words("a", 5) + " " + shared),
      (2L, words("c", 5) + " " + shared))
    assert(spans(d).isEmpty)
  }

  test("two shared runs split by a private token stay two spans") {
    val r1 = words("x", K)
    val r2 = words("y", K)
    val d = df(
      (1L, r1 + " private1only " + r2),
      (2L, r1 + " totallyelse " + r2))
    assert(spans(d).toSeq === Seq(
      (1L, 0L, 7L, 8L), (1L, 9L, 16L, 8L),
      (2L, 0L, 7L, 8L), (2L, 9L, 16L, 8L)))
  }

  test("repetition inside ONE doc is not a cross-doc duplicate") {
    val run = words("r", K)
    val d = df(
      (1L, run + " " + run + " " + run),
      (2L, words("z", 20)))
    assert(spans(d).isEmpty)
  }

  test("scrub keeps non-span tokens in order and accounts exactly") {
    val shared = words("s", 10)
    val d = df(
      (1L, words("a", 4) + " " + shared + " " + words("b", 3)),
      (2L, shared))
    val sp = dedup.SubstrDedup.spansOf(d, K)
    // doc 1: tokens 4..13 scrubbed -> keeps a0..a3 b0..b2
    import org.apache.spark.sql.functions._
    val toks = d.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.reTokens(col("text")))
        .as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.join(
      sp.select(col("doc_id").as("s_doc"), col("span_start"), col("span_end")),
      toks("doc_id") === col("s_doc") &&
        col("pos").between(col("span_start"), col("span_end")),
      "left_anti")
      .orderBy("doc_id", "pos").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSeq).toMap
    assert(kept(1L) === Seq("a0", "a1", "a2", "a3", "b0", "b1", "b2"))
    assert(!kept.contains(2L)) // whole doc was the duplicated run
  }

  test("incremental: batch-vs-corpus spans only — batch-internal and corpus-internal dups excluded") {
    // bucket16(doc_id)==0 selects the batch; find ids on each side
    def coin(id: Long): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.charAt(0) == '0'
    val batchIds = (0L until 2000L).filter(coin).take(2)
    val corpusIds = (0L until 2000L).filterNot(coin).take(2)
    val sharedBC = words("bc", 10)  // batch<->corpus duplicated run
    val sharedBB = words("bb", 10)  // batch<->batch only
    val sharedCC = words("cc", 10)  // corpus<->corpus only
    val d = df(
      (batchIds(0), words("p", 3) + " " + sharedBC + " " + sharedBB),
      (batchIds(1), sharedBB + " " + words("q", 5)),
      (corpusIds(0), sharedBC + " " + sharedCC),
      (corpusIds(1), sharedCC + " " + words("r", 4)))
    val out = dedup.SubstrDedup.incrementalSpansOn(d, K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // only the batch doc's bc-run against the corpus: positions 3..12
    assert(out === Seq((batchIds(0), 3L, 12L)))
  }

  test("decontam: only train-vs-eval collision spans — train-train excluded") {
    def coin15(id: Long): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.charAt(0) == 'f'
    val evalIds = (0L until 2000L).filter(coin15).take(1)
    val trainIds = (0L until 2000L).filterNot(coin15).take(2)
    val leaked = words("lk", 10)  // benchmark text quoted by a train doc
    val sharedTT = words("tt", 10) // train<->train only: not contamination
    val d = df(
      (evalIds(0), words("b", 4) + " " + leaked),
      (trainIds(0), words("x", 2) + " " + leaked + " " + sharedTT),
      (trainIds(1), sharedTT))
    val out = dedup.SubstrDedup.decontamSpansOn(d, K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((trainIds(0), 2L, 11L)))
  }

  test("property: spansOf equals an independent in-Scala reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    // small vocab + short docs force rich cross-doc duplicated runs,
    // overlaps, touching intervals, and sub-K fragments
    val corpusGen: Gen[List[(Long, List[String])]] = for {
      nDocs <- Gen.choose(2, 14)
      vocab <- Gen.choose(3, 6)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 28)
        toks <- Gen.listOfN(len, Gen.choose(0, vocab - 1).map(i => s"w$i"))
      } yield toks)
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    def refSpans(docs: Seq[(Long, Seq[String])], k: Int)
        : Seq[(Long, Long, Long, Long)] = {
      val grams = docs.flatMap { case (id, toks) =>
        if (toks.size >= k)
          (0 to toks.size - k).map(p => (id, p, toks.slice(p, p + k).mkString(" ")))
        else Nil
      }
      val dup = grams.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      grams.filter(g => dup(g._3)).map(g => (g._1, g._2)).distinct
        .groupBy(_._1).toSeq.flatMap { case (id, ps) =>
          var spans = List.empty[(Int, Int)]
          ps.map(_._2).sorted.foreach { p =>
            spans match {
              case (s, e) :: rest if p <= e + 1 =>
                spans = (s, math.max(e, p + k - 1)) :: rest
              case _ => spans = (p, p + k - 1) :: spans
            }
          }
          spans.reverse.map { case (s, e) =>
            (id, s.toLong, e.toLong, (e - s + 1).toLong) }
        }.sortBy(x => (x._1, x._2))
    }

    import spark.implicits._
    val k = 3
    (1 to 10).foreach { trial =>
      val docs = corpusGen.pureApply(org.scalacheck.Gen.Parameters.default,
        Seed(trial.toLong))
      val d = docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = dedup.SubstrDedup.spansOf(d, k)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === refSpans(docs, k), s"trial $trial, docs=$docs")
    }
  }

  test("hashed wire: span set ≡ string form on the sf corpus, longs on the gram shuffle") {
    val dir = TestSpark.Sf
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val strForm = dedup.SubstrDedup.queries("dedup_substring_spans")(spark, dir)
    val hashed =
      dedup.SubstrDedup.queries("dedup_substring_spans_hashed")(spark, dir)
    assert(rows(strForm).nonEmpty, "fixture corpus must contain dup spans")
    assert(rows(hashed) === rows(strForm))
    // wire shape: every gram-stage exchange partitions on the 8-byte
    // hash key, never on the K-token gram string (the string is still
    // BUILT map-side — concat_ws feeds xxhash64 — but must not ride a
    // shuffle)
    val phys = hashed.queryExecution.executedPlan.toString
    assert(phys.contains("hashpartitioning(kh#"), phys)
    assert(!phys.contains("hashpartitioning(kg#"),
      "gram string must not be a shuffle key in the hashed form")
  }

  test("spans/scrub sf entries agree on per-doc duplicated token mass") {
    val dir = TestSpark.Sf
    val sp = dedup.SubstrDedup.queries("dedup_substring_spans")(spark, dir)
    val sc = dedup.SubstrDedup.queries("dedup_substring_scrub")(spark, dir)
    import org.apache.spark.sql.functions._
    val fromSpans = sp.groupBy("doc_id")
      .agg(sum("span_len").as("dup_tokens_sp"))
    val joined = sc.join(fromSpans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_tokens"),
        coalesce(col("dup_tokens_sp"), lit(0L)).as("dup_tokens_sp"))
      .filter(col("dup_tokens") =!= col("dup_tokens_sp"))
    assert(joined.count() === 0)
  }
}
