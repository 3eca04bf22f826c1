package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeVocab

/** BPE vocabulary learning — known-answer merge sequence on the classic
  * Sennrich corpus, plus determinism under repartitioning. */
class BpeVocabSpec extends AnyFunSuite {
  import TestSpark._

  // word frequencies: low×5 lower×2 newest×6 widest×3 (Sennrich ex.)
  private def corpus(parts: Int) = {
    import spark.implicits._
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread the words across docs so the word count is a real aggregate
    words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
      .repartition(parts)
  }

  test("merge sequence matches the hand-computed BPE on the classic corpus") {
    val (merges, dict) = BpeVocab.learn(corpus(4), k = 6)
    val got = merges.map(m => (m.left, m.right, m.pair_count))
    // hand computation (ties break lexicographically):
    // r1 (e,s) 9;  r2 (es,t) 9;  r3 (est,</w>) 9;
    // r4 (l,o) 7;  r5 (lo,w) 7;  r6 (e,w) 6
    assert(got === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "w", 6L)))
    // after 6 merges: "low" is fully merged up to its boundary symbol
    val lowSyms = dict.collect().find(_.syms.headOption.contains("low"))
    assert(lowSyms.isDefined) // "low</w>" pending, "low" merged
  }

  test("merge sequence is identical under different partitionings") {
    val a = BpeVocab.learn(corpus(1), k = 4)._1
    val b = BpeVocab.learn(corpus(7), k = 4)._1
    assert(a === b)
  }

  test("exhausted vocabulary stops early instead of looping") {
    import spark.implicits._
    // single word "ab" -> merges (a,b), (ab,</w>) then nothing left
    val tiny = Seq((0L, "ab")).toDF("doc_id", "text")
    val (merges, _) = BpeVocab.learn(tiny, k = 10)
    assert(merges.length === 2)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encode reproduces the learned dictionary word-for-word") {
    // rank-priority inference must agree with creation-order training
    // application on every training word
    val (merges, dict) = BpeVocab.learn(corpus(4), k = 6)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val byWord = dict.collect().map(ws => ws.syms -> ws).toSeq
    assert(byWord.nonEmpty)
    for ((syms, _) <- byWord) {
      val word = syms.mkString.stripSuffix("</w>")
      assert(BpeVocab.encodeWord(word, ranks) === syms,
        s"encode($word) diverged from the trained dictionary")
    }
  }

  test("learnOnSample: md5 1/4 sample reproduces the top-K merges") {
    import spark.implicits._
    // Zipf-ish deterministic corpus: 1200 docs over a 30-word
    // vocabulary, frequency ∝ 1/rank — big enough that a 4/16 md5
    // sample preserves the relative frequencies the merge sequence
    // depends on (the production claim learnOnSample makes).
    val vocab = Seq("lower", "lowest", "newest", "widest", "slower",
      "render", "winter", "western", "renewed", "wondered", "tender",
      "slender", "wander", "thunder", "sunder", "launder", "blender",
      "fender", "gender", "lender", "mender", "bender", "sender",
      "vendor", "condor", "candor", "splendor", "indoor", "door",
      "floor")
    // deterministic Zipf rank pick: fixed-multiplier hash → uniform u,
    // inverted through the normalized 1/rank cumulative weights
    val weights = vocab.indices.map(j => 1.0 / (j + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum)
    val docs = (0 until 1200).map { i =>
      val u = ((i * 2654435761L & 0x7fffffffL) % 10000) / 10000.0
      val rank = cum.indexWhere(u < _) match {
        case -1 => vocab.size - 1
        case j  => j
      }
      (i.toLong, s"${vocab(rank)} ${vocab((i * 7) % vocab.size)}")
    }.toDF("doc_id", "text")
    val k = 24
    val full = BpeVocab.learn(docs, k)._1.map(m => (m.left, m.right))
    val samp = BpeVocab.learnOnSample(docs, k, keep16 = 4)._1
      .map(m => (m.left, m.right))
    val overlap = full.toSet.intersect(samp.toSet).size.toDouble / k
    assert(overlap >= 0.75,
      s"sample merge agreement $overlap below band;\nfull=$full\nsamp=$samp")
    // and the sample really was a strict subset of the corpus
    assert(BpeVocab.learnOnSample(docs, 1, keep16 = 16)._1.head ===
      BpeVocab.learn(docs, 1)._1.head, "keep16=16 must equal full corpus")
  }

  test("encode on unseen words falls back gracefully") {
    val (merges, _) = BpeVocab.learn(corpus(2), k = 6)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // "slowest" was never a training word, but its trained subunits
    // still merge: r1-3 build est</w>, r4 (l,o), r5 (lo,w) build low
    assert(BpeVocab.encodeWord("slowest", ranks) ===
      Seq("s", "low", "est</w>"))
    // fully out-of-alphabet word: characters + boundary, nothing merges
    assert(BpeVocab.encodeWord("xyz", ranks) ===
      Seq("x", "y", "z", "</w>"))
  }

  test("encodeOn counts tokens per document with hand-checked totals") {
    import spark.implicits._
    val (merges, _) = BpeVocab.learn(corpus(3), k = 6)
    // doc 0: "low low" -> 2 words x ["low", "</w>"]  = 4 tokens
    //   (after 6 merges "low" is (lo,w) merged = "low", "</w>" separate)
    // doc 1: "newest" -> ["n","ew","est</w>"] = 3 tokens (r6 = (e,w))
    val docs = Seq((0L, "low low"), (1L, "newest"))
      .toDF("doc_id", "text")
    val got = BpeVocab.encodeOn(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 2L, 4L), (1L, 1L, 3L)))
  }

  test("text_bpe_encode query covers every document deterministically") {
    val df = BpeVocab.bpeEncode(spark, Sf)
    val rows = df.collect()
    val nDocs = graft.Tables.documents(spark, Sf).count()
    assert(rows.length.toLong === nDocs)
    // every doc has at least as many BPE tokens as words (the boundary
    // symbol can merge but never disappears entirely) and no more than
    // chars+words (character fallback)
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)))
    val again = BpeVocab.bpeEncode(spark, Sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("text_bpe_vocab query runs on the corpus with 16 deterministic rows") {
    val df = BpeVocab.bpeVocab(spark, Sf)
    val rows = df.collect()
    assert(rows.length === 16)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 16L))
    // counts are non-increasing? NOT guaranteed for BPE in general
    // (a merged pair can create a new frequent pair), but every count
    // must be positive and the table deterministic across runs
    assert(rows.forall(_.getLong(3) > 0))
    val again = BpeVocab.bpeVocab(spark, Sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
