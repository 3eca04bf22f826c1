package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quality (recall) checks for the approximate dedup paths on synthetic
  * corpora with planted near-duplicates — the rows-only operators get a
  * semantic test even though no SQL oracle can check them. */
class DedupQualitySpec extends AnyFunSuite {
  import TestSpark._

  // 10 base documents plus a near-duplicate of each (one word changed),
  // plus 20 unrelated documents of distinct vocabulary.
  private def corpus() = {
    import spark.implicits._
    val base = (0 until 10).map { i =>
      val words = (0 until 40).map(j => s"w${i}_${j % 25}")
      (i.toLong, words.mkString(" "))
    }
    val nearDups = base.map { case (id, text) =>
      (id + 100, text.replaceFirst("_3 ", "_changed "))
    }
    val noise = (0 until 20).map { i =>
      (1000L + i, (0 until 40).map(j => s"n${i}_$j").mkString(" "))
    }
    (base ++ nearDups ++ noise).toDF("doc_id", "text")
  }

  test("minhash LSH recovers planted near-duplicate pairs") {
    val pairs = dedup.Dedup.minhashPairs(spark, corpus())
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val planted = (0 until 10).map(i => (i.toLong, i + 100L)).toSet
    val found = planted.intersect(pairs)
    // 4 bands × 4 rows at jaccard ~0.9 → expected recall ≈ 1
    assert(found.size >= 8, s"minhash found only ${found.size}/10 planted pairs")
    // and no cross-vocabulary false positives
    val falseCross = pairs.filter { case (a, b) =>
      (a < 1000) != (b < 1000)
    }
    assert(falseCross.isEmpty)
  }

  test("simhash recovers planted near-duplicate pairs at low hamming") {
    val pairs = dedup.Dedup.simhashPairs(corpus())
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
                 r.getAs[Long]("hamming")))
    val planted = (0 until 10).map(i => (i.toLong, i + 100L)).toSet
    val found = planted.intersect(pairs.map(p => (p._1, p._2)).toSet)
    assert(found.size >= 8, s"simhash found only ${found.size}/10 planted pairs")
    // planted near-dups should sit at much lower hamming than anything else
    val plantedHamming = pairs.filter(p => planted.contains((p._1, p._2)))
      .map(_._3)
    assert(plantedHamming.forall(_ <= 8))
  }
}
