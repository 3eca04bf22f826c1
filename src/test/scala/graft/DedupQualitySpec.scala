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

  // 20 base 64-dim vectors plus a near-duplicate of each (small
  // deterministic perturbation, cos ≳ 0.998), plus 100 unrelated
  // random vectors (pairwise cos ≈ 0 ± 0.12).
  private def embCorpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)(rnd.nextGaussian())
    val base = (0 until 20).map(i => (i.toLong, vec()))
    val dups = base.map { case (id, v) =>
      (id + 100L, v.map(_ + rnd.nextGaussian() * 0.05))
    }
    val noise = (0 until 100).map(i => (1000L + i, vec()))
    (base ++ dups ++ noise).toDF("vec_id", "embedding")
  }

  test("embedding LSH recovers planted near-dups at the sf0.1-scale band width") {
    // planesPerBand=13 is what the corpus-scaled width resolves to at
    // N=5000 — recall must survive the widening (1-(1-p^13)^16 ≈ 1 at
    // cos 0.998)
    val pairs = dedup.Dedup.embedLshPairs(spark, embCorpus(),
        bands = 16, planesPerBand = 13, threshold = 0.9)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val planted = (0 until 20).map(i => (i.toLong, i + 100L)).toSet
    val found = planted.intersect(pairs)
    assert(found.size >= 18,
      s"embedding LSH found only ${found.size}/20 planted pairs")
    // random-vector pairs sit near cos 0 — none can pass the threshold
    assert(pairs.forall { case (a, b) => planted.contains((a, b)) })
  }

  test("oversized buckets star-expand instead of exploding quadratically") {
    import spark.implicits._
    // 200 identical vectors: every band puts all of them in one bucket
    val v = Array.fill(64)(1.0)
    val df = (0 until 200).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val pairs = dedup.Dedup.embedLshPairs(spark, df,
        bands = 4, planesPerBand = 8, threshold = 0.5, maxBucket = 50)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    // star fallback: only (min, other) pairs — 199 edges, not 19900
    assert(pairs.length === 199)
    assert(pairs.forall(_._1 === 0L))
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

  test("minhash-verified pairs are a precision-1.0 subset of exact jaccard") {
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val verified = toMap(dedup.Dedup.minhashVerified(spark, Sf))
    val exact = toMap(dedup.Dedup.ngramJaccard(spark, Sf))
    assert(verified.nonEmpty)
    verified.foreach { case (pair, j) =>
      assert(exact.get(pair).contains(j),
        s"pair $pair verified=$j exact=${exact.get(pair)}")
    }
  }
}
