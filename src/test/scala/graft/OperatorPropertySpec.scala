package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the load-bearing operator contracts that fixed
  * fixtures under-exercise:
  *  - TopKPerKey (the custom physical operator every ranking leg rides)
  *    must equal the window row_number formulation on ARBITRARY frames
  *    — including heavy order-value ties, k larger than group sizes,
  *    singleton keys, and skewed key distributions — under any input
  *    partitioning (the partial pass must be merge-safe).
  *  - The md5 sampling coin must be monotone in the rate (a rate-r
  *    sample is a SUBSET of every rate-r' ≥ r sample — the property
  *    that makes deterministic down-sampling reproducible across
  *    pipeline versions) and partition-independent.
  */
class OperatorPropertySpec extends AnyFunSuite {
  import TestSpark._

  // ---- TopKPerKey ≡ window top-k on random frames ----

  private val frameGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(1, 300)
    nKeys <- Gen.choose(1, 12)
    // small value domain → frequent ties in the order column
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, nKeys.toLong)
      v <- Gen.oneOf(Gen.choose(0, 5).map(_.toDouble),
                     Gen.choose(0.0, 100.0))
    } yield (key, v))
  } yield rows.zipWithIndex.map { case ((key, v), i) => (key, i.toLong, v) }

  test("TopKPerKey equals the window formulation on arbitrary frames") {
    import spark.implicits._
    (1 to 12).foreach { trial =>
      val rows = frameGen.pureApply(Gen.Parameters.default, Seed(trial.toLong))
      val k = 1 + trial % 7
      val parts = 1 + trial % 5
      val df = rows.toDF("key", "id", "v").repartition(parts)
      val got = plans.TopKPerKey(df, "key", "v", k, tiebreak = Some("id"))
        .select("key", "id", "v")
        .orderBy("key", "id").collect().toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("key", "id", "v")
        .orderBy("key", "id").collect().toSeq
      assert(got === want, s"trial=$trial k=$k parts=$parts")
    }
  }

  // ---- md5 coin: rate monotonicity + partition independence ----

  test("md5-coin samples are nested across rates and partitionings") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val coin = conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
      .cast("int")
    def sample(rate16: Int, parts: Int): Set[Long] =
      ids.repartition(parts).filter(coin < rate16)
        .collect().map(_.getLong(0)).toSet
    val byRate = (0 to 16).map(r => r -> sample(r, 3)).toMap
    // nested: rate r ⊆ rate r+1; endpoints exact
    assert(byRate(0).isEmpty && byRate(16).size === 500)
    (0 until 16).foreach { r =>
      assert(byRate(r).subsetOf(byRate(r + 1)), s"rate $r not nested")
    }
    // sizes roughly proportional (md5 nibble ~uniform): rate 8 of 500
    // ids lands within a generous 4-sigma band of 250
    assert(math.abs(byRate(8).size - 250) < 70, s"rate-8 size ${byRate(8).size}")
    // partition-independent: same membership at any partitioning
    assert(sample(8, 1) === byRate(8))
    assert(sample(8, 7) === byRate(8))
  }
}
