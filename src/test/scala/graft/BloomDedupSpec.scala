package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bloom-prefiltered incremental dedup: the sketch in the plan must not
  * change the answer (no false negatives + exact verify), and the probe
  * must sit BELOW the verify join so non-duplicate batch rows never
  * shuffle. The synthetic corpus has no cross-split duplicates, so the
  * tests plant them through the frame-level core using the real md5
  * split (ids chosen by nibble). */
class BloomDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def nibble(id: Long): Int = {
    import java.security.MessageDigest
    Integer.parseInt(MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes).map("%02x".format(_)).mkString
      .substring(0, 1), 16)
  }

  // 5 shared texts, each on one batch id (nibble 0) and one corpus id
  // (nibble != 0), plus unique filler docs on both sides
  private def planted() = {
    import spark.implicits._
    val batchIds = (0L until 2000L).filter(nibble(_) == 0).take(10)
    val corpusIds = (0L until 2000L).filter(nibble(_) != 0).take(20)
    val dups = (0 until 5).map { i =>
      (batchIds(i), corpusIds(i), s"shared text number $i repeated words")
    }
    val rows =
      dups.map { case (b, _, t) => (b, t) } ++
      dups.map { case (_, c, t) => (c, t) } ++
      batchIds.drop(5).map(id => (id, s"unique batch doc $id")) ++
      corpusIds.drop(5).map(id => (id, s"unique corpus doc $id"))
    (rows.toDF("doc_id", "text"),
     dups.map { case (b, c, _) => (b, c) }.toSet)
  }

  test("output is exactly the planted cross-split duplicate set") {
    val (docs, expected) = planted()
    val got = dedup.Dedup.bloomIncrementalOn(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_keeper")))
      .toSet
    assert(got === expected)
  }

  test("the bloom probe filters below the verify join") {
    val (docs, _) = planted()
    val df = dedup.Dedup.bloomIncrementalOn(spark, docs)
    df.collect()
    // AQE wraps the join in query stages, so walk the printed tree:
    // the probe Filter must print BELOW (after) the join node
    val plan = df.queryExecution.executedPlan.toString
    val joinAt = plan.indexOf("HashJoin")
    val probeAt = plan.indexOf("might_contain")
    assert(joinAt >= 0, s"no join in plan:\n${plan.take(2000)}")
    assert(probeAt > joinAt,
      s"bloom probe not below the join:\n${plan.take(3000)}")
  }

  test("the bloom aggregate merges across partitions (no false negatives)") {
    import spark.implicits._
    graft.functions.Registry.register(spark)
    // 1000 corpus keys spread over 32 partitions; every one must probe
    // positive after the partial-merge build
    val corpus = (0 until 1000).map(i => s"key_$i").toDF("k").repartition(32)
    corpus.createOrReplaceTempView("graft_bloom_probe_corpus")
    val hits = spark.sql(
      """SELECT count(*) AS n FROM graft_bloom_probe_corpus
         WHERE graft_might_contain(
           (SELECT graft_bloom_agg(xxhash64(k), CAST(10000 AS BIGINT),
                                   CAST(80000 AS BIGINT))
            FROM graft_bloom_probe_corpus),
           xxhash64(k))""").head.getLong(0)
    assert(hits === 1000L)
  }

  test("the dir entry runs green on the real corpus (legitimately empty)") {
    val df = dedup.Dedup.bloomIncremental(spark, Sf)
    assert(df.count() === 0)
  }
}
