package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-prefiltered incremental dedup: the sketch in the plan must not
  * change the answer (no false negatives + exact verify), and the probe
  * must sit BELOW the verify join so non-duplicate batch rows never
  * shuffle. The synthetic corpus has no cross-split duplicates of its
  * own, so the dir entry PLANTS them in-plan (plantCrossSplitDups —
  * pinned here against an independent reconstruction) and the
  * frame-core tests plant adversarial fixtures directly, including one
  * sized to force bloom false positives through to the verify join. */
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

  test("dir entry: planted cross-split duplicates equal an independent " +
       "reconstruction — 8 rows at sf0.001, keepers are group minima") {
    val out = dedup.Dedup.bloomIncremental(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_keeper")))
    // reconstruct the planting contract from the raw parquet, without
    // the operator: doc_id ≡ 0 (mod 7) → group (doc_id/7) mod 3; a
    // planted batch doc (nibble 0) matches iff its group has a corpus
    // member, and the keeper is that group's min corpus doc_id
    val ids = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def grp(id: Long): Option[Long] =
      if (id % 7 == 0) Some((id / 7) % 3) else None
    val keeperByGroup = ids.filter(nibble(_) != 0)
      .flatMap(id => grp(id).map(_ -> id))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = ids.filter(nibble(_) == 0)
      .flatMap(id => grp(id).flatMap(keeperByGroup.get).map(id -> _)).toSet
    assert(expected.size === 8, "the planting must yield rows at sf0.001")
    assert(out.toSet === expected)
  }

  test("bloom false positives survive the probe and are killed by the " +
       "verify join") {
    import spark.implicits._
    // 20k docs, all texts unique except 3 batch docs copying a corpus
    // partner's text: the 1% FPP filter over ~18.7k corpus hashes
    // flags a handful of the ~1.25k non-dup batch probes as false
    // positives, which the exact verify join must remove
    val ids = (0L until 20000L)
    val batchIds = ids.filter(nibble(_) == 0)
    val corpusIds = ids.filter(nibble(_) != 0)
    val dupPairs = batchIds.take(3).zip(corpusIds.take(3))
    val partner = dupPairs.toMap
    val docs = ids.map { id =>
      (id, partner.get(id) match {
        case Some(c) => s"filler doc number $c body words"
        case None    => s"filler doc number $id body words"
      })
    }.toDF("doc_id", "text")
    val out = dedup.Dedup.bloomIncrementalOn(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_keeper")))
    assert(out.toSet === dupPairs.toSet,
      "verify must emit EXACTLY the true dups — no false positive leaks")
    // independent probe through the operator's own filter geometry
    // (estItems = total docs, 10 bits/item): how many batch rows did
    // the bloom flag? strictly more than the true dups ⇒ false
    // positives reached the verify join and died there
    graft.functions.Registry.register(spark)
    docs.select(col("doc_id"),
        md5(graft.functions.TextFunctions.normText(col("text")))
          .as("norm_hash"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
          .cast("int") === 0).as("is_batch"))
      .createOrReplaceTempView("graft_bloom_fp_probe")
    val flagged = spark.sql(
      s"""SELECT count(*) FROM graft_bloom_fp_probe
          WHERE is_batch AND graft_might_contain(
            (SELECT graft_bloom_agg(xxhash64(norm_hash),
                                    CAST(20000 AS BIGINT),
                                    CAST(200000 AS BIGINT))
             FROM graft_bloom_fp_probe WHERE NOT is_batch),
            xxhash64(norm_hash))""").head.getLong(0)
    assert(flagged > dupPairs.size,
      s"fixture must produce bloom false positives (flagged=$flagged, " +
      s"true dups=${dupPairs.size}) — grow the fixture if this fails")
  }
}
