package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The checkpoint-block release contract: `Dataset.unpersist` does NOT
  * free a localCheckpoint's blocks (it only uncaches CacheManager
  * entries), so iterative kernels and the streaming pregates release
  * the underlying checkpointed RDD explicitly via CheckpointBlocks —
  * these tests pin both the premise and the release. */
class CheckpointBlocksSpec extends AnyFunSuite {
  import TestSpark._

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist leaves localCheckpoint blocks pinned; " +
       "CheckpointBlocks.free releases them") {
    val before = persistentIds
    val cp = spark.range(1000).toDF("id").localCheckpoint(true)
    val pinned = persistentIds -- before
    assert(pinned.nonEmpty, "eager localCheckpoint should pin blocks")
    // the premise the scaladoc claims: unpersist is a no-op on them
    cp.unpersist(blocking = true)
    assert((persistentIds -- before) === pinned,
      "Dataset.unpersist must NOT free checkpoint blocks (if this " +
      "starts failing, Spark changed the contract and " +
      "CheckpointBlocks can be retired)")
    CheckpointBlocks.free(cp)
    assert((persistentIds -- before).isEmpty,
      "free() must release exactly the checkpointed RDD's blocks")
  }

  test("free is a no-op on a non-checkpointed frame") {
    val before = persistentIds
    val df = spark.range(10).toDF("id").filter(col("id") > 2)
    CheckpointBlocks.free(df) // must not throw, must not unpersist
    assert(persistentIds === before)
    assert(df.count() === 7)
  }

  test("runToConvergence frees every intermediate round's blocks and " +
       "the pinned transition matrix — only the returned frame's remain") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
                    (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val before = persistentIds
    val (ranks, iters) = graph.PageRank.runToConvergence(
      edges, nodes, 3L, tol = 1e-9, maxIters = 40)
    assert(iters > 1, "fixture should need several rounds")
    val after = persistentIds -- before
    // exactly the returned frame's own checkpoint blocks survive
    val owned = CheckpointBlocks.checkpointedRdd(ranks).map(_.id).toSet
    assert(after === owned,
      s"leftover blocks beyond the returned frame's: ${after -- owned}")
    CheckpointBlocks.free(ranks)
    assert((persistentIds -- before).isEmpty)
  }
}
