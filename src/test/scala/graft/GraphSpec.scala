package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.ConnectedComponents

/** Property tests for the reusable CC kernel: both regimes (local
  * union-find, iterative min-label + pointer jump) must agree with a
  * reference union-find on deterministic random graphs, including the
  * chain shape that maximizes diameter (the pointer-jump stress). */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(n => n -> find(n)).toMap.map { case (n, r) =>
      n -> parent.keys.filter(m => find(m) == r).min
    }
  }

  private def both(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = edges.toDF("u", "v")
    val expect = reference(edges).toSeq.sorted
    val tiny = ConnectedComponents.run(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val large = ConnectedComponents.run(df, tinyThreshold = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(tiny === expect, "local union-find regime")
    assert(large === expect, "iterative min-label regime")
  }

  test("random graphs: both regimes match a reference union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      both(edges)
    }
  }

  test("chain graph (max diameter) converges and labels to the minimum") {
    val chain = (0L until 64L).sliding(2).map(s => (s(1), s(0))).toSeq
    both(chain)
    // plus two disjoint chains meeting in the middle
    val twoChains = chain ++ (100L until 140L).sliding(2).map(s => (s(0), s(1)))
    both(twoChains)
  }

  test("self-contained components keep distinct labels") {
    both(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L)))
  }
}
