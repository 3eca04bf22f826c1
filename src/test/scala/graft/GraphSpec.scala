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

  test("label propagation splits a bridged barbell CC cannot") {
    import spark.implicits._
    // two K4 cliques (internal weight 10) joined by ONE weight-1 bridge:
    // connected as a graph (CC gives one component) but two communities
    val clique = (ns: Seq[Long]) =>
      for { a <- ns; b <- ns if a < b } yield (a, b, 10L)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+
      ((4L, 5L, 1L))).toDF("src", "dst", "w")
    val labels = graph.LabelProp.run(edges, iters = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    val sideA = Seq(1L, 2L, 3L, 4L).map(labels)
    val sideB = Seq(5L, 6L, 7L, 8L).map(labels)
    assert(sideA.distinct.size === 1, s"A fragmented: $labels")
    assert(sideB.distinct.size === 1, s"B fragmented: $labels")
    assert(sideA.head !== sideB.head, s"bridge merged the sides: $labels")
  }

  test("label propagation matches an in-memory synchronous reference on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 8 + rng.nextInt(6)
      val edges = (for {
        a <- 1L to n; b <- (a + 1) to n if rng.nextInt(3) == 0
      } yield (a, b, (1 + rng.nextInt(5)).toLong)).toSeq
      if (edges.nonEmpty) {
        val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        val nodes = sym.map(_._1).distinct
        var labels = nodes.map(v => v -> v).toMap
        (1 to 3).foreach { _ =>
          labels = nodes.map { v =>
            val votes = sym.filter(_._1 == v)
              .groupBy(e => labels(e._2))
              .view.mapValues(_.map(_._3).sum).toMap
            v -> votes.toSeq.sortBy { case (l, w) => (-w, l) }.head._1
          }.toMap
        }
        val dist = graph.LabelProp.run(edges.toDF("src", "dst", "w"), 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(dist === labels, s"trial $trial n=$n edges=$edges")
      }
    }
  }

  test("label propagation is partition-invariant") {
    import spark.implicits._
    val edges = (for { a <- 1L to 6L; b <- 1L to 6L if a < b }
      yield (a, b, ((a + b) % 3 + 1))).toDF("src", "dst", "w")
    val one = graph.LabelProp.run(edges.coalesce(1), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val many = graph.LabelProp.run(edges.repartition(7), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(one === many)
  }
}
