package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reusable distributed connected components over an undirected edge
  * frame — the decision kernel behind every near-dup clustering
  * (dedup.Dedup.clusters) and usable standalone for entity resolution,
  * household linking, or any pair-graph collapse.
  *
  * Contract: input is two Long columns (endpoints); output is
  * (node, label) for every node with at least one edge, where label is
  * the component's minimum node id (the deterministic canonical
  * representative). Nodes without edges are absent — singletons are the
  * caller's join-default, not rows to shuffle.
  *
  * Two regimes, sized by the EDGE GRAPH (not the input corpus — in
  * dedup almost no document pairs, so the graph is orders of magnitude
  * smaller than the data):
  *  - TINY (≤ tinyThreshold edges): collapse the whole problem into a
  *    linear-time union-find over one partition — the "local
  *    contraction" step of two-level distributed CC algorithms, one job
  *    instead of O(log diameter) shuffle round-trips. mapPartitions is
  *    justified exactly because a single-partition subproblem IS the
  *    per-task local step a 1000-executor CC job runs anyway.
  *  - LARGE: iterative min-label propagation + pointer jumping with a
  *    per-round eager localCheckpoint (truncates lineage — each round
  *    references its parent twice, so an uncheckpointed plan grows
  *    exponentially); converges in O(log diameter) rounds.
  */
object ConnectedComponents {

  /** @param edges      frame whose first two columns are Long endpoints
    * @param tinyThreshold edge count at or below which the local
    *                      union-find regime runs (rows-per-partition
    *                      sizing, the same knob any 100 TB job tunes) */
  def run(edges: DataFrame, tinyThreshold: Long = 5000000L): DataFrame = {
    val spark = edges.sparkSession
    val Seq(ua, va) = edges.columns.toSeq.take(2)
    // materialize ONCE before branching/symmetrizing: the union of
    // pairs ∪ pairs.reversed is two plan branches, and Catalyst does
    // not reuse exchanges across branches — an unmaterialized input
    // would run its whole upstream pipeline twice
    val pairs = edges.select(col(ua).cast("long").as("u"),
                             col(va).cast("long").as("v"))
      .localCheckpoint()
    if (pairs.count() <= tinyThreshold) local(spark, pairs)
    else iterative(pairs)
  }

  /** Single-partition linear-time union-find with path compression. */
  private def local(spark: SparkSession, pairs: DataFrame): DataFrame = {
    import spark.implicits._
    pairs.as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
          }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val minOfRoot = scala.collection.mutable.LongMap.empty[Long]
        val nodes = parent.keys.toArray
        nodes.foreach { n =>
          val r = find(n)
          minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
        }
        nodes.iterator.map(n => (n, minOfRoot(find(n))))
      }
      .toDF("node", "label")
  }

  /** Iterative min-label propagation + pointer jumping. */
  private def iterative(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("v"), col("u")))
      .toDF("u", "v")
      .localCheckpoint()
    // seed with the one-hop minimum — label(v) = min(v, min neighbor) —
    // folding the first propagation round into init
    var l = edges.groupBy(col("u"))
      .agg(min(col("v")).as("mv"))
      .select(col("u").as("node"), least(col("u"), col("mv")).as("label"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // one hop along graph edges...
      val prop = edges.join(l, col("u") === col("node"))
        .groupBy(col("v")).agg(min(col("label")).as("nb_label"))
      val hopped = l.join(prop, col("node") === col("v"), "left")
        .select(col("node"), col("label").as("old"),
                least(col("label"), coalesce(col("nb_label"), col("label")))
                  .as("label"))
      // ...then a pointer jump (label := label's label) so long chains
      // collapse in O(log diameter) rounds, not O(diameter)
      val jumpTo = hopped.select(col("node").as("jnode"),
                                 col("label").as("jlabel"))
      val next = hopped.join(jumpTo, col("label") === col("jnode"), "left")
        .select(col("node"), col("old"),
                least(col("label"), coalesce(col("jlabel"), col("label")))
                  .as("label"))
        .localCheckpoint() // the round's ONE materializing job
      // convergence check reads the just-checkpointed blocks — a cheap
      // cached scan, not a second join job per round
      changed = next.filter(col("label") =!= col("old")).count()
      l = next.select(col("node"), col("label"))
    }
    l
  }
}
