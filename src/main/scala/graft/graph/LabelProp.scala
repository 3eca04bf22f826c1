package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Synchronous weighted label propagation (community detection) over an
  * edge frame — the community structure the pair-network / PageRank
  * family stops short of: which nodes CLUSTER together, not just how
  * connected (ConnectedComponents) or influential (PageRank) they are.
  * A bridge edge keeps a graph connected, but each side's internal
  * weight outvotes it — LPA splits what CC cannot.
  *
  * Deterministic variant of Raghavan et al. 2007: integer edge weights,
  * ties break to the SMALLEST label, FIXED round count — every run,
  * partitioning, and engine converges identically, which is what makes
  * a DuckDB oracle possible for an iterative community algorithm.
  *
  * Scale shape: per round ONE edges⋈labels shuffle (labels are
  * node-sized — broadcast when small), a map-side-combined
  * (node, label) weight sum, then the per-node argmax as ONE
  * max(struct(weight, -label)) aggregate — no window sort over votes.
  * localCheckpoint truncates the iterative lineage exactly like
  * ConnectedComponents' large regime.
  */
object LabelProp {

  /** @param edges (src, dst, w) directed edges; votes flow both ways
    *              (the frame is symmetrized internally)
    * @param iters fixed synchronous rounds */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"), col("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    (1 to iters).foreach { _ =>
      val votes = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src"), col("label"))
        .agg(sum(col("w")).as("vw"))
      labels = votes
        .groupBy(col("src"))
        .agg(max(struct(col("vw"), (-col("label")).as("neg"))).as("best"))
        .select(col("src").as("node"), (-col("best.neg")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Nation trade-flow communities: the same two-fact edge build as
    * graph_pagerank (integer link counts as weights), 3 LPA rounds,
    * labels mapped back to nation names. Integer weights + smallest-
    * label ties ⇒ bit-exact across engines, so the iteration unrolls
    * into a chained-CTE DuckDB oracle like graph_pagerank's.
    *
    * The aggregated edge frame is ≤ nations² rows but derives from the
    * full two-fact join, and [[run]]'s per-round lazy checkpoints split
    * the iteration into SEPARATE physical plans — so without pinning,
    * every round (plus the label init) re-runs the fact join: 4
    * executions per query where one suffices. ReuseExchange cannot help
    * across plans (it dedups subtrees within ONE plan — the fixed-loop
    * regime graph_pagerank unrolls into; see PageRank.run's scaladoc
    * for that A/B). Lazily checkpointing the tiny aggregated frame —
    * the graph_triangles nationEdges precedent — makes all rounds read
    * the one materialization. Measured (r13 opt round, sf0.1,
    * median-of-5 isolated): 2.15 s → 1.69 s. */
  def nationCommunities(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c  = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s  = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
               col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(false)
    val names = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    run(edges, iters = 3)
      .join(broadcast(names), Seq("node"))
      .select(col("n_name").as("nation"), col("label").as("community"))
      .orderBy(col("nation"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_label_prop" -> (nationCommunities _))

  private def round(prev: String, out: String): String =
    s"""$out AS (
          SELECT src AS node, label FROM (
            SELECT s.src, l.label,
                   row_number() OVER (PARTITION BY s.src
                     ORDER BY sum(s.w) DESC, l.label) AS rn
            FROM sym s JOIN $prev l ON s.dst = l.node
            GROUP BY s.src, l.label)
          WHERE rn = 1)"""

  val oracles: Map[String, String] = Map(
    "graph_label_prop" ->
      s"""WITH e AS (
            SELECT CAST(c.c_nationkey AS BIGINT) AS src,
                   CAST(s.s_nationkey AS BIGINT) AS dst,
                   CAST(count(*) AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey  = c.c_custkey
            JOIN supplier s ON l.l_suppkey  = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey
            GROUP BY 1, 2),
          sym AS (SELECT src, dst, w FROM e
                  UNION ALL SELECT dst, src, w FROM e),
          l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
          ${round("l0", "l1")},
          ${round("l1", "l2")},
          ${round("l2", "l3")}
          SELECT n.n_name AS nation, l3.label AS community
          FROM l3 JOIN nation n ON l3.node = n.n_nationkey
          ORDER BY nation""")
}
