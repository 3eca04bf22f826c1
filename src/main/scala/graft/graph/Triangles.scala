package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Distributed triangle counting + degree profile over an undirected
  * edge frame — closes the graph family (components, communities,
  * PageRank) with the standard cohesion metrics the reference's
  * pair-network report (reports/handlers.py provider-collaboration
  * rollup) could feed.
  *
  * Scale shape (Suri & Vassilvitskii, "Counting triangles and the
  * curse of the last reducer", WWW'11): edges are ORIENTED from the
  * (degree, id)-smaller endpoint to the larger one before the wedge
  * join. Every triangle then materializes exactly once (no /6
  * correction, no distinct), and each node's out-adjacency in the
  * oriented graph is O(√m), so the wedge join's per-key fan-out — the
  * "last reducer" that kills naive triangle counting on skewed graphs
  * — is bounded regardless of hub degree. Two shuffles total: the
  * wedge self-join and the closing edge join.
  */
object Triangles {

  /** Canonical undirected edge list: (a, b) with a < b, self-loops
    * dropped, duplicates collapsed. */
  private def canonical(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-node undirected degree of the canonical graph. */
  def degrees(edges: DataFrame): DataFrame = {
    val und = canonical(edges)
    und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }

  /** One row per triangle, as the sorted node triple (x < y < z). */
  def triangleList(edges: DataFrame): DataFrame = {
    val und = canonical(edges)
    val deg = degrees(edges)
    // orient a→b iff (deg(a), a) < (deg(b), b): a total order, so the
    // oriented graph is acyclic and each triangle appears exactly once
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("degree", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("lo"), col("b").as("hi")))
      .otherwise(struct(col("b").as("lo"), col("a").as("hi"))).as("e"))
      .select(col("e.lo").as("u"), col("e.hi").as("v"))
    val e1 = oriented
    val e2 = oriented.select(col("u").as("u2"), col("v").as("w"))
    val wedges = e1.join(e2, col("v") === col("u2"))      // u→v→w
      .select(col("u"), col("v"), col("w"))
    val closing = canonical(edges)
      .select(col("a").as("ca"), col("b").as("cb"))
    wedges.join(closing,
        (least(col("u"), col("w")) === col("ca")) &&
        (greatest(col("u"), col("w")) === col("cb")),
        "left_semi")
      .select(
        least(col("u"), least(col("v"), col("w"))).as("x"),
        greatest(col("u"), greatest(col("v"), col("w"))).as("z"),
        (col("u").cast("long") + col("v") + col("w")).as("s"))
      .select(col("x"), (col("s") - col("x") - col("z")).as("y"), col("z"))
  }

  /** Nation trade graph (the rpt_pair_network edge set, undirected):
    * global triangle census — node/edge/triangle counts and the global
    * clustering coefficient 3·triangles / wedges. */
  def nationTriangles(spark: SparkSession, dir: String): DataFrame = {
    val e = nationEdges(spark, dir)
    val tri = triangleList(e).agg(count(lit(1)).as("n_triangles"))
    val deg = degrees(e)
    val prof = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("degree")) / 2).cast("long").as("n_edges"),
      sum(col("degree") * (col("degree") - lit(1)) / lit(2)).cast("long")
        .as("n_wedges"))
    prof.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        rnd(lit(3.0) * col("n_triangles") / col("n_wedges"), 4)
          .as("clustering"))
  }

  /** Degree histogram of the nation trade graph: degree → node count
    * (the q13-style two-level aggregation on a graph). */
  def nationDegreeHist(spark: SparkSession, dir: String): DataFrame =
    degrees(nationEdges(spark, dir))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  /** The pair-network edge set: nations trading with each other
    * (cust nation ↔ supp nation through lineitem⋈orders), SPARSIFIED
    * to pairs with above-average trade volume. The relative threshold
    * is scale-invariant (at every SF roughly the same fraction of
    * pairs survives — an absolute count cutoff would make the graph
    * complete at one SF and empty at another), and it keeps the
    * triangle census non-degenerate: the unfiltered nation graph is
    * the complete K25 already at sf0.01. The per-pair count frame is
    * ≤ 300 rows but derives from the full fact join, so it is lazily
    * checkpointed — the threshold scan and the edge output both read
    * the SAME materialization, never re-running the join. */
  private def nationEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c  = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s  = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val pairCounts = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(
        least(col("c_nationkey"), col("s_nationkey")).cast("long").as("pa"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("pb"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val cut = pairCounts.agg(avg(col("cnt")).as("ac"))
    pairCounts.crossJoin(broadcast(cut))
      .filter(col("cnt") >= col("ac"))
      .select(col("pa").as("src"), col("pb").as("dst"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_triangles"   -> (nationTriangles _),
    "graph_degree_hist" -> (nationDegreeHist _))

  val oracles: Map[String, String] = Map(
    "graph_triangles" ->
      """WITH pc AS (
           SELECT least(CAST(c_nationkey AS BIGINT), CAST(s_nationkey AS BIGINT)) AS a,
                  greatest(CAST(c_nationkey AS BIGINT), CAST(s_nationkey AS BIGINT)) AS b,
                  count(*) AS cnt
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE c_nationkey <> s_nationkey
           GROUP BY 1, 2),
         und AS (
           SELECT a, b FROM pc
           WHERE cnt >= (SELECT avg(cnt) FROM pc)),
         deg AS (
           SELECT node, count(*) AS degree FROM (
             SELECT a AS node FROM und UNION ALL SELECT b FROM und)
           GROUP BY 1),
         tri AS (
           SELECT count(*) AS n_triangles
           FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3
             ON e3.a = e1.a AND e3.b = e2.b),
         prof AS (
           SELECT count(*) AS n_nodes,
                  CAST(sum(degree) / 2 AS BIGINT) AS n_edges,
                  CAST(sum(degree * (degree - 1) / 2) AS BIGINT) AS n_wedges
           FROM deg)
         SELECT n_nodes, n_edges, n_triangles,
                floor((3.0 * n_triangles / n_wedges) * 10000 + 0.5) / 10000
                  AS clustering
         FROM prof CROSS JOIN tri""",
    "graph_degree_hist" ->
      """WITH pc AS (
           SELECT least(CAST(c_nationkey AS BIGINT), CAST(s_nationkey AS BIGINT)) AS a,
                  greatest(CAST(c_nationkey AS BIGINT), CAST(s_nationkey AS BIGINT)) AS b,
                  count(*) AS cnt
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE c_nationkey <> s_nationkey
           GROUP BY 1, 2),
         und AS (
           SELECT a, b FROM pc
           WHERE cnt >= (SELECT avg(cnt) FROM pc)),
         deg AS (
           SELECT node, count(*) AS degree FROM (
             SELECT a AS node FROM und UNION ALL SELECT b FROM und)
           GROUP BY 1)
         SELECT degree, count(*) AS n_nodes
         FROM deg GROUP BY 1 ORDER BY degree""")
}
