package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** Distributed weighted PageRank over an edge frame — the influence
  * ranking the reference's pair-network report (reports/handlers.py's
  * provider-collaboration rollup) stops one step short of: not just who
  * links to whom, but which nodes the whole link mass concentrates on.
  *
  * Contract: `edges` has columns (src, dst, w); ranks are computed over
  * the given `nodes` frame (single column, the node id), so nodes with
  * no in-links still receive the teleport mass (1-d)/n. Dangling mass
  * is not redistributed (both the oracle and this impl drop it — the
  * usual simplification when ranks are compared, not consumed as a
  * probability).
  *
  * Scale shape: per iteration, one shuffle — `edges ⋈ ranks` on src,
  * then a groupBy dst with map-side partial sums. The ranks frame is
  * node-sized (≪ edges at any real scale) and broadcasts automatically
  * when small; edge normalization (w/out_weight) is computed ONCE
  * before the loop, not per iteration. A fixed iteration count keeps
  * the plan static and bench-comparable; production convergence loops
  * would checkpoint ranks per round exactly like
  * ConnectedComponents' large regime.
  */
object PageRank {

  /** @param edges (src, dst, w) weighted directed edges. PRECONDITION:
    *              w > 0 — a src whose weights sum to exactly 0 has no
    *              transition distribution, and under ANSI mode the
    *              w/Σw normalization would throw DIVIDE_BY_ZERO.
    *              Filter zero-weight edges out before calling (they
    *              carry no rank mass by definition).
    * @param nodes single-column frame of node ids
    * @param n     node count (pass the dimension's known size; counting
    *              a 100 TB-derived frame to learn a constant is a job)
    * @param iters fixed power-iteration count
    * @param damping teleport damping factor */
  def run(edges: DataFrame, nodes: DataFrame, n: Long,
          iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val id = nodes.columns.head
    val outW = edges.groupBy("src").agg(sum("w").as("ow"))
    // transition probability per edge, computed once. Deliberately NOT
    // localCheckpoint-ed: with a FIXED iteration count the loop unrolls
    // into ONE plan whose per-iteration `trans` subtrees are identical
    // exchanges, so ReuseExchange computes the edge build once — a
    // forced materialization is at best a wash (10M-edge 5-run-median
    // A/B, tools.GraphLadder: 5.07 s unchecked vs 5.17 s checkpointed;
    // LabelProp's sym frame read the same way, 9.75 vs 12.14 s). A
    // production CONVERGENCE loop (unbounded iters, ranks checkpointed
    // per round to truncate lineage) should pin `trans` once up front —
    // there the plan is no longer one reusable DAG.
    val trans = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
    var ranks = nodes.select(col(id).as("node"), lit(1.0 / n).as("r"))
    (1 to iters).foreach { _ =>
      ranks = step(trans, nodes, id, ranks, n, damping)
    }
    ranks
  }

  /** One power iteration: edges⋈ranks on src (one shuffle), groupBy dst
    * with map-side partial sums, teleport re-added over ALL nodes. */
  private def step(trans: DataFrame, nodes: DataFrame, id: String,
                   ranks: DataFrame, n: Long, damping: Double): DataFrame = {
    val contrib = trans.join(ranks, trans("src") === ranks("node"))
      .groupBy("dst").agg(sum(col("p") * col("r")).as("c"))
    nodes.select(col(id).as("node"))
      .join(contrib, col("node") === contrib("dst"), "left")
      .select(col("node"),
        (lit((1 - damping) / n) + lit(damping) * coalesce(col("c"), lit(0.0)))
          .as("r"))
  }

  /** The CONVERGENCE-loop regime [[run]]'s scaladoc documents: iterate
    * until the L1 rank delta drops under `tol` (or `maxIters`), with
    * per-round lineage truncation — unlike the fixed-iteration entry,
    * the plan here is NOT one unrolled DAG, so ReuseExchange cannot
    * dedup the per-iteration `trans` subtrees and both frames must be
    * pinned explicitly:
    *
    *  - `trans` is eagerly localCheckpoint-ed ONCE up front (`pinTrans
    *    = false` keeps the recompute-per-round arm runnable for the
    *    GraphLadder A/B — the measured case for why pinning is the
    *    default in this regime, the opposite of the fixed-loop
    *    verdict).
    *  - `ranks` is localCheckpoint-ed EVERY round — the round-N frame
    *    otherwise carries N chained shuffles of lineage, and the L1
    *    delta check re-evaluates it twice per round.
    *
    * The delta check is one node-sized self-join + 1-row collect per
    * round — a bounded convergence statistic, same contract as the
    * k-means/BPE argmax collects. Returns (ranks, iterations run).
    * Blocks pinned by intermediate rounds are freed as soon as the
    * next round lands — via [[graft.CheckpointBlocks]], because
    * `Dataset.unpersist` does NOT release checkpoint blocks (it only
    * uncaches CacheManager entries; a checkpointed frame's blocks
    * belong to the RDD under its LogicalRDD plan, reclaimed otherwise
    * only by GC-lazy ContextCleaner — over up to `maxIters` rounds
    * that is `maxIters` node-sized block sets of pressure). `trans`'s
    * blocks are freed on return (the returned ranks frame is its own
    * eager checkpoint, self-contained); the caller owns only the
    * returned frame's blocks. */
  def runToConvergence(edges: DataFrame, nodes: DataFrame, n: Long,
                       tol: Double = 1e-9, maxIters: Int = 50,
                       damping: Double = 0.85,
                       pinTrans: Boolean = true): (DataFrame, Int) = {
    val id = nodes.columns.head
    val outW = edges.groupBy("src").agg(sum("w").as("ow"))
    val trans0 = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
    val trans = if (pinTrans) trans0.localCheckpoint(true) else trans0
    var ranks = nodes.select(col(id).as("node"), lit(1.0 / n).as("r"))
      .localCheckpoint(true)
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIters && delta > tol) {
      val next = step(trans, nodes, id, ranks, n, damping)
        .localCheckpoint(true)
      delta = next
        .join(ranks.select(col("node"), col("r").as("r0")), "node")
        .agg(sum(abs(col("r") - col("r0"))).as("d"))
        .collect().head.getDouble(0)
      // release the retired round's CHECKPOINT blocks (next is its own
      // eager checkpoint, so nothing reads the old frame again)
      graft.CheckpointBlocks.free(ranks)
      ranks = next
      it += 1
    }
    if (pinTrans) graft.CheckpointBlocks.free(trans)
    (ranks, it)
  }

  /** Nation-level trade-flow PageRank: the pair-network edge set
    * (cust_nation → supp_nation, link count as weight) ranked for
    * influence. 25-node graph — the ranks side of every join is a
    * broadcast; the edge build is the same two-fact join as
    * rpt_pair_network. */
  def nationRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c  = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s  = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val cn = Tables.nation(spark, dir).select(col("n_nationkey").as("cn_key"),
                                              col("n_name").as("src"))
    val sn = Tables.nation(spark, dir).select(col("n_nationkey").as("sn_key"),
                                              col("n_name").as("dst"))
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("w"))
    val nations = Tables.nation(spark, dir).select(col("n_name"))
    run(edges, nations, n = 25L)
      .select(col("node").as("nation"), rnd(col("r"), 5).as("rank"))
      .orderBy(col("rank").desc, col("nation"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (nationRank _))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      """WITH edges AS (
           SELECT cn.n_name AS src, sn.n_name AS dst,
                  CAST(count(*) AS DOUBLE) AS w
           FROM lineitem l
           JOIN orders o   ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey  = c.c_custkey
           JOIN supplier s ON l.l_suppkey  = s.s_suppkey
           JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
           JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
           WHERE cn.n_name <> sn.n_name
           GROUP BY 1, 2),
         trans AS (
           SELECT e.src, e.dst, e.w / o.ow AS p
           FROM edges e
           JOIN (SELECT src, sum(w) AS ow FROM edges GROUP BY 1) o
             ON o.src = e.src),
         r0 AS (SELECT n_name AS node, 1.0 / 25 AS r FROM nation),
         c1 AS (SELECT t.dst, sum(t.p * r.r) AS c FROM trans t
                JOIN r0 r ON r.node = t.src GROUP BY 1),
         r1 AS (SELECT n.n_name AS node,
                       0.15 / 25 + 0.85 * coalesce(c1.c, 0) AS r
                FROM nation n LEFT JOIN c1 ON c1.dst = n.n_name),
         c2 AS (SELECT t.dst, sum(t.p * r.r) AS c FROM trans t
                JOIN r1 r ON r.node = t.src GROUP BY 1),
         r2 AS (SELECT n.n_name AS node,
                       0.15 / 25 + 0.85 * coalesce(c2.c, 0) AS r
                FROM nation n LEFT JOIN c2 ON c2.dst = n.n_name),
         c3 AS (SELECT t.dst, sum(t.p * r.r) AS c FROM trans t
                JOIN r2 r ON r.node = t.src GROUP BY 1),
         r3 AS (SELECT n.n_name AS node,
                       0.15 / 25 + 0.85 * coalesce(c3.c, 0) AS r
                FROM nation n LEFT JOIN c3 ON c3.dst = n.n_name)
         SELECT node AS nation,
                floor(r * 100000 + 0.5) / 100000 AS rank
         FROM r3
         ORDER BY rank DESC, nation""")
}
