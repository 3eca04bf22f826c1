package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.{NormalizeUtil, UnicodeNormalize}
import graft.graph.PageRank
import org.apache.spark.unsafe.types.UTF8String

/** Round-5 additions: the Unicode-normalize native expression and the
  * weighted PageRank kernel. All non-ASCII test data is built from
  * \\u escapes so the source file itself can't be silently normalized
  * by an editor. */
class NormalizePageRankSpec extends AnyFunSuite {
  import TestSpark._

  // --- graft_normalize ---------------------------------------------------

  private val decomposed = "caf" + "e\u0301"  // e + combining acute
  private val composed   = "caf\u00e9"        // precomposed e-acute

  test("normalize: NFC fuses combining sequences, NFD expands them") {
    import spark.implicits._
    graft.functions.Registry.register(spark)
    val df = Seq(decomposed).toDF("s").select(
      call_function("graft_normalize", col("s")).as("nfc"),
      call_function("graft_normalize", col("s"), lit("NFD")).as("nfd"),
      call_function("graft_normalize", col("s"), lit("NFKC")).as("nfkc"))
    val r = df.collect().head
    assert(r.getString(0) === composed)
    assert(r.getString(1) === decomposed)
    assert(r.getString(2) === composed)
    // and the composed spelling round-trips to decomposed under NFD
    val d2 = Seq(composed).toDF("s")
      .select(call_function("graft_normalize", col("s"), lit("NFD")))
      .collect().head.getString(0)
    assert(d2 === decomposed)
  }

  test("normalize: NFKC folds compatibility variants (ligature, fullwidth)") {
    import spark.implicits._
    graft.functions.Registry.register(spark)
    val s = "\uFB01le \uFF21\uFF22" // fi-ligature + "le " + fullwidth A, B
    val df = Seq(s).toDF("s")
      .select(call_function("graft_normalize", col("s"), lit("NFKC")).as("k"),
              call_function("graft_normalize", col("s"), lit("NFC")).as("c"))
    val r = df.collect().head
    assert(r.getString(0) === "file AB") // NFKC folds
    assert(r.getString(1) === s)         // NFC preserves
  }

  test("normalize: ASCII fast path returns the input unchanged; " +
       "interpreted eval matches codegen; nulls pass through") {
    import spark.implicits._
    graft.functions.Registry.register(spark)
    val ascii = UTF8String.fromString("plain ascii text 123")
    // fast path: same instance back (isNormalized short-circuit)
    assert(NormalizeUtil.normalize(ascii,
      java.text.Normalizer.Form.NFC.ordinal) eq ascii)
    // interpreted eval (direct Expression.eval, no codegen)
    val e = UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(decomposed), StringType), "NFC")
    assert(e.eval(null).toString === composed)
    val viaDf = Seq(decomposed, (null: String)).toDF("s")
      .select(call_function("graft_normalize", col("s")).as("n")).collect()
    assert(viaDf.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ===
      Seq(composed, null))
  }

  test("normalize: bad form name fails analysis loudly") {
    import spark.implicits._
    graft.functions.Registry.register(spark)
    val ex = intercept[Exception] {
      Seq("x").toDF("s")
        .select(call_function("graft_normalize", col("s"), lit("NFX")))
        .collect()
    }
    assert(ex.getMessage.contains("NFC/NFD/NFKC/NFKD") ||
           ex.getMessage.contains("NFX"))
  }

  // --- PageRank ----------------------------------------------------------

  private def edgesDf(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  private def nodesDf(ids: Seq[String]) = {
    import spark.implicits._
    ids.toDF("id")
  }

  test("pagerank: two-node symmetric cycle converges to equal ranks summing to 1") {
    val ranks = PageRank.run(
      edgesDf(Seq(("a", "b", 1.0), ("b", "a", 1.0))),
      nodesDf(Seq("a", "b")), n = 2L, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks("a") - 0.5) < 1e-12)
    assert(math.abs(ranks("b") - 0.5) < 1e-12)
  }

  test("pagerank: star graph concentrates rank on the hub") {
    // 4 spokes all point at hub; hub points back at one spoke
    val ranks = PageRank.run(
      edgesDf(Seq(("s1", "hub", 1.0), ("s2", "hub", 1.0),
                  ("s3", "hub", 1.0), ("s4", "hub", 1.0),
                  ("hub", "s1", 1.0))),
      nodesDf(Seq("hub", "s1", "s2", "s3", "s4")), n = 5L, iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // hub and s1 trade mass in a 2-cycle (their relative order oscillates
    // with iteration parity); the robust facts are that both dominate the
    // teleport-only spokes, and the symmetric spokes tie exactly
    assert(ranks("hub") > ranks("s2"))
    assert(ranks("s1") > ranks("s2")) // s1 gets the hub's mass back
    assert(math.abs(ranks("s2") - ranks("s4")) < 1e-12) // symmetric spokes
    assert(math.abs(ranks("s2") - 0.15 / 5) < 1e-12)    // teleport only
  }

  test("pagerank: one iteration matches the closed-form hand computation") {
    // a->b (w 3), a->c (w 1): after 1 iter from uniform 1/3,
    // r(b) = 0.05 + 0.85 * (1/3 * 3/4); r(c) = 0.05 + 0.85 * (1/3 * 1/4)
    val ranks = PageRank.run(
      edgesDf(Seq(("a", "b", 3.0), ("a", "c", 1.0))),
      nodesDf(Seq("a", "b", "c")), n = 3L, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks("a") - 0.05) < 1e-12)
    assert(math.abs(ranks("b") - (0.05 + 0.85 * 0.25)) < 1e-12)
    assert(math.abs(ranks("c") - (0.05 + 0.85 * (1.0 / 12))) < 1e-12)
  }

  test("pagerank: weights matter — heavier edge target outranks lighter") {
    val ranks = PageRank.run(
      edgesDf(Seq(("a", "b", 9.0), ("a", "c", 1.0),
                  ("b", "a", 1.0), ("c", "a", 1.0))),
      nodesDf(Seq("a", "b", "c")), n = 3L, iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("b") > ranks("c"))
  }

  test("pagerank convergence loop: fixed point of the power iteration, " +
       "both trans arms identical, stops before maxIters") {
    val edges = edgesDf(Seq(("a", "b", 1.0), ("b", "c", 1.0),
                            ("c", "a", 1.0), ("a", "c", 2.0)))
    val nodes = nodesDf(Seq("a", "b", "c"))
    val (convDf, iters) = PageRank.runToConvergence(
      edges, nodes, n = 3L, tol = 1e-12, maxIters = 200)
    assert(iters < 200, "must converge by delta, not exhaust maxIters")
    val conv = convDf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the fixed point: a long fixed-iteration run lands on the same
    // vector within tolerance
    val fixed = PageRank.run(edges, nodes, n = 3L, iters = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    conv.foreach { case (k, v) => assert(math.abs(v - fixed(k)) < 1e-9, k) }
    // recompute-trans arm is byte-identical in result
    val (noPin, _) = PageRank.runToConvergence(
      edges, nodes, n = 3L, tol = 1e-12, maxIters = 200, pinTrans = false)
    val np = noPin.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    conv.foreach { case (k, v) => assert(math.abs(v - np(k)) < 1e-12, k) }
    assert(math.abs(conv.values.sum - 1.0) < 1e-6) // this graph is dangling-free
  }

  test("graph_pagerank query: 25 rows, ranks positive, teleport floor respected") {
    val rows = PageRank.nationRank(spark, Sf).collect()
    assert(rows.length === 25)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.forall(_ >= 0.15 / 25 - 1e-9)) // teleport mass floor
    // ordered desc
    assert(ranks.toSeq === ranks.sorted(Ordering[Double].reverse).toSeq)
  }
}
