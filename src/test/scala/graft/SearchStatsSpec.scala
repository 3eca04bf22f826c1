package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape checks for the retrieval (operators/Search)
  * and inferential-stats (operators/Stats) waves. Value parity vs
  * DuckDB is the driver's job; these pin the invariants the oracle
  * can't see and the plan shapes that decide 100 TB viability. */
class SearchStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("rag_bm25 ranks are contiguous and scores non-increasing per query") {
    val rows = operators.Search.bm25(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ===
             (1L to sorted.length).toSeq, "ranks must be 1..n")
      val scores = sorted.map(_.getAs[Double]("score_bm25")).toSeq
      assert(scores === scores.sorted.reverse, "scores non-increasing")
      assert(scores.forall(_ > 0.0), "BM25 of a matched doc is positive")
    }
  }

  test("rag_bm25 only returns documents containing at least one query term") {
    val hits = operators.Search.bm25(spark, Sf)
      .select(col("doc_id")).distinct()
    val docs = Tables.documents(spark, Sf)
    // match against the tokenizer's normalization (lowercase) so a doc
    // carrying only capitalized forms still counts as containing the term
    val withTerm = docs.filter(
      lower(col("text"))
        .rlike("\\b(spark|merge|window|hash|join|customer|filter|scan|stream)\\b"))
      .select(col("doc_id"))
    assert(hits.join(withTerm, Seq("doc_id"), "left_anti").count() === 0,
      "every hit must contain a query term")
  }

  test("rag_bm25 ranks through TopKPerKey with a map-side partial pass") {
    val plan = operators.Search.bm25(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan.take(3000))
  }

  test("rag_hybrid_rrf score is exactly the recomputed RRF combiner") {
    val rows = operators.Search.hybridRrf(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rd = r.getAs[Long]("r_dense")
      val rs = r.getAs[Long]("r_sparse")
      val expect = (if (rd > 0) 1.0 / (60 + rd) else 0.0) +
                   (if (rs > 0) 1.0 / (60 + rs) else 0.0)
      val got = r.getAs[Double]("rrf_score")
      assert(math.abs(got - expect) < 1e-6, s"row $r expected $expect")
      assert(rd > 0 || rs > 0, "a fused doc must appear in some list")
    }
    // a doc present in BOTH lists at rank 1 would score 2/61; any
    // single-list doc caps at 1/61 — fusion must order accordingly
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("rrf_score")).toSeq
      assert(sorted === sorted.sorted.reverse, "fused scores non-increasing")
    }
  }

  test("etl_expectations emits one verdict row per declared constraint") {
    val rows = operators.Stats.expectations(spark, Sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val obs = r.getAs[Double]("observed")
      assert(obs >= 0.0 && obs <= 1.0, s"metric out of range: $r")
    }
    val uniq = rows.find(_.getAs[String]("expectation") == "unique_pk:o_orderkey").get
    assert(uniq.getAs[Boolean]("passed"), "synthetic orders PK must be unique")
    val comp = rows.find(_.getAs[String]("expectation") == "completeness:o_custkey").get
    assert(comp.getAs[Double]("observed") === 1.0)
  }

  test("rpt_kaplan_meier survival is a proper non-increasing curve from (0,1]") {
    val rows = operators.Stats.kaplanMeier(spark, Sf)
      .orderBy(col("t_days")).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival")).toSeq
    assert(surv === surv.sorted.reverse, "survival must be non-increasing")
    assert(surv.head <= 1.0 && surv.forall(s => s >= 0.0 && s <= 1.0))
    // first event row: S = 1 - d/n exactly
    val first = rows.head
    val manual = 1.0 - first.getAs[Long]("d_events").toDouble /
                       first.getAs[Long]("n_risk").toDouble
    assert(math.abs(first.getAs[Double]("survival") - manual) < 1e-6)
    // at-risk counts strictly decrease over event times
    val risk = rows.map(_.getAs[Long]("n_risk")).toSeq
    assert(risk === risk.sorted.reverse)
  }

  test("rpt_ab_test arms partition the user universe and z is finite") {
    val r = operators.Stats.abTest(spark, Sf).collect().head
    val users = Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    val z = r.getAs[Double]("z_score")
    assert(!z.isNaN && !z.isInfinite)
    val pooledSig = math.abs(z) >= 1.96
    assert(r.getAs[Boolean]("significant") === pooledSig)
  }

  test("rpt_lift_curve gains reach 1.0 and doc counts cover the corpus") {
    val rows = operators.TextOps.liftCurve(spark, Sf)
      .orderBy(col("bin").desc).collect()
    assert(rows.nonEmpty)
    // cumulative gain is monotone non-decreasing top-down and ends at 1
    val gains = rows.map(_.getAs[Double]("cum_gain")).toSeq
    assert(gains === gains.sorted)
    assert(math.abs(gains.last - 1.0) < 1e-9)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, Sf).count())
    // count-weighted mean lift is 1 by construction
    val wl = rows.map(r => r.getAs[Long]("n_docs") * r.getAs[Double]("lift")).sum
    assert(math.abs(wl / total - 1.0) < 0.01)
  }

  test("rpt_auc equals a driver-side Mann-Whitney computation") {
    val row = operators.TextOps.auc(spark, Sf).collect().head
    val data = operators.TextOps.qualityModel(spark, Sf)
      .select(col("doc_id"), col("prob"))
      .join(Tables.documents(spark, Sf).select(col("doc_id"), col("lang")),
            Seq("doc_id"))
      .select(col("prob"), (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getAs[Double]("prob"), r.getAs[Boolean]("pos")))
    // average ranks with ties, 1-based ascending
    val sorted = data.sortBy(_._1)
    val rankOf = sorted.zipWithIndex.groupBy(_._1._1).map { case (p, g) =>
      p -> (g.map(_._2 + 1).sum.toDouble / g.length)
    }
    val np = data.count(_._2).toLong
    val nn = data.length - np
    val rpos = data.filter(_._2).map(d => rankOf(d._1)).sum
    val want = (rpos - np * (np + 1.0) / 2) / (np.toDouble * nn)
    assert(row.getAs[Long]("n_pos") === np)
    assert(row.getAs[Long]("n_neg") === nn)
    assert(math.abs(row.getAs[Double]("auc") - want) < 1e-6,
      s"AUC mismatch: got ${row.getAs[Double]("auc")}, want $want")
  }

  test("rpt_chi_square equals a driver-side contingency computation") {
    val row = operators.Stats.chiSquare(spark, Sf).collect().head
    val cells = Tables.orders(spark, Sf)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count")).toMap
    val n = cells.values.sum.toDouble
    val rowT = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum.toDouble }
    val colT = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum.toDouble }
    val want = cells.map { case ((p, s), c) =>
      val e = rowT(p) * colT(s) / n
      (c - e) * (c - e) / e
    }.sum
    assert(row.getAs[Long]("n_rows").toDouble === n)
    assert(row.getAs[Long]("dof") ===
      (rowT.size - 1).toLong * (colT.size - 1).toLong)
    assert(math.abs(row.getAs[Double]("chi2") - want) < 1e-3,
      s"chi2 mismatch: got ${row.getAs[Double]("chi2")}, want $want")
  }

  test("rpt_ks_test distance is a bounded ECDF gap and populations partition orders") {
    val row = operators.Stats.ksTest(spark, Sf).collect().head
    val d = row.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
    assert(row.getAs[Double]("critical_05") > 0.0)
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") ===
      Tables.orders(spark, Sf).count())
    assert(row.getAs[Boolean]("significant") === (d > row.getAs[Double]("critical_05")))
  }

  test("rpt_bootstrap_ci brackets the mean at roughly the analytic width") {
    val row = operators.Stats.bootstrapCi(spark, Sf).collect().head
    val mean = row.getAs[Double]("mean")
    val (lo, hi) = (row.getAs[Double]("ci_lo"), row.getAs[Double]("ci_hi"))
    assert(lo < mean && mean < hi, s"CI must bracket the mean: $row")
    assert(row.getAs[Long]("b_replicates") === 32L)
    // percentile CI width should be the same order as the normal
    // approximation 2*1.96*sd/sqrt(n) (loose band: B=32 is noisy)
    val st = Tables.orders(spark, Sf)
      .agg(stddev(col("o_totalprice")).as("sd"), count(lit(1)).as("n"))
      .collect().head
    val analytic = 2 * 1.96 * st.getAs[Double]("sd") /
      math.sqrt(st.getAs[Long]("n").toDouble)
    val width = hi - lo
    assert(width > analytic / 3 && width < analytic * 3,
      s"CI width $width vs analytic $analytic out of band")
  }

  test("rpt_bootstrap_ci plan is ONE un-exploded aggregate pass") {
    // The B=32 Poisson replicates are aggregate EXPRESSIONS, not an
    // explode(B) row multiplication: the optimized plan must carry no
    // Generate (explode) and no Join (the old base×ci crossJoin), and
    // exactly one logical Aggregate — scan cost of a plain mean.
    val qe = operators.Stats.bootstrapCi(spark, Sf).queryExecution
    val opt = qe.optimizedPlan.toString
    assert(!opt.contains("Generate"), s"explode leaked back in:\n$opt")
    assert(!opt.contains("Join"), s"join leaked back in:\n$opt")
    val aggs = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size === 1, s"expected ONE aggregate pass, got ${aggs.size}")
  }

  test("rag_mmr demotes a planted exact duplicate that plain cosine ranks second") {
    import spark.implicits._
    val d10 = Seq(0.99f, 0.141f, 0f, 0f)
    val planted = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),  // the query vector
      (10L, d10),                 // most relevant
      (11L, d10),                 // EXACT copy of 10 — redundant
      (12L, Seq(0.8f, 0f, 0.6f, 0f))) // relevant and diverse
      .toDF("vec_id", "embedding")
    val out = operators.Search.mmrOn(spark, planted, k = 3, lambda = 0.5)
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("doc_id")).toSeq
    // greedy: 10 first (ties to lowest id), then the DIVERSE 12 beats
    // the exact copy 11 (whose redundancy penalty is maximal)
    assert(out === Seq(10L, 12L, 11L), s"got $out")
  }

  test("rag_mmr rank-1 is the plain cosine top-1 and ranks are contiguous") {
    val mmr = operators.Search.mmrRerank(spark, Sf).collect()
    assert(mmr.nonEmpty)
    mmr.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq)
    }
    // with no prior selection the rank-1 pick maximizes lambda*sim — the
    // same argmax as cosine top-1
    val top1 = similarity.Knn.topK(spark, Sf).collect()
      .filter(r => r.getAs[Long]("rank") == 1L &&
        Set(1L, 2L, 3L).contains(r.getAs[Long]("query_id")))
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    mmr.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      assert(top1(r.getAs[Long]("query_id")) === r.getAs[Long]("doc_id"),
        s"rank-1 must equal cosine top-1: $r")
    }
  }

  test("rag_mmr ≡ an independent driver-side MMR on random corpora " +
       "(duplicates planted, every λ/k shape)") {
    import spark.implicits._
    // Independent reference, arithmetic-identical by construction:
    // cosine is the same index-ordered float→double accumulate as
    // DotProduct.nullSafeEval, rounding the same floor(x·1e4+.5)/1e4
    // as Num.rnd — so equality is exact, not approximate.
    def cos(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    def reference(vecs: Map[Long, IndexedSeq[Float]], k: Int,
                  lambda: Double): Seq[(Long, Long, Long, Double)] =
      (1L to 3L).flatMap { qid =>
        val q = vecs(qid)
        // the candidate generator's contract: top-20 by rounded sim
        // desc, doc_id asc (TopKPerKey with tiebreak)
        val cands = vecs.toSeq.filter(_._1 != qid)
          .map { case (id, v) => (id, r4(cos(q, v)), v) }
          .sortBy(c => (-c._2, c._1)).take(20)
        val chosen = scala.collection.mutable.ArrayBuffer
          .empty[IndexedSeq[Float]]
        val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
        (1L to math.min(k, cands.size).toLong).map { rank =>
          val best = remaining.minBy { c =>
            val red = if (chosen.isEmpty) 0.0
                      else chosen.iterator.map(s => cos(c._3, s)).max
            (-(lambda * c._2 - (1 - lambda) * red), c._1)
          }
          val red = if (chosen.isEmpty) 0.0
                    else chosen.iterator.map(s => cos(best._3, s)).max
          chosen += best._3
          remaining -= best
          (qid, rank, best._1, r4(lambda * best._2 - (1 - lambda) * red))
        }
      }
    val rnd = new scala.util.Random(1337)
    (0 until 8).foreach { trial =>
      val dim = if (trial % 2 == 0) 4 else 8
      val n = 10 + rnd.nextInt(50)
      val k = Seq(3, 5, 10)(trial % 3)
      val lambda = Seq(0.3, 0.5, 0.7, 0.9)(trial % 4)
      val vecs = scala.collection.mutable.Map.empty[Long, IndexedSeq[Float]]
      (1L to n.toLong).foreach { id =>
        // ~20% planted duplicates of an earlier vector — the redundancy
        // penalty must bite, not just order by sim
        vecs(id) =
          if (id > 3L && rnd.nextDouble() < 0.2)
            vecs(1L + rnd.nextInt(id.toInt - 1))
          else IndexedSeq.fill(dim)(rnd.nextFloat() * 2f - 1f + 0.01f)
      }
      val df = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      val got = operators.Search.mmrOn(spark, df, k, lambda)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
      val want = reference(vecs.toMap, k, lambda).sortBy(t => (t._1, t._2))
      assert(got === want, s"trial $trial (n=$n dim=$dim k=$k λ=$lambda)")
      // structural invariants on top of equality: distinct picks, and
      // rank 1 = the plain rounded-cosine argmax (no redundancy term
      // yet). Scores are NOT monotone in rank here: cosine is signed,
      // so an all-anti-correlated chosen set gives a NEGATIVE max
      // redundancy that boosts a later pick above an earlier one —
      // first observed on trial corpora, kept out of the invariants.
      got.groupBy(_._1).foreach { case (qid, rs) =>
        assert(rs.map(_._3).distinct.size === rs.size, s"q$qid repeats a doc")
        val top1 = vecs.toSeq.filter(_._1 != qid)
          .map { case (id, v) => (id, r4(cos(vecs(qid), v))) }
          .minBy(c => (-c._2, c._1))._1
        assert(rs.minBy(_._2)._3 === top1, s"q$qid rank-1 ≠ cosine argmax")
      }
    }
  }

  test("text_zipf_fit recovers slope ~ -1 on a planted Zipfian corpus") {
    import spark.implicits._
    // term i appears floor(2000/i) times: frequency ∝ 1/rank exactly
    val words = (1 to 50).flatMap(i => Seq.fill(2000 / i)(s"term$i"))
    val docs = words.grouped(200).zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val row = operators.TextOps.zipfFitOn(docs).collect().head
    val slope = row.getAs[Double]("zipf_slope")
    assert(math.abs(slope - (-1.0)) < 0.05, s"slope $slope should be ~ -1")
    assert(row.getAs[Double]("r2") > 0.99, s"r2 ${row.getAs[Double]("r2")}")
  }

  test("rpt_anova agrees with group/total variance recomputed on the driver") {
    val row = operators.Stats.anova(spark, Sf).collect().head
    val data = Tables.orders(spark, Sf)
      .select(col("o_orderpriority"), (col("o_totalprice") / 1000.0).as("x"))
      .collect().map(r => (r.getString(0), r.getAs[Double]("x")))
    val n = data.length.toDouble
    val k = data.map(_._1).distinct.length
    val grand = data.map(_._2).sum / n
    val ssb = data.groupBy(_._1).map { case (_, g) =>
      val m = g.map(_._2).sum / g.length
      g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = data.groupBy(_._1).map { case (_, g) =>
      val m = g.map(_._2).sum / g.length
      g.map(v => (v._2 - m) * (v._2 - m)).sum
    }.sum
    val want = (ssb / (k - 1)) / (ssw / (n - k))
    assert(row.getAs[Long]("k_groups") === k.toLong)
    assert(math.abs(row.getAs[Double]("f_stat") - want) < 0.01,
      s"F mismatch: got ${row.getAs[Double]("f_stat")}, want $want")
  }

  test("rag_bm25 prunes the documents scan to doc_id + text") {
    val plan = operators.Search.bm25(spark, Sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val reads = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(reads.contains("struct<doc_id:bigint,text:string>"),
      s"documents scan must prune to the two used columns:\n$reads")
    assert(!reads.contains("lang") && !reads.contains("source"),
      s"unused metadata columns leaked into the scan:\n$reads")
  }

  test("etl_pit_join pushes the custkey bound into both parquet scans") {
    val plan = operators.Etl.pitJoin(spark, Sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("LessThan(o_custkey,50)"),
      s"custkey filter must reach the orders scan:\n$pushed")
  }

  test("etl_expectations is a single-scan aggregate (one Expand at most, no joins)") {
    val plan = operators.Stats.expectations(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
  }
}
