package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the privacy wave (operators/Pii). Value parity
  * vs DuckDB is the driver's job (all four entries carry full oracles);
  * these pin the redaction invariants the hash compare can't express
  * as properties: completeness (no residual PII after the scrub),
  * idempotence, precision on planted fixtures, and the clean-corpus
  * zero-false-positive guarantee. */
class PiiSpec extends AnyFunSuite {
  import TestSpark._

  private val allPats = Seq(operators.Pii.PhonePat, operators.Pii.SsnPat,
                            operators.Pii.EmailPat, operators.Pii.IpPat)

  test("scrub removes every match of every pattern (completeness)") {
    val scrubbed = operators.Pii.piiScrub(spark, Sf)
    allPats.foreach { p =>
      val residual = scrubbed
        .filter(size(regexp_extract_all(col("note_redacted"), lit(p), lit(0))) > 0)
        .count()
      assert(residual === 0L, s"pattern $p survives the scrub")
    }
  }

  test("scrub is idempotent") {
    val once = operators.Pii.notes(spark, Sf)
      .select(col("c_custkey"), operators.Pii.scrub(col("note")).as("r1"))
    val twice = once.select(col("c_custkey"),
      (operators.Pii.scrub(col("r1")) === col("r1")).as("fixed"))
    assert(twice.filter(!col("fixed")).count() === 0L)
  }

  test("planted fixtures: each type redacts exactly, clean text untouched") {
    import spark.implicits._
    val fixtures = Seq(
      ("call 555-123-4567 now",        "call [PHONE] now"),
      ("ssn 123-45-6789.",             "ssn [SSN]."),
      ("mail a.b%c+d@ex-1.co today",   "mail [EMAIL] today"),
      ("host 10.0.255.1 up",           "host [IP] up"),
      // boundary guards: longer digit runs are NOT a phone
      ("id 1555-123-4567 raw",         "id 1555-123-4567 raw"),
      // known (documented) limit: `\b` can't see the trailing dot, so a
      // dotted quintuple redacts its first quad — identical in RE2 and
      // Java (neither side can use lookahead dialect-neutrally)
      ("v 1.2.3.4.5 semver-ish",       "v [IP].5 semver-ish"),
      ("no pii here 42",               "no pii here 42"))
      .toDF("raw", "expected")
    val out = fixtures.select(col("expected"),
      operators.Pii.scrub(col("raw")).as("got")).collect()
    out.foreach { r =>
      assert(r.getString(1) === r.getString(0))
    }
  }

  test("pii_found counts the tokens the scrub removes, row by row") {
    // pii_found must equal the number of [TYPE] markers in the output
    val rows = operators.Pii.piiScrub(spark, Sf)
      .select(col("pii_found"),
        (size(split(col("note_redacted"), "\\[PHONE\\]|\\[SSN\\]|\\[EMAIL\\]|\\[IP\\]"))
          - 1).cast("long").as("markers"))
    assert(rows.filter(col("pii_found") =!= col("markers")).count() === 0L)
  }

  test("documents corpus is PII-clean (zero false positives at corpus scale)") {
    val docs = Tables.documents(spark, Sf)
    val flagged = docs.filter(
      allPats.map(p => size(regexp_extract_all(col("text"), lit(p), lit(0))) > 0)
        .reduce(_ || _)).count()
    assert(flagged === 0L, "synthetic documents must not trip the detector")
  }

  test("k-anonymity accounting is internally consistent") {
    val rows = operators.Pii.kAnonymity(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(2L, 5L, 10L))
    val classes = rows.head.getAs[Long]("classes")
    // risk is monotone in k, bounded by the class/row totals
    val atRisk = rows.map(_.getAs[Long]("classes_at_risk")).toSeq
    assert(atRisk === atRisk.sorted)
    assert(atRisk.forall(_ <= classes))
    val rowsAtRisk = rows.map(_.getAs[Long]("rows_at_risk")).toSeq
    assert(rowsAtRisk === rowsAtRisk.sorted)
    val total = Tables.customer(spark, Sf).count()
    assert(rowsAtRisk.forall(_ <= total))
  }

  test("l-diversity risk is monotone and bounded") {
    val rows = operators.Pii.lDiversity(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("l")).toSeq === Seq(2L, 3L, 5L))
    val atRisk = rows.map(_.getAs[Long]("classes_at_risk")).toSeq
    assert(atRisk === atRisk.sorted)
    assert(atRisk.forall(_ <= rows.head.getAs[Long]("classes")))
  }

  test("t-closeness matches an independent exact recomputation") {
    // recompute TVD per class from raw counts with BigInt arithmetic —
    // a DIFFERENT formulation (explicit per-segment |p-q| over the full
    // segment set) than the operator's missing-mass algebra
    val cells = Tables.customer(spark, Sf)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
      .groupBy("c_nationkey", "bal_bucket", "c_mktsegment").count()
      .collect()
      .map(r => ((String.valueOf(r.get(0)), r.getAs[Long]("bal_bucket")),
                 r.getAs[String]("c_mktsegment"), r.getAs[Long]("count")))
    val segs = cells.map(_._2).distinct
    val global = segs.map(s => s -> cells.filter(_._2 == s).map(_._3).sum).toMap
    val grand = global.values.sum
    val byClass = cells.groupBy(_._1)
    // TVD > t ⇔ Σ|c_i·G − g_i·n| > 2t·nG; with t = a/b that is
    // b·Σ > 2a·nG — exact rationals, no doubles anywhere
    def atRisk(num: Long, den: Long) = byClass.count { case (_, cs) =>
      val n = cs.map(_._3).sum
      val sum = segs.map { s =>
        val c = cs.find(_._2 == s).map(_._3).getOrElse(0L)
        (BigInt(c) * grand - BigInt(global(s)) * n).abs
      }.sum
      sum * num > BigInt(n) * grand * den
    }
    val rows = operators.Pii.tCloseness(spark, Sf).collect()
    assert(rows.map(_.getAs[Double]("t")).toSeq === Seq(0.2, 0.3, 0.5))
    val got = rows.map(_.getAs[Long]("classes_at_risk")).toSeq
    // t=0.2 → 5Σ > 2nG; t=0.3 → 10Σ > 6nG; t=0.5 → 2Σ > 2nG
    assert(got === Seq(atRisk(5, 2), atRisk(10, 6), atRisk(2, 2)).map(_.toLong))
    assert(rows.head.getAs[Long]("classes") === byClass.size.toLong)
    // risk is anti-monotone in t; max_tvd within [0,1]
    assert(got.reverse === got.reverse.sorted)
    val maxTvd = rows.head.getAs[Double]("max_tvd")
    assert(maxTvd >= 0.0 && maxTvd <= 1.0)
  }

  test("the scrub plan is a pure projection — no shuffle, no join") {
    val plan = operators.Pii.piiScrub(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "scrub must not join")
    // the only exchange allowed is the final orderBy's range partitioning
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"scrub should shuffle at most for the output sort:\n$plan")
  }
}
