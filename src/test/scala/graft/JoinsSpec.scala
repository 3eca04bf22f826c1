package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape checks for the reusable temporal joins
  * (operators.Joins) and the salted skew join (functions.Skew). */
class JoinsSpec extends AnyFunSuite {
  import TestSpark._

  private def leftDf() = {
    import spark.implicits._
    Seq(
      (1L, 10L, 100L),  // id, key, ts
      (2L, 10L, 200L),
      (3L, 10L, 250L),
      (4L, 20L, 500L),
      (5L, 30L, 50L)    // key with no right rows at all
    ).toDF("id", "k", "ts")
  }

  private def rightDf() = {
    import spark.implicits._
    Seq(
      (10L, 100L, "a"), // key, ts, v — exactly at left ts 100
      (10L, 150L, "b"),
      (10L, 400L, "c"), // after every key-10 left row
      (20L, 499L, "d")
    ).toDF("k", "rts", "v")
  }

  test("asOf attaches the latest right row at-or-before each left row") {
    val got = operators.Joins
      .asOf(leftDf(), rightDf(), "k", "ts", "rts", Seq("v"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getAs[Long]("id"), Option(r.getAs[String]("v"))))
    assert(got.toSeq === Seq(
      1L -> Some("a"),  // inclusive: rts 100 == ts 100 visible
      2L -> Some("b"),  // 150 ≤ 200, 400 not yet
      3L -> Some("b"),
      4L -> Some("d"),
      5L -> None))      // key 30 has no right rows → null
  }

  test("asOf strict=true excludes equal-timestamp right rows") {
    val got = operators.Joins
      .asOf(leftDf(), rightDf(), "k", "ts", "rts", Seq("v"), strict = true)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getAs[Long]("id"), Option(r.getAs[String]("v"))))
    assert(got.head === (1L -> None)) // rts 100 == ts 100 now invisible
    assert(got(1) === (2L -> Some("b")))
  }

  test("asOf tolerance nulls out matches staler than the bound") {
    // key-10 left rows at ts 100/200/250 match right rows at 100/150;
    // with tolerance=60: id1 (dist 0) and id2 (dist 50) keep their
    // match, id3 (dist 100 to rts=150) exceeds the bound -> null
    val got = operators.Joins
      .asOf(leftDf(), rightDf(), "k", "ts", "rts", Seq("v"),
            tolerance = Some(60L))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getAs[Long]("id"), Option(r.getAs[String]("v"))))
    assert(got.toSeq === Seq(
      1L -> Some("a"), 2L -> Some("b"), 3L -> None,
      4L -> Some("d"), 5L -> None))
  }

  test("asOf takes ALL values from the matched row, even when they are null") {
    import spark.implicits._
    // latest right row for k=10 at ts<=300 is (rts=200, v=null, v2=9):
    // v must come back NULL (not resurrect "x" from the older row), and
    // (v, v2) must never stitch across rows
    val l = Seq((1L, 10L, 300L)).toDF("id", "k", "ts")
    val r = Seq((10L, 100L, Some("x"), Some(7L)),
                (10L, 200L, None, Some(9L)))
      .toDF("k", "rts", "v", "v2")
    val row = operators.Joins
      .asOf(l, r, "k", "ts", "rts", Seq("v", "v2"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("v")))
    assert(row.getAs[Long]("v2") === 9L)
  }

  test("asOf direction=forward attaches the earliest right row at-or-after") {
    val got = operators.Joins
      .asOf(leftDf(), rightDf(), "k", "ts", "rts", Seq("v"),
            direction = "forward")
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getAs[Long]("id"), Option(r.getAs[String]("v"))))
    assert(got.toSeq === Seq(
      1L -> Some("a"),  // rts 100 == ts 100 still visible (inclusive)
      2L -> Some("c"),  // next at-or-after 200 is 400
      3L -> Some("c"),
      4L -> None,       // key 20 has nothing at-or-after 500
      5L -> None))
  }

  test("asOf plans ONE exchange (union + shared window, no range join)") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = operators.Joins
        .asOf(leftDf(), rightDf(), "k", "ts", "rts", Seq("v"))
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1, plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("pointInRange matches the naive range join on random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (0 until 500).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "pt")
    val intervals = (0 until 200).map { i =>
      val s = rnd.nextInt(10000).toLong
      (1000L + i, s, s + rnd.nextInt(300).toLong)
    }.toDF("iid", "s", "e")
    val fast = operators.Joins
      .pointInRange(points, "pt", intervals, "s", "e", binWidth = 256L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = points.join(intervals,
        col("pt") >= col("s") && col("pt") <= col("e"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fast.nonEmpty)
    assert(fast === naive)
  }

  test("pointInRange plans an equi shuffle join, not a nested-loop join") {
    import spark.implicits._
    val prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // disable broadcast so the equi join's shuffle nature is visible
    val priorBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val points = (0 until 10).map(i => (i.toLong, i * 10L)).toDF("pid", "pt")
      val intervals = (0 until 10).map(i => (100L + i, i * 7L, i * 7L + 20L))
        .toDF("iid", "s", "e")
      val plan = operators.Joins
        .pointInRange(points, "pt", intervals, "s", "e", 16L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prior)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBc)
    }
  }

  test("asOf matches a naive per-row lookup on random data (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val lRows = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
    val rRows = (0 until 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val left = lRows.toDF("id", "k", "ts")
    val right = rRows.toDF("k", "rts", "rid")
    for (strict <- Seq(false, true)) {
      val got = operators.Joins
        .asOf(left, right, "k", "ts", "rts", Seq("rid"), strict = strict)
        .collect()
        .map(r => r.getAs[Long]("id") ->
          (if (r.isNullAt(r.fieldIndex("rid"))) None
           else Some(r.getAs[Long]("rid")))).toMap
      lRows.foreach { case (id, k, ts) =>
        val cands = rRows.filter { case (rk, rts, _) =>
          rk == k && (if (strict) rts < ts else rts <= ts) }
        got(id) match {
          case None => assert(cands.isEmpty, s"id=$id strict=$strict")
          case Some(rid) =>
            // asOf keeps A matching rid at the max eligible rts (ties on
            // rts are interchangeable for the property)
            val maxRts = cands.map(_._2).max
            val atMax = cands.filter(_._2 == maxRts).map(_._3).toSet
            assert(atMax.contains(rid), s"id=$id strict=$strict rid=$rid")
        }
      }
    }
  }

  test("saltedJoin is row-identical to the plain inner join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a uniform tail
    val fact = ((0 until 10000).map(_ => (7L, 1L)) ++
      (0 until 1000).map(i => ((i % 50).toLong, 2L))).toDF("k", "x")
    val dim = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val salted = functions.Skew.saltedJoin(fact, dim, "k", saltBuckets = 8)
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(salted === plain)
  }

  test("evt_sessionize_sw matches the lag+cumsum sessionize row-for-row") {
    val a = operators.Events.sessionize(spark, Sf)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = operators.Events.sessionizeSessionWindow(spark, Sf)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.nonEmpty)
    assert(a.map(_.toList).toList === b.map(_.toList).toList)
  }
}
