package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Skew
import graft.sinks.LakeSink

class LakeSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("monthly-partitioned write prunes partitions on read") {
    val path = Files.createTempDirectory("graft_lake").toString + "/orders"
    LakeSink.writeMonthlyPartitioned(
      Tables.orders(spark, Sf), "o_orderdate", path)
    val month = "1997-03"
    val got = LakeSink.readMonth(spark, path, month)
    val expected = Tables.orders(spark, Sf)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === month).count()
    assert(got.count() === expected)
    // The partition filter must prune directories, not scan-and-filter:
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.contains("part_month"), s"no partition pruning in:\n$plan")
    // and the data filter list must NOT carry part_month as a row filter
    assert(!plan.contains(s"PushedFilters: [IsNotNull(part_month)"))
  }

  test("bucketed tables join without a shuffle") {
    val base = Files.createTempDirectory("graft_bucket").toString
    LakeSink.writeBucketed(
      Tables.orders(spark, Sf).select(col("o_orderkey"), col("o_custkey")),
      "b_orders", s"$base/orders", "o_orderkey", 4)
    LakeSink.writeBucketed(
      Tables.lineitem(spark, Sf).select(col("l_orderkey"), col("l_quantity")),
      "b_lineitem", s"$base/lineitem", "l_orderkey", 4)
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
            col("l_orderkey") === col("o_orderkey"))
      // disable broadcast so the join strategy depends on distribution
      .hint("merge")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
           s"bucketed join still shuffles:\n$plan")
    assert(joined.count() === Tables.lineitem(spark, Sf).count())
  }

  test("compaction preserves data and reduces file count") {
    val base = Files.createTempDirectory("graft_compact").toString
    val frag = s"$base/fragmented"
    Tables.orders(spark, Sf).repartition(40).write.parquet(frag)
    LakeSink.compact(spark, frag, s"$base/compacted", targetFileMB = 128)
    val before = Tables.orders(spark, Sf).count()
    val after = spark.read.parquet(s"$base/compacted").count()
    assert(before === after)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/compacted") < parquetFiles(frag))
  }

  test("compactPartition swaps in place and recovers a mid-swap crash") {
    def seedLake(): String = {
      val base = Files.createTempDirectory("graft_cpart").toString + "/lake"
      LakeSink.writeMonthlyPartitioned(
        Tables.orders(spark, Sf), "o_orderdate", base)
      // fragment one partition with appends so compaction has work
      val more = Tables.orders(spark, Sf)
        .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1997-03")
        .repartition(8)
      LakeSink.appendMonthlyPartitioned(more, "o_orderdate", base)
      base
    }
    val month = "1997-03"
    def rowsIn(base: String) = LakeSink.readMonth(spark, base, month).count()

    // normal path: same rows, fewer files
    val lake = seedLake()
    val expected = rowsIn(lake)
    val (before, after) = LakeSink.compactPartition(spark, lake, month)
    assert(after <= before && rowsIn(lake) === expected)

    // crash between rename(dir->backup) and rename(staging->dir):
    // live dir absent, completed staging + backup present. A rerun must
    // roll forward, not delete the only surviving copies.
    val dir = new java.io.File(s"$lake/part_month=$month")
    val staging = new java.io.File(s"$lake/.compact_tmp_part_month=$month")
    val backup = new java.io.File(s"$lake/.compact_bak_part_month=$month")
    val shadow = new java.io.File(s"$lake/.shadow")
    // build a "completed staging" copy, then simulate the crash state
    assert(dir.renameTo(shadow))
    LakeSink.compact(spark, shadow.getPath, staging.getPath)
    assert(shadow.renameTo(backup))
    assert(!dir.exists())
    val (_, _) = LakeSink.compactPartition(spark, lake, month)
    assert(rowsIn(lake) === expected, "mid-swap crash recovery lost rows")
    assert(!staging.exists() && !backup.exists())

    // crash state with only a backup (no staging): must roll back
    assert(dir.renameTo(backup))
    val (_, _) = LakeSink.compactPartition(spark, lake, month)
    assert(rowsIn(lake) === expected, "backup-only recovery lost rows")
    assert(!backup.exists())
  }

  test("undoBatch deletes one load batch and a re-append restores it") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_undo").toString + "/lake"
    val rows = (0 until 300).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"1997-03-${i % 28 + 1} 00:00:00"),
       s"batch_${i % 3}")
    }.toDF("id", "ts", "load_batch")
    LakeSink.writeMonthlyPartitioned(rows, "ts", base)
    val month = "1997-03"
    val (deleted, kept) = LakeSink.undoBatch(spark, base, month,
      "load_batch", "batch_1")
    assert(deleted === 100L && kept === 200L)
    val after = LakeSink.readMonth(spark, base, month)
    assert(after.count() === 200)
    assert(after.filter(col("load_batch") === "batch_1").count() === 0)
    // restore round-trip: re-appending the undone batch (the staged
    // files a real pipeline keeps, here re-derived) recovers the
    // original partition content exactly
    LakeSink.appendMonthlyPartitioned(
      rows.filter(col("load_batch") === "batch_1"), "ts", base)
    val restored = LakeSink.readMonth(spark, base, month)
    assert(restored.count() === 300)
    assert(restored.select(sum(col("id"))).head.getLong(0) ===
           rows.select(sum(col("id"))).head.getLong(0))
  }

  test("clustered write produces pairwise-disjoint per-file key ranges") {
    val base = java.nio.file.Files.createTempDirectory("graft_lake_cl").toString
    val out = s"$base/clustered"
    LakeSink.writeClustered(
      Tables.orders(spark, Sf).select(col("o_orderkey"), col("o_totalprice")),
      out, nFiles = 4, col("o_totalprice"))
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 2, s"expected multiple files, got ${files.length}")
    // per-file (min, max) of the cluster key — these are exactly the
    // stats parquet row-group skipping consults
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping file ranges: $hi > $lo")
      case _ =>
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(out).count() ===
           Tables.orders(spark, Sf).count())
  }

  test("salted aggregation matches plain aggregation") {
    val plain = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("total"))
      .orderBy("key").collect().toSeq
    val salted = Skew.saltedCountSum(
        Tables.lineitem(spark, Sf), col("l_returnflag"), col("l_quantity"), 8)
      .orderBy("key").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getLong(1))) ===
           plain.map(r => (r.getString(0), r.getLong(1))))
    // double sums compared with tolerance (salting changes add order)
    salted.zip(plain).foreach { case (s, p) =>
      assert(math.abs(s.getDouble(2) - p.getDouble(2)) < 1e-6)
    }
  }

  test("z-ordered write shrinks per-file bounding boxes on BOTH columns " +
       "vs single-key clustering") {
    val base = java.nio.file.Files.createTempDirectory("graft_lake_z").toString
    val data = Tables.orders(spark, Sf)
      .select(col("o_orderkey"), col("o_custkey").cast("double").as("ck"),
              col("o_totalprice").as("tp"))
    val zOut = s"$base/zorder"
    val linOut = s"$base/linear"
    LakeSink.writeZOrdered(data, zOut, nFiles = 16, "ck", "tp")
    LakeSink.writeClustered(data, linOut, nFiles = 16, col("tp"))

    def boxes(path: String): Array[(Double, Double, Double, Double)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col("ck")), max(col("ck")),
                 min(col("tp")), max(col("tp"))).head()
          (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        }
    val zBoxes = boxes(zOut)
    val linBoxes = boxes(linOut)
    assert(zBoxes.length >= 4 && linBoxes.length >= 4)

    // The z-curve's guarantee is per-DIMENSION: every file's extent is
    // bounded in BOTH columns (so min/max skipping works for predicates
    // on either), where the single-key layout leaves the non-clustered
    // column's extent at ~the full domain in every file. (Total box
    // AREA is not the discriminator — 1D slices already minimize area;
    // they just concentrate all of it in one dimension.)
    val g = data.agg(min(col("ck")), max(col("ck")),
                     min(col("tp")), max(col("tp"))).head()
    val (ckLo, ckHi) = (g.getDouble(0), g.getDouble(1))
    def ckExtent(bs: Array[(Double, Double, Double, Double)]) =
      bs.map { case (a, b, _, _) => (b - a) / (ckHi - ckLo) }
    val zCk = ckExtent(zBoxes)
    val linCk = ckExtent(linBoxes)
    // files straddling a high-level z-quad boundary legitimately span a
    // wide ck range (inherent to any z-order layout, Delta's included),
    // so the layout guarantee is about the TYPICAL file: mean extent
    val zMean = zCk.sum / zCk.length
    val linMean = linCk.sum / linCk.length
    assert(zMean < 0.6,
      s"z-order mean ck extent should be bounded, got $zMean")
    assert(linMean > 0.9,
      s"single-key files span ~full ck (sanity), mean $linMean")

    // a narrow predicate on the NON-clustered column skips nothing in
    // the linear layout (every file spans ck) but skips files under z
    val ckSlice = ckLo + (ckHi - ckLo) * 0.05
    val zTouch = zBoxes.count { case (a, b, _, _) => a <= ckSlice && ckSlice <= b }
    val linTouch = linBoxes.count { case (a, b, _, _) => a <= ckSlice && ckSlice <= b }
    assert(zTouch < zBoxes.length, "z-order should skip files on ck")
    assert(zTouch <= linTouch)

    // nothing lost in the re-layout
    assert(spark.read.parquet(zOut).count() === data.count())
    assert(spark.read.parquet(zOut).columns.toSet === data.columns.toSet)
  }
}
