package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF-PQ index (similarity/AnnIndex.scala): build once
  * per corpus fingerprint, serve from the codes table. The contract is
  * the dedup persisted-labels one — served output IDENTICAL to the
  * inline-trained form, second call a pure cache hit. */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("served IVF-PQ equals the inline-trained form, and reloads hit the cache") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
    val (cbooks, coarse, codes) = similarity.AnnIndex.ivfPqCached(spark, Sf)
    val served = rows(similarity.Knn
      .ivfPqServe(spark, e, 10, nprobe = 3, cbooks, coarse, codes))
    // identical training (same deterministic Lloyd fits) → identical
    // codebooks → byte-identical search results
    val inline = rows(similarity.Knn.ivfPqOn(spark, e, 10, nprobe = 3))
    assert(served === inline)

    // second call must load, not rebuild: the model payload on disk
    // stays byte-identical (mtime check) and the result reproduces
    val cache = tools.CorpusCache.dirFor(Sf, "embeddings", "ivfpq")
    val modelSuccess = new java.io.File(s"$cache/model/_SUCCESS")
    assert(modelSuccess.exists())
    val mtime = modelSuccess.lastModified()
    val (cb2, co2, codes2) = similarity.AnnIndex.ivfPqCached(spark, Sf)
    assert(modelSuccess.lastModified() === mtime, "cache was rebuilt")
    assert(rows(similarity.Knn
      .ivfPqServe(spark, e, 10, nprobe = 3, cb2, co2, codes2)) === served)
  }

  test("serving pushes the probed-cell filter into the codes scan") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
    val (cbooks, coarse, codes) = similarity.AnnIndex.ivfPqCached(spark, Sf)
    val plan = similarity.Knn
      .ivfPqServe(spark, e, 10, nprobe = 2, cbooks, coarse, codes)
      .queryExecution.executedPlan.toString
    // the literal IN filter must reach the parquet scan (file/row-group
    // skipping on the range-clustered cluster column) — a join-only
    // cluster equality cannot prune the scan
    assert(plan.contains("PushedFilters: [In(cluster"), plan.take(3000))
  }

  test("incremental add: append ≡ re-encode, and serving from it is identical") {
    val all = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
    val (cbooks, coarse, codes) = similarity.AnnIndex.ivfPqCached(spark, Sf)
    // split the corpus; encode each half through the FIXED model and
    // union — must equal re-encoding everything with that model (the
    // append path can never drift from a rebuild that reuses the model)
    val corpus = all.filter(col("vec_id") % 5 =!= 0)
    val batch = all.filter(col("vec_id") % 5 === 0)
    val appended = similarity.AnnIndex.ivfPqAdd(corpus, cbooks, coarse)
      .union(similarity.AnnIndex.ivfPqAdd(batch, cbooks, coarse))
    val reencoded = similarity.AnnIndex.ivfPqAdd(all, cbooks, coarse)
    val key = Seq("vec_id", "m")
    assert(appended.orderBy(key.map(col): _*).collect().toSeq ===
           reencoded.orderBy(key.map(col): _*).collect().toSeq)
    // and SERVING from the appended union is byte-identical to serving
    // from the persisted codes table (same model ⇒ same ADC ranking)
    assert(rows(similarity.Knn
      .ivfPqServe(spark, all, 10, nprobe = 3, cbooks, coarse, appended)) ===
      rows(similarity.Knn
        .ivfPqServe(spark, all, 10, nprobe = 3, cbooks, coarse, codes)))
  }

  test("drift monitor: zero drift on the build corpus, detects a planted shift") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
    val out = similarity.AnnIndex.driftMonitor(spark, Sf).collect()
    // static corpus under its own index: every cell's now == base
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_base") === r.getAs[Long]("n_now"))
      assert(math.abs(r.getAs[Double]("psi_term")) < 1e-9)
    }
    // planted covariate shift (constant translation): all vectors move
    // toward one direction, occupancy collapses into the nearest cells
    // — must cross the retrain threshold. (A negation would NOT: the
    // synthetic corpus is ~symmetric, so cells permute but the
    // occupancy histogram barely moves — PSI correctly stays low.)
    val (_, coarse, codes) = similarity.AnnIndex.ivfPqCached(spark, Sf)
    val base = codes.filter(col("m") === 0)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_base"))
    val shifted = e.withColumn("embedding",
      transform(col("embedding"), x => x + lit(5.0)))
    val psi = similarity.AnnIndex.driftFrom(base, shifted, coarse)
      .agg(sum(col("psi_term"))).head.getDouble(0)
    assert(psi > 0.2, s"planted shift not detected: psi=$psi")
  }

  test("codes table is the full corpus encoding, range-clustered by cell") {
    val (_, coarse, codes) = similarity.AnnIndex.ivfPqCached(spark, Sf)
    val n = Tables.embeddings(spark, Sf).count()
    assert(codes.count() === n * 4, "M=4 code rows per vector")
    assert(codes.select("vec_id").distinct().count() === n)
    val maxCluster = codes.agg(max(col("cluster"))).head.getInt(0)
    assert(maxCluster <= coarse.length)
  }
}
