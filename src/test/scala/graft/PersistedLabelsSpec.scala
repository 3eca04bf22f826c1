package graft

import org.scalatest.funsuite.AnyFunSuite

/** The persisted-labels production shape: near-dup cluster labels are
  * written ONCE (Dedup.writeClusterLabels → LakeSink range-clustered
  * parquet) and every label consumer joins the table — output must be
  * IDENTICAL to the inline form that re-derives the pair+CC pipeline
  * per consumer (the oracle-checked shape). */
class PersistedLabelsSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("persisted labels reproduce canonical + softDedup exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-labels").toString
    try {
      dedup.Dedup.writeClusterLabels(spark, Sf, s"$dir/labels")
      assert(rows(dedup.Dedup.canonicalPersisted(spark, Sf, s"$dir/labels"))
        === rows(dedup.Dedup.canonical(spark, Sf)))
      assert(rows(operators.Sampling.softDedupPersisted(spark, Sf, s"$dir/labels"))
        === rows(operators.Sampling.softDedup(spark, Sf)))
      // the shipped dedup_canonical entry (cached-labels production
      // path, round 7) must equal the inline oracle-checked form too —
      // run twice so both the build-labels and cache-hit paths verify
      assert(rows(dedup.Dedup.canonicalEntry(spark, Sf))
        === rows(dedup.Dedup.canonical(spark, Sf)))
      assert(rows(dedup.Dedup.canonicalEntry(spark, Sf))
        === rows(dedup.Dedup.canonical(spark, Sf)))
      // all three cached-label entries equal their inline forms
      assert(rows(dedup.Dedup.clustersEntry(spark, Sf))
        === rows(dedup.Dedup.clusters(spark, Sf)))
      assert(rows(operators.Sampling.softDedupEntry(spark, Sf))
        === rows(operators.Sampling.softDedup(spark, Sf)))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
