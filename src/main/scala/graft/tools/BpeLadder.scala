package graft.tools

import org.apache.spark.sql.SparkSession

/** Merge-round ladder for BPE vocabulary learning — quantifies the
  * per-merge driver round-trip past toy K (VERDICT r9 item 4: the
  * dictionary-sized dataflow is right; the ROUND COUNT is the scaling
  * variable). Usage:
  *
  * {{{ runMain graft.tools.BpeLadder <sfDir> <k> [cpus] }}}
  *
  * Prints one JSON line: corpus size, distinct-word dictionary size,
  * wall seconds, and merges/sec — the number the production bound in
  * BpeVocab.learn's scaladoc cites. */
object BpeLadder {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val (merges, dict) = graft.operators.BpeVocab.learn(docs, k)
    val nWords = dict.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"tool":"bpe_ladder","sf":"$dir","k":$k,""" +
      f""""n_docs":$nDocs,"n_dict_words":$nWords,""" +
      f""""n_merges":${merges.size},"secs":$secs%.2f,""" +
      f""""merges_per_sec":${merges.size / secs}%.3f}""")
    spark.stop()
  }
}
