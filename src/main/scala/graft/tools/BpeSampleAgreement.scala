package graft.tools

import org.apache.spark.sql.SparkSession

/** Sample-vs-full BPE vocabulary agreement — the evidence behind
  * BpeVocab.learnOnSample's production claim (VERDICT r10 item 4: the
  * declared mitigation for the ~60–80 min 30k-merge sequential bound
  * is "train on a sample"; this measures how faithful the sampled
  * merge sequence actually is). Trains the same K merges on the full
  * corpus and on the deterministic md5 keep16/16 sample, then reports
  * wall seconds for both plus two agreement numbers:
  *
  *  - `pair_agreement`: |full-pairs ∩ sample-pairs| / K — order-free
  *    vocabulary overlap (what token-inventory consumers see);
  *  - `prefix_agreement`: length of the longest common PREFIX of the
  *    two merge sequences / K — the stricter order-sensitive measure
  *    (identical prefixes ⇒ identical encodings for words touched
  *    only by those merges).
  *
  * Usage: {{{ runMain graft.tools.BpeSampleAgreement <sfDir> <k> [keep16] [cpus] }}}
  */
object BpeSampleAgreement {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val keep16 = if (args.length > 2) args(2).toInt else 1
    val cpus = if (args.length > 3) args(3) else "32"
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
    val full = graft.operators.BpeVocab.learn(docs, k)._1
    val fullSecs = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val samp = graft.operators.BpeVocab.learnOnSample(docs, k, keep16)._1
    val sampSecs = (System.nanoTime() - t1) / 1e9

    val fp = full.map(m => (m.left, m.right))
    val sp = samp.map(m => (m.left, m.right))
    val pairAgree = fp.toSet.intersect(sp.toSet).size.toDouble / k
    val prefix = fp.zip(sp).takeWhile { case (a, b) => a == b }.size
    println(f"""{"tool":"bpe_sample_agreement","sf":"$dir","k":$k,""" +
      f""""keep16":$keep16,"n_docs":$nDocs,""" +
      f""""full_secs":$fullSecs%.2f,"sample_secs":$sampSecs%.2f,""" +
      f""""pair_agreement":$pairAgree%.4f,""" +
      f""""prefix_agreement":${prefix.toDouble / k}%.4f}""")
    spark.stop()
  }
}
