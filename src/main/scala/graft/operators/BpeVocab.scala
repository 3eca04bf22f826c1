package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.reTokens

/** Distributed BPE vocabulary learning (Sennrich et al. 2016, the
  * subword-tokenizer training step every LLM data pipeline runs before
  * token accounting means anything).
  *
  * The classic algorithm is sequential — merge the most frequent
  * adjacent symbol pair, retokenize, repeat — and naive distribution
  * retokenizes the CORPUS each round. The scalable formulation (the one
  * the original implementation uses in-memory) runs on the WORD
  * FREQUENCY DICTIONARY instead: a merge's effect on the corpus is
  * fully determined by (word, count), so after ONE corpus-sized
  * word-count pass every iteration is vocabulary-sized — at 100 TB the
  * corpus is touched once, and the K merge rounds iterate over a frame
  * millions of times smaller. Per round: a pair-count aggregate
  * (map-side combined, weighted by word count), a 1-row argmax
  * `collect` (the chosen merge — a bounded model parameter, same
  * contract as the k-means/PQ codebooks), and a vocabulary-sized map
  * applying the merge. Lineage is truncated per round with an eager
  * localCheckpoint, exactly like ConnectedComponents' iterative regime.
  *
  * Determinism: ties on pair count break lexicographically, so the
  * merge sequence is reproducible across runs, partitionings, and
  * engines. Words carry a terminal "</w>" symbol (word-boundary
  * information survives in the merges, as in the paper).
  */
object BpeVocab {

  case class WordSyms(count: Long, syms: Seq[String])
  case class Merge(rank: Int, left: String, right: String, pair_count: Long)

  /** Learn `k` merges from a corpus of documents.
    * @return (merges table, final symbolized dictionary) */
  def learn(docs: DataFrame, k: Int): (Seq[Merge], Dataset[WordSyms]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus-sized pass: word frequencies
    val wordCounts = docs
      .select(explode(reTokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("count"))
    // symbolize: chars + terminal </w>
    var dict: Dataset[WordSyms] = wordCounts.select(col("count"), col("word"))
      .as[(Long, String)]
      .map { case (c, w) => WordSyms(c, w.map(_.toString) :+ "</w>") }
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      // weighted adjacent-pair counts over the dictionary (vocab-sized)
      val best = dict.flatMap { ws =>
          ws.syms.iterator.sliding(2).withPartial(false)
            .map(p => ((p.head, p(1)), ws.count))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((l, r), c) => (l, r, c) }
        .toDF("left", "right", "c")
        // argmax with lexicographic tie-break → deterministic merges
        .orderBy(col("c").desc, col("left"), col("right"))
        .limit(1).collect() // 1 row: the chosen merge (bounded model param)
      if (best.isEmpty) exhausted = true
      else {
        val row = best.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(rank, l, r, c)
        // apply the merge — map-only over the vocabulary
        val next = dict.map { ws =>
          val out = Seq.newBuilder[String]
          var i = 0
          val s = ws.syms
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += s(i); i += 1 }
          }
          WordSyms(ws.count, out.result())
        }.localCheckpoint(true) // truncate per-round lineage
        dict.unpersist(blocking = false)
        dict = next
        rank += 1
      }
    }
    (merges.result(), dict)
  }

  /** Query entry: the learned merge table over the documents corpus.
    * Rows-only by design — K chained argmax rounds are not one SQL
    * statement; BpeVocabSpec pins the full merge sequence on a
    * known-answer corpus instead. */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, _) = learn(Tables.documents(spark, dir), k = 16)
    merges.toDF().select(
      col("rank").cast("long").as("rank"),
      col("left"), col("right"), col("pair_count"))
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_vocab" -> (bpeVocab _))

  val oracles: Map[String, String] = Map.empty
}
