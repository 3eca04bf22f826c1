package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch TopKPerKey operator (graft.plans): a
  * per-key bounded leaderboard over an unbounded scored stream —
  * "current top-k ads by spend", "hottest documents by score" — without
  * ever holding more than k rows of state per key.
  *
  * Each micro-batch merges its rows into the key's k-item state (the
  * same bounded-heap argument as the batch operator's partial pass:
  * anything below the k-th score can never re-enter), then re-emits the
  * key's full refreshed leaderboard — Update-mode semantics, so a
  * memory/console sink always shows the latest standings. State size is
  * O(keys × k) regardless of stream length, and state is partitioned by
  * key like any keyed stream — the shape that runs forever at firehose
  * rates. Rows-only per SURVEY §2.5 (streaming output has no SQL
  * oracle); TopKStreamSpec pins multi-batch results to the batch
  * TopKPerKey operator on the same rows.
  */
object TopKStream {

  case class Scored(key: String, id: Long, score: Double)
  case class LeaderboardState(items: Seq[(Double, Long)])
  case class Leader(key: String, id: Long, score: Double, rank: Int)

  /** Per-key streaming top-k by score (ties to the lower id). */
  def topKPerKey(scored: Dataset[Scored], k: Int): Dataset[Leader] = {
    import scored.sparkSession.implicits._
    scored
      .groupByKey(_.key)
      .flatMapGroupsWithState[LeaderboardState, Leader](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Scored],
         state: GroupState[LeaderboardState]) =>
          val merged =
            (state.getOption.map(_.items).getOrElse(Seq.empty) ++
              rows.map(r => (r.score, r.id)))
              .sortBy { case (s, id) => (-s, id) }
              .take(k)
          state.update(LeaderboardState(merged))
          merged.iterator.zipWithIndex.map { case ((s, id), i) =>
            Leader(key, id, s, i + 1)
          }
      }
  }
}
