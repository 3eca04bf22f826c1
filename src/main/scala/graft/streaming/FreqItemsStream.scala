package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the Misra–Gries frequent-items aggregate
  * (graft.functions.expressions.FreqItemsSketch): "which tokens are
  * trending past 1/k of the stream" over an unbounded token firehose,
  * with state bounded forever.
  *
  * The scalable formulation SHARDS BY ITEM: each item hashes to one of
  * `shards` keyed states, and each state runs an independent
  * Misra–Gries sketch of capacity k−1. Because an item lives in exactly
  * one shard, its shard-local frequency IS its global frequency, and
  * shard totals are ≤ the global total — so every item with global
  * frequency > N/k survives its shard's sketch (the same superset
  * guarantee as the batch aggregate), and the union of shard candidates
  * is a global candidate set of ≤ shards × (k−1) items. State is
  * O(shards × k) regardless of stream length; shards spread the
  * firehose across the cluster instead of funneling a global sketch
  * through one task.
  *
  * Each micro-batch folds its items into the shard's counters (the
  * aggregate's update step) and re-emits the shard's refreshed
  * candidates with their lower-bound counts — Update mode, so a memory
  * sink always shows the current standings. An exact second pass (the
  * batch text_heavy_hitters pattern) can then confirm candidates
  * downstream. Rows-only per SURVEY §2.5 (streaming output has no SQL
  * oracle); FreqItemsStreamSpec pins the superset guarantee across
  * multi-batch delivery against exact counts of the full stream.
  */
object FreqItemsStream {

  case class Item(item: String)
  case class SketchState(counts: Map[String, Long])
  case class Candidate(shard: Int, item: String, min_count: Long)

  /** Per-shard streaming Misra–Gries; `k` bounds counters per shard. */
  def freqItems(items: Dataset[Item], k: Int, shards: Int): Dataset[Candidate] = {
    import items.sparkSession.implicits._
    val cap = k - 1
    items
      .groupByKey(it => math.floorMod(it.item.hashCode, shards))
      .flatMapGroupsWithState[SketchState, Candidate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Item], state: GroupState[SketchState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
          rows.foreach { r =>
            counts.get(r.item) match {
              case Some(c) => counts = counts.updated(r.item, c + 1)
              case None if counts.size < cap =>
                counts = counts.updated(r.item, 1L)
              case None =>
                counts = counts.collect {
                  case (it, c) if c > 1 => it -> (c - 1)
                }
            }
          }
          state.update(SketchState(counts))
          counts.iterator.map { case (it, c) => Candidate(shard, it, c) }
      }
  }
}
