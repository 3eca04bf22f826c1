package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static dimension enrichment — the one core Structured
  * Streaming join shape the module suite didn't yet demonstrate
  * (dedupStream covers stateful dedup, purchaseAttribution the
  * stream-stream interval join): every micro-batch of events LEFT
  * joins the static customer dimension, so late dimension updates are
  * picked up on the next trigger without any state. This is the
  * streaming twin of the batch evt_asof_enrich lookup for
  * slowly-refreshed dimensions.
  *
  * Scale notes: the static side is a normal DataFrame — re-EXECUTED
  * per micro-batch (AQE broadcasts a small dimension, shuffle-joins a
  * large one, exactly as in batch) with no keyed state held (state
  * O(0)), which is what makes this preferable to a stream-stream join
  * when one side is a table, not a stream. The static PLAN is bound at
  * stream start, though: a temp-view swap underneath is invisible —
  * refreshable dimensions need a table format with per-batch snapshot
  * semantics (a lake table), which EnrichStreamSpec pins explicitly.
  * Unmatched events keep NULL dimension columns (left join) — an
  * enrichment must never drop facts.
  *
  * Tested in EnrichStreamSpec: MemoryStream events against the parquet
  * customer dim, row parity with the identical batch join, the
  * null-preserving left join, and the plan-snapshot semantics.
  */
object EnrichStream {

  /** events(user_id, …) LEFT JOIN dim(c_custkey → segment columns). */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame = {
    val dim = customers.select(
      col("c_custkey").as("user_id"),
      col("c_name").as("customer_name"),
      col("c_nationkey").as("nation_key"))
    events.join(dim, Seq("user_id"), "left_outer")
  }
}
