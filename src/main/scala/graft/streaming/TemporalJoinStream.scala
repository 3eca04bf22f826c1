package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming temporal (as-of) join — the stream-stream counterpart of
  * the batch etl_pit_join / Joins.asOf: a stream of dimension UPDATES
  * and a stream of events share a key, and every event must see the
  * latest dimension version with update_ts ≤ event_ts — never a later
  * one. Flink sells this as the "temporal table join"; in Structured
  * Streaming it is a keyed-state pattern: both streams union into one
  * tagged stream, and flatMapGroupsWithState holds ONE row of state
  * per key (the latest dim version), so state is O(keys) — not
  * O(events) — forever.
  *
  * Within a micro-batch the group's rows sort by (ts, dim-before-
  * event), so an update and an event landing in the same batch
  * resolve in event-time order. ACROSS batches the contract is the
  * processing-order one every streaming temporal join has without
  * watermark buffering: an update that arrives in a LATER batch than
  * an earlier-timestamped event cannot retro-enrich it (the state
  * keeps the max-ts update, and stale late updates are ignored).
  * TemporalJoinStreamSpec pins both the in-batch ordering and the
  * cross-batch version-advance semantics, plus the no-dim → null
  * contract.
  */
object TemporalJoinStream {

  /** Union row: a dim update (isDim=true, dimVal set) or an event. */
  case class Tagged(user_id: Long, ts_micros: Long, isDim: Boolean,
                    dimVal: String, event_id: Long, value: Double)
  case class DimState(ts_micros: Long, v: String)
  case class Enriched(event_id: Long, user_id: Long, ts_micros: Long,
                      value: Double, dim_value: Option[String])

  def joined(tagged: Dataset[Tagged]): Dataset[Enriched] = {
    import tagged.sparkSession.implicits._
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[DimState, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Tagged], state: GroupState[DimState]) =>
          // event-time order inside the batch; at equal ts the dim
          // update becomes visible BEFORE the event (inclusive as-of)
          val sorted = rows.toSeq.sortBy(r => (r.ts_micros, !r.isDim, r.event_id))
          var st = state.getOption
          val out = Seq.newBuilder[Enriched]
          sorted.foreach { r =>
            if (r.isDim) {
              // keep the LATEST version; a stale late update never
              // regresses the state
              if (st.forall(_.ts_micros <= r.ts_micros))
                st = Some(DimState(r.ts_micros, r.dimVal))
            } else {
              out += Enriched(r.event_id, r.user_id, r.ts_micros, r.value,
                st.filter(_.ts_micros <= r.ts_micros).map(_.v))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
