package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment join — the streaming twin of
  * `GraftOps.asofJoin` (batch: union-marker window plan; ref R4's join
  * surface composed with R1's stream source).
  *
  * Semantics: for every right-stream event, attach the latest left-stream
  * value with the same key whose `ts` is at-or-before the event's `ts`.
  * State per key is ONE left row (the greatest-ts left seen) — O(keys),
  * the standard streaming enrichment contract. Documented approximations
  * vs batch: a right event older than the retained left emits unmatched
  * (`asofTs`/`asofValue` None) because older left history is not kept,
  * and there are no retractions when a late left arrives after a right
  * was already emitted. Within a micro-batch, events process in event-
  * time order (left before right on ties), so batch-replays of ordered
  * data match the batch operator exactly.
  */
object StreamingAsof {

  case class LeftEvent(key: Long, ts: Timestamp, value: Double)
  case class RightEvent(key: Long, ts: Timestamp, payload: String)
  /** Tagged union the caller builds from both streams (kind 0 = left). */
  case class Tagged(key: Long, ts: Timestamp, kind: Int,
      value: Double, payload: String)
  case class Enriched(key: Long, ts: Timestamp, payload: String,
      asofTs: Option[Timestamp], asofValue: Option[Double])

  def tag(left: Dataset[LeftEvent], right: Dataset[RightEvent]): Dataset[Tagged] = {
    val spark = left.sparkSession
    import spark.implicits._
    left.map(l => Tagged(l.key, l.ts, 0, l.value, ""))
      .union(right.map(r => Tagged(r.key, r.ts, 1, 0.0, r.payload)))
  }

  def apply(tagged: Dataset[Tagged]): Dataset[Enriched] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    implicit val enc = Encoders.product[Enriched]

    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[LeftEvent, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Tagged], state: GroupState[LeftEvent]) =>
          // event-time order; left (kind 0) before right on equal ts →
          // an equal-ts left is visible to the right, like batch asof
          val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, t.kind))
          var latest = state.getOption
          val out = Seq.newBuilder[Enriched]
          for (t <- sorted) {
            if (t.kind == 0) {
              if (latest.forall(_.ts.getTime <= t.ts.getTime))
                latest = Some(LeftEvent(key, t.ts, t.value))
            } else {
              val m = latest.filter(_.ts.getTime <= t.ts.getTime)
              out += Enriched(key, t.ts, t.payload, m.map(_.ts), m.map(_.value))
            }
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }
}
