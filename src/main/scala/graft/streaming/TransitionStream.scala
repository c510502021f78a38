package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** S22: continuous per-key state-transition steps — the streaming twin
  * of [[graft.api.GraftOps.transitionCounts]] (the q119 Markov matrix),
  * the S21 recurrence pattern applied to SEQUENCE STRUCTURE instead of
  * arithmetic: state is O(1) per key (the last (ts, tiebreak) position
  * and last state string), and each arrival after a key's first emits
  * one (from → to) STEP event immediately. Aggregating the emitted
  * steps by (from, to) reproduces the batch operator's counts exactly
  * over any replay (law S22) — the ppm shares are a catalog-sized
  * downstream aggregation, not per-event state, so they stay batch.
  *
  * NULL states are REAL states here exactly as in batch: a key's first
  * event emits nothing (no predecessor), but a NULL state after a real
  * one emits a (state → NULL) step — the state row's PRESENCE plays the
  * batch operator's lag(1)-marker role, so instrumentation gaps surface
  * as transition mass instead of vanishing.
  *
  * Ordering contract = [[EwmaStream]]: within a micro-batch points sort
  * by (ts, tiebreak) before stepping; a cross-batch late point cannot
  * be spliced into an already-emitted step sequence with O(1) state, so
  * it fails the query LOUDLY — heavily-late replays belong to the batch
  * operator.
  */
object TransitionStream {

  case class Event(key: Long, ts: Timestamp, tb: Long, state: String)
  // Option presence of the state row IS the "has a predecessor" flag
  // (review r16 dropped a redundant hasPrev boolean from every keyed
  // state-store row)
  case class TransState(lastTs: Long, lastTb: Long, lastState: String)
  case class Step(key: Long, ts: Timestamp, tb: Long, from_state: String,
      to_state: String)

  def apply(events: Dataset[Event]): Dataset[Step] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val outEnc = Encoders.product[Step]
    events.groupByKey(_.key)
      .flatMapGroupsWithState[TransState, Step](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.tb))
          var st = state.getOption
          val out = sorted.flatMap { e =>
            val pos = (e.ts.getTime, e.tb)
            val step = st match {
              case None => None
              case Some(p) =>
                if (Ordering[(Long, Long)].lteq(pos, (p.lastTs, p.lastTb)))
                  throw new IllegalStateException(
                    s"TransitionStream: key $key point at $pos arrived at " +
                      s"or before the already-stepped (${p.lastTs}, " +
                      s"${p.lastTb}) — cross-batch order violated; replay " +
                      "in batch instead")
                Some(Step(e.key, e.ts, e.tb, p.lastState, e.state))
            }
            st = Some(TransState(e.ts.getTime, e.tb, e.state))
            step
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
