package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S5: custom stateful per-key processing — gap-based sessionization via
  * flatMapGroupsWithState (SURVEY.md §2.2 "stateful per-key processing").
  *
  * State is one open session per user (O(active users)); a session is
  * emitted when a new event arrives more than `gapMs` after the session's
  * latest event. The last session per key stays open in state until a
  * later event closes it (no timer-based flush — finite replays should
  * append a past-gap sentinel event per key if they need every session
  * emitted). This is the streaming twin of the batch TemporalOps.q28
  * window plan.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, end: Long, n: Long, sumCents: Long)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  def apply(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sessEnc = Encoders.product[Session]

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          // micro-batch arrivals must be processed in event-time order for
          // deterministic gap detection
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var out = List.empty[Session]
          var cur = state.getOption
          for (e <- sorted) {
            val t = e.ts.getTime
            val cents = math.floor(e.value * 100).toLong
            cur match {
              // merge only when the event is within gap of the session
              // INTERVAL: `t <= end+gap` alone would also merge a late
              // event arbitrarily far BEFORE the session start, widening
              // across a real gap. min/max still let an in-gap late event
              // widen the session, never shrink it.
              case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
                cur = Some(s.copy(start = math.min(s.start, t),
                  end = math.max(s.end, t), n = s.n + 1,
                  sumCents = s.sumCents + cents))
              case Some(s) if t < s.start - gapMs =>
                // past-gap late event: a completed earlier session of its
                // own (single-open-session state can't reopen history)
                out ::= Session(userId, new Timestamp(t), new Timestamp(t),
                  1, cents / 100.0)
              case Some(s) =>
                out ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end),
                  s.n, s.sumCents / 100.0)
                cur = Some(OpenSession(t, t, 1, cents))
              case None =>
                cur = Some(OpenSession(t, t, 1, cents))
            }
          }
          cur.foreach(state.update)
          out.reverse.iterator
      }
  }
}
