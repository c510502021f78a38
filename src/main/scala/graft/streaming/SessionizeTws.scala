package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import graft.streaming.Sessionize.{Event, OpenSession, Session}

/** S5 on the arbitrary-state API (`transformWithState`, the successor to
  * [m]apGroupsWithState — SURVEY.md §2.2 "stateful per-key processing"):
  * identical gap-sessionization semantics to [[Sessionize]], state held in
  * a typed `ValueState` managed by the state-v2 store. Both variants ship
  * so pipelines can pick per Spark-version availability.
  */
object SessionizeTws {

  private class Proc(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[Session]
      var cur = if (open.exists()) Some(open.get()) else None
      for (e <- sorted) {
        val t = e.ts.getTime
        val cents = math.floor(e.value * 100).toLong
        cur match {
          // interval guard + widen-never-shrink (see Sessionize for the
          // full rationale; semantics kept identical across both APIs)
          case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
            cur = Some(s.copy(start = math.min(s.start, t),
              end = math.max(s.end, t), n = s.n + 1,
              sumCents = s.sumCents + cents))
          case Some(s) if t < s.start - gapMs =>
            // past-gap late event: emitted as its own earlier session
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
      cur.foreach(open.update)
      out.reverse.iterator
    }
  }

  def apply(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Proc(gapMs), TimeMode.None(), OutputMode.Append())
  }
}
