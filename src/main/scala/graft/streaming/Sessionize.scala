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

  /** The shared per-batch interval sweep, used by BOTH stateful APIs so
    * their semantics are identical by construction: gap-merge the open
    * interval + this batch's arrivals exactly like the batch q28
    * algorithm, emit every closed interval, keep the latest open.
    * Consequences, all deterministic:
    *  - in-gap events (early OR late) widen the session they touch and
    *    never shrink it (start/end take min/max);
    *  - past-gap late events form their OWN earlier sessions, and several
    *    near each other in the SAME batch merge into one session —
    *    matching batch semantics (they used to emit as per-event
    *    singletons, the one knowing batch divergence before round 6);
    *  - past-gap late events split across DIFFERENT batches still cannot
    *    merge with each other — the inherent cost of O(1)-per-key state;
    *    batch q28 with its global view remains the reconciliation path
    *    for heavily-late replays. */
  private[streaming] def sweep(userId: Long, openOpt: Option[OpenSession],
      rows: Iterator[Event], gapMs: Long)
      : (Iterator[Session], Option[OpenSession]) = {
    val items = (openOpt.toSeq ++ rows.map(e =>
        OpenSession(e.ts.getTime, e.ts.getTime, 1,
          math.floor(e.value * 100).toLong)))
      .sortBy(s => (s.start, s.end))
    if (items.isEmpty) (Iterator.empty, None)
    else {
      var closed = List.empty[OpenSession]
      var cur = items.head
      for (s <- items.tail) {
        if (s.start <= cur.end + gapMs)
          cur = OpenSession(cur.start, math.max(cur.end, s.end),
            cur.n + s.n, cur.sumCents + s.sumCents)
        else { closed ::= cur; cur = s }
      }
      (closed.reverse.iterator.map(s =>
        Session(userId, new Timestamp(s.start), new Timestamp(s.end),
          s.n, s.sumCents / 100.0)), Some(cur))
    }
  }

  /** Cross-batch late-late reconciliation — the batch closure over a
    * checkpointed stream output. [[apply]]'s one remaining divergence from
    * batch q28 is structural: past-gap late events split across DIFFERENT
    * micro-batches emit as separate sessions (O(1)-per-key state cannot
    * remember closed intervals). This helper closes it as an operator:
    * read the emitted sessions back as a batch table and gap-merge the
    * INTERVALS under the same rule. Correct because a batch session is
    * the transitive within-gap closure of its events and every emitted
    * session is a sub-chain of exactly one: merging sub-chain intervals
    * whose endpoints chain within `gapMs` recomputes the closure; counts
    * add, and sums re-enter exact integer cents (`round(sum_value·100)`
    * recovers the cents each emitted session was built from, so the
    * merged sum is bit-identical to batch q28's cents math, never a
    * double-accumulation drift). Sessions still OPEN in state are not in
    * the sink — same replay contract as [[apply]] (flush with a past-gap
    * sentinel per key). One shuffle on user_id; scales like any
    * windowed-then-agg plan. Result == batch q28's rollup over the same
    * events (spec S5f). */
  def reconcile(sessions: Dataset[Session], gapMs: Long = 30L * 60 * 1000)
      : Dataset[Session] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = sessions.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("session_start"), col("session_end"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    sessions.toDF()
      .withColumn("__prevEnd", max(col("session_end")).over(prev))
      .withColumn("__new", when(col("__prevEnd").isNull ||
        unix_millis(col("session_start")) - unix_millis(col("__prevEnd")) > gapMs,
        1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"),
        sum(col("n_events")).as("n_events"),
        (sum(round(col("sum_value") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_value"))
      .drop("__sid")
      .as[Session]
  }

  def apply(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sessEnc = Encoders.product[Session]

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          val (closed, nextOpen) = sweep(userId, state.getOption, rows, gapMs)
          nextOpen.foreach(state.update)
          closed
      }
  }
}
