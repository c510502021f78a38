package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** S23: continuous per-key CUSUM change detection — the streaming twin
  * of [[graft.api.GraftOps.cusum]] (the q125 restart recurrence), the
  * S21/S22 "batch == stream" pattern for the detection family: state is
  * O(1) per key (the post-step pre-reset (s⁺, s⁻) pair + the last (ts,
  * tiebreak) position — whether the NEXT step restarts is derivable
  * from the stored statistics, exactly as in batch), each arrival emits
  * its (s⁺, s⁻, alarm) row immediately, and every step is the
  * IDENTICAL exact integer max(0, ·) chain — so a replay of the same
  * points is EQUAL CELL-FOR-CELL to the batch operator (law S23, no
  * IEEE caveat at all: the arithmetic is integral).
  *
  * Ordering contract = [[EwmaStream]]: within a micro-batch points sort
  * by (ts, tiebreak) before stepping; ACROSS batches a key's points
  * must arrive in strictly increasing (ts, tiebreak) order — a
  * cross-batch late point cannot be folded into an already-emitted
  * prefix with O(1) state, so it fails the query LOUDLY rather than
  * silently corrupting the chart. Values are caller-quantized integers
  * (the batch contract); NULL-valued observations belong to the batch
  * operator, whose poison semantics need the whole tail.
  */
object CusumStream {

  case class Point(key: Long, ts: Timestamp, tb: Long, value: Long)
  case class CusumState(sPos: Long, sNeg: Long, lastTs: Long, lastTb: Long)
  case class Flagged(key: Long, ts: Timestamp, tb: Long, value: Long,
      sPos: Long, sNeg: Long, alarm: Boolean)

  def apply(points: Dataset[Point], target: Long, slack: Long,
      threshold: Long): Dataset[Flagged] = {
    require(slack >= 0, s"slack must be >= 0; got $slack")
    require(threshold > 0, s"threshold must be > 0; got $threshold")
    val spark = points.sparkSession
    import spark.implicits._
    implicit val outEnc = Encoders.product[Flagged]
    points.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, Flagged](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val sorted = rows.toSeq.sortBy(p => (p.ts.getTime, p.tb))
          var st = state.getOption
          val out = sorted.map { p =>
            val pos = (p.ts.getTime, p.tb)
            val (bp, bn) = st match {
              case None => (0L, 0L)
              case Some(e) =>
                if (Ordering[(Long, Long)].lteq(pos, (e.lastTs, e.lastTb)))
                  throw new IllegalStateException(
                    s"CusumStream: key $key point at $pos arrived at or " +
                      s"before the already-folded (${e.lastTs}, ${e.lastTb})" +
                      " — cross-batch order violated; replay in batch instead")
                if (e.sPos >= threshold || e.sNeg >= threshold) (0L, 0L)
                else (e.sPos, e.sNeg)
            }
            val sp = math.max(0L, bp + (p.value - target - slack))
            val sn = math.max(0L, bn + (target - slack - p.value))
            st = Some(CusumState(sp, sn, p.ts.getTime, p.tb))
            Flagged(p.key, p.ts, p.tb, p.value, sp, sn,
              sp >= threshold || sn >= threshold)
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
