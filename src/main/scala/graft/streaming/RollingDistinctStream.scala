package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** S24: continuous trailing-window distinct-actives feed — the
  * streaming twin of [[graft.api.GraftOps.rollingDistinct]] (the q120
  * growth-dashboard shape). Unlike the S21/S22/S23 recurrences this is
  * SET state, not a fold: each entity stores which trailing TARGET
  * days it has already been announced active for, a visit announces
  * the entity on every not-yet-announced target day of its
  * `windowDays` range immediately, and a visit contributing nothing
  * new (same-day revisit, or a day whose whole range is covered by
  * neighboring visits) emits NOTHING — so emitted rows are exactly the
  * batch operator's post-explosion DISTINCT (entity, target_day)
  * pairs. Counting emitted rows per target day — restricted to days
  * actually observed, the batch grid semi-join — reproduces
  * [[graft.api.GraftOps.rollingDistinct]] over any replay (law S24).
  *
  * State is O(windowDays + lateDays) per entity, NOT O(history):
  * announced target days older than the entity's newest visit day
  * minus `lateDays` are pruned, and to keep that pruning sound a
  * visit arriving MORE than `lateDays` days behind the entity's
  * newest day fails the query LOUDLY (the S21 contract: silently
  * re-announcing a pruned target would double-count the entity;
  * heavily-late replays belong to the batch operator). Within-batch
  * arrival order is irrelevant beyond that bound — set semantics.
  */
object RollingDistinctStream {

  case class Visit(entity: Long, ts: Timestamp)
  case class SeenState(maxDay: Int, announced: List[Int])
  case class Contribution(entity: Long, day: java.sql.Date,
      target_day: java.sql.Date)

  private def toDate(epochDay: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay.toLong))

  def apply(visits: Dataset[Visit], windowDays: Int,
      lateDays: Int): Dataset[Contribution] = {
    require(windowDays >= 1, s"windowDays must be >= 1; got $windowDays")
    require(lateDays >= 0, s"lateDays must be >= 0; got $lateDays")
    val spark = visits.sparkSession
    import spark.implicits._
    implicit val outEnc = Encoders.product[Contribution]
    visits.groupByKey(_.entity)
      .flatMapGroupsWithState[SeenState, Contribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity, rows, state) =>
          var st = state.getOption.getOrElse(SeenState(Int.MinValue, Nil))
          val out = List.newBuilder[Contribution]
          // UTC epoch days — the session is pinned to UTC, so this is
          // exactly the batch operator's to_date(ts)
          rows.toSeq.map(v => Math.floorDiv(v.ts.getTime, 86400000L).toInt)
            .sorted.foreach { day =>
              if (st.maxDay != Int.MinValue && day < st.maxDay - lateDays)
                throw new IllegalStateException(
                  s"RollingDistinctStream: entity $entity visit on day " +
                    s"$day is more than lateDays=$lateDays behind the " +
                    s"newest day ${st.maxDay} — its announcement record " +
                    "may be pruned; replay in batch instead")
              val fresh = (day until day + windowDays)
                .filterNot(st.announced.contains)
              fresh.foreach { t =>
                out += Contribution(entity, toDate(day), toDate(t))
              }
              val newMax = math.max(st.maxDay, day)
              st = SeenState(newMax,
                (fresh.toList ::: st.announced)
                  .filter(_ >= newMax - lateDays))
            }
          state.update(st)
          out.result().iterator
      }
  }
}
