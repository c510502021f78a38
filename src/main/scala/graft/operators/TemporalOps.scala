package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Event-time operator family over the `events` table: as-of join and
  * gap-based sessionization — the batch forms; the streaming forms live in
  * graft.streaming (same logic through watermarked windows / state).
  *
  * Scale shape: both are a single shuffle on user_id followed by in-
  * partition ordered windows — no self-join, no cross product. At 100 TB
  * the shuffle key (user_id) is the natural partitioner; skewed users
  * would be handled by AQE skew-split since windows allow it per key-run.
  */
object TemporalOps {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ---------------------------------------------------------------- q27
  /** As-of join: for every purchase, the latest click by the same user at
    * or before the purchase time. Spark has no ASOF JOIN; the idiomatic
    * distributed plan is the union-marker trick: interleave both streams
    * in one ordered window and carry the last click forward — one shuffle
    * on user_id, no range self-join. (The oracle states it with DuckDB's
    * native ASOF LEFT JOIN.) */
  val q27 = QueryDef("q27_asof_click_purchase",
    (s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      val tagged = e.filter(col("event_type").isin("click", "purchase"))
        // clicks sort before purchases at equal ts → 'at or before' (>=)
        .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("click_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("click_id"), col("click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      p AS (SELECT * FROM e WHERE event_type = 'purchase'),
      c AS (SELECT * FROM e WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.ts,
        c.event_id AS click_id, c.ts AS click_ts,
        epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  // ---------------------------------------------------------------- q28
  /** Gap-based sessionization (30 min): lag → new-session flag → running
    * session counter → per-session rollup. `value` sums are made portable
    * via exact integer cents (floor(value*100)). */
  val q28 = QueryDef("q28_sessionize",
    (s, dir) => {
      graft.api.GraftOps.sessionize(events(s, dir), col("user_id"), col("ts"),
          gapUs = 30L * 60 * 1000000, tiebreak = col("event_id"))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          (sum(floor(col("value") * lit(100)).cast("long")).cast("double") / 100.0)
            .as("sum_value"))
        .orderBy("user_id", "sess_id")
    },
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events),
      l AS (
        SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM e),
      f AS (
        SELECT *,
          CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
            THEN 1 ELSE 0 END AS new_sess
        FROM l),
      g AS (
        SELECT *,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        FROM f)
      SELECT user_id, sess_id,
        MIN(ts) AS session_start,
        MAX(ts) AS session_end,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM g
      GROUP BY user_id, sess_id
      ORDER BY user_id, sess_id"""))

  // ---------------------------------------------------------------- q58
  /** Time-bucket gap filling (1-hour buckets): densify each user's event
    * series — one row per user per bucket from the user's first to last
    * event, with n = 0 where the series is silent. The bucket spine is
    * generated PER KEY with sequence() off a per-key min/max agg (no
    * driver-side calendar, no cross join); counts left-join back on
    * (user, bucket). Integer bucket ids via `div` (trunc division —
    * identical to DuckDB's floor `//` on the post-epoch timestamps the
    * data has; pre-1970 data would need explicit floor semantics).
    *
    * Scale shape: one agg + one equi-join shuffle, both keyed by
    * (user, bucket); spine size = keys × their active spans, never
    * keys × global calendar. */
  val q58 = QueryDef("q58_time_gapfill",
    (s, dir) =>
      graft.api.GraftOps.gapFill(events(s, dir), col("user_id"), col("ts"),
          stepUs = 3600000000L)
        .select(col("key").as("user_id"), col("bucket"), col("n"))
        .orderBy("user_id", "bucket"),
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket
        FROM events),
      agg AS (
        SELECT user_id, bucket, COUNT(*) AS n FROM e GROUP BY user_id, bucket),
      rng AS (
        SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM e GROUP BY user_id),
      spine AS (
        SELECT user_id, unnest(range(mn, mx + 1)) AS bucket FROM rng)
      SELECT s.user_id, s.bucket, coalesce(agg.n, 0) AS n
      FROM spine s LEFT JOIN agg USING (user_id, bucket)
      ORDER BY user_id, bucket"""))

  // ---------------------------------------------------------------- q72
  /** Forward as-of with tolerance: for every click, the NEXT purchase by
    * the same user at-or-after the click, but only within 2 hours —
    * clicks with no purchase in the window keep NULLs (enrichment, not a
    * filter). Exercises [[graft.api.GraftOps.asofJoin]]'s `forward` +
    * `toleranceUs` surface; same single-shuffle union-marker plan as q27
    * with the sort order reversed. Purchase ties at one (user, ts)
    * resolve to the greatest event_id on both sides (tiebreak here, a
    * max() pre-aggregate in the oracle — DuckDB's ASOF tie choice is
    * unspecified, so the oracle must not leave ties to it). */
  val q72 = QueryDef("q72_asof_forward",
    (s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
      graft.api.GraftOps.asofJoin(purchases, clicks, "user_id", "ts",
          tiebreak = Some("event_id"), forward = true,
          toleranceUs = 2L * 3600 * 1000000)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_event_id").as("purchase_id"),
          col("asof_ts").as("purchase_ts"),
          (unix_micros(col("asof_ts")) - unix_micros(col("ts"))).as("gap_us"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      c AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, ts, max(event_id) AS event_id
            FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
      j AS (
        SELECT c.event_id, c.user_id, c.ts, p.event_id AS pid, p.ts AS pts
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts)
      SELECT event_id, user_id, ts,
        CASE WHEN epoch_us(pts) - epoch_us(ts) <= 7200000000 THEN pid END AS purchase_id,
        CASE WHEN epoch_us(pts) - epoch_us(ts) <= 7200000000 THEN pts END AS purchase_ts,
        CASE WHEN epoch_us(pts) - epoch_us(ts) <= 7200000000
          THEN epoch_us(pts) - epoch_us(ts) END AS gap_us
      FROM j ORDER BY event_id"""))

  // ---------------------------------------------------------------- q75
  /** Linear interpolation over the 1-hour bucket spine: q58's densified
    * series with VALUES — silent buckets get the straight line between
    * their observed neighbors, tagged by `fill_method`. (The spine is
    * bounded by each user's first/last OBSERVED bucket, so the ffill/
    * bfill edge rules can't fire here — GraftOpsSpec covers them on a
    * synthetic series.) Exercises [[graft.api.GraftOps.interpolate]]. */
  val q75 = QueryDef("q75_interpolate",
    (s, dir) =>
      graft.api.GraftOps.interpolate(events(s, dir), col("user_id"), col("ts"),
          col("value"), stepUs = 3600000000L)
        .select(col("key").as("user_id"), col("bucket"), col("n"),
          col("value"), col("fill_method"))
        .orderBy("user_id", "bucket"),
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events),
      obs AS (
        SELECT user_id, bucket, COUNT(*) AS n,
          CAST(SUM(cents) AS DOUBLE) / 100.0 / CAST(COUNT(*) AS DOUBLE) AS v
        FROM e GROUP BY user_id, bucket),
      rng AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM e GROUP BY user_id),
      spine AS (SELECT user_id, unnest(range(mn, mx + 1)) AS bucket FROM rng),
      j AS (
        SELECT s.user_id, s.bucket, coalesce(obs.n, 0) AS n, obs.v
        FROM spine s LEFT JOIN obs USING (user_id, bucket)),
      w AS (
        SELECT user_id, bucket, n, v,
          last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv,
          last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb,
          first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bv,
          first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bb
        FROM j)
      SELECT user_id, bucket, n,
        CASE WHEN v IS NOT NULL THEN v
             WHEN fv IS NOT NULL AND bv IS NOT NULL THEN
               fv + (bv - fv) * (CAST(bucket - fb AS DOUBLE) / CAST(bb - fb AS DOUBLE))
             WHEN fv IS NOT NULL THEN fv
             ELSE bv END AS value,
        CASE WHEN v IS NOT NULL THEN 'observed'
             WHEN fv IS NOT NULL AND bv IS NOT NULL THEN 'interpolated'
             WHEN fv IS NOT NULL THEN 'ffill'
             WHEN bv IS NOT NULL THEN 'bfill'
             ELSE 'empty' END AS fill_method
      FROM w ORDER BY user_id, bucket"""))

  // ---------------------------------------------------------------- q96
  /** CDC apply (lakehouse MERGE): the events table read as a changelog of
    * per-user profile state — key user_id, version (ts, event_id),
    * 'error' events as delete tombstones. One two-phase max_by hash agg
    * (partial per-key maxima map-side — a hot key never ships its full
    * update history); the oracle states the row_number-window form of the
    * same reduction. */
  val q96 = QueryDef("q96_changelog_apply",
    (s, dir) =>
      graft.api.GraftOps.applyChanges(events(s, dir), Seq(col("user_id")),
          version = col("ts"), tiebreak = col("event_id"),
          isDelete = col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"),
          col("props"))
        .orderBy("user_id"),
    Some("""
      WITH c AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value, props,
          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, ts, event_type, value, props
      FROM c WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id"""))

  // ---------------------------------------------------------------- q97
  /** SCD Type-2 history from the same changelog: each surviving change
    * becomes a row effective [ts, next change's ts) per user, deletes
    * close their predecessor's interval without emitting a row, and
    * is_current marks the open rows. One shuffle + one ordered window —
    * the q27/q28 plan shape. */
  val q97 = QueryDef("q97_scd2_history",
    (s, dir) =>
      graft.api.GraftOps.scd2(
          events(s, dir).select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value")),
          Seq(col("user_id")), ts = col("ts"), tiebreak = col("event_id"),
          isDelete = col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("effective_from"),
          col("effective_to"), col("is_current"), col("value"))
        .orderBy("user_id", "effective_from", "event_id"),
    Some("""
      WITH w AS (
        SELECT user_id, event_id, event_type, value,
          CAST(ts AS TIMESTAMP) AS effective_from,
          lead(CAST(ts AS TIMESTAMP)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
        FROM events)
      SELECT user_id, event_id, effective_from, effective_to,
        (effective_to IS NULL) AS is_current, value
      FROM w WHERE event_type <> 'error'
      ORDER BY user_id, effective_from, event_id"""))

  // ---------------------------------------------------------------- q98
  /** Interval-overlap join: which user sessions (q28's 30-min rollup)
    * overlap an incident window (±30 min around that user's error
    * events)? Bucketized equi-join on (user, 1-hour bucket) with the
    * stateless first-shared-bucket collapse — never a nested-loop
    * range join (the oracle states the plain theta form). Overlap
    * length in exact integer micros. */
  val q98 = QueryDef("q98_interval_overlap_join",
    (s, dir) => {
      val e = events(s, dir)
      val sess = graft.api.GraftOps.sessionize(e, col("user_id"), col("ts"),
          gapUs = 30L * 60 * 1000000, tiebreak = col("event_id"))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      val inc = e.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("user_id"),
          timestamp_micros(unix_micros(col("ts")) - 1800000000L).as("inc_start"),
          timestamp_micros(unix_micros(col("ts")) + 1800000000L).as("inc_end"))
      graft.api.GraftOps.intervalJoin(sess, inc,
          col("session_start"), col("session_end"),
          col("inc_start"), col("inc_end"),
          spanUs = 3600000000L, key = Some(("user_id", "user_id")),
          rightPrefix = "i_")
        .select(col("user_id"), col("sess_id"),
          col("session_start"), col("session_end"), col("i_incident_id"),
          (unix_micros(least(col("session_end"), col("i_inc_end"))) -
            unix_micros(greatest(col("session_start"), col("i_inc_start"))))
            .as("overlap_us"))
        .orderBy("user_id", "sess_id", "i_incident_id")
    },
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      l AS (
        SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM e),
      f AS (
        SELECT *,
          CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
            THEN 1 ELSE 0 END AS new_sess
        FROM l),
      g AS (
        SELECT *,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        FROM f),
      sess AS (
        SELECT user_id, sess_id, MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM g GROUP BY user_id, sess_id),
      inc AS (
        SELECT event_id AS incident_id, user_id,
          ts - INTERVAL 30 MINUTE AS inc_start,
          ts + INTERVAL 30 MINUTE AS inc_end
        FROM e WHERE event_type = 'error')
      SELECT s.user_id, s.sess_id, s.session_start, s.session_end,
        i.incident_id AS i_incident_id,
        epoch_us(least(s.session_end, i.inc_end)) -
          epoch_us(greatest(s.session_start, i.inc_start)) AS overlap_us
      FROM sess s JOIN inc i ON s.user_id = i.user_id
        AND s.session_start <= i.inc_end AND i.inc_start <= s.session_end
      ORDER BY s.user_id, s.sess_id, i_incident_id"""))

  // --------------------------------------------------------------- q103
  /** Product-analytics funnel click → view → purchase per user: first
    * completion of each stage strictly after the previous and within 7
    * days of the first click. One user_id shuffle + three windowed
    * conditional-min passes + a partitioning-reusing aggregate; the
    * oracle states the same chained window CTEs. */
  val q103 = QueryDef("q103_funnel",
    (s, dir) =>
      graft.api.GraftOps.funnel(events(s, dir), col("user_id"), col("ts"),
          col("event_type"), Seq("click", "view", "purchase"),
          horizonUs = 7L * 86400 * 1000000)
        .select(col("key").as("user_id"), col("t_click"), col("t_view"),
          col("t_purchase"), col("stage_reached"))
        .orderBy("user_id"),
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      w1 AS (
        SELECT *, min(CASE WHEN event_type = 'click' THEN ts END)
          OVER (PARTITION BY user_id) AS t_click
        FROM e),
      w2 AS (
        SELECT *, min(CASE WHEN event_type = 'view' AND ts > t_click
            AND epoch_us(ts) <= epoch_us(t_click) + 604800000000 THEN ts END)
          OVER (PARTITION BY user_id) AS t_view
        FROM w1),
      w3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_view
            AND epoch_us(ts) <= epoch_us(t_click) + 604800000000 THEN ts END)
          OVER (PARTITION BY user_id) AS t_purchase
        FROM w2)
      SELECT user_id, min(t_click) AS t_click, min(t_view) AS t_view,
        min(t_purchase) AS t_purchase,
        CASE WHEN min(t_click) IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN min(t_view) IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN min(t_purchase) IS NOT NULL THEN 1 ELSE 0 END
          AS stage_reached
      FROM w3 GROUP BY user_id ORDER BY user_id"""))

  // --------------------------------------------------------------- q104
  /** Weekly cohort retention triangle over events: users cohorted by
    * first-activity week, counted in every later active week; exact
    * integer-ppm retention. All shuffles keyed by user or by the
    * catalog-scale (cohort, week) pair. */
  val q104 = QueryDef("q104_cohort_retention",
    (s, dir) =>
      graft.api.GraftOps.cohortRetention(events(s, dir), col("user_id"),
          col("ts"), unit = "week")
        .orderBy("cohort", "period_offset"),
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      f AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM e GROUP BY user_id),
      a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM e),
      sizes AS (
        SELECT cohort, count(*) AS n_cohort FROM f GROUP BY cohort),
      r AS (
        SELECT f.cohort, a.wk, count(*) AS n_active
        FROM a JOIN f USING (user_id)
        GROUP BY f.cohort, a.wk)
      SELECT r.cohort,
        (epoch_us(r.wk) - epoch_us(r.cohort)) // 604800000000 AS period_offset,
        r.n_active, s.n_cohort,
        (r.n_active * 1000000) // s.n_cohort AS retention_ppm
      FROM r JOIN sizes s ON r.cohort = s.cohort
      ORDER BY r.cohort, period_offset"""))

  // --------------------------------------------------------------- q106
  /** Golden-record survivorship over the events changelog read as a
    * SPARSE profile stream (each change carries some fields): `value`
    * is null on views, `props` null on errors — both sides state the
    * same sparsification — and the merge keeps each field's own latest
    * non-null writer. One two-phase filtered-max_by agg vs the oracle's
    * per-field row_number CTEs. */
  val q106 = QueryDef("q106_golden_record",
    (s, dir) => {
      val sparse = events(s, dir).select(col("event_id"), col("ts"),
        col("user_id"),
        when(col("event_type") =!= "view", col("value")).as("value"),
        when(col("event_type") =!= "error", col("props")).as("props"))
      graft.api.GraftOps.goldenRecord(sparse, Seq(col("user_id")),
          version = "ts", tiebreak = "event_id",
          fields = Seq("value", "props"))
        .select(col("user_id"), col("value"), col("props"), col("last_ts"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
          CASE WHEN event_type <> 'view' THEN value END AS value,
          CASE WHEN event_type <> 'error' THEN props END AS props
        FROM events),
      fv AS (
        SELECT user_id, value FROM (
          SELECT user_id, value, row_number() OVER
            (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM e WHERE value IS NOT NULL) WHERE rn = 1),
      fp AS (
        SELECT user_id, props FROM (
          SELECT user_id, props, row_number() OVER
            (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM e WHERE props IS NOT NULL) WHERE rn = 1),
      lt AS (SELECT user_id, max(ts) AS last_ts FROM e GROUP BY user_id)
      SELECT lt.user_id, fv.value, fp.props, lt.last_ts
      FROM lt LEFT JOIN fv USING (user_id) LEFT JOIN fp USING (user_id)
      ORDER BY user_id"""))

  // --------------------------------------------------------------- q117
  /** Per-user EWMA (α = 0.3) over every event value in (ts, event_id)
    * order: the oracle restates the IDENTICAL recurrence as a recursive
    * CTE stepping rn → rn+1 (≤ 100 steps — the per-user event cap), so
    * every smoothed value of every row is bit-equal and the whole
    * series hash-gates micros-quantized. Exercises
    * [[graft.api.GraftOps.ewma]]. */
  val q117 = QueryDef("q117_ewma",
    (s, dir) =>
      graft.api.GraftOps.ewma(events(s, dir), col("user_id"), col("ts"),
          col("value"), col("event_id"), alphaPpm = 300000L)
        .select(col("tiebreak").as("event_id"), col("key").as("user_id"),
          col("value"), floor(col("ewma") * lit(1000000.0)).as("ewma_us"))
        .orderBy("event_id"),
    Some("""
      WITH RECURSIVE o AS (
        SELECT event_id, user_id, value,
          CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS BIGINT) AS rn
        -- the operator drops NULL ts/tiebreak rows up front (no
        -- position in the order — review r17)
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
      r AS (
        SELECT event_id, user_id, value, rn, CAST(value AS DOUBLE) AS s
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.event_id, o.user_id, o.value, o.rn,
          (CAST(300000 AS DOUBLE) / 1000000.0) * o.value +
          (1.0 - (CAST(300000 AS DOUBLE) / 1000000.0)) * r.s
        FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
      SELECT event_id, user_id, value,
        CAST(floor(s * 1000000.0) AS BIGINT) AS ewma_us
      FROM r ORDER BY event_id"""))

  // --------------------------------------------------------------- q125
  /** Per-user two-sided CUSUM over floor-cent event values in (ts,
    * event_id) order (target 5000¢, slack 1000¢, threshold 15000¢):
    * the oracle restates the IDENTICAL restart recurrence as a
    * recursive CTE stepping rn → rn+1 (the q117 pattern), and every
    * statistic is exact integer arithmetic — the full (s⁺, s⁻, alarm)
    * series hash-gates with no float anywhere. Exercises
    * [[graft.api.GraftOps.cusum]]. */
  val q125 = QueryDef("q125_cusum",
    (s, dir) =>
      graft.api.GraftOps.cusum(events(s, dir), col("user_id"), col("ts"),
          floor(col("value") * lit(100)).cast("long"), col("event_id"),
          target = 5000L, slack = 1000L, threshold = 15000L)
        .select(col("tiebreak").as("event_id"), col("key").as("user_id"),
          col("value"), col("s_pos"), col("s_neg"),
          col("alarm").cast("long").as("alarm"))
        .orderBy("event_id"),
    Some("""
      WITH RECURSIVE o AS (
        SELECT event_id, user_id, CAST(floor(value * 100) AS BIGINT) AS x,
          CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS BIGINT) AS rn
        -- NULL ts/tiebreak rows drop up front, matching the operator
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
      r AS (
        -- NULL x poisons the tail EXPLICITLY, exactly as the operator
        -- states it: DuckDB's greatest() SKIPS nulls rather than
        -- propagating them, so without the CASE the oracle would
        -- silently restart poisoned keys at 0 on NULL-bearing data
        -- (review r16 — latent while the fixture has no NULLs)
        SELECT event_id, user_id, x, rn,
          CASE WHEN x IS NULL THEN NULL ELSE
            greatest(CAST(0 AS BIGINT), x - 5000 - 1000) END AS sp,
          CASE WHEN x IS NULL THEN NULL ELSE
            greatest(CAST(0 AS BIGINT), 5000 - 1000 - x) END AS sn
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.event_id, o.user_id, o.x, o.rn,
          CASE WHEN o.x IS NULL OR r.sp IS NULL THEN NULL ELSE
            greatest(CAST(0 AS BIGINT),
              CASE WHEN r.sp >= 15000 OR r.sn >= 15000 THEN 0 ELSE r.sp
              END + (o.x - 5000 - 1000)) END,
          CASE WHEN o.x IS NULL OR r.sp IS NULL THEN NULL ELSE
            greatest(CAST(0 AS BIGINT),
              CASE WHEN r.sp >= 15000 OR r.sn >= 15000 THEN 0 ELSE r.sn
              END + (5000 - 1000 - o.x)) END
        FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
      SELECT event_id, user_id, x AS value, sp AS s_pos, sn AS s_neg,
        CAST(sp >= 15000 OR sn >= 15000 AS BIGINT) AS alarm
      FROM r ORDER BY event_id"""))

  // --------------------------------------------------------------- q126
  /** Per-user time-weighted average of floor-cent event values — the
    * irregular-sampling mean where each event's value holds until the
    * user's next event; exact micro-cent output via decimal sums and
    * the sign-split integral division. Exercises
    * [[graft.api.GraftOps.timeWeightedAvg]]. */
  val q126 = QueryDef("q126_twap",
    (s, dir) =>
      graft.api.GraftOps.timeWeightedAvg(events(s, dir), col("user_id"),
          col("ts"), floor(col("value") * lit(100)).cast("long"),
          col("event_id"))
        .orderBy("key")
        .withColumnRenamed("key", "user_id"),
    Some("""
      WITH b AS (
        SELECT user_id, epoch_us(ts) AS um, event_id,
          CAST(floor(value * 100) AS BIGINT) AS x
        FROM events
        -- the operator DROPS null values up front (the prior value
        -- holds through); without this filter the oracle would be
        -- faithful only while the fixture has no NULLs (review r16)
        WHERE value IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL),
      d AS (
        SELECT user_id, x,
          coalesce(lead(um) OVER (PARTITION BY user_id
            ORDER BY um, event_id) - um, 0) AS dur
        FROM b),
      a AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(dur) AS BIGINT) AS dur_us,
          sum(CAST(x AS HUGEINT) * dur) AS num
        FROM d GROUP BY 1)
      SELECT user_id, n, dur_us,
        CASE WHEN dur_us > 0 THEN
          CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
            ((abs(num) * 1000000) // dur_us) AS BIGINT) END AS twap_us
      FROM a ORDER BY user_id"""))

  // --------------------------------------------------------------- q134
  /** Top-10 three-step opening journeys across all users — exact
    * counts and integer-ppm share of all user journeys, total-order
    * tie break. Exercises [[graft.api.GraftOps.topPaths]]. */
  val q134 = QueryDef("q134_top_paths",
    (s, dir) =>
      graft.api.GraftOps.topPaths(events(s, dir), col("user_id"),
        col("ts"), col("event_type"), col("event_id"), maxSteps = 3,
        topK = 10),
    Some("""
      WITH p AS (
        -- COALESCE before listing: the operator renders NULL states as
        -- a visible '∅' segment, while array_to_string SKIPS nulls —
        -- latent divergence on NULL-bearing data (review r16)
        SELECT array_to_string(
          (list(coalesce(event_type, '∅') ORDER BY ts, event_id))[1:3],
          '>') AS path
        -- NULL ts/tiebreak rows drop up front, matching the operator
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
        GROUP BY user_id),
      c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      SELECT path, n,
        CAST((CAST(n AS HUGEINT) * 1000000) // tot AS BIGINT) AS share_ppm
      FROM c CROSS JOIN t
      ORDER BY n DESC, path LIMIT 10"""))

  // --------------------------------------------------------------- q119
  /** Per-user event-type transition matrix over the full event log:
    * every consecutive step per user in (ts, event_id) order, with
    * exact integer-ppm transition shares. Exercises
    * [[graft.api.GraftOps.transitionCounts]]. */
  val q119 = QueryDef("q119_transition_matrix",
    (s, dir) =>
      graft.api.GraftOps.transitionCounts(events(s, dir), col("user_id"),
          col("ts"), col("event_type"), col("event_id"))
        .orderBy("from_state", "to_state"),
    Some("""
      WITH e AS (
        SELECT user_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev,
          lag(1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS has_prev
        -- NULL ts/tiebreak rows drop up front, matching the operator
        -- (engines disagree on NULL placement in a window ORDER BY)
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
      t AS (
        SELECT prev AS from_state, event_type AS to_state,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM e WHERE has_prev IS NOT NULL
        GROUP BY 1, 2),
      d AS (
        SELECT from_state, to_state, n,
          CAST(SUM(n) OVER (PARTITION BY from_state) AS BIGINT) AS tot
        FROM t)
      SELECT from_state, to_state, n, (n * 1000000) // tot AS p_ppm
      FROM d
      ORDER BY from_state, to_state"""))

  // --------------------------------------------------------------- q120
  /** Rolling 7-day distinct active users per event day — the growth
    * dashboard's trailing-window DAU/WAU shape via contribution
    * explosion (no distinct-over-range window exists in either
    * engine). Exercises [[graft.api.GraftOps.rollingDistinct]]. */
  val q120 = QueryDef("q120_rolling_active",
    (s, dir) =>
      graft.api.GraftOps.rollingDistinct(events(s, dir), col("user_id"),
          col("ts"), windowDays = 7)
        // DATE → TIMESTAMP for the driver gate (parquet date32 reads as
        // python objects on the pandas side — the q104 convention)
        .select(col("day").cast("timestamp").as("day"), col("active"))
        .orderBy("day"),
    Some("""
      WITH d AS (
        SELECT DISTINCT user_id AS e, CAST(ts AS DATE) AS day FROM events),
      days AS (SELECT DISTINCT day FROM d),
      c AS (
        SELECT DISTINCT d.e, d.day + CAST(t.x AS INTEGER) AS day
        FROM d, generate_series(0, 6) AS t(x))
      SELECT CAST(c.day AS TIMESTAMP) AS day, CAST(count(*) AS BIGINT) AS active
      FROM c JOIN days USING (day)
      GROUP BY 1 ORDER BY 1"""))

  // --------------------------------------------------------------- q140
  /** Channel attribution of purchases under first/last/linear models,
    * 7-day lookback: each purchase's credit goes to the user's
    * preceding non-purchase events — exact integer counts and ppm
    * shares (each attributed conversion's linear shares sum to exactly
    * 10⁶, remainder to the last touch). Exercises
    * [[graft.api.GraftOps.attributionReport]]. The oracle restates
    * first/last via row_number over the identical (ts, event_id) order
    * — equivalent to the operator's min/max-struct frames because the
    * tiebreak is unique. */
  val q140 = QueryDef("q140_attribution",
    (s, dir) =>
      graft.api.GraftOps.attributionReport(events(s, dir), col("user_id"),
          col("ts"), col("event_id"), col("event_type"),
          col("event_type") === "purchase", lookbackDays = 7)
        .orderBy("channel"),
    Some("""
      WITH b AS (
        SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
          event_id AS tb, event_type AS ch
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL),
      c AS (SELECT u, t AS ct, tb AS ctb FROM b WHERE ch = 'purchase'),
      tt AS (SELECT u, t AS tt, tb AS ttb, ch FROM b WHERE ch <> 'purchase'),
      j AS (
        SELECT c.u, c.ct, c.ctb, tt.tt, tt.ttb, tt.ch
        FROM c JOIN tt ON c.u = tt.u
          AND (tt.tt < c.ct OR (tt.tt = c.ct AND tt.ttb < c.ctb))
          AND tt.tt >= c.ct - 604800000000),
      m AS (
        SELECT ch,
          CAST(COUNT(*) OVER w AS BIGINT) AS n,
          row_number() OVER (PARTITION BY u, ct, ctb ORDER BY tt, ttb) AS ra,
          row_number() OVER (PARTITION BY u, ct, ctb ORDER BY tt DESC, ttb DESC) AS rd
        FROM j WINDOW w AS (PARTITION BY u, ct, ctb))
      SELECT ch AS channel,
        CAST(SUM(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
        CAST(SUM(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
        CAST(SUM(1000000 // n + CASE WHEN rd = 1 THEN 1000000 % n ELSE 0 END)
          AS BIGINT) AS linear_ppm
      FROM m GROUP BY ch
      ORDER BY channel"""))

  // --------------------------------------------------------------- q141
  /** Trending leaderboard over synthetic items (event_id mod 1000, the
    * q108 derived-key idiom): top-20 by half-life-decayed score (7-day
    * half-life, reference = the corpus's own max ts) — every decay term
    * an integer shift, the whole board hash-portable. Exercises
    * [[graft.api.GraftOps.trendingTopK]]. */
  val q141 = QueryDef("q141_trending",
    (s, dir) =>
      graft.api.GraftOps.trendingTopK(
          events(s, dir).select(pmod(col("event_id"), lit(1000)).as("item"),
            col("ts")),
          col("item"), col("ts"), halfLifeDays = 7, k = 20)
        .orderBy(desc("score_ppm"), col("item")),
    Some("""
      WITH b AS (
        SELECT event_id % 1000 AS item, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
      r AS (SELECT MAX(t) AS ref FROM b),
      w AS (
        SELECT item,
          (CAST(1000000 AS BIGINT) >> CAST(LEAST(
            ((ref - t) // 86400000000) // 7, 63) AS INTEGER)) AS w
        FROM b, r),
      s AS (
        SELECT item, CAST(SUM(w) AS BIGINT) AS score_ppm,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM w GROUP BY 1)
      SELECT item, score_ppm, n_events FROM s
      ORDER BY score_ppm DESC, item LIMIT 20"""))

  // --------------------------------------------------------------- q153
  /** Frequency-cap dedup: each user's first 3 events in (ts, event_id)
    * order — the contribution bound every training-data feed applies
    * before mixing. Exercises [[graft.api.GraftOps.frequencyCap]]
    * (NULL key/ts/tiebreak rows drop up front; one shuffle + ordered rank, the
    * top-k-per-group shape); the streaming twin admits the same set
    * through a real chunked replay (law S27). */
  val q153 = QueryDef("q153_frequency_cap",
    (s, dir) =>
      graft.api.GraftOps.frequencyCap(events(s, dir), col("user_id"),
          col("ts"), col("event_id"), k = 3)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id, user_id, ts, event_type FROM (
        SELECT event_id, user_id, ts, event_type,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS rn
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_id IS NOT NULL) t
      WHERE rn <= 3
      ORDER BY event_id"""))

  // --------------------------------------------------------------- q155
  /** Holt level+trend smoothing per user (α = 0.3, β = 0.2) — the
    * drifting-series member of the smoothing family (q117 EWMA lags a
    * trend by a constant; level+trend here is the one-step forecast).
    * Both engines run the identical sequential IEEE fold over the
    * (ts, event_id)-sorted per-user values, so the floor-micros
    * projections hash-gate exactly (the q117 precedent with a second
    * carried accumulator). Exercises [[graft.api.GraftOps.holt]];
    * the S28 streaming twin is bit-equal by law. */
  val q155 = QueryDef("q155_holt_trend",
    (s, dir) =>
      graft.api.GraftOps.holt(events(s, dir), col("user_id"), col("ts"),
          col("value"), col("event_id"), alphaPpm = 300000L,
          betaPpm = 200000L)
        .select(col("tiebreak").as("event_id"), col("key").as("user_id"),
          col("value"),
          floor(col("level") * lit(1000000.0)).as("level_us"),
          floor(col("trend") * lit(1000000.0)).as("trend_us"))
        .orderBy("event_id"),
    Some("""
      WITH RECURSIVE o AS (
        SELECT event_id, user_id, value,
          CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS BIGINT) AS rn
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
      r AS (
        SELECT event_id, user_id, value, rn,
          CAST(value AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.event_id, o.user_id, o.value, o.rn,
          (CAST(300000 AS DOUBLE) / 1000000.0) * o.value +
            (1.0 - (CAST(300000 AS DOUBLE) / 1000000.0)) * (r.l + r.b) AS l,
          (CAST(200000 AS DOUBLE) / 1000000.0) *
            (((CAST(300000 AS DOUBLE) / 1000000.0) * o.value +
              (1.0 - (CAST(300000 AS DOUBLE) / 1000000.0)) * (r.l + r.b))
             - r.l) +
            (1.0 - (CAST(200000 AS DOUBLE) / 1000000.0)) * r.b AS b
        FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
      SELECT event_id, user_id, value,
        CAST(floor(l * 1000000.0) AS BIGINT) AS level_us,
        CAST(floor(b * 1000000.0) AS BIGINT) AS trend_us
      FROM r ORDER BY event_id"""))

  val all: Seq[QueryDef] =
    Seq(q27, q28, q58, q72, q75, q96, q97, q98, q103, q104, q106, q117,
      q119, q120, q125, q126, q134, q140, q141, q153, q155)
}
