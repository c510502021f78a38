package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{CosineSim, Portable, Text}
/** event-time family: as-of join, sessions, changelog/SCD2, funnel, attribution, cohorts, intervals, outliers — members of [[GraftOps]], split out of the former single
  * 6,600-line object (round 19) purely for maintainability: the trait
  * mixes back into `object GraftOps`, so every callsite, registry op,
  * and scaladoc link is untouched. The self-type makes members of the
  * other family traits visible exactly as before the split. */
private[api] trait TemporalApi { self: GraftOps.type =>

  // ------------------------------------------------------- event time

  /** As-of join: for each `right` row, the nearest `left` row with the
    * same key at-or-before its timestamp — or at-or-after with
    * `forward = true` (union-marker window plan — one shuffle on the key,
    * no range self-join). Left value columns surface prefixed
    * (`asof_<col>`); right columns pass through untouched — the left side
    * is renamed BEFORE the union so same-named right columns are never
    * merged/dropped. `tiebreak` orders left rows sharing a (key, ts): the
    * greatest tiebreak value wins deterministically, in either direction.
    * `toleranceUs` bounds the match: a nearest left row farther than the
    * tolerance yields NULL asof columns (the row is kept — as-of is a
    * left-outer enrichment, never a filter).
    *
    * Scale shape is direction-independent: the forward plan is the same
    * single shuffle with the sort order reversed, NOT a second pass or a
    * reversed copy of the data. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftPrefix: String = "asof_", tiebreak: Option[String] = None,
      forward: Boolean = false, toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be non-negative; got $toleranceUs")
    val lCols = left.columns.filter(c => c != key && c != ts).toIndexedSeq
    val pre = s"__l_"
    val lRenamed = lCols.foldLeft(left)((df, c) => df.withColumnRenamed(c, s"$pre$c"))
      .withColumnRenamed(ts, s"$pre$ts")
      .withColumn(key, col(key)) // keep the join key shared
      .withColumn("__kind", lit(0))
      .withColumn("__ts", col(s"$pre$ts"))
    val rTagged = right.withColumn("__kind", lit(1)).withColumn("__ts", col(ts))
    val all = lRenamed.unionByName(rTagged, allowMissingColumns = true)
    // Backward: ts asc, so preceding rows are at-or-before. Forward: ts
    // desc, so preceding rows are at-or-AFTER and last() picks the one
    // closest to (i.e. the earliest at-or-after) the current right row.
    // kind stays ascending either way: a left row at the exact right ts
    // sorts before it, making both bounds inclusive.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val orderCols = Seq(tsOrder, col("__kind")) ++
      tiebreak.map(t => col(s"$pre$t").asc_nulls_first)
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the WHOLE left row as one struct through a single last(...)
    // window: per-column carries would backfill a null field from an OLDER
    // left row, mixing values across rows. The struct is non-null iff the
    // row is a left row, so ignoreNulls picks the latest left row intact.
    val lValueCols = lCols :+ ts
    val lStruct = struct(lValueCols.map(c => col(s"$pre$c").as(c)): _*)
    val withAsof = all
      .withColumn("__lrow",
        last(when(col("__kind") === 0, lStruct), ignoreNulls = true).over(w))
    val bounded =
      if (toleranceUs == Long.MaxValue) withAsof
      else withAsof.withColumn("__lrow",
        when(abs(unix_micros(col("__ts")) -
            unix_micros(col("__lrow").getField(ts))) <= toleranceUs,
          col("__lrow")))
    lValueCols.foldLeft(bounded) { (df, c) =>
        df.withColumn(s"$leftPrefix$c", col("__lrow").getField(c))
      }
      .filter(col("__kind") === 1)
      .drop("__kind", "__ts", "__lrow")
      .drop(lValueCols.map(c => s"$pre$c"): _*)
  }

  /** Gap-based sessionization: assigns `sess_id` per key, sessions split
    * when consecutive events are more than `gapUs` micros apart. */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapUs: Long,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(ts, 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(ts) - unix_micros(col("__prev")) > gapUs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("__new")).over(wRun).cast("long"))
      .drop("__prev", "__new")
  }

  // ---------------------------------------- changelog apply / SCD2

  /** CDC apply — lakehouse MERGE-INTO semantics as one batch operator:
    * reduce a changelog (insert/update/delete rows keyed by `key`,
    * totally ordered per key by (`version`, `tiebreak`)) to the table
    * state it describes. Each key's LATEST change wins; keys whose
    * latest change satisfies `isDelete` vanish (tombstone). The same
    * reduction Delta/Iceberg MERGE or a Flink upsert-changelog sink
    * performs, expressed Spark-first as ONE two-phase hash aggregate:
    * `max_by(struct(*), struct(version, tiebreak))` computes per-key
    * maxima map-side BEFORE the shuffle, so a key with a million
    * updates ships at most one row per input task — where the
    * row_number-window formulation (the oracle states that form) would
    * shuffle and sort every version of every key. `version` must be
    * non-null (null ordering keys would silently lose to any non-null
    * change); `tiebreak` makes the winner deterministic when versions
    * collide. Streaming twin: [[graft.streaming.StreamingOps]] S20
    * applies the same changelog continuously through keyed state. */
  def applyChanges(df: DataFrame, key: Seq[Column], version: Column,
      tiebreak: Column, isDelete: Column): DataFrame =
    // NULL delete flag = NOT a tombstone (coalesce — a bare !isDelete
    // would SQL-filter the winner out, silently deleting the key; a CDC
    // source with occasional null op columns must not lose keys)
    latestByKey(df, key, version, tiebreak)
      .filter(coalesce(!isDelete, lit(true)))

  /** The reduction inside [[applyChanges]] WITHOUT the tombstone filter:
    * one winning row per key, deletes still present as rows. This is
    * what a continuously-maintained upsert STATE must store — dropping
    * tombstones from state would let an out-of-order older update
    * resurrect a deleted key (S20 spec pins that exact scenario); the
    * read face filters them ([[graft.streaming.StreamingOps.upsertState]]). */
  def latestByKey(df: DataFrame, key: Seq[Column], version: Column,
      tiebreak: Column): DataFrame = {
    require(key.nonEmpty, "latestByKey needs at least one key column")
    val cols = df.columns
    df.groupBy(key: _*)
      .agg(max_by(struct(cols.map(col): _*), struct(version, tiebreak))
        .as("__last"))
      .select(cols.map(c => col(s"__last.`$c`").as(c)): _*)
  }

  /** Golden-record survivorship merge — the MDM consumer of a changelog:
    * one row per key carrying, for EACH field independently, the value
    * of the latest change where that field was NON-NULL (a sparse
    * update stream — each change touches some fields — merges into the
    * complete current profile), plus `last_<version>`. Extends
    * [[applyChanges]] field-wise: apply keeps the whole winning row
    * (a null field in the winner nulls the profile); survivorship keeps
    * each field's own winner.
    *
    * ONE two-phase hash aggregate — per-field
    * `max_by(field, (version, tiebreak)) FILTER (WHERE field IS NOT
    * NULL)` — so partial per-key/per-field winners combine map-side and
    * a hot key never ships its history (the q96 posture); no window, no
    * per-field self-joins (the oracle states that per-field row_number
    * form). Columns by NAME (the S20 restart contract). `version` must
    * be non-null, ties break on `tiebreak`. */
  def goldenRecord(df: DataFrame, key: Seq[Column], version: String,
      tiebreak: String, fields: Seq[String]): DataFrame = {
    require(key.nonEmpty, "goldenRecord needs at least one key column")
    require(fields.nonEmpty, "goldenRecord needs at least one field")
    require(fields.distinct.size == fields.size,
      s"duplicate field names: ${fields.diff(fields.distinct).distinct.mkString(", ")}")
    require(!fields.contains(s"last_$version"),
      s"field 'last_$version' collides with the appended last-version column")
    val aggs = fields.map(f =>
      expr(s"max_by(`$f`, struct(`$version`, `$tiebreak`)) " +
        s"FILTER (WHERE `$f` IS NOT NULL)").as(f)) :+
      max(col(version)).as(s"last_$version")
    df.groupBy(key: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-batch pre-reduction for the streaming golden-record log — the
    * S26 member of the append-log family ([[latestByKey]]'s S20 upsert
    * shape at FIELD grain): one row per key carrying, for every field,
    * the batch's winning (v = version, t = tiebreak, x = value) STRUCT
    * — NULL when the batch saw no non-null value for that field — plus
    * the batch's `last_<version>`. Per-field max over the (version,
    * tiebreak) total order is ASSOCIATIVE and arrival-order-
    * insensitive, so reducing any log of these deltas re-derives full
    * survivorship exactly: [[graft.streaming.StreamingOps.goldenRecordState]]
    * over the log == [[goldenRecord]] over all changes, for ANY
    * chunking (law S26). Unlike [[goldenRecord]] (max_by — value never
    * compared) the delta rides the value INSIDE the comparison struct,
    * so fields must be orderable types (no maps); a cross-delta
    * (version, tiebreak) tie can only be the same change replayed
    * (at-least-once retry), where the value ties too. Columns by NAME
    * (the S20 restart contract). */
  def goldenRecordDelta(df: DataFrame, key: Seq[String], version: String,
      tiebreak: String, fields: Seq[String]): DataFrame = {
    require(key.nonEmpty, "goldenRecordDelta needs at least one key column")
    require(fields.nonEmpty, "goldenRecordDelta needs at least one field")
    require(fields.distinct.size == fields.size,
      s"duplicate field names: ${fields.diff(fields.distinct).distinct.mkString(", ")}")
    require(!fields.contains(s"last_$version"),
      s"field 'last_$version' collides with the appended last-version column")
    val aggs = fields.map(f =>
      max(when(col(f).isNotNull,
        struct(col(version).as("v"), col(tiebreak).as("t"),
          col(f).as("x")))).as(f)) :+
      max(col(version)).as(s"last_$version")
    df.groupBy(key.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** SCD Type-2 history build — the other consumer of the same
    * changelog: every surviving change becomes a versioned dimension
    * row effective [`effective_from`, `effective_to`) with
    * `is_current` marking each key's open row. Delete tombstones emit
    * no row of their own but still CLOSE the predecessor's interval
    * (its `effective_to` is the delete's timestamp) and leave the key
    * with no current row — the standard warehouse contract for hard
    * deletes in a type-2 dimension.
    *
    * Plan: one shuffle on `key` + one in-partition ordered window
    * (lead) — no self-join; at 100 TB the changelog partitions on its
    * natural key and AQE skew-split handles hot keys, the q27/q28
    * posture. */
  def scd2(df: DataFrame, key: Seq[Column], ts: Column, tiebreak: Column,
      isDelete: Column): DataFrame = {
    require(key.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(key: _*).orderBy(ts, tiebreak)
    df.withColumn("effective_from", ts)
      .withColumn("effective_to", lead(ts, 1).over(w))
      // a closed-by-delete row keeps its non-null effective_to; NULL
      // delete flags are NOT tombstones (the applyChanges contract)
      .filter(coalesce(!isDelete, lit(true)))
      .withColumn("is_current", col("effective_to").isNull)
  }

  // -------------------------------------------------- funnel analysis

  /** Ordered-sequence funnel: for every key, the first time each stage
    * of `stages` was reached IN ORDER — stage i counts only strictly
    * after stage i−1's first completion and within `horizonUs` of stage
    * 0's (the classic product-analytics funnel; MATCH_RECOGNIZE-lite).
    * Returns one row per key: `t_<stage>` timestamps (NULL from the
    * first unreached stage on — reaching stage i without i−1 is
    * impossible by construction) and `stage_reached` (0..n).
    *
    * Plan: ONE shuffle on `key`, then n windowed conditional-min passes
    * over the same partitioning (Catalyst collapses them — no
    * per-stage re-shuffle, no self-joins, no row explosion), then a
    * same-key aggregate that reuses the partitioning. Skewed keys →
    * AQE, the q27/q28 posture. */
  def funnel(df: DataFrame, key: Column, ts: Column, stage: Column,
      stages: Seq[String], horizonUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    require(horizonUs > 0, s"horizonUs must be positive; got $horizonUs")
    // stage names become `t_<stage>` output columns referenced by name;
    // a dot or backtick would parse as struct access / break resolution
    // with an opaque AnalysisException deep in the plan — fail at the API
    // boundary instead (review r15). ONLY those two characters are the
    // hazard: an allowlist regex here rejected previously-working
    // non-ASCII stage names like "señal" (review r16)
    val badStages = stages.filter(s => s.isEmpty ||
      s.contains(".") || s.contains("`"))
    require(badStages.isEmpty,
      "funnel stage names must be non-empty and contain no '.' or '`' " +
        s"(they become t_<stage> output columns); got: " +
        badStages.mkString(", "))
    val w = Window.partitionBy(col("__key"))
    var cur = df.select(key.as("__key"), ts.as("__ts"), stage.as("__st"))
      .withColumn(s"t_${stages.head}",
        min(when(col("__st") === stages.head, col("__ts"))).over(w))
    val deadline = unix_micros(col(s"t_${stages.head}")) + horizonUs
    for (i <- 1 until stages.size) {
      cur = cur.withColumn(s"t_${stages(i)}",
        min(when(col("__st") === stages(i) &&
            col("__ts") > col(s"t_${stages(i - 1)}") &&
            unix_micros(col("__ts")) <= deadline,
          col("__ts"))).over(w))
    }
    val tAggs = stages.map(s => min(col(s"t_$s")).as(s"t_$s"))
    val reached = stages
      .map(s => when(col(s"t_$s").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    cur.groupBy(col("__key").as("key"))
      .agg(tAggs.head, tAggs.tail: _*)
      .withColumn("stage_reached", reached)
  }

  /** Per-key state-transition (Markov) counts — the path-analysis
    * companion to [[funnel]] (which checks ONE prescribed order) and
    * [[cohortRetention]]: over each key's (ts, tiebreak)-ordered event
    * stream, count every consecutive (from_state → to_state) step and
    * report the exact transition share in integer ppm
    * (n·10⁶ div Σ n(from) — the q54/q104 decimal-free idiom). A key's
    * first event has no predecessor and feeds no transition; NULL
    * states are real states (a NULL→x step counts — null-safe grouping),
    * so instrumentation gaps show up as mass instead of vanishing.
    * Rows with a NULL ts or tiebreak drop up front (no position in the
    * order — the timeWeightedAvg posture; engines disagree on where
    * NULLs sort inside a window ORDER BY, so the contract is explicit).
    * Output: (from_state, to_state, n, p_ppm).
    *
    * Plan: ONE shuffle on key + an in-partition lag window (the q27/q28
    * posture), then a (from, to) hash agg — state-catalog-sized — and a
    * from-keyed window over THAT catalog for the denominators. The
    * corpus shuffles once; everything after is catalog-scale. */
  def transitionCounts(df: DataFrame, key: Column, ts: Column,
      state: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
    df.select(key.as("__k"), ts.as("__ts"), tiebreak.as("__tb"),
        state.as("__s"))
      .filter(col("__ts").isNotNull && col("__tb").isNotNull)
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .withColumn("__has_prev", lag(lit(1), 1).over(w)) // NULL state ≠ no row
      .filter(col("__has_prev").isNotNull)
      .groupBy(col("__prev").as("from_state"), col("__s").as("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum("n").over(Window.partitionBy(col("from_state"))))
      .withColumn("p_ppm", expr("(n * 1000000L) div __tot"))
      .drop("__tot")
  }

  // ------------------------------------------- multi-touch attribution

  /** Multi-touch attribution report — which channel gets credit for a
    * conversion, under the three standard models at once: for every
    * conversion event, its attributable touches are the same key's
    * non-conversion events at a strictly earlier (ts, tiebreak)
    * position within `lookbackDays`; FIRST-touch credits the earliest
    * such touch, LAST-touch the latest, and LINEAR splits 10⁶ ppm
    * evenly with the integer remainder going to the last touch — so
    * every attributed conversion's linear shares sum to EXACTLY 10⁶
    * and the whole report is integer arithmetic (hash-gates, q140).
    * Conversions with no in-window touch are unattributable and drop
    * (stated — report them via [[funnel]] if the zero-touch count
    * matters). Rows with NULL key/ts/tiebreak drop up front (no
    * position in the order — the house q117/q126 posture). CONTRACT:
    * (ts, tiebreak) must be unique per key among a conversion's
    * touches — a duplicate pair at the first/last position makes the
    * credit ambiguous and raises loudly at run time rather than
    * over-crediting silently.
    *
    * Plan: ONE key equi-join (conversions × touches, range residual on
    * the micros — never a cross product), one UNSORTED window over the
    * conversion key (count/min/max aggregate frames — no sort pass),
    * one channel agg. Touches per key are activity-bounded; a hot key
    * is one AQE-split partition. */
  def attributionReport(df: DataFrame, key: Column, ts: Column,
      tiebreak: Column, channel: Column, isConversion: Column,
      lookbackDays: Int): DataFrame = {
    require(lookbackDays >= 1 && lookbackDays <= 3650,
      s"lookbackDays must be in [1, 3650]; got $lookbackDays")
    val base = df.select(key.as("__u"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), channel.as("__ch"), isConversion.as("__cv"))
      .filter(col("__u").isNotNull && col("__t").isNotNull &&
        col("__tb").isNotNull)
    val conv = base.filter(col("__cv"))
      .select(col("__u"), col("__t").as("__ct"), col("__tb").as("__ctb"))
    val touch = base.filter(!col("__cv"))
      .select(col("__u"), col("__t").as("__tt"), col("__tb").as("__ttb"),
        col("__ch"))
    val lookbackUs = lookbackDays * 86400000000L
    val joined = conv.join(touch, Seq("__u"))
      .filter((col("__tt") < col("__ct") ||
        (col("__tt") === col("__ct") && col("__ttb") < col("__ctb"))) &&
        col("__tt") >= col("__ct") - lit(lookbackUs))
    val w = Window.partitionBy(col("__u"), col("__ct"), col("__ctb"))
    joined
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__pos", struct(col("__tt"), col("__ttb")))
      .withColumn("__isf", col("__pos") === min(col("__pos")).over(w))
      .withColumn("__isl", col("__pos") === max(col("__pos")).over(w))
      // the (ts, tiebreak) pair must be UNIQUE per key among a
      // conversion's touches: a duplicate pair at the min or max
      // position would credit first/last to MULTIPLE touches and push
      // the linear remainder above 10⁶ ppm — that ambiguity fails
      // loudly (house raise_error posture, r17 ADVICE) instead of
      // silently over-crediting. Duplicates at interior positions are
      // harmless and pass. Same unsorted window frames, no extra sort.
      .withColumn("__nf", sum(when(col("__isf"), 1L).otherwise(0L)).over(w))
      .withColumn("__nl", sum(when(col("__isl"), 1L).otherwise(0L)).over(w))
      .withColumn("__lin",
        when(col("__nf") > 1 || col("__nl") > 1, raise_error(concat(
          lit("attributionReport: duplicate (ts, tiebreak) among a "),
          lit("conversion's touches (key "), col("__u").cast("string"),
          lit(") — first/last credit is ambiguous; pick a unique tiebreak"))))
        .otherwise(expr("cast(1000000 as bigint) div __n") +
          when(col("__isl"), expr("cast(1000000 as bigint) % __n"))
            .otherwise(lit(0L))))
      .groupBy(col("__ch").as("channel"))
      .agg(sum(when(col("__isf"), 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("__isl"), 1L).otherwise(0L)).as("last_touch"),
        sum(col("__lin")).as("linear_ppm"))
  }

  // ------------------------------------------------ cohort retention

  /** Cohort retention: key grouped by the calendar period of its FIRST
    * activity (`date_trunc(unit, min ts)`), then for every (cohort,
    * period-offset) the count of cohort members active in that period —
    * the standard growth-analytics retention triangle. `retention_ppm`
    * is exact integer ppm (`n_active·10⁶ div n_cohort` — the q54/q80
    * decimal-free share idiom).
    *
    * Plan: one agg on key (first activity), one (key, period) distinct,
    * one key equi-join, one (cohort, period) agg, one broadcast-sized
    * cohort-sizes join — every shuffle keyed by key or by the
    * catalog-scale (cohort, period) pair; no window, no self-join over
    * the event log. Period offsets are exact integer divisions of
    * truncated-boundary differences (UTC — no DST shear). */
  def cohortRetention(df: DataFrame, key: Column, ts: Column,
      unit: String = "week"): DataFrame = {
    val periodUs: Long = unit match {
      case "week" => 7L * 86400 * 1000000
      case "day" => 86400L * 1000000
      case other => throw new IllegalArgumentException(
        s"cohortRetention unit must be 'week' or 'day'; got '$other'")
    }
    val firsts = df.groupBy(key.as("__k")).agg(min(ts).as("__t0"))
      .select(col("__k"), date_trunc(unit, col("__t0")).as("cohort"))
    val active = df.select(key.as("__k"), date_trunc(unit, ts).as("__wk"))
      .distinct()
    val sizes = firsts.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    active.join(firsts, "__k")
      .groupBy(col("cohort"), col("__wk"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort")
      .withColumn("period_offset",
        expr(s"(unix_micros(__wk) - unix_micros(cohort)) div ${periodUs}L"))
      .withColumn("retention_ppm",
        expr("(n_active * 1000000L) div n_cohort"))
      .select(col("cohort"), col("period_offset"), col("n_active"),
        col("n_cohort"), col("retention_ppm"))
  }

  // ------------------------------------------ rolling distinct count

  /** Rolling trailing-window distinct count (the "7-day active users"
    * shape): for every calendar day that appears in the input, the
    * number of DISTINCT entities with at least one row in the closed
    * trailing window [day − windowDays + 1, day]. Output grid = days
    * present in the corpus (a day with zero rows of its own does not
    * surface even if trailing activity covers it — the honest contract;
    * gap-fill the grid first if a dense calendar is wanted).
    *
    * Spark has no distinct-over-range-window; the scale shape here is
    * CONTRIBUTION EXPLOSION instead of a window: (entity, day) pairs
    * are deduped once (shuffle 1, corpus-keyed), each pair fans out
    * narrowly into the ≤ `windowDays` target days it contributes to,
    * dedup again on (entity, target day) (shuffle 2, ≤ windowDays× the
    * pair count — bounded, never |corpus|²), then one map-side-combined
    * count per day. The day catalog is calendar-bounded (years → low
    * thousands of rows) so the grid semi-join broadcasts. */
  def rollingDistinct(df: DataFrame, entity: Column, ts: Column,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1; got $windowDays")
    val d = df.select(entity.as("__e"), to_date(ts).as("__day")).distinct()
    val days = d.select(col("__day").as("day")).distinct()
    val contrib = d
      .select(col("__e"), explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))).as("day"))
      .distinct()
    contrib.join(broadcast(days), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active"))
  }

  // ---------------------------------------------- prefix rollup

  /** Hierarchical prefix rollup — "which subtrees of the corpus are
    * heavy": every row's `path` (a `sep`-joined hierarchy — URL path,
    * source/section taxonomy, directory) contributes one count to each
    * of its ancestor prefixes up to `maxDepth`, yielding (prefix,
    * depth, n) for the whole tree in ONE pass. The standard input to
    * per-subtree caps and crawl-balance reports (pair with
    * `stratifiedFixedSample` on a chosen prefix depth to enforce a
    * cap). NULL paths drop; empty segments are real segments (a
    * trailing separator is a child named "" — honest, not normalized
    * away).
    *
    * Plan: ancestor prefixes expand NARROWLY per row (≤ min(depth,
    * maxDepth) structs from one codegen'd transform — no join, no
    * window), then ONE map-side-combined agg on (prefix, depth):
    * output is tree-sized, the corpus shuffles once at prefix grain.
    * `sep` is regex-quoted — "." or "|" separators are literal. */
  def prefixRollup(df: DataFrame, path: Column, sep: String = "/",
      maxDepth: Int = Int.MaxValue): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1; got $maxDepth")
    val segs = split(path, java.util.regex.Pattern.quote(sep))
    val pref = transform(
      sequence(lit(1), least(size(segs), lit(maxDepth))),
      d => struct(array_join(slice(segs, lit(1), d), sep).as("prefix"),
        d.as("depth")))
    df.filter(path.isNotNull)
      .select(explode(pref).as("__p"))
      .groupBy(col("__p.prefix").as("prefix"), col("__p.depth").as("depth"))
      .agg(count(lit(1)).as("n"))
  }

  // ----------------------------------------------- lexicon scoring

  /** Lexicon/blocklist scoring — the curation gate "how much of this
    * document's mass is lexicon terms" (safety blocklists, boilerplate
    * vocabularies, domain wordlists): per document the total lexicon
    * token hits, the distinct matched terms, and an exact integer-ppm
    * density (`hits·10⁶ div n_tokens`; a zero-token document scores
    * 0/0/0 — stated, never a divide). Matching is whole-token equality
    * over [[graft.functions.Text.tokens]]; lexicon entries must be
    * single normalized tokens — a multi-word or mixed-case entry never
    * matches anything (normalize/split the lexicon upstream, stated
    * contract).
    *
    * The lexicon is a TABLE, not a literal: real blocklists run 10⁴–10⁶
    * terms, which must never be embedded in the plan. Plan: tokens
    * explode narrowly, a broadcast LEFT-SEMI join against the
    * deduped lexicon keeps only matching tokens (hit-bounded — the
    * corpus-sized token stream never shuffles), one agg on doc id over
    * the matches, then one doc-keyed join back onto the per-doc token
    * counts (computed in the same scan, no second pass over text). */
  def lexiconScore(df: DataFrame, id: Column, text: Column,
      lexicon: DataFrame, term: Column): DataFrame = {
    val toks = df.select(id.as("__id"), Text.tokens(text).as("__tk"))
    val base = toks.select(col("__id"),
      // tokens("") == [""] — an empty/whitespace doc must count 0
      when(col("__tk") === typedLit(Seq("")), lit(0))
        .otherwise(size(col("__tk"))).as("n_tokens"))
    val lex = lexicon.select(term.as("__t")).distinct()
    val hits = toks.select(col("__id"), explode(col("__tk")).as("__t"))
      .join(broadcast(lex), Seq("__t"), "left_semi")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__hits"),
        countDistinct(col("__t")).as("__terms"))
    base.join(hits, Seq("__id"), "left")
      .select(col("__id").as("doc_id"), col("n_tokens"),
        coalesce(col("__hits"), lit(0L)).as("hits"),
        coalesce(col("__terms"), lit(0L)).as("n_terms"),
        when(col("n_tokens") > 0,
          expr("(coalesce(__hits, 0L) * 1000000L) div n_tokens"))
          .otherwise(lit(0L)).as("hits_ppm"))
  }

  // ---------------------------------------------- pareto frontier

  /** Per-group 2-D Pareto frontier (skyline): the DISTINCT (x, y)
    * points not strictly dominated by any other point of their group —
    * q dominates p iff q is better-or-equal on both axes and strictly
    * better on at least one ("better" per `minimizeX`/`minimizeY`).
    * Rows with NULL x or y are excluded up front (the two engines
    * disagree on NULL sort placement, and a NULL coordinate has no
    * domination order — the honest contract).
    *
    * The naive statement is an all-pairs anti-join (|G|² per group —
    * banned shape). The 2-D frontier needs none of it: sort the
    * group's distinct points better-x-first (ties better-y-first);
    * a point survives iff its y is strictly better than the running
    * best y of all STRICTLY-PRECEDING points (any dominator sorts
    * earlier, and every earlier point with better-or-equal y is a
    * dominator — the classic sweep, here one window pass). Plan: one
    * distinct shuffle + one per-group window on the SAME key — the
    * q27/q28 single-shuffle posture. A single giant group serializes
    * into one task's sort, the standard per-group window bound. */
  def paretoFrontier(df: DataFrame, group: Column, x: Column, y: Column,
      minimizeX: Boolean = true, minimizeY: Boolean = true): DataFrame = {
    val pts = df.filter(x.isNotNull && y.isNotNull)
      .select(group.as("__g"), x.as("__x"), y.as("__y")).distinct()
    val w = Window.partitionBy(col("__g"))
      .orderBy(
        if (minimizeX) col("__x").asc else col("__x").desc,
        if (minimizeY) col("__y").asc else col("__y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val best = if (minimizeY) min(col("__y")).over(w)
               else max(col("__y")).over(w)
    val strictlyBetter = if (minimizeY) col("__y") < col("__m")
                         else col("__y") > col("__m")
    pts.withColumn("__m", best)
      .filter(col("__m").isNull || strictlyBetter)
      .select(col("__g").as("group"), col("__x").as("x"), col("__y").as("y"))
  }

  // ------------------------------------------------- interval join

  /** Interval-overlap join: pairs every left row with every right row
    * whose closed time interval [rStart, rEnd] overlaps the left's
    * [lStart, lEnd] (overlap iff lStart ≤ rEnd AND rStart ≤ lEnd),
    * optionally under an extra equi-key. Right columns surface under
    * `rightPrefix`.
    *
    * Spark's own planner turns a pure range predicate into a broadcast
    * nested-loop — all-pairs, the one shape this engine bans (q14
    * precedent). Instead each interval explodes into the fixed-width
    * `spanUs` BUCKETS it covers and the join is an EQUI-join on
    * (bucket, key): two intervals can only overlap if they share a
    * covered bucket, so candidates are bucket-local — shuffle-bounded
    * by occupancy, never |L|×|R|. A pair sharing several buckets is
    * emitted exactly once, STATELESSLY: only from the FIRST shared
    * bucket, which for contiguous intervals is
    * `greatest(bucket0(lStart), bucket0(rStart))` — a per-row
    * predicate, no dropDuplicates (the S16 collapse idea in batch).
    * Exact overlap is then verified on the real endpoints.
    *
    * `spanUs` is the scale knob: row inflation = interval length /
    * span (pick span ≈ typical interval length — each side then
    * explodes ~2×); bucket occupancy bounds the worst key's work, and
    * AQE skew-split handles a hot bucket. Rows with NULL or inverted
    * (end < start) intervals join nothing, on either side (documented:
    * `sequence()` would walk BACKWARD on inverted bounds rather than
    * fail). Bucket ids use `div` — trunc division, == floor on the
    * post-1970 data (the gapFill precedent). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lStart: Column, lEnd: Column, rStart: Column, rEnd: Column,
      spanUs: Long, key: Option[(String, String)] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(spanUs > 0, s"spanUs must be positive; got $spanUs")
    // the bucket/endpoint working columns are reserved: withColumn would
    // silently OVERWRITE a user column of the same name and the final
    // drop would remove it (review r15) — fail at the API boundary
    // lowercase before matching: Spark resolution is case-INSENSITIVE,
    // so a user column named __B would be clobbered just the same
    // (review r16 — sampleBudget's guard had this right)
    val reserved = Set("__b", "__ls", "__le", "__rs", "__re")
    val clashes =
      (left.columns ++ right.columns).filter(c => reserved(c.toLowerCase))
    require(clashes.isEmpty,
      s"intervalJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename the input column(s): ${clashes.distinct.mkString(", ")}")
    def prep(df: DataFrame, s: Column, e: Column, tag: String): DataFrame =
      df.filter(s.isNotNull && e.isNotNull && s <= e)
        .withColumn(s"__${tag}s", unix_micros(s))
        .withColumn(s"__${tag}e", unix_micros(e))
        .withColumn("__b", explode(sequence(
          expr(s"__${tag}s div ${spanUs}L"), expr(s"__${tag}e div ${spanUs}L"))))
    val l = prep(left, lStart, lEnd, "l")
    val r0 = prep(right, rStart, rEnd, "r")
    // prefix every ORIGINAL right column — including user columns that
    // happen to start with __ (review r15: a startsWith("__") test let
    // them escape the rename and collide ambiguously with left columns)
    val rWorking = Set("__b", "__rs", "__re")
    val r = r0.select(r0.columns.map(c =>
      if (rWorking(c)) col(c) else col(c).as(s"$rightPrefix$c")): _*)
    val keyCond = key.map { case (lk, rk) =>
      l(lk) === r(s"$rightPrefix$rk") }.getOrElse(lit(true))
    l.join(r,
        l("__b") === r("__b") && keyCond &&
          l("__ls") <= r("__re") && r("__rs") <= l("__le") &&
          l("__b") === greatest(expr(s"__ls div ${spanUs}L"),
            expr(s"__rs div ${spanUs}L")))
      .drop("__b", "__ls", "__le", "__rs", "__re")
  }

  // --------------------------------------- intra-doc segment dedup

  /** Intra-document repeated-segment trim — the Gopher-style boilerplate
    * removal that operates INSIDE one document (repeated headers,
    * footers, navigation blocks), complementing [[maskRepeatedSpans]]'s
    * cross-document masking and q38's repetition SCORE (this one
    * transforms): cut the token stream into consecutive `width`-token
    * segments, drop every segment that already occurred in the same
    * document (first occurrence kept, order preserved), re-join. One
    * codegen'd [[graft.functions.DedupSegments]] pass per row — pure
    * narrow, ZERO shuffles at any scale (the chunkDocuments posture).
    * Adds `out` (trimmed text), `n_segs`, `n_kept`. */
  def trimRepeatedSegments(df: DataFrame, text: Column, width: Int,
      out: String = "trimmed_text"): DataFrame = {
    require(width >= 1, s"width must be >= 1; got $width")
    // empty/whitespace text is ZERO segments, not one: split("", " ")
    // yields [""], which would re-enter as a phantom single-token segment
    // and diverge from any list-arithmetic restatement (review r15 — the
    // q101 oracle computes 0 for an empty token list)
    df.withColumn("__toks",
        when(length(trim(text)) === 0, array().cast("array<string>"))
          .otherwise(graft.functions.Text.tokens(text)))
      .withColumn("__kept",
        graft.functions.DedupSegments.asColumn(col("__toks"), width))
      .withColumn("n_segs", // exact integer ceil-division (q86 precedent)
        expr(s"(size(__toks) + ${width - 1}) div $width").cast("long"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn(out, array_join(col("__kept"), " "))
      .drop("__toks", "__kept")
  }

  // ------------------------------------------------- robust outliers

  /** Robust per-group outlier scoring via median/MAD — the data-quality
    * screen that survives the contamination it hunts (mean/stddev move
    * with the outliers; median/MAD don't). Adds `med`, `mad` (group
    * medians, exact interpolated percentile — same portable aggregate as
    * q29) and `score` = |value − med| / mad (NULL when MAD is 0: a
    * degenerate group where >half the values sit ON the median scores
    * nothing rather than everything).
    *
    * Plan: two hash aggregates on the group key with the per-group stats
    * broadcast back — group cardinality is assumed catalog-scale (langs,
    * sources, shards), so each join is a broadcast, never a corpus
    * shuffle; the corpus itself is scanned narrow, twice. At 100 TB the
    * alternative single-pass approximate tier is `percentile_approx` on
    * both aggs (GK sketch, not oracle-portable — q29b precedent). */
  def robustOutliers(df: DataFrame, group: Column, value: Column): DataFrame =
    robustOutliersImpl(df, group, value, exact = true, accuracy = 0)

  /** The bounded-memory tier of [[robustOutliers]] for groups too hot to
    * buffer exactly: both medians come from `percentile_approx`'s GK
    * sketch (O(accuracy) state per group vs the exact aggregate
    * buffering every value — the q29b/topQuantileFilterApprox trade).
    * Same output contract; scores are approximate with the sketch's
    * rank-error bound (spec-asserted close to exact at fixture scale),
    * so this tier is NOT oracle-portable — use it for scale, the exact
    * tier for the gate. */
  def robustOutliersApprox(df: DataFrame, group: Column, value: Column,
      accuracy: Int = 10000): DataFrame = {
    require(accuracy > 0, s"accuracy must be positive; got $accuracy")
    robustOutliersImpl(df, group, value, exact = false, accuracy = accuracy)
  }

  /** Per-group winsorization — outlier CAPPING where [[robustOutliers]]
    * only scores and [[topQuantileFilter]] drops: every value clamped to
    * its group's exact [pLo, pHi] percentile band (`clamped` column;
    * in-band values pass through BIT-identical in the value's own type —
    * clamping must never alter inliers, and `clamped` keeps the input
    * column's type). NULL values pass through NULL; a NULL GROUP is a
    * group like any other (null-safe join — no row is ever dropped).
    * Group stats broadcast back — the corpus never shuffles on the
    * group key (the robustOutliers plan). The GK-sketch tier for groups
    * too hot to buffer exactly is [[topQuantileFilterApprox]]'s same
    * trade — compose with `percentile_approx` directly when needed (not
    * oracle-portable).
    *
    * Bounds are DISCRETE percentiles (inverse CDF — the smallest value
    * whose cume_dist ≥ p): the textbook winsorization replaces tails
    * with actual order STATISTICS, and a discrete bound is an existing
    * data value, so no interpolation arithmetic exists to diverge
    * between engines (the interpolated form lost a ulp to DuckDB's
    * `lo + (hi−lo)·g` at sf1 — measured, round 15). Spark's
    * `percentile_disc` aggregate emits the bound as a double, so it is
    * cast back to the value's type here; for integral values beyond
    * 2^53 the BOUND itself travels through double and may round — only
    * the bound, never an in-band value. */
  def winsorize(df: DataFrame, group: Column, value: Column,
      pLo: Double, pHi: Double, out: String = "clamped"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1; got [$pLo, $pHi]")
    val d = df.withColumn("__g", group).withColumn("__v", value)
    val vType = d.schema("__v").dataType
    val bounds = d.groupBy(col("__g")).agg(
      expr(s"percentile_disc($pLo) WITHIN GROUP (ORDER BY __v)")
        .cast(vType).as("__lo"),
      expr(s"percentile_disc($pHi) WITHIN GROUP (ORDER BY __v)")
        .cast(vType).as("__hi"))
      .withColumnRenamed("__g", "__gb")
    d.join(broadcast(bounds), col("__g") <=> col("__gb"))
      .withColumn(out,
        when(col("__v") < col("__lo"), col("__lo"))
          .when(col("__v") > col("__hi"), col("__hi"))
          .otherwise(col("__v")))
      .drop("__g", "__gb", "__v", "__lo", "__hi")
  }

  private def robustOutliersImpl(df: DataFrame, group: Column, value: Column,
      exact: Boolean, accuracy: Int): DataFrame = {
    def med(c: String): String =
      if (exact) s"percentile($c, 0.5)"
      else s"percentile_approx($c, 0.5, $accuracy)"
    val d = df.withColumn("__g", group).withColumn("__v", value.cast("double"))
    val m = d.groupBy(col("__g"))
      .agg(expr(med("__v")).cast("double").as("med"))
    val withMed = d.join(broadcast(m), Seq("__g"))
    val mad = withMed.groupBy(col("__g"))
      .agg(expr(med("abs(__v - med)")).cast("double").as("mad"))
    withMed.join(broadcast(mad), Seq("__g"))
      .withColumn("score",
        when(col("mad") > 0, abs(col("__v") - col("med")) / col("mad")))
      .drop("__g", "__v")
  }

}
