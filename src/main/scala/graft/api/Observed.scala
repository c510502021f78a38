package graft.api

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** One-pass pipeline observability via Spark's Observation API: named
  * aggregate metrics (row counts, drop rates, token totals) computed ON
  * the plan node they observe, during the job that materializes the
  * result — at 100 TB a separate `count()` per stage re-reads the input,
  * while an observation is free. Works on batch plans (read the
  * Observation after the action) and streaming plans (metrics surface in
  * each micro-batch's QueryProgress.observedMetrics under `name`).
  *
  * Constraint (Spark's, enforced at analysis): metric expressions must be
  * DISTINCT-free aggregates — count a marker row (e.g. `copy_idx = 1`)
  * instead of `countDistinct`.
  *
  * Usage:
  * {{{
  * val (mixed, m) = Observed(GraftOps.mixCorpus(...), "mix",
  *   count(lit(1)).as("rows_out"), sum(col("n_tokens")).as("tokens_out"))
  * mixed.write...   // one job
  * m.get("rows_out") // metrics of that same job
  * }}}
  */
object Observed {
  /** Batch form: read the Observation after the materializing action. */
  def apply(df: DataFrame, name: String, first: Column,
      rest: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, first, rest: _*), obs)
  }

  /** Streaming form (an Observation handle would be ambiguous across
    * micro-batches, so Spark rejects it on streams): metrics land in each
    * micro-batch's `QueryProgress.observedMetrics(name)` — read them from
    * `query.lastProgress`/`recentProgress` or a StreamingQueryListener. */
  def streaming(df: DataFrame, name: String, first: Column,
      rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)
}
