package graft.api


/** The reusable operator API: every LLM-data-pipeline operator as a
  * parametric `DataFrame => DataFrame` transformation, independent of any
  * fixture schema. `SparkEntry.queries` instantiates these against the
  * TESTDATA tables for the oracle gate; library users call them directly.
  *
  * All operators keep the 100 TB shape: signatures are narrow maps,
  * candidate generation is index-shaped (bands / chunks / inverted lists),
  * per-pair verification touches only candidate pairs, and every output is
  * deterministic (explicit survivors, tiebreaks, total-order sorts are the
  * caller's choice).
  */
object GraftOps
    extends DedupApi
    with SimilarityApi
    with ModelStatApi
    with TextApi
    with TemporalApi
    with ProfilingApi
    with SketchApi
