package graft.tools

/** Registry-growth guard for the bench baseline: fails (exit 1) if any
  * `SparkEntry.queries` key has no row in `BASELINE.md`'s per-query
  * frozen-medians table — so the 2× bench gate can never silently skip
  * a query (q61 landed in round 8 and q109/q110 in round 15 without
  * freeze rows, each a judge finding a round later; this makes the gap
  * loud and mechanical). Also cross-checks that the "suite wall-clock"
  * headline equals the re-sum of the table, so the two can't drift.
  * The SAME coverage rule applies to `PLAN_AUDIT.md` (the per-round
  * plan-shape diff guard): a registry key without a plan row means the
  * plan-regression diff has a hole exactly where the newest code is
  * (q145–q147 landed after the r17 regeneration — a judge finding) —
  * so a missing PLAN_AUDIT row fails too.
  *
  * Usage: sbt "runMain graft.tools.CheckFreeze [BASELINE.md [PLAN_AUDIT.md]]"
  * Run it with CheckSf1/CheckSurvey after any round that adds queries.
  */
object CheckFreeze {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("BASELINE.md")
    val auditPath = args.drop(1).headOption.getOrElse("PLAN_AUDIT.md")
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    // frozen rows look like `| q83_semantic_dedup | 1.74 |`
    val Row = """\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|""".r
    val frozen = lines.collect { case Row(q, s) => q -> s.toDouble }.toMap
    val registry = graft.SparkEntry.queries.keySet
    val missing = (registry -- frozen.keySet).toSeq.sorted
    val stale = (frozen.keySet -- registry).toSeq.sorted
    if (stale.nonEmpty)
      System.err.println(s"[check-freeze] WARNING stale rows (no such " +
        s"query): ${stale.mkString(", ")}")
    // PLAN_AUDIT coverage: every registry key must have a plan-shape row
    // (`| q83_semantic_dedup | 3 | 1 | ... |`) so the per-round plan
    // diff can never silently skip the newest queries
    val AuditRow = """\|\s*(q\w+)\s*\|.*""".r
    val audited = scala.io.Source.fromFile(auditPath, "UTF-8").getLines()
      .collect { case AuditRow(q) if q != "query" => q }.toSet
    val unaudited = (registry -- audited).toSeq.sorted
    val staleAudit = (audited -- registry).toSeq.sorted
    if (staleAudit.nonEmpty)
      System.err.println(s"[check-freeze] WARNING stale PLAN_AUDIT rows " +
        s"(no such query): ${staleAudit.mkString(", ")}")
    // headline `| suite wall-clock ... | **160.61 s** (...` must re-sum
    val Headline = """.*suite wall-clock.*\*\*([0-9.]+) s\*\*.*""".r
    val headline = lines.collectFirst { case Headline(v) => v.toDouble }
    val tableSum = frozen.values.sum
    val sumDrift = headline match {
      case Some(h) if math.abs(h - tableSum) > 0.005 * frozen.size =>
        Some(f"headline $h%.2f s != table re-sum $tableSum%.2f s")
      case None => Some("no 'suite wall-clock' headline found")
      case _ => None
    }
    if (missing.nonEmpty || sumDrift.nonEmpty || unaudited.nonEmpty) {
      if (missing.nonEmpty)
        System.err.println(s"[check-freeze] FAIL — registry keys with no " +
          s"frozen row in $path: ${missing.mkString(", ")}")
      sumDrift.foreach(d =>
        System.err.println(s"[check-freeze] FAIL — $d"))
      if (unaudited.nonEmpty)
        System.err.println(s"[check-freeze] FAIL — registry keys with no " +
          s"plan row in $auditPath: ${unaudited.mkString(", ")} — " +
          "regenerate via graft.tools.PlanAudit")
      System.err.println("[check-freeze] freeze by the two-clean-pair " +
        "worse-median rule and add the row + re-sum the headline.")
      sys.exit(1)
    }
    println(f"[check-freeze] OK — all ${registry.size} registry queries " +
      f"frozen (table sum $tableSum%.2f s matches the headline) and " +
      f"plan-audited")
  }
}
