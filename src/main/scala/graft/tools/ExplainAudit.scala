package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dumps the formatted physical plan of every registry query at the given
  * SF dir — the plan-quality audit loop: check PushedFilters reach scans,
  * dims broadcast, WholeStageCodegen spans are wide, no stray
  * CartesianProduct/BNLJ. Usage: sbt "runMain graft.tools.ExplainAudit [sfDir] [name...]" */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = GraftSession.local(8, "graft-explain")
    SparkEntry.registry.filter(q => only.isEmpty || only(q.name)).foreach { q =>
      println(s"\n======== ${q.name} ========")
      try println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
