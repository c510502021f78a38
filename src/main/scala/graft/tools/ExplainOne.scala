package graft.tools

import org.apache.spark.sql.SparkSession

/** One-query plan microscope: run a single registry query, print its
  * FINAL (AQE-resolved) physical plan and wall-clock — the targeted
  * companion to [[PlanAudit]]'s whole-registry sweep, for adjudicating
  * a single query's plan shape without a 140-query run.
  *
  * Usage: sbt "runMain graft.tools.ExplainOne <query> [sfDir] [cpus]"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ExplainOne <query> [sfDir] [cpus]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = args.lift(2).getOrElse("8")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .appName("graft-explain-one"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.registry.find(_.name == name).getOrElse(
      sys.error(s"no registry query named $name"))
    val df = q.run(spark, dir)
    val t0 = System.nanoTime()
    val n = df.collect().length
    val sec = (System.nanoTime() - t0) / 1e9
    println(df.queryExecution.executedPlan.toString)
    println(f"[explain-one] $name: $n rows in $sec%.2f s over $dir")
    spark.stop()
  }
}
