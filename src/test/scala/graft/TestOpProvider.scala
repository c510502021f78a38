package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plans.{PipelineOperator, PipelineOperatorProvider}

/** ServiceLoader-discovered extension provider exercised by
  * PipelineCompilerSpec: proves the runtime-pluggable operator seam
  * (reference R8 — OpContainer.java:181-195 resolves operator names at
  * runtime) end-to-end. This class is wired ONLY through
  * `src/test/resources/META-INF/services/graft.plans.PipelineOperatorProvider`
  * — nothing references it by name, exactly how a user's extension jar
  * would plug in. */
final class TestOpProvider extends PipelineOperatorProvider {
  override def operators: Map[String, PipelineOperator] = Map(
    // a genuinely new operator: tag rows with a constant column
    "testTag" -> ((_: SparkSession, in: Map[String, DataFrame],
        args: Map[String, String]) =>
      Map("outport1" -> in("inport1").withColumn(
        args.getOrElse("name", "tag"),
        org.apache.spark.sql.functions.lit(args.getOrElse("value", "x"))))),
    // a COLLIDING name: if the sealed registry ever lost a collision,
    // this would silently drop every row — the spec asserts the built-in
    // `filter` semantics prevail instead
    "filter" -> ((_: SparkSession, in: Map[String, DataFrame],
        _: Map[String, String]) => Map("outport1" -> in("inport1").limit(0))))
}
