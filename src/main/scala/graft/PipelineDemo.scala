package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.{PipelineCompiler, PipelineSpec}
import graft.streaming.{JobLogListener, StreamingOps}

/** Runnable demo of the declarative pipeline surface (ref R7–R9 parity):
  * 1. an XML-specified batch DAG (parquet → addField → filter → view sink),
  * 2. the reference streaming pipeline shape (KafkaInput → AddField →
  *    KafkaOutput, R1→R2→R3) on a file-stream test double with the job-log
  *    listener attached.
  *
  * Usage: sbt "runMain graft.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(4, "graft-pipeline-demo")

    // -- 1. batch XML pipeline ------------------------------------------
    val xml = s"""
      <pipeline>
        <operator name="in" class="parquetInput">
          <arg key="dir" value="$sfDir"/><arg key="table" value="lineitem"/>
        </operator>
        <operator name="rev" class="addField">
          <arg key="name" value="revenue"/>
          <arg key="expr" value="l_extendedprice * (1 - l_discount)"/>
        </operator>
        <operator name="big" class="filter">
          <arg key="predicate" value="l_quantity &gt;= 48"/>
        </operator>
        <operator name="out" class="viewSink"><arg key="name" value="big_items"/></operator>
        <connect from="in.outport1" to="rev.inport1"/>
        <connect from="rev.outport1" to="big.inport1"/>
        <connect from="big.outport1" to="out.inport1"/>
      </pipeline>"""
    PipelineCompiler.compile(PipelineSpec.parseXml(xml), spark)
    val n = spark.table("big_items").count()
    println(s"[demo] batch pipeline: big_items rows = $n")
    spark.table("big_items").select("l_orderkey", "l_quantity", "revenue").show(5)

    // -- 2. streaming pipeline shape (R1 -> R2 -> R3) -------------------
    val tmp = java.nio.file.Files.createTempDirectory("graft-demo").toFile
    val srcDir = new java.io.File(tmp, "src"); srcDir.mkdirs()
    import spark.implicits._
    Seq("""{"user":1,"amount":5.0}""", """{"user":2,"amount":50.0}""")
      .toDF("value").write.mode("overwrite").parquet(srcDir.getAbsolutePath)
    val listener = new JobLogListener()
    spark.streams.addListener(listener)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .parquet(srcDir.getAbsolutePath)
    val shaped = StreamingOps.toKafkaJson(
      StreamingOps.addField(
        StreamingOps.parseKafkaJson(stream, StructType(Seq(
          StructField("user", LongType), StructField("amount", DoubleType)))),
        "flag", expr("amount > 10")).filter(col("flag")))
    val q = shaped.writeStream.format("memory").queryName("demo_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    println(s"[demo] streaming pipeline emitted ${spark.table("demo_out").count()} row(s):")
    spark.table("demo_out").show(false)
    println(s"[demo] job log:\n${listener.lines.map("  " + _).mkString("\n")}")
    spark.stop()
  }
}
