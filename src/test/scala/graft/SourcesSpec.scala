package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{PipelineCompiler, PipelineSpec, OpNode, Edge}

/** Source/sink surface (SURVEY.md §2.2 sources/sinks): CSV and JSON scans
  * with explicit schemas (through the pipeline registry), CTAS table sink,
  * rate source availability. */
class SourcesSpec extends AnyFunSuite with SharedSpark {

  test("csvInput reads with explicit schema through the pipeline") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "data.csv")
    java.nio.file.Files.writeString(f.toPath, "k,v\n1,a\n2,b\n")
    val spec = PipelineSpec(
      nodes = Seq(OpNode("in", "csvInput", Map(
        "path" -> f.getAbsolutePath, "schema" -> "k INT, v STRING", "header" -> "true"))),
      edges = Nil)
    val out = PipelineCompiler.compile(spec, spark)("in.outport1")
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b")))
  }

  test("fileSink/fileInput roundtrip ORC (and partitioned parquet) through the pipeline") {
    val dir = Files.createTempDirectory("graft-orc").toFile
    val orcPath = new java.io.File(dir, "orc_out").getAbsolutePath
    import spark.implicits._
    Seq((1L, "a", "s0"), (2L, "b", "s0"), (3L, "c", "s1"))
      .toDF("k", "v", "part").createOrReplaceTempView("file_sink_src")
    val spec = PipelineSpec(
      nodes = Seq(
        OpNode("in", "viewInput", Map("table" -> "file_sink_src")),
        OpNode("out", "fileSink", Map("path" -> orcPath, "format" -> "orc"))),
      edges = Seq(Edge("in.outport1", "out.inport1")))
    PipelineCompiler.compile(spec, spark)
    val back = PipelineCompiler.compile(PipelineSpec(
      nodes = Seq(OpNode("rd", "fileInput",
        Map("path" -> orcPath, "format" -> "orc"))), edges = Nil),
      spark)("rd.outport1")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")), "ORC roundtrip must be lossless")
    // partitioned parquet layout: partitionBy materializes part=N dirs
    val pqPath = new java.io.File(dir, "pq_out").getAbsolutePath
    PipelineCompiler.compile(PipelineSpec(
      nodes = Seq(
        OpNode("in", "viewInput", Map("table" -> "file_sink_src")),
        OpNode("out", "fileSink",
          Map("path" -> pqPath, "partitionBy" -> "part"))),
      edges = Seq(Edge("in.outport1", "out.inport1"))), spark)
    assert(new java.io.File(pqPath, "part=s0").exists &&
      new java.io.File(pqPath, "part=s1").exists,
      "partitionBy must materialize the partitioned layout")
  }

  test("jsonInput reads with explicit schema through the pipeline") {
    val dir = Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "data.json")
    java.nio.file.Files.writeString(f.toPath, """{"k":1,"v":"a"}""" + "\n" + """{"k":2,"v":"b"}""" + "\n")
    val spec = PipelineSpec(
      nodes = Seq(OpNode("in", "jsonInput", Map(
        "path" -> f.getAbsolutePath, "schema" -> "k INT, v STRING"))),
      edges = Nil)
    val out = PipelineCompiler.compile(spec, spark)("in.outport1")
    assert(out.count() == 2)
  }

  test("jsonInput captures malformed lines in the corrupt column; DROPMALFORMED drops them") {
    val dir = Files.createTempDirectory("graft-badjson").toFile
    val f = new java.io.File(dir, "data.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"k":1,"v":"a"}""" + "\n" + """{"k":2,"v":"b""" + "\n" + // truncated line
        """{"k":3,"v":"c"}""" + "\n")
    val permissive = PipelineSpec(
      nodes = Seq(OpNode("in", "jsonInput", Map(
        "path" -> f.getAbsolutePath,
        "schema" -> "k INT, v STRING, _bad STRING",
        "corruptColumn" -> "_bad"))),
      edges = Nil)
    val rows = PipelineCompiler.compile(permissive, spark)("in.outport1").collect()
    assert(rows.length == 3, "no row vanishes in PERMISSIVE mode")
    val bad = rows.filter(!_.isNullAt(2))
    assert(bad.length == 1 && bad(0).getString(2).contains("""{"k":2"""),
      "the raw malformed line is queryable, not lost")
    assert(rows.filter(_.isNullAt(2)).map(_.getInt(0)).toSet == Set(1, 3))
    val dropping = PipelineSpec(
      nodes = Seq(OpNode("in", "jsonInput", Map(
        "path" -> f.getAbsolutePath, "schema" -> "k INT, v STRING",
        "mode" -> "DROPMALFORMED"))),
      edges = Nil)
    assert(PipelineCompiler.compile(dropping, spark)("in.outport1").count() == 2)
  }

  test("tableSink performs CTAS into the session catalog (ref R6)") {
    // spark.sql.warehouse.dir is static — the shared session uses the
    // default ./spark-warehouse (gitignored); drop the table afterwards.
    val spec = PipelineSpec(
      nodes = Seq(
        OpNode("in", "parquetInput", Map("dir" -> sf001, "table" -> "region")),
        OpNode("ctas", "tableSink", Map("name" -> "region_copy"))),
      edges = Seq(Edge("in.outport1", "ctas.inport1")))
    PipelineCompiler.compile(spec, spark)
    assert(spark.table("region_copy").count() == 5)
    spark.sql("DROP TABLE region_copy")
  }

  test("rate source is available for stream testing") {
    val q = spark.readStream.format("rate").option("rowsPerSecond", "5").load()
      .writeStream.format("memory").queryName("rate_out").outputMode("append").start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
      assert(spark.table("rate_out").columns.toSeq == Seq("timestamp", "value"))
    } finally q.stop()
  }

  test("schema_of_json / get_json_object / to_json round the JSON surface") {
    import spark.implicits._
    val df = Seq("""{"k": 7, "tag": "x"}""").toDF("js")
    val r = df.select(
      schema_of_json(lit("""{"k": 7, "tag": "x"}""")).as("sch"),
      get_json_object(col("js"), "$.tag").as("tag"),
      to_json(struct(lit(1).as("a"))).as("enc")).collect()(0)
    assert(r.getString(0).contains("k"))
    assert(r.getString(1) == "x")
    assert(r.getString(2) == """{"a":1}""")
  }
}
