package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.{PipelineCompiler, PipelineSpec}
import graft.streaming.{JobLogListener, StreamingOps}

/** Runnable demo of the declarative pipeline surface (ref R7–R9 parity):
  * 1. an XML-specified batch DAG (parquet → addField → filter → view sink),
  * 2. the reference streaming pipeline shape (KafkaInput → AddField →
  *    KafkaOutput, R1→R2→R3) on a file-stream test double with the job-log
  *    listener attached,
  * 3. an XML training-data curation chain (validate → dedup → quality
  *    filter → mixture plan/apply → quantile filter) over `documents`,
  * 4. the declarative ANN index lifecycle (kmeansFit + pqFit →
  *    ivfPqEncode → ivfPqSearch → annRerank) over `embeddings`,
  * 5. the passage-granular prep chain (spanIndex → maskSpansAgainst →
  *    chunkDocuments): repeated passages masked corpus-wide, survivors
  *    windowed into training chunks.
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

    // -- 3. curation chain in XML (the LLM-data-pipeline surface) -------
    val curation = s"""
      <pipeline>
        <operator name="docs" class="parquetInput">
          <arg key="dir" value="$sfDir"/><arg key="table" value="documents"/>
        </operator>
        <operator name="tok" class="addField">
          <arg key="name" value="n_tokens"/>
          <arg key="expr" value="size(split(trim(lower(text)), '[^a-z0-9]+'))"/>
        </operator>
        <operator name="val" class="validate">
          <arg key="checks" value="nonempty:length(trim(text)) &gt; 0;id_positive:doc_id &gt;= 0"/>
        </operator>
        <operator name="ok" class="filter"><arg key="predicate" value="is_valid"/></operator>
        <operator name="pairs" class="minhashPairs">
          <arg key="id" value="doc_id"/><arg key="text" value="text"/>
        </operator>
        <operator name="dd" class="dedupApply">
          <arg key="id" value="doc_id"/>
          <arg key="idA" value="id_a"/><arg key="idB" value="id_b"/>
        </operator>
        <operator name="plan" class="mixturePlan">
          <arg key="source" value="source"/><arg key="tokens" value="n_tokens"/>
          <arg key="shares" value="src0:300000;src1:200000"/>
          <arg key="defaultSharePpm" value="50000"/>
          <arg key="budgetTokens" value="20000"/>
        </operator>
        <operator name="mix" class="mixtureApply">
          <arg key="source" value="source"/><arg key="key" value="doc_id"/>
        </operator>
        <operator name="qf" class="quantileFilter">
          <arg key="strata" value="source"/><arg key="score" value="n_tokens"/>
          <arg key="quantile" value="0.5"/>
        </operator>
        <operator name="outc" class="viewSink"><arg key="name" value="curated"/></operator>
        <connect from="docs.outport1" to="tok.inport1"/>
        <connect from="tok.outport1" to="val.inport1"/>
        <connect from="val.outport1" to="ok.inport1"/>
        <connect from="ok.outport1" to="pairs.inport1"/>
        <connect from="ok.outport1" to="dd.inport1"/>
        <connect from="pairs.outport1" to="dd.inport2"/>
        <connect from="dd.outport1" to="plan.inport1"/>
        <connect from="dd.outport1" to="mix.inport1"/>
        <connect from="plan.outport1" to="mix.inport2"/>
        <connect from="mix.outport1" to="qf.inport1"/>
        <connect from="qf.outport1" to="outc.inport1"/>
      </pipeline>"""
    PipelineCompiler.compile(PipelineSpec.parseXml(curation), spark)
    val curated = spark.table("curated")
    println(s"[demo] curation pipeline: ${curated.count()} docs survived " +
      "validate -> dedup -> mixture -> quantile filter")
    curated.select("doc_id", "source", "n_tokens", "q_threshold").show(5)

    // -- 4. ANN index lifecycle in XML (train -> encode -> search -> rerank)
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("demo_emb")
    spark.table("demo_emb").filter(col("vec_id") < 5)
      .createOrReplaceTempView("demo_probes")
    val ann = s"""
      <pipeline>
        <operator name="src" class="viewInput"><arg key="table" value="demo_emb"/></operator>
        <operator name="probes" class="viewInput"><arg key="table" value="demo_probes"/></operator>
        <operator name="coarse" class="kmeansFit">
          <arg key="id" value="vec_id"/><arg key="vec" value="embedding"/>
          <arg key="k" value="4"/><arg key="iters" value="1"/>
        </operator>
        <operator name="pq" class="pqFit">
          <arg key="id" value="vec_id"/><arg key="vec" value="embedding"/>
          <arg key="dim" value="64"/><arg key="m" value="4"/>
          <arg key="ksub" value="4"/><arg key="iters" value="1"/>
        </operator>
        <operator name="enc" class="ivfPqEncode">
          <arg key="id" value="vec_id"/><arg key="vec" value="embedding"/>
          <arg key="dim" value="64"/>
        </operator>
        <operator name="search" class="ivfPqSearch">
          <arg key="id" value="id"/><arg key="cell" value="cell"/>
          <arg key="codes" value="codes"/>
          <arg key="probeId" value="vec_id"/><arg key="probeVec" value="embedding"/>
          <arg key="k" value="6"/><arg key="nprobe" value="2"/>
        </operator>
        <operator name="rr" class="annRerank">
          <arg key="slProbeId" value="probe_id"/><arg key="slCandId" value="id"/>
          <arg key="probeId" value="vec_id"/><arg key="probeVec" value="embedding"/>
          <arg key="vecId" value="vec_id"/><arg key="vec" value="embedding"/>
          <arg key="k" value="3"/>
        </operator>
        <operator name="outa" class="viewSink"><arg key="name" value="ann_hits"/></operator>
        <connect from="src.outport1" to="coarse.inport1"/>
        <connect from="src.outport1" to="pq.inport1"/>
        <connect from="src.outport1" to="enc.inport1"/>
        <connect from="coarse.outport1" to="enc.inport2"/>
        <connect from="pq.outport1" to="enc.inport3"/>
        <connect from="enc.outport1" to="search.inport1"/>
        <connect from="probes.outport1" to="search.inport2"/>
        <connect from="coarse.outport1" to="search.inport3"/>
        <connect from="pq.outport1" to="search.inport4"/>
        <connect from="search.outport1" to="rr.inport1"/>
        <connect from="probes.outport1" to="rr.inport2"/>
        <connect from="src.outport1" to="rr.inport3"/>
        <connect from="rr.outport1" to="outa.inport1"/>
      </pipeline>"""
    PipelineCompiler.compile(PipelineSpec.parseXml(ann), spark)
    println(s"[demo] ANN pipeline: top-3 exact-reranked neighbors per probe")
    spark.table("ann_hits").orderBy("probe_id", "rank").show(9)

    // -- 5. span-dedup -> chunking prep chain (the passage-granular ops) --
    val spans = s"""
      <pipeline>
        <operator name="docs" class="parquetInput">
          <arg key="dir" value="$sfDir"/><arg key="table" value="documents"/>
        </operator>
        <operator name="si" class="spanIndex">
          <arg key="id" value="doc_id"/><arg key="text" value="text"/>
          <arg key="width" value="5"/><arg key="minDf" value="2"/>
        </operator>
        <operator name="ms" class="maskSpansAgainst">
          <arg key="id" value="doc_id"/><arg key="text" value="text"/>
          <arg key="width" value="5"/>
        </operator>
        <operator name="ch" class="chunkDocuments">
          <arg key="id" value="doc_id"/><arg key="text" value="masked_text"/>
          <arg key="maxTokens" value="20"/><arg key="stride" value="15"/>
        </operator>
        <operator name="outs" class="viewSink"><arg key="name" value="prep_chunks"/></operator>
        <connect from="docs.outport1" to="si.inport1"/>
        <connect from="docs.outport1" to="ms.inport1"/>
        <connect from="si.outport1" to="ms.inport2"/>
        <connect from="ms.outport1" to="ch.inport1"/>
        <connect from="ch.outport1" to="outs.inport1"/>
      </pipeline>"""
    PipelineCompiler.compile(PipelineSpec.parseXml(spans), spark)
    println("[demo] span-dedup -> chunk prep: repeated passages masked " +
      s"corpus-wide, then windowed into ${spark.table("prep_chunks").count()} chunks")
    spark.table("prep_chunks").orderBy("doc_id", "chunk_id").show(5, 60)
    spark.stop()
  }
}
