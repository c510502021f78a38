package graft

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** Opt-in REAL-broker smoke for the Kafka source/sink surface (ref R1/R3,
  * `KafkaInput.java:9-23` / `KafkaOutput.java:9-22`): the registry's
  * `kafkaInput`/`kafkaOutput` wiring plus `parseKafkaJson`/`toKafkaJson`
  * roundtripped through an actual topic.
  *
  * Gated twice, because BOTH prerequisites are environmental:
  *  - `GRAFT_KAFKA_BROKERS` (e.g. `localhost:9092`) names a reachable
  *    broker — unset in the offline build container;
  *  - the `spark-sql-kafka-0-10` connector jar must be on the classpath —
  *    absent here (zero-egress build, documented in README "Kafka
  *    connectivity").
  * When either is missing the tests CANCEL (not fail) with the reason —
  * so `sbt test` stays green in the container and the two env-partial
  * rows of SURVEY §2.2 close automatically wherever a real cluster runs
  * this suite. */
class KafkaSmokeSpec extends AnyFunSuite with SharedSpark {

  private val brokers = sys.env.get("GRAFT_KAFKA_BROKERS")

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: Throwable => false }

  test("kafka roundtrip: toKafkaJson -> topic -> parseKafkaJson (env-gated)") {
    assume(brokers.isDefined, "GRAFT_KAFKA_BROKERS unset — no broker in this env")
    assume(connectorPresent, "spark-sql-kafka connector jar not on classpath")
    import spark.implicits._
    val b = brokers.get
    // unique per run so replays never see stale offsets
    val topic = s"graft-smoke-${java.util.UUID.randomUUID()}"
    StreamingOps.toKafkaJson(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", b)
      .option("topic", topic)
      .save()
    val back = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", b)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    val parsed = StreamingOps.parseKafkaJson(back,
      StructType.fromDDL("id BIGINT, v STRING"))
    assert(parsed.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")),
      "values must roundtrip bit-exact through the broker")
  }

  test("kafkaInput registry op compiles to a streaming kafka scan (env-gated)") {
    assume(brokers.isDefined, "GRAFT_KAFKA_BROKERS unset — no broker in this env")
    assume(connectorPresent, "spark-sql-kafka connector jar not on classpath")
    // the registry op itself: builds the readStream; existence of the
    // streaming DataFrame proves the spec-side wiring binds to the real
    // connector (full end-to-end streaming is the roundtrip test above)
    val out = graft.plans.PipelineCompiler.registry("kafkaInput")(
      spark, Map.empty, Map("brokers" -> brokers.get, "topic" -> "graft-smoke-compile"))
    assert(out("outport1").isStreaming, "kafkaInput must yield a streaming frame")
  }
}
