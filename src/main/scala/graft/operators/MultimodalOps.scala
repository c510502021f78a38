package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Portable

/** Multimodal-column plumbing (SURVEY.md §2.2 ext): media ride through the
  * engine as opaque `binary` payload columns + typed metadata structs; the
  * per-frame decode/feature step is a batched `mapPartitions` operator
  * whose actual codec is STUBBED (no image/audio libs in this container) —
  * the Spark-side shape (schema, partitioning, batch iteration) is real.
  */
object MultimodalOps {

  /** One decoded frame row produced by the stub decoder. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_offset: Long,
      feature: Long)

  /** The mapPartitions "decoder": iterates payload batches like a real
    * codec would (one buffer reuse per partition, no per-row allocation in
    * the real thing). The decode itself is a deterministic fake — a
    * portable hash of (doc_id, frame_idx) standing in for pixel features.
    */
  def decodeFrames(payload: DataFrame, frameStride: Int = 100): Dataset[Frame] = {
    val spark = payload.sparkSession
    import spark.implicits._
    payload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (docId, bytes) =>
          val nFrames = bytes.length / frameStride + 1
          (0 until nFrames).iterator.map { f =>
            // STUB: a real decoder would slice bytes(f*stride ...) through
            // a codec; we fingerprint the coordinates instead.
            md.reset()
            val d = md.digest(s"frame|$docId|$f".getBytes("UTF-8"))
            val feature = java.lang.Long.parseLong(
              d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
            Frame(docId, f, f.toLong * frameStride, feature)
          }
        }
      }
  }

  // ---------------------------------------------------------------- q26
  /** Binary-payload metadata + frame sampling, fully expression-based so
    * the oracle can state it: payload = utf-8 bytes of the text (the test
    * stand-in for a media blob), fake decode metadata from portable
    * hashes, one row per sampled frame. */
  val q26 = QueryDef("q26_multimodal_meta",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      d.withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("n_bytes", length(col("payload")))
        .withColumn("width", (Portable.phash(concat(lit("w|"), col("doc_id").cast("string"))) % 640).cast("int"))
        .withColumn("height", (Portable.phash(concat(lit("h|"), col("doc_id").cast("string"))) % 480).cast("int"))
        .withColumn("n_frames", (col("n_bytes") / 100).cast("int") + 1)
        .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
        .withColumn("frame_offset", (col("frame_idx") * 100).cast("long"))
        .withColumn("feature",
          Portable.phash(concat_ws("|", lit("frame"),
            col("doc_id").cast("string"), col("frame_idx").cast("string"))))
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("n_frames"), col("frame_idx"), col("frame_offset"), col("feature"))
        .orderBy("doc_id", "frame_idx")
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id,
          CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
          CAST(${Duck.ph("'w|' || CAST(doc_id AS VARCHAR)")} % 640 AS INTEGER) AS width,
          CAST(${Duck.ph("'h|' || CAST(doc_id AS VARCHAR)")} % 480 AS INTEGER) AS height,
          CAST(octet_length(encode(text)) // 100 AS INTEGER) + 1 AS n_frames
        FROM documents)
      SELECT doc_id, n_bytes, width, height, n_frames,
        CAST(f AS INTEGER) AS frame_idx,
        CAST(f * 100 AS BIGINT) AS frame_offset,
        ${Duck.ph("'frame|' || CAST(doc_id AS VARCHAR) || '|' || CAST(f AS VARCHAR)")} AS feature
      FROM d, LATERAL (SELECT unnest(range(0, n_frames)) AS f) frames
      ORDER BY doc_id, frame_idx"""))

  val all: Seq[QueryDef] = Seq(q26)
}
