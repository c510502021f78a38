package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** R9 parity: the reference writes a startup log document to HDFS recording
  * per-operator success/failure (writeStartupLog, OpContainer.java:71-90,
  * START_LOG accumulation :138-145). The Structured-Streaming-native
  * equivalent is a StreamingQueryListener: query lifecycle events append
  * one line each to an in-memory buffer and (optionally) a local log file.
  */
final class JobLogListener(logPath: Option[String] = None,
    maxLines: Int = 10000) extends StreamingQueryListener {
  require(maxLines > 0, "maxLines must be positive")

  // Ring-capped: a long-running streaming job emits one progress line per
  // micro-batch forever; an unbounded buffer is a slow driver leak. The
  // file append (when configured) still records every line — only the
  // in-memory tail is bounded, and `dropped` says how many rolled off.
  private val buf = mutable.ArrayDeque.empty[String]
  private var nDropped = 0L

  private[graft] def log(line: String): Unit = synchronized {
    buf += line
    if (buf.size > maxLines) { buf.removeHead(); nDropped += 1 }
    logPath.foreach { p =>
      Files.writeString(Paths.get(p), line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  def lines: Seq[String] = synchronized(buf.toSeq)
  def dropped: Long = synchronized(nDropped)

  /** One-shot dump of the accumulated log to any Hadoop-visible path
    * (`hdfs://`, `file://`, `s3a://`) — the exact shape of the reference's
    * writeStartupLog (OpContainer.java:71-90), which writes the whole
    * startup document to HDFS once, rather than streaming appends. */
  def flush(path: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = synchronized {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write((buf.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    log(s"started ${e.name} ${e.id}")
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    log(s"progress ${e.progress.name} batch=${e.progress.batchId} rows=${e.progress.numInputRows}")
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    log(s"terminated ${e.id} ${e.exception.map(x => s"FAILED: $x").getOrElse("ok")}")
}
