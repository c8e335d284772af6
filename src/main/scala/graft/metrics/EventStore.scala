package graft.metrics

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted tracking events — the reference's GobblinTrackingEvent
  * pipeline (events submitted through the MetricContext tree reach
  * event reporters that persist them; gobblin-metrics-base/.../
  * GobblinTrackingEvent.avsc schema: namespace, name, timestamp,
  * metadata map; file/Kafka event reporters ship them for audit and
  * lineage queries).
  *
  * Buffer-and-flush: [[listener]] enqueues every event that bubbles to
  * its context (lock-free, submit-side cost O(1)); [[flush]] drains the
  * buffer into ONE atomically-created newline-JSON file. Flush ids
  * follow the run-ledger convention, so a retried driver can't
  * double-record a flush. Queryable as a fixed-schema DataFrame;
  * volume is O(events), never O(data).
  */
final class EventStore(spark: SparkSession, dir: String) {

  private val buffer = new ConcurrentLinkedQueue[TrackingEvent]()

  private def fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sanitize(id: String): String =
    id.map(c => if (c.isLetterOrDigit || c == '-' || c == '_') c else '_')

  private def js(s: String) = EventStore.js(s)

  /** Attach to a context (usually the root): every event submitted at
    * or below it lands in the buffer. */
  def listener: TrackingEvent => Unit = e => { buffer.add(e); () }

  /** Pending (un-flushed) event count. */
  def pending: Int = buffer.size()

  /** Drain the buffer into one atomic file; duplicate flushIds refused.
    * Returns the number of events flushed (0 writes nothing). Events are
    * only removed from the buffer AFTER the file is fully written — a
    * failed or refused flush loses nothing and a retry (with a fresh
    * flushId) re-flushes the same events. Single concurrent flusher
    * assumed (concurrent SUBMITS are always safe; two racing flush()
    * calls could write the same head events twice). */
  def flush(flushId: String): Int = {
    // snapshot the head segment without removing (FIFO: concurrent
    // submits append behind it)
    val snapshot = {
      import scala.jdk.CollectionConverters._
      buffer.iterator().asScala.toSeq
    }
    if (snapshot.isEmpty) return 0
    fs.mkdirs(new Path(dir))
    val p = new Path(dir, s"events-${sanitize(flushId)}.json")
    val lines = snapshot.map { e =>
      val md = e.metadata.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${js(k)}:${js(v)}" }.mkString("{", ",", "}")
      s"""{"namespace":${js(e.namespace)},"name":${js(e.name)},""" +
        s""""timestamp_ms":${e.timestampMs},"metadata":$md}""" + "\n"
    }.mkString
    val out = fs.create(p, false) // claims the flushId atomically
    try out.write(lines.getBytes("UTF-8"))
    catch { case t: Throwable =>
      try { out.close(); fs.delete(p, true) }
      catch { case _: java.io.IOException => }
      throw t // buffer untouched: nothing was removed yet
    }
    out.close()
    snapshot.foreach(_ => buffer.poll()) // remove exactly what we wrote
    snapshot.size
  }

  /** Full event history, fixed schema. */
  def table: DataFrame = {
    val p = new Path(dir)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty) {
      import spark.implicits._
      spark.read.schema(EventStore.schema)
        .json(spark.createDataset(Seq.empty[String]))
    } else spark.read.schema(EventStore.schema).json(dir)
  }
}

object EventStore {
  import org.apache.spark.sql.types._

  /** The ONE JSON-string escaper for every graft.metrics artifact
    * (event files, descriptor JSON) — an escaping fix applied here
    * cannot diverge the descriptor JSON from the event-file JSON. */
  private[metrics] def js(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  val schema: StructType = StructType(Seq(
    StructField("namespace", StringType),
    StructField("name", StringType),
    StructField("timestamp_ms", LongType),
    StructField("metadata", MapType(StringType, StringType))))
}
