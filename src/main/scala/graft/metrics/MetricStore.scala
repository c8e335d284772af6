package graft.metrics

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-run stage-metric history: records/bytes/timings per operator per
  * run, queryable as a DataFrame — the task-metric half of the
  * reference's job-history store (gobblin-metastore/.../database/
  * DatabaseJobHistoryStore.java persists TaskExecutionInfo metric rows
  * next to JobExecutionInfo; the CLI and GaaS query them for SLA
  * monitoring).
  *
  * Same write model as [[graft.state.RunLedger]]: ONE file per run
  * created with overwrite=false (atomic, duplicate runId fails loudly,
  * concurrent writers never clobber), newline-delimited JSON with one
  * line per metric row. Volume is O(runs × stages), never O(data): the
  * values themselves come from `observe()` nodes computed inside the
  * run's own sink actions, so querying ten thousand runs' metrics is a
  * small metadata scan regardless of how many petabytes those runs moved.
  */
final class MetricStore(spark: SparkSession, dir: String) {

  private def fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sanitize(id: String): String =
    id.map(c => if (c.isLetterOrDigit || c == '-' || c == '_') c else '_')

  private def js(s: String) = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Record one run's metric rows; throws if runId was already recorded. */
  def record(job: String, runId: String, recordedAtMs: Long,
             rows: Seq[MetricRecord]): Unit = {
    fs.mkdirs(new Path(dir))
    val p = new Path(dir, s"metrics-${sanitize(runId)}.json")
    // no-metric runs still create the (empty) file — the runId uniqueness
    // check must hold — but never a blank line the JSON reader would
    // surface as an all-null row
    val lines = rows.map { r =>
      s"""{"job":${js(job)},"run_id":${js(runId)},""" +
        s""""context":${js(r.context)},"metric":${js(r.metric)},""" +
        s""""kind":${js(r.kind)},"value":${r.value},""" +
        s""""recorded_at_ms":$recordedAtMs}""" + "\n"
    }.mkString
    // overwrite=false: the create itself is the per-run uniqueness check
    val out = fs.create(p, false)
    try out.write(lines.getBytes("UTF-8")) finally out.close()
  }

  /** One metric across runs, time-ordered — feed it to a dashboard or a
    * regression check (is records.rejected trending up?). */
  def timeSeries(job: String, context: String, metric: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    table.filter(col("job") === job && col("context") === context &&
        col("metric") === metric)
      .orderBy("recorded_at_ms", "run_id")
      .select("run_id", "recorded_at_ms", "value")
  }

  /** Full metric history, fixed schema (empty store still column-addressable). */
  def table: DataFrame = {
    val p = new Path(dir)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty) {
      import spark.implicits._
      spark.read.schema(MetricStore.schema)
        .json(spark.createDataset(Seq.empty[String]))
    } else spark.read.schema(MetricStore.schema).json(dir)
  }
}

object MetricStore {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("job", StringType),
    StructField("run_id", StringType),
    StructField("context", StringType),
    StructField("metric", StringType),
    StructField("kind", StringType),
    StructField("value", LongType),
    StructField("recorded_at_ms", LongType)))
}
