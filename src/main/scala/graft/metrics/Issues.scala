package graft.metrics

import java.security.MessageDigest

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Automatic troubleshooter — the reference's issue subsystem
  * (gobblin-runtime/.../troubleshooter/Issue.java:30,
  * InMemoryIssueRepository.java:45, DefaultIssueRefinery.java:33,
  * gobblin-troubleshooter/.../AutoTroubleshooterLogAppender.java:56):
  * failures and suspicious events become structured Issues whose CODE is
  * a hash of the failure's stack SHAPE (class names + frames, messages
  * excluded), so the same root cause collapses to one issue across
  * retries, tasks, and runs even when messages embed run-specific ids or
  * paths. A bounded repository dedups by code; a refinery orders what the
  * user sees (severity first, noise demoted); issues ship as tracking
  * events through the same store as lineage and metrics.
  *
  * Spark-first capture surface: where the reference attaches a log4j
  * appender, this engine attaches a [[IssueListener]] SparkListener —
  * executor task failures (including retried-then-succeeded attempts,
  * the transient noise a flaky cluster generates at 1000 executors)
  * are converted to issues as they happen, driver-side, O(failures). */
final case class Issue(timeMs: Long,
                       severity: String, // DEBUG<INFO<WARN<ERROR<FATAL
                       code: String,
                       summary: String,
                       details: String = "",
                       sourceClass: String = "",
                       exceptionClass: String = "",
                       properties: Map[String, String] = Map.empty)

object Issues {

  val severityOrder: Map[String, Int] =
    Seq("DEBUG", "INFO", "WARN", "ERROR", "FATAL").zipWithIndex.toMap

  /** "T" + 6 hex of sha256 over the cause chain's class names + frames —
    * AutoTroubleshooterLogAppender.getStackTraceWithoutExceptionMessage:
    * messages are EXCLUDED on purpose, they carry per-run noise. */
  def codeOf(t: Throwable): String = {
    val sb = new StringBuilder
    var cur = t
    val seen = scala.collection.mutable.Set[Throwable]()
    while (cur != null && seen.add(cur)) {
      sb.append(cur.getClass.getName).append('\n')
      cur.getStackTrace.foreach(f => sb.append(f.toString).append('\n'))
      sb.append("---\n")
      cur = cur.getCause
    }
    hash(sb.toString)
  }

  /** Code for a failure reported as strings (Spark's ExceptionFailure
    * carries className + frames, not a live Throwable). */
  def codeOf(exceptionClass: String, frames: Seq[String]): String =
    hash((exceptionClass +: frames).mkString("", "\n", "\n---\n"))

  private def hash(text: String): String =
    "T" + MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8"))
      .take(3).map(b => f"$b%02X").mkString

  /** Issue from a live exception: summary = root-cause first line + the
    * context message, details = the full chain. */
  def fromThrowable(t: Throwable, sourceClass: String, timeMs: Long,
                    severity: String = "ERROR",
                    context: String = ""): Issue = {
    var root = t
    val seen = scala.collection.mutable.Set[Throwable](root)
    while (root.getCause != null && seen.add(root.getCause))
      root = root.getCause
    val rootMsg = Option(root.getMessage).getOrElse(root.getClass.getSimpleName)
      .linesIterator.nextOption().getOrElse("")
    val summary =
      if (context.isEmpty) rootMsg else s"$rootMsg | $context"
    val sw = new java.io.StringWriter()
    t.printStackTrace(new java.io.PrintWriter(sw))
    Issue(timeMs, severity, codeOf(t), summary, sw.toString,
      sourceClass, root.getClass.getName)
  }

  /** The default refinery (DefaultIssueRefinery.java:33): severity
    * descending then time ascending; issues from metric/reporting
    * plumbing demoted to the bottom — they rarely change a job outcome. */
  def refine(issues: Seq[Issue]): Seq[Issue] = {
    val sorted = issues.sortBy(i =>
      (-severityOrder.getOrElse(i.severity, 0), i.timeMs))
    val (noise, signal) =
      sorted.partition(_.sourceClass.startsWith("graft.metrics"))
    signal ++ noise
  }

  val Namespace = "graft.event.issue"

  def toEvent(i: Issue): TrackingEvent =
    TrackingEvent(Namespace, i.code, i.timeMs, Map(
      "severity" -> i.severity,
      "summary" -> i.summary,
      "details" -> i.details,
      "sourceClass" -> i.sourceClass,
      "exceptionClass" -> i.exceptionClass) ++ i.properties)

  /** Issue rows from a persisted event table ([[EventStore.table]]
    * shape). */
  def table(events: DataFrame): DataFrame =
    events.filter(col("namespace") === Namespace)
      .select(col("name").as("code"),
        col("metadata")("severity").as("severity"),
        col("metadata")("summary").as("summary"),
        col("metadata")("sourceClass").as("source_class"),
        col("metadata")("exceptionClass").as("exception_class"),
        col("timestamp_ms"))
}

/** Bounded, insertion-ordered, code-deduped issue store
  * (InMemoryIssueRepository.java:45): the FIRST issue with a given code
  * wins; at capacity new codes are dropped (one warning), existing codes
  * still dedup silently — a failure storm can't OOM the driver. */
final class IssueRepository(maxSize: Int = 100) {
  private val issues = new java.util.LinkedHashMap[String, Issue]()
  private var reportedOverflow = false

  def put(issue: Issue): Unit = synchronized {
    if (issues.containsKey(issue.code)) ()
    else if (issues.size >= maxSize) {
      if (!reportedOverflow) {
        reportedOverflow = true
        System.err.println(s"[graft] issue repository full at $maxSize; " +
          "new issue codes will be ignored")
      }
    } else { issues.put(issue.code, issue); () }
  }

  def putAll(is: Seq[Issue]): Unit = is.foreach(put)

  def getAll: Seq[Issue] = synchronized {
    import scala.jdk.CollectionConverters._
    issues.values.asScala.toSeq
  }

  /** Most recent first — InMemoryIssueRepository.getMostRecentErrors. */
  def mostRecentErrors(limit: Int): Seq[Issue] = synchronized {
    import scala.jdk.CollectionConverters._
    issues.values.asScala.toSeq
      .filter(i => Issues.severityOrder.getOrElse(i.severity, 0) >=
        Issues.severityOrder("ERROR"))
      .sortBy(-_.timeMs).take(limit)
  }

  def refined: Seq[Issue] = Issues.refine(getAll)

  def remove(code: String): Unit = synchronized { issues.remove(code); () }

  def clear(): Unit = synchronized { issues.clear() }
}

/** Spark-native automatic capture: executor task failures (transient or
  * fatal) become issues keyed by stack shape. Attach with
  * `spark.sparkContext.addSparkListener(new IssueListener(repo))`;
  * remove with `removeSparkListener` when the job scope ends. Retried
  * attempts that eventually succeed still record their failure — that is
  * the point: the repository shows the flakiness a green job hid. */
final class IssueListener(repo: IssueRepository) extends SparkListener {
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    taskEnd.reason match {
      case ef: org.apache.spark.ExceptionFailure =>
        repo.put(Issue(
          timeMs = System.currentTimeMillis(),
          // a single task failure is retryable noise until the JOB fails;
          // the job-level failure path records the ERROR
          severity = "WARN",
          code = Issues.codeOf(ef.className, ef.stackTrace.map(_.toString).toSeq),
          summary = ef.description.linesIterator.nextOption().getOrElse(""),
          details = ef.fullStackTrace,
          sourceClass = s"task ${taskEnd.taskInfo.taskId} stage ${taskEnd.stageId}",
          exceptionClass = ef.className))
      case _ => ()
    }
}
