package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.{Fork, Quality}
import graft.sinks.AtomicPublisher
import graft.state.StateStore

/** Executes a [[PipelineSpec]] — the engine's AbstractJobLauncher.launchJob
  * (gobblin-runtime/.../AbstractJobLauncher.java:433):
  *
  *  1. plan: read previous high watermark from the state store, build the
  *     source DataFrame with the incremental predicate pushed into the scan
  *     (Source.getWorkunits);
  *  2. execute: transforms (Converter chain) + row-policy split
  *     (RowLevelPolicyChecker) + fork branch writes (Fork/DataWriter) —
  *     all one Catalyst plan per branch, no record-at-a-time loop;
  *  3. commit: task policies (TaskLevelPolicy: row counts), atomic publish
  *     (BaseDataPublisher), state-store watermark upsert
  *     (FsDatasetStateStore).
  *
  * Commit policy is COMMIT_ON_FULL_SUCCESS (JobCommitPolicy.java:35): any
  * branch failure aborts the publish of the whole job (writes are staged,
  * so nothing becomes visible).
  */
object PipelineRunner {

  final case class JobResult(runId: String,
                             extracted: Long,
                             rejected: Long,
                             branchCounts: Map[String, Long],
                             committedWatermark: Option[String])

  def run(spark: SparkSession, spec: PipelineSpec, runId: String): JobResult = {
    val store = spec.stateDir.map(new StateStore(spark, _))

    // ---- 1. plan: source + incremental watermark predicate ----
    val raw = read(spark, spec.source)
    val prevWm: Option[String] = (store, spec.source.watermarkColumn) match {
      case (Some(s), Some(_)) =>
        s.highWatermark(spec.name).orElse(spec.source.watermarkDefault)
      case _ => None
    }
    val sourced = (spec.source.watermarkColumn, prevWm) match {
      case (Some(wmCol), Some(wm)) => raw.filter(col(wmCol) > lit(parseTs(wm)))
      case _ => raw
    }

    // ---- 2. transforms + row policies ----
    val transformed = spec.transformExprs.foldLeft(sourced) { (df, t) =>
      t.split(':') match {
        case Array("selectExpr", exprs) => df.selectExpr(exprs.split(';').map(_.trim): _*)
        case Array("filter", e)         => df.filter(e)
        case other => throw new IllegalArgumentException(s"bad transform: ${other.mkString(":")}")
      }
    }

    val checked = Quality.checkRows(transformed, spec.rowPolicies.map(_.toPolicy))
    val needBoth = spec.rowPolicies.nonEmpty
    val input = if (needBoth) checked.passed.persist(StorageLevel.MEMORY_AND_DISK)
                else checked.passed

    val rejectedCount =
      if (needBoth) {
        checked.enforceFail()
        spec.errDir match {
          case Some(err) =>
            AtomicPublisher.publish(checked.rejected, s"$err/${spec.name}", runId)
            spark.read.parquet(s"$err/${spec.name}").count()
          case None => checked.rejected.count()
        }
      } else 0L

    // observe extracted count on the shared input without an extra scan
    val extracted = input.count()

    // ---- branches ----
    val branchCounts = Fork.run(input,
      spec.branches.map(b => Fork.Branch(b.name, b.predicate, b.transform,
        b.outDir, b.writeSpec)), runId)

    // ---- 3. task policies + state commit ----
    spec.rowCountRange.foreach { range =>
      spec.branches.foreach { b =>
        val written = branchCounts(b.name)
        val expected =
          if (b.filterExpr.isEmpty) extracted
          else input.filter(b.predicate.get).count()
        require(Quality.rowCountRange(expected, written, range),
          s"row-count policy failed for branch ${b.name}: expected≈$expected written=$written")
      }
    }

    val newWm: Option[String] = spec.source.watermarkColumn.flatMap { wmCol =>
      // empty extract preserves the previous watermark (QueryBasedSource.java:195-199)
      if (extracted == 0) prevWm
      else Option(transformed.agg(max(col(wmCol))).head.get(0)).map(fmtWm)
    }
    (store, newWm) match {
      case (Some(s), Some(wm)) => s.commit(Map((spec.name, "") -> wm), runId)
      case _ =>
    }
    if (needBoth) { input.unpersist(); () }

    JobResult(runId, extracted, rejectedCount, branchCounts, newWm)
  }

  /** Canonical "yyyy-MM-dd HH:mm:ss[.f...]" watermark string from whatever
    * the collected max() returns (Timestamp, or Instant when
    * spark.sql.datetime.java8API is on). */
  private def fmtWm(v: Any): String = v match {
    case t: Timestamp => t.toString
    case i: java.time.Instant => Timestamp.from(i).toString
    case l: java.time.LocalDateTime => Timestamp.valueOf(l).toString
    case other => other.toString
  }

  private def parseTs(wm: String): Timestamp =
    try Timestamp.valueOf(wm)
    catch { case _: IllegalArgumentException =>
      try Timestamp.from(java.time.Instant.parse(wm))
      catch { case _: java.time.format.DateTimeParseException =>
        Timestamp.valueOf(java.time.LocalDateTime.parse(wm)) } }

  private def read(spark: SparkSession, s: SourceSpec): DataFrame = {
    var r = spark.read.format(s.format).options(s.options)
    s.schemaDDL.foreach(ddl => r = r.schema(ddl))
    s.format match {
      // jdbc carries its target in options (url/dbtable), not a path;
      // watermark + transform filters push into the generated SQL
      case "jdbc" => r.load()
      case _      => r.load(s.path)
    }
  }
}
