package graft.planning

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Backfill planning for a date-partitioned table: which date
  * partitions are MISSING between the observed (or requested) bounds?
  * The silent failure mode of incremental ingestion is a day that never
  * landed — every later run happily appends newer days and nothing
  * ever notices the hole. The planner diffs the expected daily range
  * against the partitions actually on disk and emits one work-unit row
  * per hole, ready to drive a re-extraction
  * ([[WatermarkPartitioner]]-style unit per missing day).
  *
  * Reference: the reference walks date-partitioned dataset trees with
  * lookback windows (DateTimeDatasetVersionFinder / our
  * [[graft.sources.DatePartitionedSource]]) and verifies completeness
  * by audit counts; the gap-DIFF that turns "what exists" into "what
  * to re-run" is this planner.
  *
  * Scale shape: one driver FS listing (O(partitions) metadata — the
  * same listing every dataset-finder pass already does), then pure
  * date arithmetic. No data is read at all.
  */
object BackfillPlanner {

  /** The missing partition dates of `dir` between the min and max
    * PRESENT partitions (or the explicit `from`/`to` bounds when the
    * edge of the range itself might be missing). One row per hole,
    * column `partitionCol`, ascending. */
  def missingDates(spark: SparkSession, dir: String, partitionCol: String,
                   pattern: String = "yyyy-MM-dd",
                   from: Option[String] = None,
                   to: Option[String] = None): DataFrame = {
    val fmt = DateTimeFormatter.ofPattern(pattern)
    val present = listPartitionDates(spark, dir, partitionCol, fmt)
    require(present.nonEmpty || (from.nonEmpty && to.nonEmpty),
      s"$dir has no parseable $partitionCol= partitions and no explicit bounds")
    val lo = from.map(LocalDate.parse(_, fmt)).getOrElse(present.min)
    val hi = to.map(LocalDate.parse(_, fmt)).getOrElse(present.max)
    val holes = Iterator.iterate(lo)(_.plusDays(1))
      .takeWhile(!_.isAfter(hi))
      .filterNot(present.contains)
      .map(_.format(fmt))
      .toSeq
    import spark.implicits._
    holes.toDF(partitionCol)
  }

  /** Dates present as `partitionCol=<date>` dirs; unparseable dir names
    * are skipped (same contract as the version finders). */
  def listPartitionDates(spark: SparkSession, dir: String,
                         partitionCol: String,
                         fmt: DateTimeFormatter): Set[LocalDate] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .flatMap { d =>
        val v = d.getPath.getName.stripPrefix(s"$partitionCol=")
        try Some(LocalDate.parse(v, fmt))
        catch { case _: java.time.format.DateTimeParseException => None }
      }.toSet
  }
}
