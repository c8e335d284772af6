package graft.operators

import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneId}
import java.time.format.DateTimeFormatterBuilder
import java.time.temporal.ChronoField

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

/** Dataset-version finders over REAL filesystem layouts — the bridge
  * between a retention policy and a runnable retention job.
  *
  * Reference: gobblin-data-management/.../version/finder/
  * DateTimeDatasetVersionFinder.java:47 (a datetime pattern both derives
  * the glob — every non-slash run becomes `*` — and parses each matched
  * path into its version timestamp) and
  * GlobModTimeDatasetVersionFinder.java (explicit glob, version = file
  * modification time). AbstractDatasetVersionFinder skips paths whose
  * parse fails rather than aborting the cleaner.
  *
  * Scale shape: version discovery is a driver-side globStatus — O(number
  * of versions) METADATA, independent of data volume, exactly like the
  * reference — and the result feeds [[Retention]] policies as a small
  * DataFrame. Only the surviving versions' DATA is ever read
  * distributed; deletes touch doomed directory roots, not files.
  */
object VersionFinder {

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("version_ts", TimestampType, nullable = false)))

  /** Derive the glob from a datetime pattern: each non-slash segment run
    * becomes `*` (DateTimeDatasetVersionFinder.java:80: pattern
    * `yyyy/MM/dd` globs `*&#47;*&#47;*`). */
  def globFor(pattern: String): String = pattern.replaceAll("[^/]+", "*")

  /** Versions found by parsing the path SUFFIX (relative to `root`) with
    * `pattern`. Sub-day patterns default missing fields to their floor
    * (month/day -> 1, time -> midnight), matching joda's parseDateTime.
    * Unparseable or non-directory matches are skipped. */
  def dateTimeVersions(spark: SparkSession, root: String, pattern: String,
                       zone: String = "UTC",
                       glob: Option[String] = None): DataFrame = {
    val fmt = new DateTimeFormatterBuilder()
      .appendPattern(pattern)
      .parseDefaulting(ChronoField.MONTH_OF_YEAR, 1)
      .parseDefaulting(ChronoField.DAY_OF_MONTH, 1)
      .parseDefaulting(ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(rootPath).toUri
    val statuses = Option(fs.globStatus(
      new Path(rootPath, glob.getOrElse(globFor(pattern))))).getOrElse(Array())
    val rows = statuses.toSeq.filter(_.isDirectory).flatMap { st =>
      val rel = rootUri.relativize(fs.makeQualified(st.getPath).toUri).getPath
        .stripSuffix("/")
      try {
        val ldt = LocalDateTime.parse(rel, fmt)
        val ts = Timestamp.from(ldt.atZone(ZoneId.of(zone)).toInstant)
        Some(Row(st.getPath.toString, ts))
      } catch { case _: java.time.format.DateTimeParseException => None }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Versions matched by an explicit glob; version = modification time
    * (GlobModTimeDatasetVersionFinder.java). */
  def globModTimeVersions(spark: SparkSession, root: String,
                          glob: String = "*"): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(new Path(rootPath, glob)))
      .getOrElse(Array())
    val rows = statuses.toSeq.map(st =>
      Row(st.getPath.toString, new Timestamp(st.getModificationTime)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Versions from a unix timestamp embedded in each matched path's
    * NAME: `regex`'s first capture group (or the whole name when None)
    * parses as epoch millis; non-matching / non-numeric names are
    * skipped (UnixTimestampVersionFinder.java:45-80 over
    * WatermarkDatasetVersionFinder's regex extraction). */
  def unixTimestampVersions(spark: SparkSession, root: String,
                            glob: String = "*",
                            regex: Option[String] = None): DataFrame = {
    val pattern = regex.map(_.r)
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(new Path(rootPath, glob)))
      .getOrElse(Array())
    val rows = statuses.toSeq.flatMap { st =>
      val name = st.getPath.getName
      val raw = pattern match {
        case Some(p) => p.findFirstMatchIn(name)
          // a regex without a capture group falls back to its whole
          // match; non-numeric text then fails toLongOption below — the
          // skip-unparseable contract, never an exception mid-sweep
          .flatMap(m =>
            if (m.groupCount >= 1) Option(m.group(1)) else Some(m.matched))
        case None => Some(name)
      }
      raw.flatMap(_.toLongOption)
        .map(ms => Row(st.getPath.toString, new Timestamp(ms)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** One version per MOST-NESTED path (leaf file, or empty leaf dir),
    * versioned by its modification time — the finder for datasets whose
    * retention unit is individual files rather than version dirs
    * (FileLevelTimestampVersionFinder.java:49,67 over
    * listMostNestedPathRecursively). The walk is O(files) driver
    * metadata; retention datasets are bounded by design. */
  def fileLevelModTimeVersions(spark: SparkSession,
                               root: String): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recurse on the statuses listStatus already returned: one RPC per
    // directory, and no getFileStatus on a path a concurrent writer may
    // have deleted between list and stat
    def leaves(st: org.apache.hadoop.fs.FileStatus)
        : Seq[org.apache.hadoop.fs.FileStatus] =
      if (!st.isDirectory) Seq(st)
      else {
        val children = fs.listStatus(st.getPath).toSeq
        if (children.isEmpty) Seq(st) // empty dir is its own leaf
        else children.flatMap(leaves)
      }
    val rows =
      if (!fs.exists(rootPath)) Nil
      else leaves(fs.getFileStatus(rootPath)).map(st =>
        Row(st.getPath.toString, new Timestamp(st.getModificationTime)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Execute the delete set: remove each doomed version ROOT recursively
    * (the cleaner deletes version directories, not individual files —
    * DatasetCleaner.java:71 via VersionCleaner). The doomed list is
    * O(versions), so the collect is bounded metadata. Returns the paths
    * actually deleted. */
  def deleteVersions(spark: SparkSession, doomed: DataFrame): Seq[String] = {
    val paths = doomed.select("path").collect().map(_.getString(0)).toSeq
    paths.filter { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(hp) && fs.delete(hp, true)
    }
  }
}
