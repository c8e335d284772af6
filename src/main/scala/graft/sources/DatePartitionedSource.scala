package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-partitioned directory-tree source with PLAN-TIME pruning: walk
  * the `yyyy/MM/dd`-style levels of the tree, parse each directory date,
  * and hand only in-range leaf directories to the reader — directories
  * below the watermark (or outside the lookback) are never listed into
  * the scan at all.
  *
  * Reference: PartitionedFileSourceBase / DatePartitionedAvroFileSource
  * (gobblin-core/.../source/PartitionedFileSourceBase.java,
  * DatePartitionedAvroFileSource.java) and RegexBasedPartitionedRetriever
  * — prune date partitions below the low watermark with an optional
  * lookback window.
  *
  * This complements Catalyst partition pruning: Catalyst prunes
  * hive-style `k=v` layouts, while the reference's raw `2024/03/01/...`
  * trees carry no column mapping — pruning must happen during planning,
  * which at 100 TB also avoids the driver listing millions of dead files.
  */
object DatePartitionedSource {

  final case class DatePartition(date: LocalDate, path: String)

  /** All date partitions of the tree, parsed per `pattern` (slash count =
    * directory depth). */
  def partitions(spark: SparkSession, root: String,
                 pattern: String = "yyyy/MM/dd"): Seq[DatePartition] = {
    val depth = pattern.count(_ == '/') + 1
    val fmt = DateTimeFormatter.ofPattern(pattern)
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path, level: Int): Seq[Path] =
      if (level == depth) Seq(dir)
      else fs.listStatus(dir).toSeq
        .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .flatMap(st => walk(st.getPath, level + 1))
    if (!fs.exists(rootPath)) Nil
    else {
      val rootUri = fs.makeQualified(rootPath).toString
      walk(fs.makeQualified(rootPath), 0).flatMap { p =>
        val rel = p.toString.stripPrefix(rootUri).stripPrefix("/")
        try Some(DatePartition(LocalDate.parse(rel, fmt), p.toString))
        catch { case _: java.time.format.DateTimeParseException => None }
      }
    }
  }

  /** Read only the partitions in (lowWatermark, high] ∩ lookback — the
    * pruned path list goes straight into the reader. */
  def read(spark: SparkSession, root: String,
           pattern: String = "yyyy/MM/dd",
           lowWatermark: Option[LocalDate] = None,
           lookback: Option[Int] = None,
           high: Option[LocalDate] = None,
           format: String = "parquet"): DataFrame = {
    val all = partitions(spark, root, pattern)
    val hi = high.getOrElse(LocalDate.MAX)
    val lookLow = lookback.map(d =>
      (if (hi == LocalDate.MAX) all.map(_.date).maxOption.getOrElse(hi) else hi)
        .minusDays(d.toLong))
    val kept = all.filter { p =>
      lowWatermark.forall(p.date.isAfter) &&
        !p.date.isAfter(hi) &&
        lookLow.forall(!p.date.isBefore(_))
    }
    if (kept.nonEmpty) spark.read.format(format).load(kept.map(_.path): _*)
    else if (all.nonEmpty) // schema-preserving empty result
      spark.read.format(format).load(all.map(_.path): _*).limit(0)
    else throw new IllegalArgumentException(s"no date partitions under $root")
  }
}
