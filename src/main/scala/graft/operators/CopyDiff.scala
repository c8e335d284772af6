package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distcp-style copy planning: copy only files missing or different at the
  * target, comparing (path, length) manifests.
  *
  * Reference: gobblin-data-management copy —
  * RecursiveCopyableDataset diffing source/target listings, CopyableFile
  * (copy/CopyableFile.java:68), prioritized allocation under a byte budget
  * (CopySource.java:207-222).
  *
  * Spark-first: manifests are DataFrames (path, length, mod_time...);
  * the diff is an anti-join on (path, length). Target listings are usually
  * much smaller than a 100 TB source scan — broadcast the target manifest.
  * Budgeted prioritization = sort + running-sum window + filter.
  */
object CopyDiff {

  /** Files present in src whose (relPath, length) is absent at the target. */
  def diff(src: DataFrame, dst: DataFrame,
           on: Seq[String] = Seq("path", "length")): DataFrame =
    src.join(broadcast(dst.select(on.map(col): _*).distinct()), on, "left_anti")

  /** Allocate highest-priority files under a total byte budget
    * (CopySource prioritization): order by priority, keep the prefix whose
    * cumulative size fits. */
  def allocateUnderBudget(files: DataFrame, lengthCol: String,
                          priorityOrder: Seq[org.apache.spark.sql.Column],
                          budgetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(priorityOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.withColumn("__graft_cum", sum(col(lengthCol)).over(w))
      .filter(col("__graft_cum") <= budgetBytes)
      .drop("__graft_cum")
  }

  /** Build a file manifest DataFrame by listing a filesystem path
    * (driver-side, like the reference's dataset finders). */
  def listManifest(spark: SparkSession, root: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path): Seq[(String, Long, Long)] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq((st.getPath.toString.stripPrefix(fs.makeQualified(p).toString),
          st.getLen, st.getModificationTime))
      }
    walk(p).toDF("path", "length", "mod_time")
  }
}
