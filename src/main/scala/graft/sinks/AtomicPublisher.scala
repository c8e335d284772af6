package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Staged atomic publish: write to a staging dir, then rename into the
  * final dir in one filesystem move.
  *
  * Reference: all FS writers stage task output
  * (gobblin-core/.../writer/FsDataWriter.java:58 — task-staging ->
  * task-output) and BaseDataPublisher.java:106,338 atomically renames to
  * the final directory at job commit, per branch.
  *
  * Spark-first: Spark's FileCommitProtocol already gives task-level
  * atomicity (_temporary + rename); this publisher adds the reference's
  * JOB-level publish step — data is invisible under the final path until
  * the whole branch succeeded. TimePartitioned layout is preserved because
  * partition subdirectories are moved as-is
  * (TimePartitionedDataPublisher semantics).
  */
object AtomicPublisher {

  final case class WriteSpec(format: String = "parquet",
                             partitionBy: Seq[String] = Nil,
                             options: Map[String, String] = Map.empty,
                             mode: SaveMode = SaveMode.Overwrite)

  /** Write df to `<finalDir>/.staging-<runId>`, then move into finalDir. */
  def publish(df: DataFrame, finalDir: String, runId: String,
              spec: WriteSpec = WriteSpec()): Unit = {
    val spark = df.sparkSession
    val fs = new Path(finalDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = new Path(finalDir).getParent
    val staging = new Path(parent, s".staging-$runId-${new Path(finalDir).getName}")
    if (fs.exists(staging)) fs.delete(staging, true)

    var w = df.write.mode(spec.mode).format(spec.format).options(spec.options)
    if (spec.partitionBy.nonEmpty) w = w.partitionBy(spec.partitionBy: _*)
    w.save(staging.toString)

    val dst = new Path(finalDir)
    if (fs.exists(dst)) fs.delete(dst, true)
    if (!fs.exists(dst.getParent)) fs.mkdirs(dst.getParent)
    require(fs.rename(staging, dst), s"publish rename failed: $staging -> $dst")
  }
}
