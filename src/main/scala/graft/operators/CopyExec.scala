package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Distcp byte-copy executor: the record IS a file; each task streams the
  * bytes of its files to the target filesystem, staging to a hidden
  * temp name and renaming into place on success.
  *
  * Reference: FileAwareInputStreamExtractor / FileAwareInputStreamDataWriter
  * (gobblin-data-management/.../copy/extractor/FileAwareInputStreamExtractor
  * .java:49, copy/writer/FileAwareInputStreamDataWriter.java:84) — records
  * are whole files as streams; the writer copies bytes, preserves
  * attributes, and renames from staging into the final path. Planning
  * (what to copy, under what budget) is [[CopyDiff]]; this is the
  * execution face.
  *
  * Scale: one Spark task copies a partition's worth of files — parallelism
  * = partitions, bounded by repartitioning the task set; rename-per-file
  * means interrupted jobs leave only hidden temps (re-runs are idempotent:
  * completed files are skipped by length match).
  */
object CopyExec {

  final case class CopyTask(src: String, dst: String, length: Long)

  /** Derive the copy plan from a (path, length) manifest as a DISTRIBUTED
    * map — the task set never lands on the driver, so a million-file tree
    * plans with the same O(1) driver footprint as ten files (the
    * reference's CopySource.java:207-222 plans driver-side; Spark lets the
    * plan itself stay a Dataset). Manifest paths are root-relative. */
  def planFromManifest(manifest: org.apache.spark.sql.DataFrame,
                       srcRoot: String, dstRoot: String): Dataset[CopyTask] = {
    val spark = manifest.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    manifest.select(
      concat(lit(srcRoot), col("path")).as("src"),
      concat(lit(dstRoot), col("path")).as("dst"),
      col("length"))
      .as[CopyTask]
  }

  final case class CopyStats(filesCopied: Long, filesSkipped: Long,
                             bytesCopied: Long)

  /** Execute the copy plan; `preserveModTime` mirrors the reference's
    * attribute preservation. */
  def execute(tasks: Dataset[CopyTask], parallelism: Int = 0,
              preserveModTime: Boolean = true): CopyStats = {
    val spark: SparkSession = tasks.sparkSession
    val sc = spark.sparkContext
    val copied: LongAccumulator = sc.longAccumulator("graft.copy.files")
    val skipped: LongAccumulator = sc.longAccumulator("graft.copy.skipped")
    val bytes: LongAccumulator = sc.longAccumulator("graft.copy.bytes")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    val work = if (parallelism > 0) tasks.repartition(parallelism) else tasks
    work.foreachPartition { (it: Iterator[CopyTask]) =>
      val conf = hconf.value
      it.foreach { t =>
        val src = new Path(t.src)
        val dst = new Path(t.dst)
        val sfs = src.getFileSystem(conf)
        val dfs = dst.getFileSystem(conf)
        // idempotent re-run: a completed file of the right length is done
        if (dfs.exists(dst) && dfs.getFileStatus(dst).getLen == t.length) {
          skipped.add(1)
        } else {
          val tmp = new Path(dst.getParent, s".copy-tmp-${dst.getName}")
          if (!dfs.exists(dst.getParent)) dfs.mkdirs(dst.getParent)
          val in = sfs.open(src)
          val out = dfs.create(tmp, true)
          val buf = new Array[Byte](1 << 20)
          var total = 0L
          try {
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); total += n; n = in.read(buf) }
          } finally { in.close(); out.close() }
          if (dfs.exists(dst)) dfs.delete(dst, false)
          require(dfs.rename(tmp, dst), s"copy rename failed: $tmp -> $dst")
          if (preserveModTime) {
            val st = sfs.getFileStatus(src)
            dfs.setTimes(dst, st.getModificationTime, -1)
          }
          copied.add(1)
          bytes.add(total)
        }
      }
    }
    CopyStats(copied.value, skipped.value, bytes.value)
  }
}
