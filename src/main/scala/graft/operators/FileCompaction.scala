package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for a partitioned table: find the partitions
  * whose data is scattered over many under-sized files, rewrite ONLY
  * those partitions into `ceil(bytes / targetBytes)` files each, and
  * swap every rewritten partition dir atomically. Data is bit-identical
  * before and after — this is a pure layout rewrite.
  *
  * Reference: the reference's compaction module selects datasets by a
  * file-count/recency condition and rewrites them per partition
  * (CompactionSource + conditions; our dedup face is
  * [[Dedup.keyDeltaTop1]]) — this operator is its OTHER job, the one
  * that fixes the small-file problem streaming ingest creates
  * (every flush epoch = one file per writer; a day of 5-minute epochs
  * = hundreds of slivers per partition). The swap protocol is the same
  * park-restore [[graft.sinks.AtomicPublisher.Staged]] used by purge
  * and MERGE, so a crash mid-compaction never mixes layouts within a
  * partition.
  *
  * Scale shape: candidate discovery is one driver FS listing (O(files)
  * metadata, no data read). The rewrite is ONE distributed job over
  * all selected partitions — not a job per partition: rows get a
  * deterministic salt `hash(row) mod targetFiles(partition)` and one
  * shuffle on (partition, salt) bounds every partition's output file
  * count while keeping the whole rewrite a single stage pipeline.
  * Untouched partitions are never read, never written.
  */
object FileCompaction {

  /** One partition's layout audit: dir name (e.g. "dt=2024-01-03"),
    * current file count, total bytes, and the file count a compaction
    * to `targetBytes` would produce. */
  final case class PartitionLayout(dir: String, files: Int, bytes: Long,
                                   targetFiles: Int) {
    def needsCompaction: Boolean = files > targetFiles
  }

  final case class CompactionStats(rewritten: Seq[String], filesBefore: Long,
                                   filesAfter: Long, bytesRewritten: Long)

  /** Driver FS listing of every `partitionCol=...` dir under `dir`:
    * metadata only, no data read. */
  def audit(spark: SparkSession, dir: String, partitionCol: String,
            targetBytes: Long): Seq[PartitionLayout] = {
    require(targetBytes > 0)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .map { d =>
        val files = fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
        val bytes = files.map(_.getLen).sum
        val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        PartitionLayout(d.getPath.getName, files.size, bytes, target)
      }
      .sortBy(_.dir)
  }

  /** Compact every partition whose file count exceeds its target. The
    * rewrite is one distributed job over the selected partitions; each
    * rewritten dir swaps in atomically ([[graft.sinks.AtomicPublisher]]
    * park-restore), so re-running after a crash just compacts again.
    * Returns what was rewritten; a fully-compacted table is a no-op. */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
              targetBytes: Long, format: String = "parquet"): CompactionStats = {
    val layouts = audit(spark, dir, partitionCol, targetBytes)
    val picked = layouts.filter(_.needsCompaction)
    val before = layouts.map(_.files.toLong).sum
    if (picked.isEmpty)
      return CompactionStats(Nil, before, before, 0L)

    val paths = picked.map(p => s"$dir/${p.dir}")
    val slice = spark.read.option("basePath", dir).format(format)
      .load(paths: _*)
    // deterministic per-row salt bounded by the partition's target file
    // count: one broadcast of the tiny (partition dir -> target) table,
    // one shuffle on (partition, salt). No rand(): a retried task must
    // re-produce the same salt or a speculative retry could duplicate.
    val targets = spark.createDataFrame(
      picked.map(p => (dirValue(partitionCol, p.dir), p.targetFiles)))
      .toDF(partitionCol, "__graft_target")
      .withColumn(partitionCol, col(partitionCol).cast(
        slice.schema(partitionCol).dataType))
    val dataCols = slice.columns.filter(_ != partitionCol).map(col).toIndexedSeq
    val salted = slice.join(broadcast(targets), Seq(partitionCol))
      .withColumn("__graft_salt",
        pmod(xxhash64(struct(dataCols: _*)), col("__graft_target")))
    val staging = new Path(dir, ".compact-staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) fs.delete(staging, true)
    salted.repartition(col(partitionCol), col("__graft_salt"))
      .drop("__graft_target", "__graft_salt")
      .write.mode(SaveMode.Overwrite).format(format)
      .partitionBy(partitionCol).save(staging.toString)
    picked.foreach { p =>
      val src = new Path(staging, p.dir)
      val dst = new Path(dir, p.dir)
      require(fs.exists(src),
        s"compaction staged nothing for ${p.dir} — refusing to swap")
      graft.sinks.AtomicPublisher.Staged(fs, src, dst, "compact").promote()
    }
    fs.delete(staging, true)
    val after = audit(spark, dir, partitionCol, targetBytes)
    CompactionStats(picked.map(_.dir), before, after.map(_.files.toLong).sum,
      picked.map(_.bytes).sum)
  }

  /** "dt=2024-01-03" -> "2024-01-03" (unescaped partition value). */
  private def dirValue(partitionCol: String, dirName: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(dirName.stripPrefix(s"$partitionCol="))
}
