package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Compliance purge (GDPR delete): remove rows whose key appears in a
  * deletion list, then rewrite the partition.
  *
  * Reference: gobblin-modules/gobblin-compliance/.../purger/
  * HivePurgerSource.java:66 plans per-Hive-partition purge work units that
  * rewrite each partition without the purged keys.
  *
  * Spark-first: a LEFT ANTI join. The delete-key list is almost always
  * tiny relative to the data — Spark auto-broadcasts it below the
  * autoBroadcastJoinThreshold, making the purge a map-side scan+filter
  * with NO shuffle of the 100 TB side. Rewrite = INSERT OVERWRITE of the
  * affected partitions only.
  */
object Purge {

  def purge(data: DataFrame, deleteKeys: DataFrame, keyCols: Seq[String]): DataFrame =
    data.join(deleteKeys.select(keyCols.head, keyCols.tail: _*).distinct(),
      keyCols, "left_anti")

  /** The rows that WOULD be purged (audit/preview). */
  def purged(data: DataFrame, deleteKeys: DataFrame, keyCols: Seq[String]): DataFrame =
    data.join(deleteKeys.select(keyCols.head, keyCols.tail: _*).distinct(),
      keyCols, "left_semi")

  /** Partitions a purge run touched / removed outright. */
  final case class PartitionPurgeStats(affected: Seq[Any], removed: Seq[Any])

  /** Purge IN PLACE over a partitioned directory, rewriting ONLY the
    * partitions that contain a deleted key — the reference's
    * per-Hive-partition purge work units (HivePurgerSource.java:66 plans
    * one WU per affected partition; untouched partitions are never read
    * or written). Affected-partition discovery is one semi-join; the
    * affected list is collected to the driver — it is the purge plan,
    * bounded by the delete list, not the data.
    *
    * Survivors are staged to a hidden dir under `dir` (Spark readers skip
    * `.`-prefixed paths), then each affected partition dir is swapped via
    * the AtomicPublisher rename protocol — the read path is never
    * overwritten mid-scan, each partition flips all-or-nothing, and a
    * crash mid-loop leaves every partition either old or new, healed by a
    * re-run (the purge is idempotent). A fully-purged partition has no
    * staged dir and is deleted outright. After the swap the semi-join is
    * re-run and the call FAILS LOUDLY if any deleted key survived — a
    * GDPR purge must never silently partial-delete.
    *
    * `keepBackup` retains each displaced partition as `.old-<partdir>`
    * (and parks fully-purged partitions instead of deleting them) — the
    * compliance purger's backup-per-partition, restorable via
    * [[graft.sinks.AtomicPublisher.restoreBackup]] until the next
    * publish or a Vacuum sweep reclaims it. The backup of course still
    * CONTAINS the purged subjects — compliance deletion completes only
    * when the backups age out, exactly as the reference's versioned
    * purge documents. */
  def purgePartitioned(spark: SparkSession, dir: String, partitionCol: String,
                       deleteKeys: DataFrame, keyCols: Seq[String],
                       format: String = "parquet",
                       keepBackup: Boolean = false): PartitionPurgeStats = {
    val data = spark.read.format(format).load(dir)
    val affected = purged(data, deleteKeys, keyCols)
      .select(partitionCol).distinct().collect().map(_.get(0)).toSeq
    if (affected.isEmpty) return PartitionPurgeStats(Nil, Nil)
    // null partitions land in __HIVE_DEFAULT_PARTITION__ and never match
    // isin — select them explicitly
    val (nullAffected, valAffected) = affected.partition(_ == null)
    val inAffected = {
      val byVal =
        if (valAffected.nonEmpty) col(partitionCol).isin(valAffected: _*)
        else org.apache.spark.sql.functions.lit(false)
      if (nullAffected.nonEmpty) byVal || col(partitionCol).isNull else byVal
    }
    val survivors = purge(data.filter(inAffected), deleteKeys, keyCols)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir, ".purge-staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    survivors.write.mode(SaveMode.Overwrite).format(format)
      .partitionBy(partitionCol).save(staging.toString)
    val removed = Seq.newBuilder[Any]
    affected.foreach { v =>
      val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partitionCol, if (v == null) null else v.toString)
      val src = new Path(staging, dirName)
      val dst = new Path(dir, dirName)
      if (fs.exists(src))
        graft.sinks.AtomicPublisher.Staged(fs, src, dst, "purge",
          keepBackup).promote()
      else {
        if (keepBackup && fs.exists(dst)) {
          val park = new Path(dir, s".old-$dirName")
          if (fs.exists(park)) fs.delete(park, true)
          require(fs.rename(dst, park), s"purge: cannot park $dst")
        } else fs.delete(dst, true)
        removed += v
      }
    }
    fs.delete(staging, true)
    val leftover = purged(spark.read.format(format).load(dir), deleteKeys, keyCols)
    require(leftover.isEmpty,
      s"purge verification failed: deleted keys remain in $dir after partition swap")
    PartitionPurgeStats(affected, removed.result())
  }
}
