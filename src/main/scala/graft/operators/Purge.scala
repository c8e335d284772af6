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
    * rewrite is a dynamic partition overwrite restricted to those
    * partitions; a partition whose every row is purged is deleted
    * outright (dynamic overwrite cannot express "overwrite with
    * nothing"). The affected list is collected to the driver — it is the
    * purge plan, bounded by the delete list, not the data. */
  def purgePartitioned(spark: SparkSession, dir: String, partitionCol: String,
                       deleteKeys: DataFrame, keyCols: Seq[String],
                       format: String = "parquet"): PartitionPurgeStats = {
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
      .persist() // one scan+anti-join feeds both the part list and the write
    try {
      val survivorParts = survivors.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSet
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try survivors.write.mode(SaveMode.Overwrite).format(format)
        .partitionBy(partitionCol).save(dir)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
      // fully-purged partitions wrote no rows: drop their directories,
      // using Spark's own Hive-style escaping for the dir names
      val removed = affected.filterNot(survivorParts.contains)
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      removed.foreach { v =>
        val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partitionCol,
            if (v == null) null else v.toString)
        fs.delete(new Path(dir, dirName), true): Unit
      }
      PartitionPurgeStats(affected, removed)
    } finally { survivors.unpersist(); () }
  }
}
