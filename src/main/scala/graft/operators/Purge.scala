package graft.operators

import org.apache.spark.sql.DataFrame

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
}
