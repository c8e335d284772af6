package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retention policies over a "dataset versions" table
  * (columns: dataset id, version timestamp, path/payload...).
  *
  * Reference semantics: gobblin-data-management retention —
  * TimeBasedRetentionPolicy.java:48 (delete versions older than a duration),
  * NewestKRetentionPolicy.java:39 (keep the newest K),
  * CombineRetentionPolicy (union/intersect of sub-policies),
  * executed by DatasetCleaner.java:71.
  *
  * Here a policy SELECTS THE SURVIVORS (the complement is the delete set) —
  * delete execution is a filesystem action applied to the complement.
  */
object Retention {

  /** Keep the newest K versions per dataset. `order` must be a total order
    * (ties broken by a unique column) for deterministic results. */
  def newestK(datasetCols: Seq[String], order: Seq[Column], k: Int)(
      df: DataFrame): DataFrame = {
    val w = Window.partitionBy(datasetCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }

  /** Keep versions with ts >= cutoff (TimeBasedRetentionPolicy keeps
    * versions newer than `now - duration`; cutoff precomputed at plan time
    * for determinism). */
  def newerThan(tsCol: String, cutoff: java.sql.Timestamp)(df: DataFrame): DataFrame =
    df.filter(col(tsCol) >= lit(cutoff))

  /** CombineRetentionPolicy: survivors kept by ALL sub-policies (intersect)
    * or by ANY (union). */
  def combineIntersect(policies: Seq[DataFrame => DataFrame])(df: DataFrame): DataFrame =
    policies.map(_(df)).reduce(_.intersect(_))

  def combineUnion(policies: Seq[DataFrame => DataFrame])(df: DataFrame): DataFrame =
    policies.map(_(df)).reduce(_.union(_)).distinct()

  /** The delete set = all versions minus survivors (left_anti on key). */
  def deleteSet(all: DataFrame, survivors: DataFrame, keyCols: Seq[String]): DataFrame =
    all.join(survivors.select(keyCols.map(col): _*), keyCols, "left_anti")
}
