package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bridges resolved per-dataset config to distributed policy execution.
  *
  * The reference resolves config per dataset on the driver (ConfigClient
  * + a DatasetFinder loop) and then runs one cleaner per dataset
  * (gobblin-data-management/.../retention/DatasetCleaner.java:71). At
  * 100 TB / 10k datasets a per-dataset job loop is the bottleneck, so
  * here the resolved configs become ONE small broadcast policy table and
  * the policy applies to ALL datasets in a single windowed pass — same
  * semantics, one Spark job total instead of one per dataset.
  */
object ConfigPolicies {

  /** Resolved configs -> (dataset, k) policy frame on `spark`. Datasets
    * missing the key fall back to `default` (root-level config). */
  def newestKTable(spark: org.apache.spark.sql.SparkSession,
                   resolved: Map[String, Map[String, String]],
                   kKey: String, default: Int): DataFrame = {
    import spark.implicits._
    resolved.toSeq.map { case (ds, props) =>
      (ds, props.get(kKey).map(_.trim.toInt).getOrElse(default))
    }.sortBy(_._1).toDF("__graft_dataset", "__graft_k")
  }

  /** Keep the newest-K versions per dataset where K is dataset-scoped:
    * one broadcast join against the policy table + one window — never a
    * per-dataset job loop. Undeclared datasets get `default`. `order`
    * must be a total order within a dataset for deterministic results. */
  def newestKPerDataset(policy: DataFrame, datasetCol: String,
                        order: Seq[Column], default: Int)(
      versions: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(datasetCol)).orderBy(order: _*)
    versions
      .join(broadcast(policy),
        col(datasetCol) === col("__graft_dataset"), "left")
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= coalesce(col("__graft_k"), lit(default)))
      .drop("__graft_dataset", "__graft_k", "__graft_rn")
  }
}
