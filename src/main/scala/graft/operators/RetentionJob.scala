package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.ConfigStore

/** Config-driven retention: the reference's DatasetCleaner composition
  * (gobblin-data-management/.../retention/DatasetCleaner.java:71 — a
  * dataset finder enumerates datasets, each dataset's config picks its
  * VersionFinder + RetentionPolicy, surviving versions stay, the rest
  * are deleted), with datasets and their policies declared in a
  * [[ConfigStore]] subtree so one tag edit re-policies thousands of
  * datasets.
  *
  * Per-dataset keys (own, imported, or inherited):
  *   version.finder            datetime | modtime | unix | filelevel
  *                                                     (default datetime)
  *   version.datetime.pattern  e.g. yyyy/MM/dd or 'd='yyyy-MM-dd
  *   version.globPattern       override/for modtime+unix (default *)
  *   version.timestamp.regex   unix finder: group 1 = epoch millis
  *   retention.policy          newestk | newerthan     (default newestk)
  *   retention.newestk.k       K                       (default 2)
  *   retention.newerthan.cutoff yyyy-MM-dd HH:mm:ss
  *   dataset.root              data dir (default <dataRoot>/<leaf name>)
  *
  * Scale shape: everything here is metadata-plane — one glob + one
  * bounded delete list per dataset, O(datasets) driver RPCs total,
  * independent of data volume (the reference's cleaner does the same
  * walk). No record data is ever read.
  */
object RetentionJob {

  final case class DatasetOutcome(dataset: String, found: Long,
                                  kept: Long, deleted: Seq[String])

  def run(spark: SparkSession, store: ConfigStore, configPrefix: String,
          dataRoot: String, parallelism: Int = 1): Seq[DatasetOutcome] = {
    val datasets = store.resolveAll(configPrefix).toSeq.sortBy(_._1)
    // each dataset is pure metadata work (glob + delete list) — at 10k
    // datasets the wall time is RPC-latency-bound, so run them on a
    // bounded pool; results come back in dataset order either way
    val cleanOne: ((String, Map[String, String])) => DatasetOutcome = {
      case (name, props) =>
        val root = props.getOrElse("dataset.root", s"$dataRoot/$name")
        val versions = props.getOrElse("version.finder", "datetime") match {
          case "modtime" => VersionFinder.globModTimeVersions(
            spark, root, props.getOrElse("version.globPattern", "*"))
          case "unix" => VersionFinder.unixTimestampVersions(
            spark, root, props.getOrElse("version.globPattern", "*"),
            regex = props.get("version.timestamp.regex"))
          case "filelevel" =>
            VersionFinder.fileLevelModTimeVersions(spark, root)
          case _ => VersionFinder.dateTimeVersions(
            spark, root,
            props.getOrElse("version.datetime.pattern",
              throw new IllegalArgumentException(
                s"$name: version.datetime.pattern is required")),
            glob = props.get("version.globPattern"))
        }
        val withDs = versions.withColumn("dataset", lit(name))
        val survivors = props.getOrElse("retention.policy", "newestk") match {
          case "newerthan" => Retention.newerThan("version_ts",
            Timestamp.valueOf(props("retention.newerthan.cutoff")))(withDs)
          case _ => Retention.newestK(Seq("dataset"),
            Seq(col("version_ts").desc, col("path").desc),
            props.getOrElse("retention.newestk.k", "2").trim.toInt)(withDs)
        }
        val doomed = Retention.deleteSet(withDs, survivors, Seq("path"))
        val deleted = VersionFinder.deleteVersions(spark, doomed)
        val found = versions.count()
        DatasetOutcome(name, found, found - deleted.size, deleted)
    }
    if (parallelism <= 1 || datasets.size <= 1) datasets.map(cleanOne)
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(parallelism.min(datasets.size))
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(
          datasets.map(d => new java.util.concurrent.Callable[DatasetOutcome] {
            override def call(): DatasetOutcome = cleanOne(d)
          }).asJava
        ).asScala.toSeq.map(_.get()) // rethrows the first dataset failure
      } finally { pool.shutdown(): Unit }
    }
  }

  /** Outcomes as a queryable frame (mirrors the cleaner's audit log). */
  def outcomesFrame(spark: SparkSession,
                    outcomes: Seq[DatasetOutcome]): DataFrame = {
    import spark.implicits._
    outcomes.map(o => (o.dataset, o.found, o.kept, o.deleted.size.toLong))
      .toDF("dataset", "found", "kept", "deleted")
  }
}
