package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone-map pruning: publish a table with a per-file
  * (min, max) stats manifest over a chosen column, then answer range
  * queries by reading ONLY the files whose range intersects — the
  * data-skipping layer between partition-dir pruning
  * ([[DatePartitionedSource]], whole directories) and Parquet's own
  * row-group statistics (inside a file that was already opened). At
  * 100 TB the win is planning-time: a range probe touches the manifest
  * (O(files) driver metadata, same shape as the reference's
  * dataset-finder listings) and schedules tasks for the handful of
  * matching files instead of listing-then-footer-probing every file.
  *
  * Reference: the reference tracks per-output-file metadata through its
  * publish path (gobblin-metadata module; partition-level registration
  * in HiveRegister) but has no file-stat skipping; this is the
  * Iceberg-manifest idea (min/max per data file) re-expressed with this
  * repo's own sidecar-manifest pattern ([[ManifestSource]],
  * [[graft.state.StateStore]]).
  *
  * Correctness is layout-independent: the residual filter ALWAYS
  * applies after pruning, so a sloppy writer (no range clustering) just
  * prunes less — never wrong. The writer clusters by range
  * (`repartitionByRange` on the stat column) precisely so file ranges
  * are tight and disjoint, which is what makes pruning bite.
  */
object StatsPrunedSource {

  /** Publish `df` clustered by `statCol` into `numFiles` range-buckets,
    * plus a `_graft_stats` sidecar manifest with one (file, min, max)
    * row per data file. The stats are computed from the data ACTUALLY
    * WRITTEN (read-back with input_file_name), not from the plan, so
    * they are correct whatever the writer did to row order. */
  def writeWithStats(df: DataFrame, dir: String, statCol: String,
                     numFiles: Int = 32): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(numFiles, col(statCol))
      .write.mode("overwrite").parquet(dir)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("stat_min"), max(col(statCol)).as("stat_max"))
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/_graft_stats")
  }

  /** The stats manifest of a [[writeWithStats]] table. */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/_graft_stats")

  /** Read rows with `statCol` in [lo, hi] (inclusive), opening only
    * files whose [min, max] intersects the probe range; the residual
    * filter re-applies the predicate so pruning can never change the
    * answer. Returns the pruned frame plus how many files it kept (the
    * observability hook the units pin). */
  def readRange(spark: SparkSession, dir: String, statCol: String,
                lo: Column, hi: Column): (DataFrame, Long, Long) = {
    val st = stats(spark, dir)
    val kept = st.filter(col("stat_max") >= lo && col("stat_min") <= hi)
      .select("file").collect().map(_.getString(0))
    val total = st.count()
    val pred = col(statCol) >= lo && col(statCol) <= hi
    val frame =
      if (kept.isEmpty) // typed empty frame, same schema as the table
        spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*).filter(pred)
    (frame, kept.length.toLong, total)
  }
}
