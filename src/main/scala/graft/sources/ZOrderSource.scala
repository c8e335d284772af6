package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ZCurve

/** Multi-dimensional zone-map pruning: publish a table Z-ORDER
  * clustered on several columns, plus a per-file (min, max) sidecar
  * manifest for EACH clustered column, then answer box probes
  * (range predicates on several dimensions at once) by opening only
  * the files whose envelope intersects every range.
  *
  * [[StatsPrunedSource]] solves the one-dimension case: range-cluster
  * on a single column, skip files by its (min, max). A second
  * predicate gets no skipping there — the non-leading column is
  * scattered across every file. The Morton curve
  * ([[graft.functions.ZInterleave]]) fixes that: sorting by the
  * interleaved-bit value bounds every clustered dimension within each
  * contiguous file, so ALL the per-column envelopes come out tight.
  * At 100 TB this is the difference between a (ts, user) probe reading
  * one day's files and reading the whole day × every user shard.
  *
  * Correctness is layout-independent, same contract as
  * [[StatsPrunedSource]]: the residual filter always re-applies the
  * full predicate after pruning, so a bad clustering only prunes less.
  *
  * Reference: the reference registers partition-level metadata only
  * (HiveRegister; gobblin-metadata) — file-stat skipping and
  * multi-dimensional clustering are the Iceberg-manifest / Delta
  * Z-ORDER ideas, re-expressed with this repo's sidecar pattern.
  */
object ZOrderSource {

  /** Scale `c` (cast to long) into a [0, 2^bits) rank:
    * `floor((v - lo) * 2^bits / (hi - lo + 1))`. The scale factor is
    * applied as ONE double multiply so a small domain (e.g. 150 user
    * ids) still spreads across the HIGH rank bits — file splits read the
    * top z bits first, so low-bit-only ranks would never prune. Exact
    * for ranges under 2^53; beyond that the possible one-bucket wobble
    * only perturbs LAYOUT: result correctness rides the residual filter
    * and the written-data stats, never the rank. */
  def rankCol(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val scale = (1L << bits).toDouble / ((hi - lo).toDouble + 1.0)
    floor((c.cast("long") - lit(lo)).cast("double") * lit(scale)).cast("long")
  }

  private def statsDir(dir: String) = s"$dir/_graft_stats"

  /** Publish `df` Z-clustered on `cols` into `numFiles` range buckets of
    * the z-value, plus a sidecar manifest with one row per data file
    * carrying `<col>_min` / `<col>_max` for every clustered column.
    * Column ranges for rank scaling come from one pass over `df`; the
    * manifest is computed from the data ACTUALLY WRITTEN (read-back
    * with input_file_name), so it is correct whatever the writer did. */
  def writeZOrdered(df: DataFrame, dir: String, cols: Seq[String],
                    numFiles: Int = 32, bits: Int = 16): Unit = {
    require(cols.nonEmpty)
    val spark = df.sparkSession
    // one driver-side agg: per-column long-cast (min, max) for scaling
    val boundAggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*).collect()(0)
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) =
        if (bounds.isNullAt(2 * i)) (0L, 0L) // all-NULL column: rank 0
        else (bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
      rankCol(col(c), lo, hi, bits)
    }
    val z = ZCurve.zValue(ranks, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
      .write.mode("overwrite").parquet(dir)
    val written = spark.read.parquet(dir)
    val statAggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    val stats = written.groupBy(input_file_name().as("file"))
      .agg(statAggs.head, statAggs.tail: _*)
    stats.coalesce(1).write.mode("overwrite").parquet(statsDir(dir))
  }

  /** The per-file stats manifest of a [[writeZOrdered]] table. */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(statsDir(dir))

  /** Read rows inside the box `∀ (c, lo, hi): c ∈ [lo, hi]` (inclusive),
    * opening only files whose per-column envelopes intersect EVERY
    * range. Returns (frame, filesKept, filesTotal) — the counts are the
    * observability hook callers assert pruning on. */
  def readBox(spark: SparkSession, dir: String,
              box: Seq[(String, Column, Column)]): (DataFrame, Long, Long) = {
    require(box.nonEmpty)
    val st = stats(spark, dir)
    val keepPred = box.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lo && col(s"${c}_min") <= hi
    }.reduce(_ && _)
    val kept = st.filter(keepPred).select("file").collect().map(_.getString(0))
    val total = st.count()
    val residual = box.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    val frame =
      if (kept.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*).filter(residual)
    (frame, kept.length.toLong, total)
  }
}
