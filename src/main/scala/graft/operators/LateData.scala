package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.AtomicPublisher

/** Late-data handling + recompaction, the reference's compaction loop:
  * records arriving after their hour/day was compacted land in a `_late`
  * directory next to the compacted data, and recompaction conditions
  * decide when merging them back is worth a rewrite.
  *
  * Reference: MRCompactor late-dir handling
  * (gobblin-compaction/.../mapreduce/MRCompactor.java; docs
  * gobblin-docs/user-guide/Compaction.md) and the condition classes under
  * gobblin-compaction/.../compaction/conditions/ (late-record ratio,
  * elapsed time); the row-level cut-off mirrors
  * RecordTimestampLowerBoundPolicy (gobblin-core/.../policies/time/).
  *
  * Spark-first: the `_late` name is deliberate — Spark's file index hides
  * `_`/`.`-prefixed paths, so normal reads of the compacted dir never see
  * late spills; recompaction reads them explicitly and rewrites through
  * the atomic publisher (dedup included, so replays are idempotent).
  */
object LateData {

  /** Split records at an event-time watermark: (onTime >= wm-lateness
    * cutoff is the caller's choice; here: ts > watermark = on time for the
    * NEXT window, ts <= watermark = late for the already-compacted one). */
  def splitLate(df: DataFrame, tsCol: String,
                watermark: Timestamp): (DataFrame, DataFrame) =
    (df.filter(col(tsCol) > lit(watermark)),
      df.filter(col(tsCol) <= lit(watermark)))

  /** Spill late records under `<dir>/_late/<runId>` (hidden from normal
    * reads of `dir`). */
  def appendLate(late: DataFrame, dir: String, runId: String): Unit =
    late.write.mode("overwrite").parquet(s"$dir/_late/$runId")

  /** Counts driving the recompaction decision. */
  final case class LateState(mainRows: Long, lateRows: Long,
                             lastCompactionMs: Long)

  /** Recompact when late volume or staleness crosses a threshold
    * (RecompactionConditionBasedOnRatio / ...Duration). */
  def shouldRecompact(st: LateState, ratioThreshold: Double,
                      maxAgeMs: Long = Long.MaxValue,
                      nowMs: Long = System.currentTimeMillis()): Boolean = {
    val ratio =
      if (st.mainRows == 0) (if (st.lateRows > 0) Double.MaxValue else 0.0)
      else st.lateRows.toDouble / st.mainRows
    st.lateRows > 0 &&
      (ratio >= ratioThreshold || nowMs - st.lastCompactionMs >= maxAgeMs)
  }

  /** Rows currently spilled late for `dir` (empty frame when none). */
  def lateRows(spark: SparkSession, dir: String, schema: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_late")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema.schema).parquet(s"$dir/_late/*")
    else schema.limit(0)
  }

  /** Merge the compacted dir with its `_late` spills, dedup per the
    * compaction contract, republish atomically, drop the spills. */
  def recompact(spark: SparkSession, dir: String, keys: Seq[String],
                delta: Seq[Column], runId: String): Unit = {
    val main = spark.read.parquet(dir) // _late is hidden from this read
    val merged = main.union(lateRows(spark, dir, main))
      .transform(Dedup.keyDeltaTop1(keys, delta))
    AtomicPublisher.publish(merged, dir, runId)
    val late = new org.apache.hadoop.fs.Path(s"$dir/_late")
    val fs = late.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(late)) fs.delete(late, true)
    ()
  }
}
