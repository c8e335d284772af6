package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compaction-style deduplication.
  *
  * Semantics from the reference's MR compaction reducers: keep ONE record
  * per key, choosing the max by "delta" comparator fields, or an arbitrary
  * record when no delta fields are declared
  * (gobblin-compaction RecordKeyDedupReducerBase.java:35,74-94,
  * AvroKeyDedupReducer.java:39,63-75).
  *
  * Spark-first: the reduce-side "pick one per key" is a windowed top-1 —
  * one hash-partition shuffle on the key, no sort of the whole dataset.
  * At 100 TB this is the canonical shuffle-bound plan; AQE handles skewed
  * keys, and callers should ensure the delta ordering is a TOTAL order
  * (append a unique tiebreaker) so results are deterministic.
  */
object Dedup {

  /** Keep the max-by-delta record per key (windowed top-1). */
  def keyDeltaTop1(keys: Seq[String], deltaOrder: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(deltaOrder: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Exact dedup: no delta fields declared -> arbitrary survivor per key
    * (dropDuplicates); empty keys = full-record DISTINCT. */
  def exact(keys: Seq[String] = Nil)(df: DataFrame): DataFrame =
    if (keys.isEmpty) df.distinct() else df.dropDuplicates(keys)

  /** CompactionThresholdVerifier (compaction/verify/
    * CompactionThresholdVerifier.java:40): recompact only when
    * newRecords/totalRecords exceeds a threshold. Plan-time gate. */
  def thresholdVerify(newCount: Long, totalCount: Long, minRatio: Double): Boolean =
    totalCount > 0 && newCount.toDouble / totalCount.toDouble > minRatio
}
