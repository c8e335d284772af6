package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic token-budget shard packing — the "write the training
  * shards" step of a pretraining pipeline: lay the corpus out in a
  * deterministic pseudo-random order (a salted portable hash of the key,
  * so the order is reproducible run-to-run and engine-to-engine), then
  * cut it into shards of ~`budget` weight each (weight = token count,
  * char count, byte size …). Every document lands in exactly one shard;
  * shard k holds the documents whose running weight total before them is
  * in [k·budget, (k+1)·budget).
  *
  * The reference's analogue is work-unit bin-packing at ingestion time
  * (gobblin-core/.../source/workunit/KafkaWorkUnitPacker semantics, see
  * `planning/BinPacker.scala`); shard packing is the corpus-side variant
  * where the order itself must be stable because it IS the training
  * order.
  *
  * Scale shape: a global ordered prefix-sum normally collapses Spark
  * into ONE window partition — the classic 100 TB killer. This
  * implementation keeps it distributed:
  *
  *   1. bucket each row by the TOP bits of its 60-bit order hash —
  *      buckets partition the hash range into contiguous slices, so
  *      bucket order == global order (a plain modulo would interleave
  *      buckets and break the prefix sum);
  *   2. one map-side-combined aggregation produces the ≤`buckets`
  *      per-bucket weight totals; a window over those few rows turns
  *      them into exclusive bucket offsets (driver never collects);
  *   3. broadcast-join the offsets back and run the exclusive prefix
  *      sum as a window partitioned BY BUCKET — 32, 1024, 4096-way
  *      parallel, never single-partition;
  *   4. global_cum_before = bucket_offset + local_cum_before, and
  *      shard = global_cum_before div budget (exact long division).
  *
  * Everything is integer arithmetic on a portable hash, so the full
  * assignment is oracle-checkable bit-for-bit in DuckDB with a plain
  * global window.
  */
object ShardPack {

  /** Add `cum_before` (exclusive running weight total in global hash
    * order) and `shardCol` to `df`. `keyCol` must be unique per row (it
    * is the deterministic tiebreak); null weights count as 0. `buckets`
    * bounds the offset table (tune to ~10× parallelism; output is
    * invariant to it).
    *
    * `startOffset` makes packing INCREMENTAL for continuous ingest: pass
    * the previous run's committed total weight (its max `cum_before` +
    * that row's weight) and the new batch continues the shard sequence
    * where the corpus left off — per-batch cost is O(batch), the
    * already-written shards are never touched, and the last (possibly
    * underfull) shard keeps filling. The batch is hash-ordered among
    * ITSELF; a continuously-growing corpus is packed batch-by-batch in
    * arrival order, which is the training-shard contract (shards are
    * append-only artifacts, not a global re-sort per batch). */
  def packByBudget(df: DataFrame, keyCol: String, weightCol: String,
                   budget: Long, salt: String = "shard",
                   buckets: Int = 1024,
                   shardCol: String = "shard_id",
                   startOffset: Long = 0L): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(startOffset >= 0, s"startOffset must be non-negative: $startOffset")
    val clash = df.columns.toSet.intersect(Set("cum_before", shardCol,
      "__graft_h", "__graft_w", "__graft_b", "__graft_off", "__graft_bt"))
    require(clash.isEmpty,
      s"input columns collide with shard-pack columns: ${clash.mkString(", ")}")
    // hash range is [0, 2^60); ceil-divide so bucket ids stay < buckets
    val width = ((1L << 60) + buckets - 1) / buckets
    val hashed = df
      .withColumn("__graft_h", TextStats.portableHash60(
        concat(lit(salt), col(keyCol).cast("string"))))
      .withColumn("__graft_w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .withColumn("__graft_b", expr(s"__graft_h div ${width}L"))

    // ≤ buckets rows: total weight per hash slice → exclusive offsets.
    // The empty-partition window here is single-partition BY DESIGN —
    // it runs over the aggregated slice totals, never the corpus.
    // `hashed` is deliberately NOT persisted even though both this
    // aggregate and the output join consume it: column pruning cuts the
    // aggregate's scan to (keyCol, weightCol) — a tiny fraction of a
    // text corpus — so re-evaluating the hash there is far cheaper than
    // materializing the full hashed corpus at 100 TB would be.
    val offsets = hashed
      .groupBy(col("__graft_b")).agg(sum(col("__graft_w")).as("__graft_bt"))
      .withColumn("__graft_off", coalesce(
        sum(col("__graft_bt")).over(Window.orderBy(col("__graft_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__graft_bt")

    // the corpus pays ONE shuffle: the per-bucket window exchange. The
    // offsets join is broadcast (map-side), so it adds none.
    val perBucket = Window.partitionBy(col("__graft_b"))
      .orderBy(col("__graft_h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    hashed
      .join(broadcast(offsets), "__graft_b")
      .withColumn("cum_before",
        lit(startOffset) + col("__graft_off") +
          coalesce(sum(col("__graft_w")).over(perBucket), lit(0L)))
      .withColumn(shardCol, expr(s"cum_before div ${budget}L"))
      .drop("__graft_h", "__graft_w", "__graft_b", "__graft_off")
  }
}
