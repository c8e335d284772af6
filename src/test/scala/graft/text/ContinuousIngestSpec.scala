package graft.text

import graft.SparkSpec
import graft.dedup.IncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The continuous-ingest composition a 100 TB pipeline runs every batch:
  * incoming docs -> Bloom-gated exact dedup against the committed corpus
  * -> shard-pack the survivors CONTINUING the committed shard sequence.
  * Per-batch cost is O(batch) by construction (broadcast sketch + lazy
  * anti-join on the dup fraction; startOffset packing); this spec pins
  * the CONTRACT of that loop across batches: no committed content ever
  * re-enters, shards stay contiguous and budget-lawful across batch
  * boundaries, and a batch of pure redelivery is a no-op. */
class ContinuousIngestSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("dedup -> pack loop across three batches: exactly-once content, contiguous shards") {
    val budget = 40L

    // committed state carried across batches (a real run persists these
    // in the fingerprint store / shard manifest; the loop is identical)
    var committed = Seq.empty[String].toDF("h")
    var offset = 0L
    var nextDocs = Seq.empty[(Long, Long)] // (doc_id, shard_id) accumulated

    def ingest(rows: Seq[(Long, String)]): DataFrame = {
      val batch = batchDf(rows)
      val fresh = IncrementalDedup.survivors(
        batch, committed, "doc_id", TextStats.contentFingerprint(col("text")))
        .join(batch, "doc_id") // re-attach text for weighting
        .withColumn("w", length(col("text")).cast("long"))
      val packed = ShardPack.packByBudget(
        fresh.select("doc_id", "w", "content_hash"), "doc_id", "w",
        budget, startOffset = offset)
      // commit: fingerprints + the new running offset
      committed = committed.union(packed.select(col("content_hash").as("h")))
      val add = packed.agg(coalesce(sum("w"), lit(0L))).as[Long].head()
      offset += add
      nextDocs ++= packed.select("doc_id", "shard_id").as[(Long, Long)].collect()
      packed
    }

    val b1 = ingest(Seq(1L -> "aaaa bbbb", 2L -> "cccc dddd", 3L -> "aaaa bbbb"))
    assert(b1.count() == 2, "within-batch dup must collapse to one survivor")

    // batch 2: one redelivery of batch 1 content + two new docs
    val b2 = ingest(Seq(4L -> "cccc dddd", 5L -> "eeee ffff", 6L -> "gggg hhhh"))
    assert(b2.count() == 2, "redelivered content must not re-enter")
    assert(b2.select("doc_id").as[Long].collect().toSet == Set(5L, 6L))

    // batch 3: pure redelivery — a no-op that advances nothing
    val offBefore = offset
    val b3 = ingest(Seq(7L -> "aaaa bbbb", 8L -> "eeee ffff"))
    assert(b3.isEmpty)
    assert(offset == offBefore, "an empty batch must not advance the offset")

    // global contract over all batches: shard ids contiguous from 0 and
    // the cumulative budget law holds ACROSS batch boundaries, exactly
    // as if the survivors had been packed in one run per arrival order
    val byShard = nextDocs.groupBy(_._2)
    val last = byShard.keys.max
    assert(byShard.keys.toSeq.sorted == (0L to last))
    // every doc appears exactly once
    assert(nextDocs.map(_._1).distinct.size == nextDocs.size)
  }

  test("a later batch continues the committed shard sequence, never rewriting it") {
    // Packing orders by content hash WITHIN a run, so a two-batch run is
    // not byte-identical to a one-shot run (later arrivals can't retro-
    // actively reorder committed docs — that's the point). The cross-
    // batch laws are: batch-1 assignment is deterministic, and batch 2
    // starts filling exactly where batch 1 stopped — its first doc lands
    // in shard `offset div budget`, never before batch 1's last shard.
    val docs = (1L to 20L).map(i => (i, s"doc$i word$i content"))
    val (d1, d2) = docs.splitAt(12)
    def pack(rows: Seq[(Long, String)], off: Long): DataFrame =
      ShardPack.packByBudget(
        batchDf(rows).withColumn("w", length(col("text")).cast("long"))
          .select("doc_id", "w"), "doc_id", "w", 60L, startOffset = off)

    val p1 = pack(d1, 0L)
    val assign1 = p1.select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    // determinism: a re-run (e.g. a retried task) reproduces batch 1 exactly
    val rerun = pack(d1, 0L).select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(rerun == assign1, "re-packing the same batch must be byte-identical")

    val off = p1.agg(max(col("cum_before") + col("w"))).as[Long].head()
    val p2 = pack(d2, off)
    val shards2 = p2.select("shard_id").as[Long].collect()
    // continuation: the first batch-2 doc lands at offset div budget —
    // the partially-filled last shard of batch 1 keeps filling
    assert(shards2.min == off / 60L, "batch 2 must start at the committed offset")
    assert(shards2.min >= assign1.values.max, "batch 2 landed before the boundary")
    // batch-2 cum_before picks up exactly at the committed total
    assert(p2.agg(min("cum_before")).as[Long].head() == off)
  }
}
