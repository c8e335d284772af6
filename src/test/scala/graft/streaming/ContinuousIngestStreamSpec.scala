package graft.streaming

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

class ContinuousIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Three arrival files with in-batch dups, cross-batch redelivery, and
    * one pure-redelivery batch; modtimes pin the pickup order. */
  private def writeArrivals(inDir: String): Unit = {
    val files = Seq(
      Seq(1L -> "aaaa bbbb", 2L -> "cccc dddd", 3L -> "aaaa bbbb"),
      Seq(4L -> "cccc dddd", 5L -> "eeee ffff", 6L -> "gggg hhhh"),
      Seq(7L -> "aaaa bbbb", 8L -> "eeee ffff"))
    files.zipWithIndex.foreach { case (rows, i) =>
      val part = s"$inDir/f$i"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(part)
      new File(part).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }
  }

  private def runIngest(inDir: String, stateDir: String, outDir: String,
                        ckpt: String): Unit = {
    val stream = Streams.fileReplay(spark, s"$inDir/*", schema)
    val q = ContinuousIngest.start(stream, "doc_id", "text", budget = 40L,
      stateDir, outDir, ckpt)
    q.awaitTermination()
  }

  test("streamed dedup->pack: exactly-once content, contiguous shards") {
    val in = tmpDir("ci-in"); val state = tmpDir("ci-state")
    val out = tmpDir("ci-out"); val ckpt = tmpDir("ci-ckpt")
    writeArrivals(in)
    runIngest(in, state, out, ckpt)

    val packed = spark.read.parquet(out)
    // 4 distinct contents exist across all arrivals -> exactly 4 rows
    assert(packed.count() == 4)
    assert(packed.select("text").as[String].collect().toSet ==
      Set("aaaa bbbb", "cccc dddd", "eeee ffff", "gggg hhhh"))
    // in-batch dup collapsed to min id; redeliveries never re-entered
    assert(packed.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 5L, 6L))
    // shard sequence contiguous from 0 across micro-batches
    val shards = packed.select("shard_id").as[Long].collect().sorted
    assert(shards.head == 0L && shards.distinct.toSeq == (0L to shards.max))
    // the pure-redelivery batch emitted nothing but still committed state
    assert(spark.read.parquet(s"$out/batch_id=2").isEmpty)
    val off = spark.read.parquet(s"$state/off")
    assert(off.count() == 3)
    val offs = off.orderBy("batch_id").select("off").as[Long].collect()
    assert(offs(1) == offs(2), "an all-dup batch must not advance the offset")
    assert(offs(2) == packed.agg(sum("w")).as[Long].head())
  }

  test("restart with the same checkpoint is a no-op; checkpoint loss replays identically") {
    val in = tmpDir("ci2-in"); val state = tmpDir("ci2-state")
    val out = tmpDir("ci2-out"); val ckpt = tmpDir("ci2-ckpt")
    writeArrivals(in)
    runIngest(in, state, out, ckpt)
    val first = spark.read.parquet(out)
      .select("doc_id", "text", "shard_id").as[(Long, String, Long)]
      .collect().sortBy(_._1)

    // restart, same checkpoint: no new work, nothing changes
    runIngest(in, state, out, ckpt)
    val second = spark.read.parquet(out)
      .select("doc_id", "text", "shard_id").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(second.sameElements(first))

    // checkpoint lost: every batch replays against the surviving state
    // dirs and must overwrite batch_id=N with byte-identical rows —
    // the exactly-once-by-determinism claim, end to end
    val ckpt2 = tmpDir("ci2-ckpt-b")
    runIngest(in, state, out, ckpt2)
    val third = spark.read.parquet(out)
      .select("doc_id", "text", "shard_id").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(third.sameElements(first))
    assert(spark.read.parquet(s"$state/off").count() == 3,
      "replay must overwrite, not append, its state partitions")
  }

  test("substring pass: batch N scrubs passages committed in batch N-1, replay-idempotent") {
    val in = tmpDir("ci3-in"); val state = tmpDir("ci3-state")
    val out = tmpDir("ci3-out"); val ckpt = tmpDir("ci3-ckpt")
    // b0: doc 1 novel. b1: doc 11 quotes doc 1's "p q r s t" passage
    // (cross-BATCH, via the committed gram index); doc 13 shares a
    // window with lower-id doc 12 (within-batch keeper rule). b2:
    // doc 21 quotes "k1 k2 k3" — a passage first COMMITTED by batch 1
    // (doc 12's published text), proving the index advances per batch.
    val files = Seq(
      Seq(1L -> "p q r s t u v w x y"),
      Seq(11L -> "m n o p q r s t z1 z2", 12L -> "k1 k2 k3 k4",
        13L -> "h1 k2 k3 k4"),
      Seq(21L -> "a1 a2 k1 k2 k3 b1"))
    files.zipWithIndex.foreach { case (rows, i) =>
      val part = s"$in/f$i"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(part)
      new File(part).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }
    def run(ck: String): Unit = {
      val stream = Streams.fileReplay(spark, s"$in/*", schema)
      val q = ContinuousIngest.start(stream, "doc_id", "text", budget = 60L,
        state, out, ck, substringW = Some(3))
      q.awaitTermination()
    }
    run(ckpt)
    def published = spark.read.parquet(out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val first = published
    assert(first == Map(
      1L -> "p q r s t u v w x y",  // keeper: untouched
      11L -> "m n o z1 z2",         // committed passage scrubbed
      12L -> "k1 k2 k3 k4",         // within-batch keeper: untouched
      13L -> "h1",                  // within-batch dup window scrubbed
      21L -> "a1 a2 b1"),           // passage committed by batch 1 scrubbed
      first)
    // the gram index advanced once per batch
    assert(spark.read.parquet(s"$state/grams")
      .select("batch_id").distinct().count() == 3)
    // checkpoint loss: replay against surviving state is byte-identical
    run(tmpDir("ci3-ckpt-b"))
    assert(published == first, "replay must be idempotent")
  }

  test("scrub seams create no phantom grams: the index carries pre-scrub text") {
    val in = tmpDir("ci4-in"); val state = tmpDir("ci4-state")
    val out = tmpDir("ci4-out"); val ckpt = tmpDir("ci4-ckpt")
    // b0 commits doc 1. b1's doc 11 quotes its "a b c d e f" passage,
    // which is scrubbed out, publishing "x y z q r s" — a seam between
    // 'z' and 'q'. Indexing the PUBLISHED text would mint phantom grams
    // ("y z q", "z q r") that never co-occurred in any source document.
    // b2's doc 21 legitimately contains "y z q": it must survive intact,
    // matching what batch-mode SubstringDedup.clean would do (where
    // "y z q" is globally unique).
    val files = Seq(
      Seq(1L -> "a b c d e f"),
      Seq(11L -> "x y z a b c d e f q r s"),
      Seq(21L -> "m1 y z q m2"))
    files.zipWithIndex.foreach { case (rows, i) =>
      val part = s"$in/f$i"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(part)
      new File(part).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val stream = Streams.fileReplay(spark, s"$in/*", schema)
    val q = ContinuousIngest.start(stream, "doc_id", "text", budget = 60L,
      state, out, ckpt, substringW = Some(3))
    q.awaitTermination()
    val published = spark.read.parquet(out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(published == Map(
      1L -> "a b c d e f",
      11L -> "x y z q r s",   // the committed passage scrubbed
      21L -> "m1 y z q m2"),  // NOT scrubbed by a phantom seam gram
      published)
  }
}
