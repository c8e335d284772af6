package graft.streaming

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.{SparkSpec, Tables}
import graft.ann.Ann

class VectorIndexIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(FloatType))))

  /** q47-style separable corpus split into a bootstrap + 2 arrivals. */
  private def derived = Tables.load(spark, sf, "embeddings")
    .select($"vec_id", transform($"embedding".cast("array<double>"),
      (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
        lit(10.0)).otherwise(lit(0.0))).as("vd"))
    .select($"vec_id", $"vd".cast("array<float>").as("v"))

  private def writeArrivals(inDir: String): Unit =
    Seq(($"vec_id" >= 200L && $"vec_id" < 350L, 0),
        ($"vec_id" >= 350L, 1)).foreach { case (pred, i) =>
      val part = s"$inDir/f$i"
      derived.filter(pred).coalesce(1).write.parquet(part)
      new File(part).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }

  test("streamed appends = one inline build; checkpoint-loss replay never duplicates") {
    val in = tmpDir("vii-in"); val idx = tmpDir("vii-idx") + "/index"
    writeArrivals(in)
    // bootstrap: model trained on the head, persisted with batch -1
    val boot = derived.filter($"vec_id" < 200L)
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    Ann.ivfInitIndex(boot, "vec_id", "v", m, idx)

    def run(ckpt: String): Unit = {
      val q = VectorIndexIngest.start(
        Streams.fileReplay(spark, s"$in/*", schema),
        "vec_id", "v", idx, ckpt)
      q.awaitTermination()
    }
    val ckptA = tmpDir("vii-ckpt-a")
    run(ckptA)
    assert(spark.read.parquet(idx).count() == 500)
    // streamed batches landed in their own partitions, bootstrap intact
    val batches = spark.read.parquet(idx).select("batch").distinct()
      .as[Long].collect().sorted.toSeq
    assert(batches == Seq(-1L, 0L, 1L), batches)

    // mid-stream search answers EXACTLY like an inline build
    val queries = derived.filter($"vec_id" < 5)
    val viaIndex = Ann.ivfTopKIndexed(idx, queries, "vec_id", "v",
      k = 10, nprobe = 2, Ann.loadModel(spark, idx))
    val inline = Ann.ivfTopK(derived, queries, "vec_id", "v",
      k = 10, numCells = 16, nprobe = 2, model = Some(m))
    assert(viaIndex.select("query_id", "neighbor_id", "rank")
      .except(inline.select("query_id", "neighbor_id", "rank")).isEmpty)
    assert(inline.select("query_id", "neighbor_id", "rank")
      .except(viaIndex.select("query_id", "neighbor_id", "rank")).isEmpty)

    // SAME checkpoint restart: identity matches, appends proceed (no-op
    // here — AvailableNow already drained the input)
    run(ckptA)
    assert(spark.read.parquet(idx).count() == 500)

    // a DIFFERENT checkpoint restarts batch ids at 0 — its "batch 0" is
    // NOT a replay of ours, so the index REFUSES rather than silently
    // overwriting committed partitions
    val e = intercept[IllegalArgumentException] { run(tmpDir("vii-ckpt-b")) }
    assert(e.getMessage.contains("bound to checkpoint"), e.getMessage)
    assert(spark.read.parquet(idx).count() == 500)

    // explicit rebind (delete _stream.json): the replay re-delivers the
    // same files under the same batch ids — partitions republish
    // byte-identically, nothing duplicates
    new File(s"$idx/_stream.json").delete()
    val ckptC = tmpDir("vii-ckpt-c")
    run(ckptC)
    assert(spark.read.parquet(idx).count() == 500)

    // deleted-checkpoint detection: the binding survives but the
    // checkpoint's metadata is gone — refused until rebound
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit
    }
    rm(new File(ckptC))
    val e2 = intercept[IllegalArgumentException] { run(ckptC) }
    assert(e2.getMessage.contains("no metadata"), e2.getMessage)
  }

  test("pq streaming appends build a PQ index whose search matches inline ADC") {
    import graft.ann.IvfPq
    val in = tmpDir("viipq-in"); val idx = tmpDir("viipq-idx") + "/index"
    writeArrivals(in)
    val boot = derived.filter($"vec_id" < 200L)
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val cb = IvfPq.trainResiduals(derived, "vec_id", "v", m,
      m = 8, k = 16, sampleN = 2000, iters = 5)
    Ann.ivfInitIndexPq(boot, "vec_id", "v", m, cb, idx)
    val q = VectorIndexIngest.start(
      Streams.fileReplay(spark, s"$in/*", schema),
      "vec_id", "v", idx, tmpDir("viipq-ckpt"), codec = "pq")
    q.awaitTermination()
    val stored = spark.read.parquet(idx)
    assert(stored.count() == 500 && stored.columns.contains("pq_code"))
    val queries = derived.filter($"vec_id" < 3)
    val got = Ann.ivfTopKIndexedPq(idx, queries, "vec_id", "v",
      k = 5, nprobe = 2).select("query_id", "neighbor_id", "rank")
    val want = IvfPq.adcTopK(IvfPq.encode(derived, "vec_id", "v", m, cb),
      queries, "vec_id", "v", m, cb, topK = 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // unknown codec refuses before any stream starts
    val e = intercept[IllegalArgumentException] {
      VectorIndexIngest.start(Streams.fileReplay(spark, s"$in/*", schema),
        "vec_id", "v", idx, tmpDir("viipq-ckpt2"), codec = "zstd")
    }
    assert(e.getMessage.contains("unknown index codec"), e.getMessage)
  }

  test("compactEvery folds on cadence: bounded dirs, identical search, folded replay no-ops") {
    val in = tmpDir("viic-in"); val idx = tmpDir("viic-idx") + "/index"
    // 10 single-file arrivals of 30 vectors each (ids 200..499)
    (0 until 10).foreach { i =>
      val part = s"$in/f$i"
      derived.filter($"vec_id" >= 200L + i * 30L && $"vec_id" < 230L + i * 30L)
        .coalesce(1).write.parquet(part)
      new File(part).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val boot = derived.filter($"vec_id" < 200L)
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    Ann.ivfInitIndex(boot, "vec_id", "v", m, idx)
    val q = VectorIndexIngest.start(
      Streams.fileReplay(spark, s"$in/*", schema),
      "vec_id", "v", idx, tmpDir("viic-ckpt"), compactEvery = 4)
    q.awaitTermination()
    assert(spark.read.parquet(idx).count() == 500)
    // folds fired at batches 4 (upTo 3) and 8 (upTo 7): the manifest is
    // bounded at {fold(7), 8, 9} instead of 11 per-batch dirs
    val batches = spark.read.parquet(idx).select("batch").distinct()
      .as[Long].collect().sorted.toSeq
    assert(batches == Seq(7L, 8L, 9L), batches)
    // searches over the folded index answer EXACTLY like an inline build
    val queries = derived.filter($"vec_id" < 5)
    val viaIndex = Ann.ivfTopKIndexed(idx, queries, "vec_id", "v",
      k = 10, nprobe = 2, Ann.loadModel(spark, idx))
    val inline = Ann.ivfTopK(derived, queries, "vec_id", "v",
      k = 10, numCells = 16, nprobe = 2, model = Some(m))
    assert(viaIndex.select("query_id", "neighbor_id", "rank")
      .except(inline.select("query_id", "neighbor_id", "rank")).isEmpty)
    assert(inline.select("query_id", "neighbor_id", "rank")
      .except(viaIndex.select("query_id", "neighbor_id", "rank")).isEmpty)
    // a replay of any FOLDED batch id no-ops against the fold line
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 200L && $"vec_id" < 230L),
      "vec_id", "v", idx, batchId = 0L)
    assert(spark.read.parquet(idx).count() == 500,
      "replay of a folded batch id must no-op, not duplicate")
    // keepOut < 1 refuses before any stream starts
    val e = intercept[IllegalArgumentException] {
      VectorIndexIngest.start(Streams.fileReplay(spark, s"$in/*", schema),
        "vec_id", "v", idx, tmpDir("viic-ckpt2"), compactEvery = 4,
        keepOut = 0)
    }
    assert(e.getMessage.contains("keepOut"), e.getMessage)
  }

  test("sq8 streaming appends build a compressed index that searches correctly") {
    val in = tmpDir("vii8-in"); val idx = tmpDir("vii8-idx") + "/index"
    writeArrivals(in)
    val boot = derived.filter($"vec_id" < 200L)
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    Ann.ivfInitIndexSq8(boot, "vec_id", "v", m, idx)
    val q = VectorIndexIngest.start(
      Streams.fileReplay(spark, s"$in/*", schema),
      "vec_id", "v", idx, tmpDir("vii8-ckpt"), sq8 = true)
    q.awaitTermination()
    val stored = spark.read.parquet(idx)
    assert(stored.count() == 500 && stored.columns.contains("codes") &&
      !stored.columns.contains("v"))
    // search parity with the dequantized brute force, mid-lifecycle
    val queries = derived.filter($"vec_id" < 3)
    val got = Ann.ivfTopKIndexedSq8(idx, queries, "vec_id", "v",
      k = 5, nprobe = 2, Ann.loadModel(spark, idx))
    val recon = graft.ann.Quantize.quantizeInt8(derived, "vec_id", "v")
      .select($"vec_id", graft.ann.Quantize.dequantizeInt8Cols(
        $"codes", $"mn", $"mx").as("v"))
    val want = Ann.bruteForceTopK(recon, queries, "vec_id", "v", k = 5)
    assert(got.select("query_id", "neighbor_id", "rank")
      .except(want.select("query_id", "neighbor_id", "rank")).isEmpty)
  }
}
