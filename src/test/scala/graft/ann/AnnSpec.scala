package graft.ann

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("cosine of identical vectors is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val c = df.select(Ann.cosine($"a", $"b")).as[Double].head
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    assert(math.abs(df.select(Ann.cosine($"a", $"b")).as[Double].head) < 1e-12)
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val queries = emb.filter($"vec_id" < 3)
    val out = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val counts = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == Set(0L, 1L, 2L))
    assert(counts.values.forall(_ == 5))
    // ranks are 1..5 and cosine non-increasing per query
    val r0 = out.filter($"query_id" === 0).orderBy("rank")
      .select("cosine").as[Double].collect()
    assert(r0.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("srp signature is deterministic") {
    val a = emb.limit(5).select(Ann.srpSignature($"embedding", 8, 0)).as[Long].collect()
    val b = emb.limit(5).select(Ann.srpSignature($"embedding", 8, 0)).as[Long].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("nearDupPairs equals the exact above-threshold pair set") {
    val exact = {
      val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
      val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
      a.crossJoin(b).filter($"id_a" < $"id_b")
        .filter(Ann.cosine($"va", $"vb") >= 0.35)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    val lsh = Ann.nearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, bits = 2, tables = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("nearDupPairs sheds a signature mega-bucket at the default-bounded cap") {
    // 30 clones of one vector land in the same bucket of every table
    val clones = emb.limit(1).select($"embedding")
      .crossJoin(spark.range(30).select($"id".as("vec_id")))
      .select($"vec_id", $"embedding")
    val shed = Ann.nearDupPairs(clones, "vec_id", "embedding",
      threshold = 0.9, bits = 4, tables = 4, maxBucketSize = 10)
    assert(shed.count() == 0, "bucket of 30 must shed at cap 10")
    val kept = Ann.nearDupPairs(clones, "vec_id", "embedding",
      threshold = 0.9, bits = 4, tables = 4)
    assert(kept.count() == 30L * 29 / 2)
  }

  private def clustered = emb.select($"vec_id",
    transform($"embedding".cast("array<double>"),
      (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
        lit(10.0)).otherwise(lit(0.0))).as("embedding"))

  test("ivfTopK equals exact top-k on a clustered corpus") {
    val derived = clustered
    val queries = derived.filter($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(derived, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val ivf = Ann.ivfTopK(derived, queries, "vec_id", "embedding", 10,
      numCells = 16, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(ivf == exact)
  }

  test("ivfTopKIndexed over a persisted index equals the inline ivfTopK") {
    val derived = clustered
    val queries = derived.filter($"vec_id" < 5)
    val model = Ann.ivfTrain(derived, "vec_id", "embedding", numCells = 16)
    val idx = s"${sys.props("java.io.tmpdir")}/graft-test/ivf-index"
    Ann.ivfWriteIndex(derived, "vec_id", "embedding", model, idx)
    val indexed = Ann.ivfTopKIndexed(idx, queries, "vec_id", "embedding",
      k = 10, nprobe = 2, model = model)
    val inline = Ann.ivfTopK(derived, queries, "vec_id", "embedding", 10,
      numCells = 16, nprobe = 2, model = Some(model))
    assert(indexed.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet ==
      inline.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet)
    // the scan is partition-pruned: only the probed cell dirs are read
    val scan = indexed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"expected partition filters on cell:\n$scan")
  }

  test("ivf model: unit centroids, assignment covers only valid cells") {
    val m = Ann.ivfTrain(emb, "vec_id", "embedding", numCells = 8)
    assert(m.centroids.length == 8)
    assert(m.centroids.forall(c =>
      math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
    val cells = emb.select(Ann.assignCell($"embedding", m)).as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 8))
    // deterministic: retraining yields identical centroids
    val m2 = Ann.ivfTrain(emb, "vec_id", "embedding", numCells = 8)
    assert(m.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("lshTopK recalls most of the exact top-k") {
    val queries = emb.filter($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(emb, queries, "vec_id", "embedding", 5,
      bits = 6, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("semanticContamination flags eval members and their near-copies only") {
    val out = Ann.semanticContamination(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      threshold = 0.999)
    // every corpus vector gets exactly one verdict
    assert(out.count() == emb.count())
    val flagged = out.filter(col("contaminated"))
      .select("vec_id").as[Long].collect().toSet
    // the eval vectors themselves are in the corpus: cos=1 with
    // themselves, so all 10 must be flagged
    assert((0L until 10L).forall(flagged.contains), s"missed self-matches: $flagged")
    // at a 0.999 bar, near-nothing else matches in random-ish data
    assert(flagged.size < emb.count() / 10, s"flag rate implausible: ${flagged.size}")
  }

  test("semanticContamination: map-only plan, bounded eval enforced") {
    val plan = Ann.semanticContamination(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 0.9)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"decontam must be one map pass:\n$plan")
    val err = intercept[IllegalArgumentException] {
      Ann.semanticContamination(emb, emb, "vec_id", "embedding", 0.9,
        maxEval = 64)
    }
    assert(err.getMessage.contains("maxEval"))
  }

  test("incremental IVF: init + appends answer exactly like one inline build") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val path = tmpDir("ivf-incr") + "/index"
    Ann.ivfInitIndex(derived.filter($"vec_id" < 250), "vec_id", "v", m, path)
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 1L)
    val queries = derived.filter($"vec_id" < 5)
    val viaIndex = Ann.ivfTopKIndexed(path, queries, "vec_id", "v",
      k = 10, nprobe = 2, Ann.loadModel(spark, path))
    val inline = Ann.ivfTopK(derived, queries, "vec_id", "v",
      k = 10, numCells = 16, nprobe = 2, model = Some(m))
    assert(viaIndex.select("query_id", "neighbor_id", "rank")
      .except(inline.select("query_id", "neighbor_id", "rank")).isEmpty)
    assert(inline.select("query_id", "neighbor_id", "rank")
      .except(viaIndex.select("query_id", "neighbor_id", "rank")).isEmpty)
    // a REPLAYED append republishes its batch partition, never duplicates
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 1L)
    assert(spark.read.parquet(path).count() == 500)
    // the batch=/cell= nested layout still prunes unprobed cells
    val scan = viaIndex.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"incremental index scan must prune on cell:\n${scan.take(500)}")
    // the persisted model round-trips exactly
    val loaded = Ann.loadModel(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      m.centroids.map(_.toSeq).toSeq)
    // appending without a model refuses loudly
    val e = intercept[IllegalArgumentException] {
      Ann.ivfAppendIndex(derived, "vec_id", "v",
        tmpDir("ivf-nomodel"), batchId = 0L)
    }
    assert(e.getMessage.contains("_model.json"), e.getMessage)
  }

  test("SQ8 incremental index: int8 rows, replay-safe, search matches dequantized brute") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val path = tmpDir("ivf-sq8") + "/index"
    Ann.ivfInitIndexSq8(derived.filter($"vec_id" < 250), "vec_id", "v", m, path)
    Ann.ivfAppendIndexSq8(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 1L)
    Ann.ivfAppendIndexSq8(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 1L)
    val idx = spark.read.parquet(path)
    assert(idx.count() == 500, "replay duplicated rows")
    // rows store CODES, not vectors — the 4x-storage contract
    assert(idx.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType))
    assert(!idx.columns.contains("v"))
    val got = Ann.ivfTopKIndexedSq8(path, derived.filter($"vec_id" < 3),
      "vec_id", "v", k = 5, nprobe = 2, Ann.loadModel(spark, path))
    // exact brute top-k over the DEQUANTIZED corpus must agree
    val recon = Quantize.quantizeInt8(derived, "vec_id", "v")
      .select($"vec_id", Quantize.dequantizeInt8Cols(
        $"codes", $"mn", $"mx").as("v"))
    val want = Ann.bruteForceTopK(recon,
      derived.filter($"vec_id" < 3), "vec_id", "v", k = 5)
    assert(got.select("query_id", "neighbor_id", "rank")
      .except(want.select("query_id", "neighbor_id", "rank")).isEmpty)
    assert(want.select("query_id", "neighbor_id", "rank")
      .except(got.select("query_id", "neighbor_id", "rank")).isEmpty)
  }

  test("ivfCompactIndex folds batches; searches identical; folded replays no-op") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val path = tmpDir("ivf-fold") + "/index"
    Ann.ivfInitIndex(derived.filter($"vec_id" < 200), "vec_id", "v", m, path)
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 200 && $"vec_id" < 350),
      "vec_id", "v", path, batchId = 0L)
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 350), "vec_id", "v",
      path, batchId = 1L)
    val queries = derived.filter($"vec_id" < 5)
    def search() = Ann.ivfTopKIndexed(path, queries, "vec_id", "v",
      k = 10, nprobe = 2, Ann.loadModel(spark, path))
      .select("query_id", "neighbor_id", "rank")
    val before = search().collect().toSet

    // fold -1 and 0 (up to 0): two dirs become one under the highest id
    val t0 = Ann.ivfCompactIndex(spark, path, upTo = 0L)
    assert(t0 == 0L)
    val batches = spark.read.parquet(path).select("batch").distinct()
      .as[Long].collect().sorted.toSeq
    assert(batches == Seq(0L, 1L), batches)
    assert(spark.read.parquet(path).count() == 500)
    assert(search().collect().toSet == before)

    // replay of a FOLDED batch id must no-op, not overwrite the fold
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 200 && $"vec_id" < 350),
      "vec_id", "v", path, batchId = 0L)
    assert(spark.read.parquet(path).count() == 500)
    Ann.ivfAppendIndex(derived.filter($"vec_id" < 200), "vec_id", "v",
      path, batchId = -1L)
    assert(spark.read.parquet(path).count() == 500)

    // fold the rest; a new append past the line still lands
    val t1 = Ann.ivfCompactIndex(spark, path, upTo = 99L)
    assert(t1 == 1L)
    assert(spark.read.parquet(path).select("batch").distinct()
      .as[Long].collect().toSeq == Seq(1L))
    assert(search().collect().toSet == before)
    Ann.ivfAppendIndex(derived.filter($"vec_id" < 3).select($"vec_id" + 10000L,
      $"v").toDF("vec_id", "v"), "vec_id", "v", path, batchId = 2L)
    assert(spark.read.parquet(path).count() == 503)

    // nothing left to fold: no-op returns the standing fold line
    assert(Ann.ivfCompactIndex(spark, path, upTo = 1L) == 1L)

    // re-initializing a compacted index in place refuses loudly
    val e = intercept[IllegalArgumentException] {
      Ann.ivfInitIndex(derived, "vec_id", "v", m, path)
    }
    assert(e.getMessage.contains("compacted"), e.getMessage)
  }

  test("a compaction swap that crashed after its marker completes on next use") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val path = tmpDir("ivf-crash") + "/index"
    Ann.ivfInitIndex(derived.filter($"vec_id" < 250), "vec_id", "v", m, path)
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 0L)

    // construct the crash state by hand (the publisher-spec pattern):
    // fold fully staged + pending marker written, swap not yet performed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.option("basePath", path)
      .parquet(s"$path/batch=-1", s"$path/batch=0").drop("batch")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/.compact-0")
    val marker = new org.apache.hadoop.fs.Path(path, "_compaction_pending.json")
    val out = fs.create(marker, true)
    out.write("""{"target":0,"ids":[-1,0]}""".getBytes("UTF-8")); out.close()

    // the next search completes the swap before reading
    val got = Ann.ivfTopKIndexed(path, derived.filter($"vec_id" < 3),
      "vec_id", "v", k = 5, nprobe = 2, Ann.loadModel(spark, path))
    assert(got.count() == 15)
    assert(!fs.exists(marker))
    assert(spark.read.parquet(path).select("batch").distinct()
      .as[Long].collect().toSeq == Seq(0L))
    assert(spark.read.parquet(path).count() == 500)
    // and the fold line now refuses folded replays
    Ann.ivfAppendIndex(derived, "vec_id", "v", path, batchId = -1L)
    assert(spark.read.parquet(path).count() == 500)
  }

  test("ivfCompactIndex folds an SQ8 index preserving the coded row shape") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val path = tmpDir("ivf-fold8") + "/index"
    Ann.ivfInitIndexSq8(derived.filter($"vec_id" < 250), "vec_id", "v", m, path)
    Ann.ivfAppendIndexSq8(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 0L)
    val queries = derived.filter($"vec_id" < 3)
    val before = Ann.ivfTopKIndexedSq8(path, queries, "vec_id", "v",
      k = 5, nprobe = 2, Ann.loadModel(spark, path))
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(Ann.ivfCompactIndex(spark, path, upTo = 0L) == 0L)
    val idx = spark.read.parquet(path)
    assert(idx.count() == 500 && idx.columns.contains("codes"))
    val after = Ann.ivfTopKIndexedSq8(path, queries, "vec_id", "v",
      k = 5, nprobe = 2, Ann.loadModel(spark, path))
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(after == before)
  }

  test("incremental PQ index: codebooks persist, folds, replays, refuses rebuild") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val cb = IvfPq.trainResiduals(derived, "vec_id", "v", m,
      m = 8, k = 16, sampleN = 2000, iters = 5)
    val path = tmpDir("ivf-pq-incr") + "/index"
    Ann.ivfInitIndexPq(derived.filter($"vec_id" < 250), "vec_id", "v",
      m, cb, path)
    Ann.ivfAppendIndexPq(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 0L)
    Ann.ivfAppendIndexPq(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 0L) // replay republishes, never duplicates
    assert(spark.read.parquet(path).count() == 500)
    // codebooks round-trip exactly through _codebooks.json
    val loaded = Ann.loadPqCodebooks(spark, path)
    assert(loaded.m == cb.m && loaded.k == cb.k && loaded.dim == cb.dim)
    assert(loaded.centers.flatMap(_.flatMap(_.toSeq)).toSeq ==
      cb.centers.flatMap(_.flatMap(_.toSeq)).toSeq)
    // indexed ADC == inline ADC with the same codebooks, pre- AND post-fold
    val queries = derived.filter($"vec_id" < 3)
    val inline = IvfPq.adcTopK(IvfPq.encode(derived, "vec_id", "v", m, cb),
      queries, "vec_id", "v", m, cb, topK = 10, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
    def indexed() = Ann.ivfTopKIndexedPq(path, queries, "vec_id", "v",
      k = 10, nprobe = 2).select("query_id", "neighbor_id", "rank")
    assert(indexed().except(inline).isEmpty && inline.except(indexed()).isEmpty)
    assert(Ann.ivfCompactIndex(spark, path, upTo = 0L) == 0L)
    assert(indexed().except(inline).isEmpty && inline.except(indexed()).isEmpty)
    assert(spark.read.parquet(path).count() == 500)
    // a PQ index refuses in-place rebuild (double quantization error)
    val e = intercept[IllegalArgumentException] {
      Ann.ivfRebuildIndex(spark, path, "vec_id", "v", 8, sq8 = false, "r")
    }
    assert(e.getMessage.contains("PQ index"), e.getMessage)
  }

  test("PQ indexed search prunes unprobed cells at the scan") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val cb = IvfPq.trainResiduals(derived, "vec_id", "v", m, m = 8, k = 16)
    val path = tmpDir("ivf-pq-plan") + "/index"
    Ann.ivfInitIndexPq(derived, "vec_id", "v", m, cb, path)
    val plan = Ann.ivfTopKIndexedPq(path, derived.filter($"vec_id" < 2),
      "vec_id", "v", k = 5, nprobe = 2)
      .queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"PQ index scan must prune on cell:\n${plan.take(500)}")
  }

  test("source-corpus rebuild replaces index content for any codec; PQ allowed") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val cb = IvfPq.trainResiduals(derived, "vec_id", "v", m,
      m = 8, k = 16, sampleN = 2000, iters = 5)
    val path = tmpDir("ivf-pq-src") + "/index"
    Ann.ivfInitIndexPq(derived.filter($"vec_id" < 250), "vec_id", "v",
      m, cb, path)
    Ann.ivfAppendIndexPq(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 0L)
    // rebuild from the SOURCE corpus with a fresh 8-cell geometry
    val line = Ann.ivfRebuildIndexFromSource(spark, path, derived,
      "vec_id", "v", numCells = 8, codec = "pq", runId = "src1",
      pqM = 8, pqK = 16)
    assert(line == 0L)
    assert(spark.read.parquet(path).count() == 500)
    assert(Ann.loadModel(spark, path).numCells == 8)
    // consumed-batch replays no-op against the new fold line
    Ann.ivfAppendIndexPq(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 0L)
    assert(spark.read.parquet(path).count() == 500)
    // search works against the rebuilt geometry
    val got = Ann.ivfTopKIndexedPq(path, derived.filter($"vec_id" < 3),
      "vec_id", "v", k = 5, nprobe = 2)
    assert(got.count() == 15)
    // fresh appends past the fold line land, encoded with the NEW books
    Ann.ivfAppendIndexPq(derived.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"), $"v"),
      "vec_id", "v", path, batchId = 1L)
    assert(spark.read.parquet(path).count() == 503)
  }

  test("an externally retrained _model.json invalidates the append cache") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val path = tmpDir("ivf-stale") + "/index"
    val m16 = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    Ann.ivfInitIndex(derived.filter($"vec_id" < 250), "vec_id", "v", m16, path)

    // another process retrains the quantizer IN PLACE (fewer cells so the
    // fingerprint — file length — must change even within one mtime tick)
    val m4 = Ann.ivfTrain(derived, "vec_id", "v", numCells = 4)
    Ann.saveModel(spark, m4, path)

    // a live appender must pick up the new geometry, not assign with the
    // cached 16-cell model and scatter the batch into dead cells
    Ann.ivfAppendIndex(derived.filter($"vec_id" >= 250), "vec_id", "v",
      path, batchId = 1L)
    val cells = spark.read.parquet(s"$path/batch=1")
      .select("cell").distinct().as[Int].collect().toSet
    assert(cells.forall(_ < 4), s"appended with the stale 16-cell model: $cells")
  }

  test("appendDrift flags a batch the trained centroids no longer describe") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val path = tmpDir("ivf-drift") + "/index"
    Ann.ivfInitIndex(derived, "vec_id", "v", m, path)
    // a batch drawn from the same distribution: low drift
    val sameDist = derived.filter($"vec_id" % 7 === 0)
    val low = Ann.appendDrift(spark, path, sameDist, "v").head()
      .getAs[Long]("tv_permille")
    assert(low < 200, s"same-distribution batch drifted $low")
    // a batch confined to 2 of 16 classes: high drift, retrain signal
    val narrow = derived.filter(pmod($"vec_id", lit(16L)) < 2)
    val high = Ann.appendDrift(spark, path, narrow, "v").head()
      .getAs[Long]("tv_permille")
    assert(high > 700, s"narrow batch only drifted $high")
  }

  test("cellDrift: zero for identical corpora, 1000 for disjoint, exact permille between") {
    val derived = emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod($"vec_id", lit(16L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val same = Ann.cellDrift(derived, derived, "v", m).head()
    assert(same.getAs[Long]("tv_permille") == 0L, same)
    // a snapshot that lost some cells entirely: TV = lost mass share
    val cur = derived.filter(pmod($"vec_id", lit(16L)) >= 8)
    val d = Ann.cellDrift(derived, cur, "v", m).head()
    assert(d.getAs[Long]("n_a") == 500L && d.getAs[Long]("n_b") < 500L)
    // dropped classes' mass / total = TV exactly (cur ⊂ ref by whole bins)
    val lost = derived.count() - cur.count()
    assert(d.getAs[Long]("tv_permille") == 1000L * lost / derived.count(), d)
    val disjointA = derived.filter(pmod($"vec_id", lit(16L)) < 8)
    val disjoint = Ann.cellDrift(disjointA, cur, "v", m).head()
    assert(disjoint.getAs[Long]("tv_permille") == 1000L, disjoint)
  }
}
