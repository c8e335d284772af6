package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{DupClusters, MinHashDedup}

/** Dev tool: scale the near-dup/ANN pipelines beyond the test SFs by
  * replicating the input K times with shifted ids, and time each stage.
  * Usage:
  *   runMain graft.ScaleProbe <sfDir> <replication> [docs|embed]
  * docs mode (default): replicate documents (true near-dup pairs grow
  * ~K^2 within each content group — a stress test for bucket skew, not
  * just volume). embed mode: replicate embeddings with a small
  * deterministic per-replica perturbation (plants K-sized near-dup
  * groups) and time SRP-banded near-dup pairs + IVF build/search.
  * events mode: replicate events with UNSHIFTED user ids, so per-key
  * history deepens K× — the stress profile of the temporal joins
  * (as-of sort/fill per key) and sessionization, not just row volume.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 4
    val mode = if (args.length > 2) args(2) else "docs"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "embed") { embedProbe(spark, sfDir, k, cpus.toInt); return }
    if (mode == "events") { eventsProbe(spark, sfDir, k, cpus.toInt); return }

    val base = Tables.load(spark, sfDir, "documents")
    val n0 = base.count()
    val docs = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
        col("text"), col("source"), col("n_chars"))).reduce(_ union _)
      .repartition(cpus.toInt).persist()
    val n = docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val cands = MinHashDedup.candidatePairs(docs, "doc_id", "text",
      n = 3, k = 32, numBands = 16).persist()
    val nc = time(s"candidates over $n docs (${k}x of $n0)")(cands.count())
    val verified = MinHashDedup.verifyShingleJaccard(
      cands, docs, "doc_id", "text", n = 3, threshold = 0.5).persist()
    val nv = time("exact verify")(verified.count())
    val clusters = time("cluster resolution")(
      DupClusters.resolve(docs, "doc_id", verified.select("id_a", "id_b"))
        .agg(countDistinct(col("cluster_id"))).head().getLong(0))
    val keepBest = time("keep-best survivors")(
      DupClusters.survivorsBy(
        docs.withColumn("n_chars", length(col("text"))), "doc_id",
        verified.select("id_a", "id_b"), col("n_chars")).count())
    val spans = time("C4 span dedup (corpus-wide)")(
      graft.text.SpanDedup.dedupSpans(docs, "doc_id", "text", 8).count())
    val inDoc = time("within-doc span dedup (map-only)")(
      graft.text.SpanDedup.dedupSpansWithinDoc(docs, "doc_id", "text", 3)
        .count())
    // layout stages: distributed prefix-sum shard packing, two-level
    // salted quota cap, map-only strided chunking — the post-dedup half
    // of the pipeline, probed at the same K-times scale
    val shards = time("shard pack (distributed prefix sum)")(
      graft.text.ShardPack.packByBudget(docs, "doc_id", "n_chars",
        budget = 100000L).agg(max(col("shard_id"))).head().getLong(0) + 1)
    val capped = time("quota cap 1000/source (two-level salted top-n)")(
      graft.operators.QuotaCap.capPerKey(docs, "source", "doc_id",
        n = 1000).count())
    val chunks = time("token chunks seqLen=64 stride=48 (map-only)")(
      graft.text.Chunker.chunkByTokens(docs, "text", 64, 48).count())
    println(s"[scaleprobe] docs=$n candidates=$nc verified=$nv " +
      s"clusters=$clusters keep_best=$keepBest span_docs=$spans " +
      s"indoc_docs=$inDoc shards=$shards quota_kept=$capped " +
      s"chunks=$chunks")
    spark.stop()
  }

  /** Temporal-join probe: K event replicas with the SAME user ids (per-key
    * history deepens K×; event ids stay unique). Times the as-of
    * forward-fill, the binned range join, and gap sessionization. */
  private def eventsProbe(spark: SparkSession, sfDir: String, k: Int,
                          cpus: Int): Unit = {
    import graft.operators.{Sessionize, TemporalJoin}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val base = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val ev = (0 until k).map(i =>
      base.select((col("event_id") + lit(i.toLong * 100_000_000L)).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value")))
      .reduce(_ union _).repartition(cpus).persist()
    val n = ev.count()
    // replicas share (user, ts): the (key, ts) grouping dedups them, so
    // the right side stays deterministic at any K
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(max(col("value")).as("pval"))
    val asof = time(s"asOf over $n events (per-key history ${k}x)")(
      TemporalJoin.asOf(ev.select("event_id", "user_id", "ts"), purchases,
        Seq("user_id"), "ts", "pts").count())
    val wins = ev.groupBy(date_trunc("hour", col("ts")).as("ws"))
      .agg(count(lit(1)).as("nn"))
      .orderBy(col("nn").desc, col("ws")).limit(100)
      .select((col("ws") + expr("INTERVAL 10 MINUTES")).as("win_start"),
        (col("ws") + expr("INTERVAL 50 MINUTES")).as("win_end"))
    val ranged = time("pointInRange vs top-100 busy-hour cores")(
      TemporalJoin.pointInRange(ev.select("event_id", "ts"), "ts",
        wins, "win_start", "win_end", binSeconds = 1800).count())
    val sessions = time("gap sessionization 30m")(
      Sessionize.gapSessions(ev, "user_id", "ts", "30 minutes").count())
    println(s"[scaleprobe] events=$n asof_rows=$asof range_rows=$ranged " +
      s"sessions=$sessions")
    spark.stop()
  }

  /** Embedding-space probe: K perturbed replicas -> banded near-dup pairs
    * (threshold 0.9, planted groups of size K) and IVF train/assign/search. */
  private def embedProbe(spark: SparkSession, sfDir: String, k: Int,
                         cpus: Int): Unit = {
    import graft.ann.Ann
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = (0 until k).map(i =>
      base.select((col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
        transform(col("embedding"), (x, p) =>
          x * (lit(1.0) + lit(0.002 * i) *
            (pmod(p.cast("bigint"), lit(7L)) - lit(3L)).cast("double")))
          .as("embedding"))).reduce(_ union _)
      .repartition(cpus).persist()
    val n = corpus.count()
    val pairs = time(s"neardup pairs over $n vectors")(
      Ann.nearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, bits = 8, tables = 8).count())
    val model = time("ivf train (sampled spherical k-means)")(
      Ann.ivfTrain(corpus, "vec_id", "embedding", numCells = 64))
    val assigned = time("ivf assign (map-only corpus pass)")(
      corpus.select(Ann.assignCell(col("embedding"), model)).count())
    val hits = time("ivf search 100 queries, nprobe=8")(
      Ann.ivfTopK(corpus, corpus.filter(col("vec_id") < 100), "vec_id",
        "embedding", k = 10, numCells = 64, nprobe = 8,
        model = Some(model)).count())
    val quantized = time("int8 quantize (map-only)")(
      graft.ann.Quantize.quantizeInt8(corpus, "vec_id", "embedding").count())
    // PQ: train stays O(sampleN·k·D) on the driver regardless of corpus
    // size; encode and ADC are map-only corpus passes — the probe shows
    // all three flat-lining against K
    val cb = time("pq train (bounded driver sample)")(
      graft.ann.Pq.train(corpus, "vec_id", "embedding", m = 8, k = 64,
        sampleN = 5000, iters = 8))
    val encoded = graft.ann.Pq.encode(corpus, "vec_id", "embedding", cb)
      .persist()
    val nEnc = time("pq encode (map-only, m bytes/vector)")(encoded.count())
    val adc = time("pq ADC search 100 queries (broadcast LUTs)")(
      graft.ann.Pq.adcTopK(encoded, corpus.filter(col("vec_id") < 100),
        "vec_id", "embedding", cb, topK = 10).count())
    // composed IVF-ADC: residual codebooks + cell-pruned ADC — the scan
    // touches nprobe/numCells of the corpus however large K grows
    val rcb = time("ivfpq train residual codebooks")(
      graft.ann.IvfPq.trainResiduals(corpus, "vec_id", "embedding", model,
        m = 8, k = 64, sampleN = 5000, iters = 8))
    val ivfEnc = graft.ann.IvfPq.encode(corpus, "vec_id", "embedding",
      model, rcb).persist()
    val nIvfEnc = time("ivfpq encode (cell + residual code)")(ivfEnc.count())
    val ivfAdc = time("ivfpq ADC search 100 queries, nprobe=8")(
      graft.ann.IvfPq.adcTopK(ivfEnc, corpus.filter(col("vec_id") < 100),
        "vec_id", "embedding", model, rcb, topK = 10, nprobe = 8).count())
    println(s"[scaleprobe] vectors=$n neardup_pairs=$pairs " +
      s"assigned=$assigned ivf_hits=$hits quantized=$quantized " +
      s"pq_encoded=$nEnc pq_adc_hits=$adc ivfpq_encoded=$nIvfEnc " +
      s"ivfpq_hits=$ivfAdc")
    spark.stop()
  }
}
