package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: fixed headline workloads over
  * sys.env("SPARK_GRAFT_SF_DIR"), one JSON result line on stdout.
  *
  * The headline set is held STABLE across rounds (the driver compares each
  * round against the first recorded baseline): a representative slice of
  * scan/project, shuffle-heavy dedup, window aggregation, broadcast
  * anti-join, partitioned write, and the training-data operators
  * (minhash, simhash, text quality, ANN).
  */
object Bench {

  // stable headline workloads; each forced with count()
  val headline: Seq[String] = Seq(
    "q01_project",          // scan + projection pushdown
    "q06_dedup_delta",      // key-shuffle windowed top-1
    "q07_dedup_exact",      // full-row distinct
    "q09_audit_window",     // time-bucket aggregation
    "q10_purge",            // broadcast left_anti
    "q16_partitioned_write",// partitioned parquet write + read-back
    "q21_minhash_pairs",    // shingle/minhash/band join
    "q22_simhash",          // 64-bit vote fold
    "q25_quality_score",    // text quality columns
    "q28_ann_topk",         // brute-force cosine top-k
    "q29_ann_lsh",          // multiprobe SRP-LSH top-k
    // appended round 3 (earlier entries stay comparable across rounds):
    "q36_dup_clusters",     // near-dup pairs -> connected components
    "q43_embed_neardup",    // banded SRP-LSH + exact-cosine verify
    "q44_sessionize",       // keyed gap sessions (1 shuffle)
    "q47_ivf_ann",          // IVF coarse-quantizer probe
    "q56_jdbc_bulk",        // staged JDBC publish (BASELINE.md rec/s figure)
    // appended round 4:
    "q62_grok_wide",        // 7-field grok, single-match GrokStruct
    "q64_ivf_indexed",      // IVF index build + partition-pruned search
    // appended round 6: the distributed star-contraction loop — planner
    // blowups (plan growth per round) surface here as bench deltas
    "q65_components_distributed",
    "q67_incremental_dedup",  // Bloom-prefiltered batch-vs-corpus dedup
    "q70_tfidf_topk",         // explode + two-level agg + windowed top-k
    "q72_decontaminate",      // broadcast semi-join n-gram overlap filter
    "q73_lsh_index_neardup",  // bucketed LSH index build + batch probe
    // appended round 8:
    "q76_config_retention",   // config-store K + broadcast-policy window
    "q77_fs_retention",       // partitioned write + version-find + delete + read-back
    "q79_corpus_mix",         // map-only weighted epoch expansion
    "q81_span_dedup",         // C4 span explode + min-agg + rebuild
    "q85_neardup_keepbest",   // full minhash->verify->components->keep-best
    // appended round 8 (cont.):
    "q87_shard_pack",         // distributed prefix-sum shard assignment
    "q88_token_chunks",       // map-only strided window explode
    "q89_quota_cap",          // two-level salted per-key top-n
    "q90_training_export",    // composed quota->shard->chunk export
    "q91_quality_filter",     // integer-gated Gopher quality filter
    "q92_mix_temperature",    // (n/N)^alpha targets + weight-table mix
    "q93_lm_familiarity",     // char-trigram LM train + broadcast score
    "q95_asof_join",          // single-shuffle as-of (union + forward fill)
    "q96_range_join",         // binned point-in-interval hash join
    // appended round 9:
    "q98_stream_dedup_wm",    // watermark-bounded streaming dedup (real stream path)
    "q99_crypto_roundtrip",   // keystore rotating-AES encrypt+decrypt map pass
    "q100_pq_ann",            // PQ train + byte-encode + ADC top-k
    "q102_dsir_select",       // DSIR hashed-ngram importance top-k
    "q103_semdedup",          // k-means cell-confined embedding dedup
    "q104_bpe_tokens",        // BPE merge training + map-only encode
    "q105_snapshot_replicate",// incremental file-delta replication
    "q107_stream_interval_join", // watermarked stream-stream join
    "q109_split_skew_join",   // broadcast-hot/shuffle-cold split join
    "q110_ccnet_tiers",       // LM familiarity + integer tier cut
    // appended round 9 (cont.):
    "q113_zorder_box",        // z-order write + 2-dim file-skipping probe
    "q114_compact_files",     // small-file audit + salted one-job rewrite
    "q115_gap_fill",          // bucket agg + grid explode + forward fill
    "q116_incremental_agg",   // stored partial state + delta merge
    "q117_stream_outer_join", // watermark-flushed outer interval join
    "q118_snapshot_diff",     // full-outer struct-compare CDC extraction
    "q120_bloom_point",       // per-file bloom build + point-probe skip
    "q126_sliding_window",    // 4x-overlap hopping-window aggregation
    "q128_asof_forward",      // forward as-of (one sort, no join node)
    "q131_repetition_runs",   // map-only consecutive-run fold
    "q134_mv_refresh",        // 3-wave watermark-driven MV refresh
    // appended round 9:
    "q138_cube_report",       // CUBE grouping sets in one exchange
    "q141_heavy_hitters",     // bounded-state Misra-Gries + exact recount
    "q143_funnel_depth",      // 3-stage funnel through one window sort
    "q146_seq_pack",          // distributed prefix sum + sequence explode
    // appended round 11:
    "q168_substring_dedup",   // cross-doc 20-gram fingerprint dedup
    // appended round 13:
    "q176_knn_graph",         // IVF cell-confined all-nodes top-k + probe
    // appended round 14:
    "q185_image_decode",      // real ImageIO PNG encode+decode round-trip
    // appended round 15: the perceptual dedup paths get perf tripwires —
    // a decode-recompute regression (the round-14 weak mark) would be
    // invisible without them
    "q189_image_neardup",     // dHash + banded pairing + components
    "q193_image_incremental_dedup", // Bloom O(batch) image admission
    "q197_video_neardup",     // GIF frame decode + majority fold + components
    // appended round 17: the second real video container — RIFF walk +
    // per-frame JPEG decode; a parser/decode regression surfaces here
    "q237_avi_frames",
    // appended round 18: scale tripwires for the round-17 media paths
    // the sweep set predated — part-hash streaming admission (bucketed
    // committed stores; a store-scan regression shows as a super-linear
    // exponent) and the fps-invariant time-sampled fold
    "q238_stream_part_admission",
    "q240_video_fps_dedup",
    // appended round 18 (cont.): two NEW cost classes — the
    // integer-predictive FLAC decode (bit-level loops; a BitReader
    // regression is invisible to the container tripwires) and the
    // tar-shard pack+stream-read I/O path (rolling shard seal +
    // one-task-per-shard scan)
    "q259_flac_audio",
    "q261_tar_shards")

  /** Driver-side per-batch capture for the streaming headline queries:
    * trigger machinery + sentinel batches dominate their WALL time, so a
    * 2x regression in the join itself would vanish inside it — the
    * per-batch triggerExecution durations are the plan-sensitive
    * number. Events arrive async on the listener bus; [[drain]] is
    * called outside the timed region after the query terminated. */
  private final class BatchCapture
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val d = e.progress.durationMs.get("triggerExecution")
      if (d != null) { buf.add(d.longValue()); () }
    }
    def drain(): Seq[Long] = {
      Thread.sleep(150) // let the async bus settle
      val out = Seq.newBuilder[Long]
      var d = buf.poll()
      while (d != null) { out += d.longValue(); d = buf.poll() }
      out.result()
    }
  }

  /** One timed pass of `selected` over `sfDir` with min-of-`runs`
    * discipline. A failing query must never be recorded as a (fast)
    * time — round 8 published a 0.10 s entry that was an analysis-time
    * failure. Invariant: a query appears in `errors` with NO `times`
    * entry iff every run failed; a flaky query (some runs failed, some
    * passed) keeps its best successful time and carries an explicitly
    * marked "flaky" error entry, so consumers never read an ambiguous
    * record. */
  private def runSet(spark: SparkSession, sfDir: String,
                     selected: Seq[String], runs: Int,
                     capture: BatchCapture)
      : (collection.Map[String, Double], collection.Map[String, String],
         collection.Map[String, Seq[Long]]) = {
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val perBatch = scala.collection.mutable.LinkedHashMap[String, Seq[Long]]()
    selected.foreach { name =>
      val fn = SparkEntry.queries(name)
      capture.drain() // discard anything attributed to earlier queries
      val dts = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        // the timer covers BOTH DataFrame construction and the action:
        // iterative operators (q65) do their looped jobs eagerly at
        // build time, so timing only the action would under-attribute.
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
            System.err.println(s"[bench] FAILED $name: $msg")
            errors(name) = msg
            false
        }
        val t = (System.nanoTime() - t0) / 1e9
        // Each headline query models an independent job; drop the state it
        // pinned (persisted frames, shuffle files) OUTSIDE the timed region
        // so query N's residue doesn't tax query N+1's GC and memory.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        if (ok) Some(t) else None
      }
      val batches = capture.drain()
      if (batches.nonEmpty) perBatch(name) = batches
      if (dts.nonEmpty) {
        times(name) = dts.min
        if (errors.contains(name))
          errors(name) = s"flaky: ${runs - dts.size}/$runs runs failed, " +
            s"timed from a successful run — ${errors(name)}"
      }
    }
    (times, errors, perBatch)
  }

  /** Queries whose per-query scaling exponent is allowed past the
    * ~linear bound, with the documented reason (the sweep flags any
    * OTHER super-linear query as a scale regression). */
  val superlinearAllowed: Map[String, String] = Map(
    "q103_semdedup" -> "cell-confined quadratic pairing (by design)",
    "q65_components_distributed" -> "star-contraction rounds grow with diameter")

  /** 1-minute load average from /proc/loadavg (-1.0 if unreadable).
    * Four consecutive rounds recorded officials inflated 25-150% by
    * concurrent sandbox load; embedding the load makes the record
    * self-describing so a contaminated total impeaches itself. */
  def loadAvg1(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .trim.split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** (machine busy jiffies across all cpus, this JVM's jiffies) from
    * /proc — the inputs for FOREIGN-CPU accounting. The start-load
    * quiet gate cannot see load that arrives mid-run (the round-18
    * official ended at 1-min load 8.94 yet flagged clean, because its
    * start was quiet), and the END load is useless on its own: the
    * bench's own 32 threads push it up. Foreign busy time — total busy
    * minus this process — is load the bench did NOT cause, measured
    * over the whole run. iowait/idle are excluded from "busy". */
  def cpuSnap(): Option[(Long, Long)] =
    try {
      val cpu = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
      // user nice system idle iowait irq softirq steal ...
      val busy = cpu(0) + cpu(1) + cpu(2) + cpu(5) + cpu(6) +
        (if (cpu.length > 7) cpu(7) else 0L)
      val self = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/self/stat"))
        .split(" ")
      Some((busy, self(13).toLong + self(14).toLong))
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // QUIET GATE: refuse-and-retry instead of annotate-and-run. Six
    // straight rounds recorded load-contaminated officials; waiting out
    // foreign load (poll /proc/loadavg, bounded by
    // SPARK_GRAFT_LOAD_WAIT_SECS, default 600, 0 disables) makes the
    // recorded numbers comparable across rounds. If the machine never
    // quiets within the budget the run proceeds and the JSON still
    // carries load_contaminated=true — a bench that never runs is worse
    // than an impeached one.
    val waitBudgetSecs =
      sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_SECS", "600").toLong
    var loadAtStart = loadAvg1()
    val waitDeadline = System.nanoTime + waitBudgetSecs * 1000000000L
    while (loadAtStart > 2.0 && System.nanoTime < waitDeadline) {
      System.err.println(f"[bench] 1-min load $loadAtStart%.2f > 2 — " +
        "waiting for a quiet machine (SPARK_GRAFT_LOAD_WAIT_SECS=" +
        s"$waitBudgetSecs)")
      Thread.sleep(15000)
      loadAtStart = loadAvg1()
    }
    if (loadAtStart > 2.0)
      System.err.println(f"[bench] WARNING: 1-min load $loadAtStart%.2f > 2 after " +
        "the wait budget — timings will be recorded as load_contaminated")
    val cpuAtStart = cpuSnap()
    val wallStartNs = System.nanoTime()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val capture = new BatchCapture
    spark.streams.addListener(capture)

    // warm up the JVM/codegen paths outside the timed region (a warm-up
    // failure is not fatal — the per-query loop will surface the error)
    try SparkEntry.queries("q01_project")(spark, sfDir).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}") }

    // SPARK_GRAFT_ONLY=q21_minhash_pairs,q43_... narrows the run for
    // local iteration; the driver never sets it, so recorded rounds
    // always cover the full stable headline set
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(_.diff(headline.toSet).foreach(bad =>
      System.err.println(s"[bench] SPARK_GRAFT_ONLY name matches no headline query: $bad")))
    val selected = only.fold(headline)(f => headline.filter(f))

    // Sandbox contention has repeatedly inflated single-shot timings by
    // 2-4x (BENCH_r04/r06/r07 all recorded one-off spikes that re-ran at
    // a fraction of the recorded time in isolation). Run each query
    // SPARK_GRAFT_BENCH_RUNS times (default 2) and record the minimum:
    // the min is the contention-free estimate of plan cost, which is what
    // round-over-round comparison needs.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(2).max(1)

    val (times, errors, perBatch) = runSet(spark, sfDir, selected, runs, capture)

    // Scale sweep: a 2x-of-first-light bound cannot catch super-linear
    // growth. When benching sf0.1, also time the set at sf0.01 and emit
    // each query's scaling exponent log10(t_0.1 / t_0.01) — the closest
    // in-sandbox proxy for "would this survive 100x". ~1.0 = linear in
    // data; markedly above (> 1.3) without a documented reason
    // (superlinearAllowed) is flagged. Small sf0.01 times carry fixed
    // per-job overhead, which UNDERstates exponents — a flagged query
    // is therefore all the more real. SPARK_GRAFT_SCALE_SWEEP=0 skips.
    val sweepDir = sfDir.replaceAll("sf0\\.1/?$", "sf0.01")
    val doSweep = sys.env.getOrElse("SPARK_GRAFT_SCALE_SWEEP", "1") != "0" &&
      sweepDir != sfDir && new java.io.File(sweepDir).isDirectory
    val (sweepTimes, exponents) = if (doSweep) {
      val (st, serr, _) = runSet(spark, sweepDir, selected, runs, capture)
      if (serr.nonEmpty)
        System.err.println(s"[bench] sweep failures (exponent omitted): ${serr.keys.mkString(", ")}")
      val ex = times.flatMap { case (q, t1) =>
        st.get(q).filter(_ > 0).map(t01 => q -> math.log10(t1 / t01))
      }
      (st, ex)
    } else (Map.empty[String, Double], Map.empty[String, Double])
    val superlinear = exponents.collect {
      case (q, e) if e > 1.3 && !superlinearAllowed.contains(q) => q
    }.toSeq.sorted
    if (superlinear.nonEmpty)
      System.err.println(s"[bench] SUPER-LINEAR without documented reason: ${superlinear.mkString(", ")}")

    def jstr(s: String): String = JsonUtil.jstr(s)
    def numMap(m: collection.Map[String, Double], fmt: Double => String): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val qs = numMap(times, _.toString)
    val errs = errors.map { case (k, v) => "\"" + k + "\":" + jstr(v) }
      .mkString("{", ",", "}")
    val exps = numMap(exponents, e => f"$e%.3f")
    val sweeps = numMap(sweepTimes, _.toString)
    val batches = perBatch.map { case (k, ds) =>
      "\"" + k + "\":{\"batches\":" + ds.size + ",\"sumMs\":" + ds.sum +
        ",\"maxMs\":" + (if (ds.isEmpty) 0L else ds.max) + "}"
    }.mkString("{", ",", "}")
    val superJson = superlinear.map(jstr).mkString("[", ",", "]")
    val total = times.values.sum
    // Contamination = quiet gate failed at START, or FOREIGN CPU ran
    // during the run: total busy cpu-seconds minus this JVM's own,
    // averaged over the wall — the end 1-min load alone cannot tell
    // foreign load from the bench's own threads, but foreign busy time
    // can (round 18's official ended at load 8.94 and still flagged
    // clean because only the start was gated). Threshold 1.5 cores:
    // the sbt launcher and kernel writeback of the bench's own output
    // sit well under it; a concurrent sandbox job does not.
    val loadAtEnd = loadAvg1()
    val elapsedSec = (System.nanoTime() - wallStartNs) / 1e9
    val hz = 100.0 // kernel USER_HZ; /proc jiffies are reported at 100/s
    val foreignCores = (for {
      (b0, s0) <- cpuAtStart
      (b1, s1) <- cpuSnap()
    } yield (((b1 - b0) - (s1 - s0)) / hz / elapsedSec).max(0.0))
      .getOrElse(-1.0)
    val contaminated = loadAtStart > 2.0 || foreignCores > 1.5
    if (foreignCores > 1.5)
      System.err.println(f"[bench] WARNING: foreign load averaged " +
        f"$foreignCores%.2f cpu cores during the run — recording " +
        "load_contaminated")
    val loadJson = f""","load1_start":$loadAtStart%.2f,"load1_end":$loadAtEnd%.2f,"foreign_cpu_cores":$foreignCores%.2f,"load_contaminated":$contaminated"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"$loadJson""" +
      (if (doSweep) s""","sweep_sf":${jstr(sweepDir)},"sweep_queries":$sweeps,"exponents":$exps,"superlinear":$superJson""" else "") +
      s""","perBatchMs":$batches}"""
    println(line)
    // the full artifact also lands in a file: round 9's driver capture
    // truncated the stdout JSON (q01-q06 timings lost, parsed: null)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    // Capture-proof FINAL line: the driver keeps only a bounded tail of
    // stdout, and the full artifact above (63+ queries x FIVE maps:
    // queries/errors/sweep/exponents/perBatch, ~8-10 KB) has overflowed
    // it two rounds running (BENCH_r10/r11 `parsed: null`). Emit a
    // summary — same core schema (metric/value/unit/queries/sf) so the
    // driver's parser accepts it, `queries` restricted to the top-10 by
    // time, PLUS `full_queries`: the complete per-query map at 2-decimal
    // precision (~1.8 KB for ~70 queries — one map, not five, so it fits
    // where the round-10 full line did not). The round-16 judge could
    // not diff 58 of 68 queries because only the top-10 survived into
    // the recorded artifact; full_queries closes that.
    val top10 = times.toSeq.sortBy(-_._2).take(10)
    val maxBatchMs = perBatch.values.flatten.foldLeft(0L)(_ max _)
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","queries":${
        numMap(collection.mutable.LinkedHashMap(top10: _*), t => f"$t%.3f")
      },"full_queries":${numMap(times, t => f"$t%.2f")
      },"sf":"$sfDir","n_queries":${times.size},"n_errors":${errors.size},"superlinear":$superJson,"maxPerBatchMs":$maxBatchMs$loadJson,"full_artifact":${jstr(outPath)}}"""
    println(compact)
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
