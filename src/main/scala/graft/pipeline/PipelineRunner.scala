package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.metrics.{DatasetDescriptor, EventStore, LineageCollector, MetricContext, MetricRecord, MetricStore}
import graft.operators.{Fork, Quality}
import graft.sinks.AtomicPublisher
import graft.state.StateStore

/** Executes a [[PipelineSpec]] — the engine's AbstractJobLauncher.launchJob
  * (gobblin-runtime/.../AbstractJobLauncher.java:433):
  *
  *  1. plan: read previous high watermark from the state store, build the
  *     source DataFrame with the incremental predicate pushed into the scan
  *     (Source.getWorkunits);
  *  2. execute: transforms (Converter chain) + row-policy split
  *     (RowLevelPolicyChecker) + fork branch writes (Fork/DataWriter) —
  *     all one Catalyst plan per branch, no record-at-a-time loop;
  *  3. commit: task policies (TaskLevelPolicy: row counts), atomic publish
  *     (BaseDataPublisher), state-store watermark upsert
  *     (FsDatasetStateStore).
  *
  * Commit policy is COMMIT_ON_FULL_SUCCESS (JobCommitPolicy.java:35): all
  * branches stage first, task policies run over the staged counts, and
  * only then does anything become visible (rename-only promote; a branch
  * or policy failure leaves every previous output untouched).
  *
  * Metrics are SINGLE-PASS: source-row count, max watermark, passed and
  * rejected counts, FAIL-policy violations and per-branch routed/written
  * counts all come from `observe()` nodes evaluated during the sink
  * actions themselves. Total source scans per run: one for the err-file
  * side-output (when row policies exist) + one to materialize the shared
  * cache for the branch writes — nothing is ever re-read to count it.
  */
object PipelineRunner {

  final case class JobResult(runId: String,
                             extracted: Long,
                             rejected: Long,
                             branchCounts: Map[String, Long],
                             committedWatermark: Option[String],
                             stageMetrics: Seq[MetricRecord] = Nil,
                             // non-empty only under COMMIT_SUCCESSFUL_TASKS:
                             // branch name -> error text for branches whose
                             // output was NOT published this run
                             failedBranches: Map[String, String] = Map.empty,
                             // branches already current under their
                             // per-branch watermark (empty delta, publish
                             // skipped, previous output untouched)
                             skippedBranches: Set[String] = Set.empty,
                             // one deduped event per (source, destination)
                             // actually PUBLISHED this run (LineageInfo
                             // semantics; skipped/failed branches emit none)
                             lineage: Seq[graft.metrics.TrackingEvent] = Nil)

  /** Run the job lifecycle. Stateful jobs (stateDir set) additionally
    * land a record in the `<stateDir>/runs` history ledger — for EVERY
    * outcome, success or failure, so `status = 'FAILED'` monitoring sees
    * aborted runs. Ledger writes are best-effort (logged, never fatal):
    * by the time the success record is written the data and watermark are
    * already committed, and a history-store hiccup must not convert a
    * committed run into a reported failure (the reference's job-history
    * store is likewise non-fatal). RunIds must be unique per ATTEMPT —
    * the ledger refuses duplicates. */
  def run(spark: SparkSession, spec: PipelineSpec, runId: String): JobResult = {
    val startedAt = System.currentTimeMillis()
    def ledgered(body: => Unit): Unit =
      try body catch {
        case e: Exception =>
          System.err.println(s"[graft] run-ledger write failed for " +
            s"'${spec.name}' run '$runId' (non-fatal): $e")
      }
    // automatic troubleshooter scope (the reference attaches its log
    // appender for the job's duration — AutomaticTroubleshooterImpl
    // .start/stop): executor task failures during this run, including
    // retried-then-succeeded attempts a green job would hide, become
    // WARN issues deduped by stack shape. Stateful runs only — the
    // issues need an event store to land in. SparkListeners are
    // context-global: CONCURRENT runs on one session would capture each
    // other's task failures (attribution noise, not data corruption);
    // schedulers running pipelines in parallel should drive them on
    // separate sessions or accept cross-attributed WARN issues.
    val issueRepo = new graft.metrics.IssueRepository()
    val issueListener = new graft.metrics.IssueListener(issueRepo)
    val capture = spec.stateDir.isDefined
    if (capture) spark.sparkContext.addSparkListener(issueListener)
    // listener delivery is async; wait for the captured set to go quiet
    // (diagnostics are best-effort — a straggler event past the settle
    // window is dropped, never blocks the run)
    def settledIssues(): Seq[graft.metrics.Issue] = {
      var prev = -1
      var cur = issueRepo.getAll.size
      while (cur != prev) { Thread.sleep(50); prev = cur; cur = issueRepo.getAll.size }
      issueRepo.getAll
    }
    def flushIssues(sd: String, extra: Seq[graft.metrics.Issue]): Unit = ledgered {
      // only pay the settle wait when something was captured or the run
      // failed; a clean run with an empty repo skips straight through (a
      // WARN still in flight on the listener bus at that instant is
      // dropped — best-effort diagnostics, never run latency)
      val all = (if (issueRepo.getAll.isEmpty && extra.isEmpty) Nil
                 else settledIssues()) ++ extra
      if (all.nonEmpty) {
        val es = new EventStore(spark, s"$sd/events")
        all.map(graft.metrics.Issues.toEvent).foreach(es.listener)
        es.flush(s"issues-$runId"): Unit
      }
    }
    try {
      val result = runInner(spark, spec, runId)
      spec.stateDir.foreach { sd =>
        val finishedAt = System.currentTimeMillis()
        ledgered(new graft.state.RunLedger(spark, s"$sd/runs")
          .recordResult(spec.name, result, startedAt, finishedAt))
        // per-stage records/bytes/timings, queryable like the reference's
        // TaskExecutionInfo rows; best-effort for the same reason the
        // ledger is (data + watermark are already committed by now)
        ledgered(new MetricStore(spark, s"$sd/metrics")
          .record(spec.name, runId, finishedAt, result.stageMetrics))
        // lineage events for this run, one atomic duplicate-refusing
        // file — a retried driver can't double-record the run's lineage
        if (result.lineage.nonEmpty) ledgered {
          val es = new EventStore(spark, s"$sd/events")
          result.lineage.foreach(es.listener)
          es.flush(s"lineage-$runId"): Unit
        }
        flushIssues(sd, Nil)
      }
      result
    } catch {
      case e: Exception =>
        spec.stateDir.foreach { sd =>
          ledgered(new graft.state.RunLedger(spark, s"$sd/runs")
            .record(spec.name, runId, "FAILED", startedAt,
              System.currentTimeMillis(), detail = e.toString))
          // troubleshooter: the job failure as a structured ERROR issue,
          // keyed by stack shape — the same root cause across retried
          // runs lands ONE code, so "what broke this week" is a
          // group-by, not a log dig — flushed together with any task
          // failures the listener caught on the way down
          flushIssues(sd, Seq(graft.metrics.Issues.fromThrowable(
            e, sourceClass = getClass.getName,
            timeMs = System.currentTimeMillis(),
            context = s"job '${spec.name}' run '$runId' failed")))
        }
        throw e
    } finally if (capture) spark.sparkContext.removeSparkListener(issueListener)
  }

  private def runInner(spark: SparkSession, spec: PipelineSpec,
                       runId: String): JobResult = {
    val store = spec.stateDir.map(new StateStore(spark, _))

    // hierarchical metric contexts (gobblin-metrics MetricContext.java:85):
    // job root + one child per stage; branch counters recorded at the
    // branch child ALSO roll up to the job root (ContextAwareCounter),
    // so `records.written` at the root is the job-wide total. The values
    // come from the SAME observe() nodes the run already evaluates — the
    // context tree adds naming + rollup + a queryable history, no extra
    // scans.
    val mctx = MetricContext.root(spec.name, Map("run_id" -> runId))
    // exported through the Spark-plugin metric face for the duration of
    // the run (a no-op unless spark.plugins carries GraftSparkPlugin)
    graft.metrics.SparkMetricsBridge.register(mctx)
    try {
    val srcCtx = mctx.childContext("source")

    // ---- 1. plan: source + incremental watermark predicate ----
    val raw = read(spark, spec.source)
    val prevWm: Option[String] = (store, spec.source.watermarkColumn) match {
      case (Some(s), Some(_)) =>
        s.highWatermark(spec.name).orElse(spec.source.watermarkDefault)
      case _ => None
    }
    // Per-branch committed watermarks (COMMIT_SUCCESSFUL_TASKS only):
    // each branch is its own dataset with its own state, like the
    // reference's SafeDatasetCommit — a branch that published while a
    // sibling failed must not re-publish its window on the repair run.
    val branchState: Map[String, Option[String]] =
      (store, spec.source.watermarkColumn) match {
        case (Some(s), Some(_)) if spec.commitPolicy == "successful" =>
          spec.branches.map(b => b.name ->
            s.highWatermark(spec.name, s"branch.${b.name}")).toMap
        case _ => Map.empty
      }
    val branchPrev: Map[String, Option[String]] =
      branchState.map { case (n, v) => n -> v.orElse(prevWm) }
    // the scan covers the laggard branch; siblings narrow further below
    val extractWm: Option[String] =
      if (branchPrev.isEmpty) prevWm
      else if (branchPrev.values.exists(_.isEmpty)) None
      else Some(branchPrev.values.flatten.reduce(minWm))
    val sourced = (spec.source.watermarkColumn, extractWm) match {
      case (Some(wmCol), Some(wm)) => raw.filter(col(wmCol) > lit(parseWm(wm)))
      case _ => raw
    }

    // ---- 2. transforms (the Converter chain, declaratively) ----
    // keys for the encrypt:/decrypt: transforms load ONCE here on the
    // driver (a JSON credential store path in the transform spec); the
    // per-row work stays a map-only expression
    def jsonRing(parts: Array[String]): graft.functions.KeyCrypto.KeyRing = {
      val codec = parts.lift(2).getOrElse("hex") match {
        case "hex" => graft.functions.JsonCredentialStore.Hex
        case "b64" => graft.functions.JsonCredentialStore.B64
        case bad => throw new IllegalArgumentException(
          s"key codec must be hex or b64: $bad")
      }
      graft.functions.JsonCredentialStore.loadRing(parts(1), codec,
        spark.sparkContext.hadoopConfiguration)
    }

    val transformed = spec.transformExprs.foldLeft(sourced) { (df, t) =>
      t.split(":", 2) match {
        case Array("selectExpr", exprs) => df.selectExpr(exprs.split(';').map(_.trim).toIndexedSeq: _*)
        case Array("filter", e)         => df.filter(e)
        case Array("drop", cols)        => df.drop(cols.split(';').map(_.trim).toIndexedSeq: _*)
        case Array("rename", spec2) => // old1=new1;old2=new2
          spec2.split(';').foldLeft(df) { (d, kv) =>
            val Array(from, to) = kv.split('=').map(_.trim)
            d.withColumnRenamed(from, to)
          }
        case Array("split", spec2) => // col;delim -> 1:N rows (StringSplitter)
          val Array(c, delim) = spec2.split(';').map(_.trim)
          df.transform(graft.operators.Converters.splitToRows(c, delim))
        case Array("grok", spec2) => // col;pattern (GrokToJsonConverter)
          val Array(c, pattern) = spec2.split(";", 2).map(_.trim)
          graft.functions.Grok.parse(df, c, pattern)
        case Array("sample", spec2) => // keyCol;num;denom (SamplingConverter)
          val Array(c, num, denom) = spec2.split(';').map(_.trim)
          df.transform(graft.operators.Converters.sampleByKeyMod(
            c, num.toInt, denom.toInt))
        case Array("stratified", spec2) => // keyCol;strataCol;en=50,de=20;10
          val parts = spec2.split(';').map(_.trim)
          val rates = parts(2).split(',').filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split('=').map(_.trim); k -> v.toInt
          }.toMap
          df.transform(graft.operators.Converters.stratifiedSampleByHash(
            parts(0), parts(1), rates, parts(3).toInt))
        case Array("dedup", spec2) => // k1,k2;delta1.desc,delta2.asc
          val parts = spec2.split(';').map(_.trim)
          val keys = parts(0).split(',').map(_.trim).toSeq
          val delta = parts(1).split(',').map(_.trim).map { d =>
            d.split('.') match {
              case Array(c, "desc") => col(c).desc
              case Array(c, "asc")  => col(c).asc
              case Array(c)         => col(c).asc
              case _ => throw new IllegalArgumentException(s"bad delta: $d")
            }
          }.toSeq
          df.transform(graft.operators.Dedup.keyDeltaTop1(keys, delta))
        case Array("scd2", spec2) => // k1,k2;tsCol (changelog -> history)
          val parts = spec2.split(';').map(_.trim)
          graft.operators.Scd.scd2(df,
            parts(0).split(',').map(_.trim).toSeq, parts(1))
        case Array("tiers", spec2) => // scoreCol;k (CCNet head/middle/tail)
          val Array(c, k) = spec2.split(';').map(_.trim)
          graft.text.QualityTiers.tiers(df, c, k.toInt)
        case Array("redact", c) => // PII-redact a text column in place
          df.withColumn(c.trim, graft.text.Redact.redactPii(col(c.trim)))
        case Array("gapfill", spec2) => // k1,k2;tsCol;interval;unit;valueCol
          // dense per-key grid, max(value) per bucket, forward fill
          val parts = spec2.split(';').map(_.trim)
          graft.operators.Resample.gridFill(df,
            parts(0).split(',').map(_.trim).toSeq, parts(1),
            parts(2), max(col(parts(4))), parts(3))
        case Array("maxrun", spec2) => // textCol=outCol (repetition signal)
          val Array(c, out) = spec2.split('=').map(_.trim)
          df.withColumn(out, graft.text.TextStats.maxTokenRun(col(c)))
        case Array("lineclean", spec2) => // textCol[;minWords;minSent;bad1,bad2]
          val parts = spec2.split(';').map(_.trim)
          graft.text.LineClean.clean(df, parts(0),
            parts.lift(1).map(_.toInt).getOrElse(3),
            parts.lift(2).map(_.toInt).getOrElse(5),
            parts.lift(3).map(_.split(',').map(_.trim)
              .filter(_.nonEmpty).toSeq).getOrElse(Nil))
        case Array("hashsplit", spec2) => // keyCol;train=80,val=10,test=10
          val parts = spec2.split(';').map(_.trim)
          val bands = parts(1).split(',').filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split('=').map(_.trim); k -> v.toInt
          }.toSeq
          df.transform(graft.operators.Converters.hashSplit(parts(0), bands))
        case Array("winsorize", spec2) => // col;pLo;pHi;outCol
          val parts = spec2.split(';').map(_.trim)
          graft.operators.Profile.winsorize(df, parts(0),
            parts(1).toInt, parts(2).toInt, parts(3))
        case Array("wsample", spec2) => // keyCol;weightCol;n
          val parts = spec2.split(';').map(_.trim)
          df.transform(graft.operators.Converters.weightedSample(
            parts(0), parts(1), parts(2).toInt))
        case Array("urlcanon", spec2) => // urlCol=outCol
          val Array(c, out) = spec2.split('=').map(_.trim)
          df.withColumn(out, graft.text.UrlOps.canonicalizeUrl(col(c)))
        case Array("blockdomains", spec2) => // urlCol;evil.com,bad.org
          val parts = spec2.split(';').map(_.trim)
          val doms = parts(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
          df.filter(graft.text.UrlOps.domain(col(parts(0))).isNull ||
            !graft.text.UrlOps.isBlockedDomain(col(parts(0)), doms))
        // REAL media decode in the converter chain: image (ImageIO) and
        // audio (javax.sound) payloads decode on the executors, video
        // falls through to the documented stub — the frame carries the
        // canonical media schema in, MediaFeatures out
        case Array("mediafeatures", spec2) => // [featureDim]
          val dim = Option(spec2).map(_.trim).filter(_.nonEmpty)
            .map(_.toInt).getOrElse(8)
          graft.multimodal.Multimodal.extractFeatures(df,
            new graft.multimodal.Multimodal.ImageIoDecoder(dim,
              new graft.multimodal.Multimodal.WavDecoder(dim))).toDF()
        // perceptual image dedup in the converter chain: exact -> every
        // image labeled with its hash group's representative; near;H ->
        // banded-Hamming clusters (media_id, cluster_id)
        case Array("imagededup", spec2) => // exact | near;maxHamming
          spec2.split(';').map(_.trim) match {
            case Array("exact") =>
              graft.multimodal.ImageDedup.exactGroups(df)
            case Array("near", h) =>
              graft.multimodal.ImageDedup.clusters(df, h.toInt)
            case other => throw new IllegalArgumentException(
              s"imagededup: wants 'exact' or 'near;<maxHamming>', got " +
                s"'${other.mkString(";")}'")
          }
        // perceptual media dedup for ALL modalities as a config-driven
        // hop (the round-15 family): exact groups, banded near-dup
        // clusters, or keep-best-resolution survivors (image only)
        case Array("mediadedup", spec2) => // modality;exact|near;H|best;H
          spec2.split(';').map(_.trim) match {
            case Array("image", "exact") =>
              graft.multimodal.ImageDedup.exactGroups(df)
            case Array("audio", "exact") =>
              graft.multimodal.AudioDedup.exactGroups(df)
            case Array("video", "exact") =>
              graft.multimodal.VideoDedup.exactGroups(df)
            // FPS-INVARIANT exact dedup: time-sampled fingerprints
            // re-align frame-rate-converted (VFR<->CFR) re-renders
            case Array("video", "fps", fps) =>
              graft.multimodal.VideoDedup.exactGroupsAtFps(df, fps.toInt)
            case Array("image", "near", h) =>
              graft.multimodal.ImageDedup.clusters(df, h.toInt)
            case Array("audio", "near", h) =>
              graft.multimodal.AudioDedup.clusters(df, h.toInt)
            case Array("video", "near", h) =>
              graft.multimodal.VideoDedup.clusters(df, h.toInt)
            case Array("image", "best", h) =>
              graft.multimodal.ImageDedup.survivorsByResolution(df, h.toInt)
            // keep-LONGEST video survivors over frame-overlap clusters
            // (clipped re-uploads lose to the full cut)
            case Array("video", "best", h) =>
              graft.multimodal.VideoDedup.survivorsByFrames(df, h.toInt)
            // frame-overlap clusters: clipped/extended copies cluster
            // with their original through shared frames
            case Array("video", "overlap", h) =>
              graft.multimodal.VideoDedup.overlapClusters(df, h.toInt)
            // shift-tolerant audio clusters: trimmed/padded copies
            // re-align through hop-aligned window hashes
            case Array("audio", "shift", h, win, hop) =>
              graft.multimodal.AudioDedup.shiftClusters(
                df, win.toInt, hop.toInt, h.toInt)
            // keep-LONGEST audio survivors over shift clusters (the
            // trimmed re-upload loses to the full master)
            case Array("audio", "best", h, win, hop) =>
              graft.multimodal.AudioDedup.survivorsByWindows(
                df, win.toInt, hop.toInt, h.toInt)
            // crop-tolerant image clusters: tile-multiple crops and
            // border extensions re-align through per-tile hashes
            case Array("image", "crop", h, tw, th) =>
              graft.multimodal.ImageDedup.cropClusters(
                df, tw.toInt, th.toInt, h.toInt)
            // rotation/flip-tolerant image clusters: dihedral copies
            // re-align through the 8-orientation hash set
            case Array("image", "rot", h) =>
              graft.multimodal.ImageDedup.rotationClusters(df, h.toInt)
            // byte-exact survivors: the zero-decode first pass, keeps
            // full rows so perceptual hops chain after it
            case Array("bytes") =>
              graft.multimodal.MediaBytes.survivors(df)
            case Array("bytes", "groups") =>
              graft.multimodal.MediaBytes.exactGroups(df)
            case other => throw new IllegalArgumentException(
              "mediadedup: wants '<image|audio|video>;exact', " +
                "'video;fps;<fps>', " +
                "'<image|audio|video>;near;<maxHamming>', " +
                "'image;best;<maxHamming>', 'video;best;<maxHamming>', " +
                "'video;overlap;<maxHamming>', " +
                "'audio;shift;<maxHamming>;<windowFrames>;<hopFrames>', " +
                "'audio;best;<maxHamming>;<windowFrames>;<hopFrames>', " +
                "'image;crop;<maxHamming>;<tileW>;<tileH>' or " +
                "'image;rot;<maxHamming>', " +
                s"got '${other.mkString(";")}'")
          }
        // decoded media as EMBEDDINGS: (media_id, embedding) rows that
        // feed every existing vector operator (ANN search, embedding
        // near-dup, SemDeDup, the IVF index family) — the bridge from
        // the multimodal decode pass into the vector stack
        // AVI soundtrack demux: PCM audio rows out of video containers —
        // the declarative bridge from the video stack into the audio
        // stack (dedup/quality/segments run on soundtracks unchanged)
        case Array("aviaudio") =>
          graft.multimodal.Multimodal.demuxAviAudio(df)
        // mp4 soundtrack demux: the ISO-BMFF face of the same bridge —
        // PCM sample-table walk, zero video decode
        case Array("mp4audio") =>
          graft.multimodal.Multimodal.demuxMp4Audio(df)
        // Matroska soundtrack demux: the EBML face — A_PCM blocks out
        // of Cluster/SimpleBlock, zero video decode
        case Array("mkvaudio") =>
          graft.multimodal.Multimodal.demuxMkvAudio(df)
        // image format normalization: decode through the shared seam,
        // re-encode as png (lossless), jpg or in-JVM VP8L webp
        // (lossless) — one corpus, one container
        case Array("imagetranscode", fmt) =>
          graft.multimodal.Multimodal.transcodeImages(df, fmt.trim)
        // caption sidecars (SRT/WebVTT) exploded into timed cue rows
        case Array("captioncues") =>
          graft.multimodal.Captions.cues(df)
        case Array("captioncues", colName) =>
          graft.multimodal.Captions.cues(df, colName.trim)
        case Array("mediaembed", spec2) => // [featureDim]
          val dim = Option(spec2).map(_.trim).filter(_.nonEmpty)
            .map(_.toInt).getOrElse(8)
          graft.multimodal.Multimodal.extractFeatures(df,
            new graft.multimodal.Multimodal.ImageIoDecoder(dim,
              new graft.multimodal.Multimodal.WavDecoder(dim,
                new graft.multimodal.Multimodal.GifVideoDecoder(dim)))).toDF()
            .select(col("media_id"), col("feature").as("embedding"))
        // quality gates over decoded media as a config-driven drop hop:
        // keep only records passing every modality gate (thumbnails,
        // banner strips, solid placeholders; short/silent/clipped audio;
        // single-frame/static/short-or-endless video)
        case Array("mediafilter", spec2) => // image|audio|video|sharp
          spec2.split(';').map(_.trim) match {
            case Array("image") =>
              graft.multimodal.MediaQuality.filterImages(df)
            case Array("audio") =>
              graft.multimodal.MediaQuality.filterAudio(df)
            case Array("video") =>
              graft.multimodal.MediaQuality.filterVideo(df)
            // variance-of-Laplacian blur gate (images only)
            case Array("sharp") =>
              graft.multimodal.MediaQuality.filterSharp(df)
            case Array("sharp", minVar) =>
              graft.multimodal.MediaQuality.filterSharp(df, minVar.toLong)
            case other => throw new IllegalArgumentException(
              s"mediafilter: wants 'image', 'audio', 'video' or " +
                s"'sharp[;minLapVar]', got '${other.mkString(";")}'")
          }
        // REAL per-frame sampling of animated-GIF videos in the chain:
        // one row per sampled frame with decoded dims + luminance bands
        case Array("gifframes", spec2) => // every[;featureDim]
          val parts = spec2.split(';').map(_.trim)
          val dim = if (parts.length > 1) parts(1).toInt else 8
          graft.multimodal.Multimodal.sampleGifFrames(df, parts(0).toInt, dim)
        // composed per-video frame card: features + sampled-frame census
        // from ONE container decode (GIF/AVI/MJPEG-mp4)
        case Array("framecard", spec2) => // every[;featureDim]
          val parts = spec2.split(';').map(_.trim)
          graft.multimodal.Multimodal.videoFrameCard(df, parts(0).toInt,
            if (parts.length > 1) parts(1).toInt else 8)
        // shot-boundary detection over real decoded frames: one row per
        // scene (the content-balanced frame sampler's segmentation)
        case Array("videoscenes", spec2) => // maxHamming[;every]
          val parts = spec2.split(';').map(_.trim)
          graft.multimodal.VideoScenes.scenes(df, parts(0).toInt,
            if (parts.length > 1) parts(1).toInt else 1)
        // silence-split utterance segmentation over real decoded PCM:
        // one row per segment (the energy-VAD packing unit)
        case Array("audiosegments", spec2) => // windowFrames[;minMeanAbs]
          val parts = spec2.split(';').map(_.trim)
          graft.multimodal.AudioScenes.segments(df, parts(0).toInt,
            if (parts.length > 1) parts(1).toLong else 100L)
        // letterbox/pillarbox bar removal before perceptual hashing
        // (bars shift every hash); bar-free rows pass through untouched
        case Array("cropbars") =>
          graft.multimodal.MediaQuality.cropBars(df)
        // PNG/WAV/GIF/AVI metadata scrub (incl. trailing-byte
        // smuggling): the compliance pass for binary payloads
        case Array("mediascrub") =>
          graft.multimodal.MediaScrub.scrub(df)
        // scene keyframes extracted as standalone IMAGE rows — the
        // declarative bridge from the video stack into the image stack
        case Array("keyframes", spec2) => // maxHamming[;every]
          val parts = spec2.split(';').map(_.trim)
          graft.multimodal.VideoScenes.keyframeImages(df, parts(0).toInt,
            if (parts.length > 1) parts(1).toInt else 1)
        // time-uniform frame ticks from the real delay chain
        case Array("fpssample", spec2) => // fps
          graft.multimodal.VideoScenes.sampleAtFps(df, spec2.trim.toInt)
        // PCM rate normalization before packing/fingerprinting
        case Array("audioresample", spec2) => // targetRate
          graft.multimodal.AudioScenes.resample(df, spec2.trim.toInt)
        // vision batch-packing: nearest aspect bucket from header bytes
        case Array("aspectbuckets", spec2) => // w:h[,w:h...] or empty
          val bs = spec2.split(',').map(_.trim).filter(_.nonEmpty).map { b =>
            val i = b.indexOf(':')
            require(i > 0, s"aspect bucket is not w:h: '$b'")
            (b.substring(0, i).toInt, b.substring(i + 1).toInt)
          }.toSeq
          if (bs.isEmpty) graft.multimodal.MediaQuality.aspectBuckets(df)
          else graft.multimodal.MediaQuality.aspectBuckets(df, bs)
        // paired media-caption curation: captions (and the optional
        // media eval set) load from parquet paths in the spec — the
        // reference's converters likewise reach side inputs by
        // config-given location
        case Array("pairedcuration", spec2) =>
          // <captionsPath>;<minCaptionChars>;<maxHamming>
          //   [;eval=<path>][;capkey=<col>][;deep=<minShared>]
          //   [;capeval=<path>]
          val segs = spec2.split(';').map(_.trim)
          require(segs.length >= 3,
            "pairedcuration: wants '<captionsPath>;<minCaptionChars>;" +
              "<maxHamming>[;eval=<path>][;capkey=<col>]" +
              "[;deep=<minShared>][;capeval=<path>]', got " +
              s"'$spec2'")
          val opts = segs.drop(3).filter(_.nonEmpty).map { o =>
            val i = o.indexOf('=')
            require(i > 0 &&
              Set("eval", "capkey", "deep", "capeval")(o.substring(0, i)),
              s"pairedcuration option is not eval=/capkey=/deep=/capeval=: " +
                s"'$o'")
            o.substring(0, i) -> o.substring(i + 1)
          }.toMap
          opts.get("deep") match {
            // deep: the decontamination probes tiles/windows/frames and
            // image orientations — cropped/rotated benchmark leaks flag
            case Some(minShared) =>
              graft.multimodal.PairedCuration.curateDeep(df,
                spark.read.parquet(segs(0)), segs(1).toLong, segs(2).toInt,
                minShared = minShared.toInt,
                evalMedia = opts.get("eval").map(spark.read.parquet(_)),
                capKeyCol = opts.get("capkey"),
                evalCaptions = opts.get("capeval").map(spark.read.parquet(_)))
            case None =>
              graft.multimodal.PairedCuration.curate(df,
                spark.read.parquet(segs(0)), segs(1).toLong, segs(2).toInt,
                evalMedia = opts.get("eval").map(spark.read.parquet(_)),
                capKeyCol = opts.get("capkey"),
                evalCaptions = opts.get("capeval").map(spark.read.parquet(_)))
          }
        // leakage-safe split by PERCEPTUAL cluster: label:width bands
        // over the banded portable hash of the near-dup cluster id
        case Array("mediasplit", spec2) =>
          // <image|audio|video>;<maxHamming>;label:width[,label:width...]
          spec2.split(';').map(_.trim) match {
            case Array(modality, h, bandSpec) =>
              val bands = bandSpec.split(',').map(_.trim).map { b =>
                val i = b.indexOf(':')
                require(i > 0, s"mediasplit band is not label:width: '$b'")
                b.substring(0, i) -> b.substring(i + 1).toInt
              }.toSeq
              graft.multimodal.MediaSplit.byPerceptualCluster(
                df, modality, h.toInt, bands)
            case other => throw new IllegalArgumentException(
              "mediasplit: wants '<image|audio|video>;<maxHamming>;" +
                s"label:width[,label:width...]', got '${other.mkString(";")}'")
          }
        // field-level crypto in the converter chain — the reference's
        // encryption IS a converter (gobblin-crypto EncryptionFactory);
        // keys load once on the driver from a JSON credential store,
        // the per-row work is the map-only rotating-AES expression
        case Array("encrypt", spec2) => // col;/path/to/keys.json[;hex|b64]
          val parts = spec2.split(';').map(_.trim)
          val ring = jsonRing(parts)
          df.withColumn(parts(0),
            graft.functions.KeyCrypto.encryptStringField(col(parts(0)), ring))
        case Array("decrypt", spec2) => // col;/path/to/keys.json[;hex|b64]
          val parts = spec2.split(';').map(_.trim)
          val ring = jsonRing(parts)
          df.withColumn(parts(0),
            graft.functions.KeyCrypto.decryptStringField(col(parts(0)), ring))
        // per-record HTTP join enrichment in the converter chain — the
        // reference's HttpJoinConverter IS config-driven
        // (converter.classes + gobblin.converter.http.* properties);
        // first segment is the ${col} url template, the rest k=v options
        case Array("enrich", spec2) =>
          // enrich:http://h/p?k=${col}[;verb=POST;body=tmpl;header.K=V;
          //   maxInFlight=8;timeoutMs=10000;failGe=500;statusCol=..;
          //   responseCol=..]  (option values may not contain ';')
          val segs = spec2.split(';').map(_.trim)
          val opts = segs.drop(1).filter(_.nonEmpty).map { o =>
            val i = o.indexOf('=')
            require(i > 0, s"enrich option is not key=value: '$o'")
            o.substring(0, i) -> o.substring(i + 1)
          }
          val known = Set("verb", "body", "statusCol", "responseCol",
            "maxInFlight", "timeoutMs", "failGe")
          val bad = opts.map(_._1)
            .filterNot(k => known(k) || k.startsWith("header."))
          require(bad.isEmpty,
            s"unknown enrich option(s): ${bad.mkString(", ")} " +
              s"(known: ${known.toSeq.sorted.mkString(", ")}, header.*)")
          val m = opts.toMap
          val failGe = m.get("failGe").map(_.toInt).getOrElse(500)
          graft.operators.HttpEnrich.enrich(df,
            graft.operators.HttpEnrich.EnrichConfig(
              urlTemplate = segs(0),
              verb = m.getOrElse("verb", "GET"),
              bodyTemplate = m.get("body"),
              headers = opts.collect { case (k, v) if k.startsWith("header.") =>
                k.stripPrefix("header.") -> v }.toMap,
              statusCol = m.getOrElse("statusCol", "http_status"),
              responseCol = m.getOrElse("responseCol", "http_response"),
              maxInFlight = m.getOrElse("maxInFlight", "8").toInt,
              timeoutMs = m.getOrElse("timeoutMs", "10000").toLong,
              failOnStatus = _ >= failGe))
        case other => throw new IllegalArgumentException(s"bad transform: ${other.mkString(":")}")
      }
    }

    // source-level metrics observed below the policy split (and below the
    // cache point): whichever sink action runs first records them
    val obsSrc = Observation(s"graft_${runId}_src")
    val srcMetrics = Seq(count(lit(1)).as("rows")) ++
      spec.source.watermarkColumn.map(c => max(col(c)).as("wm_max"))
    val srcObserved = transformed.observe(obsSrc, srcMetrics.head, srcMetrics.tail: _*)

    val checked = Quality.checkRows(srcObserved, spec.rowPolicies.map(_.toPolicy))
    val needBoth = spec.rowPolicies.nonEmpty
    val obsPassed = Observation(s"graft_${runId}_passed")
    val passedObs = checked.passed.observe(obsPassed, count(lit(1)).as("rows"))
    val input = if (needBoth) passedObs.persist(StorageLevel.MEMORY_AND_DISK)
                else passedObs
    try {

    // rejected side-output: ONE action writes the err file and observes
    // both the reject count and the FAIL-policy violation count
    val rejectedCount =
      if (!needBoth) 0L
      else srcCtx.timer("time.reject_scan").time {
        val failPred = checked.failPolicies.map(_.predicate).reduceOption(_ && _)
        val obsRej = Observation(s"graft_${runId}_rejected")
        val rejMetrics = Seq(count(lit(1)).as("rows")) ++ failPred.map(p =>
          sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as("fail_cnt"))
        val rejObs = checked.rejected.observe(obsRej, rejMetrics.head, rejMetrics.tail: _*)
        // STAGE the err output (metrics come from the staged write) but
        // only make it visible after FAIL enforcement passes — an aborting
        // job must not clobber the previous run's err directory
        val stagedErr = spec.errDir.map(err =>
          AtomicPublisher.stage(rejObs, s"$err/${spec.name}", runId))
        if (stagedErr.isEmpty) { rejObs.count(): Unit } // metrics-only scan
        val m = obsRej.get
        failPred.foreach { _ =>
          val bad = Option(m("fail_cnt")).fold(0L)(_.asInstanceOf[Long])
          if (bad != 0) {
            stagedErr.foreach(_.abort())
            throw new IllegalArgumentException(s"row policies " +
              s"${checked.failPolicies.map(_.name).mkString(",")} failed: " +
              s"$bad violating records")
          }
        }
        stagedErr.foreach(_.promote())
        m("rows").asInstanceOf[Long]
      }

    // ---- branches: stage all, gate on task policies, then promote ----
    val writeTimer = mctx.timer("time.branch_write")
    val tWrite0 = System.nanoTime()
    val forkBranches = spec.branches.map { b =>
      // a branch ahead of the extraction watermark filters its own delta
      val ownWm = branchPrev.getOrElse(b.name, None)
      val wmPred = (spec.source.watermarkColumn, ownWm) match {
        case (Some(c), Some(w)) if ownWm != extractWm =>
          Some(col(c) > lit(parseWm(w)))
        case _ => None
      }
      val pred = (b.predicate, wmPred) match {
        case (Some(p), Some(w)) => Some(p && w)
        case (p, w) => p.orElse(w)
      }
      Fork.Branch(b.name, pred, b.transform, b.outDir, b.writeSpec)
    }
    // ---- 3a. task policies run BEFORE anything becomes visible ----
    def gate(name: String, c: Fork.BranchResult): Unit = {
      spec.rowCountRange.foreach { range =>
        require(Quality.rowCountRange(c.routed, c.written, range),
          s"row-count policy failed for branch $name: " +
            s"expected≈${c.routed} written=${c.written}")
      }
      // drift gate: recompute the branch's LOGICAL output (column
      // pruning cuts it to the bin expression — no staged-file read)
      // and measure exact total-variation against the reference
      spec.driftPolicy.foreach { dp =>
        val fb = forkBranches.find(_.name == name).getOrElse(
          throw new IllegalStateException(s"no branch named $name"))
        val outFrame = fb.transform(
          fb.predicate.map(input.filter).getOrElse(input))
        val ref = spark.read.parquet(dp.refPath)
        val tv = graft.operators.DriftCheck.tvDrift(
            outFrame.selectExpr(s"${dp.binExpr} AS __graft_drift_bin"),
            ref.selectExpr(s"${dp.binExpr} AS __graft_drift_bin"),
            "__graft_drift_bin")
          .collect()(0).getAs[Long]("tv_permille")
        require(tv <= dp.maxPermille,
          s"drift policy failed for branch $name: TV=$tv permille vs " +
            s"reference ${dp.refPath} (max ${dp.maxPermille})")
      }
    }
    val (branchResults, failedBranches, skippedBranches) =
      spec.commitPolicy match {
        case "successful" =>
          // COMMIT_SUCCESSFUL_TASKS (JobCommitPolicy.java:53): branches
          // stage/gate/promote independently; the job only fails outright
          // when NOTHING published. A previously-published branch whose
          // per-branch delta is empty skips its publish — "already
          // current", its output stays untouched. A committed JOB-level
          // watermark (full-success history, or a job predating branch
          // keys) means every branch published then, so all of them get
          // the skip protection — an empty overwrite must never clobber
          // output that a prior run committed.
          val jobCommitted = (store, spec.source.watermarkColumn) match {
            case (Some(s), Some(_)) => s.highWatermark(spec.name).isDefined
            case _ => false
          }
          val publishedBefore: Set[String] =
            if (jobCommitted) spec.branches.map(_.name).toSet
            else branchState.collect { case (n, Some(_)) => n }.toSet
          // reference semantics: maxretries counts RETRIES, so a task
          // gets retries+1 attempts (LocalTaskStateTracker.java:94)
          val o = Fork.runPartial(input, forkBranches, runId,
            branchGate = gate, skipEmpty = publishedBefore,
            maxAttempts = spec.taskMaxRetries + 1)
          if (o.succeeded.isEmpty && o.skipped.isEmpty && forkBranches.nonEmpty)
            throw new IllegalStateException(
              "all branches failed: " + o.failed.map {
                case (n, e) => s"$n: $e" }.mkString("; "))
          (o.succeeded, o.failed, o.skipped)
        case _ => // COMMIT_ON_FULL_SUCCESS (default)
          (Fork.run(input, forkBranches, runId,
            beforePromote = counts =>
              counts.foreach { case (n, c) => gate(n, c) }),
            Map.empty[String, String], Set.empty[String])
      }

    writeTimer.update(System.nanoTime() - tWrite0)

    // sink-less job (no branches): run one count to materialize metrics
    if (spec.branches.isEmpty) { input.count(); () }

    val extracted = obsPassed.get("rows").asInstanceOf[Long]

    // fill the context tree from the observed values; branch output bytes
    // are an O(metadata) content summary of the published dir (jdbc
    // branches have no directory — their cost shows as time, not bytes)
    srcCtx.counter("records.read").inc(
      obsSrc.get("rows").asInstanceOf[Long])
    srcCtx.counter("records.passed").inc(extracted)
    srcCtx.counter("records.rejected").inc(rejectedCount)
    spec.branches.foreach { b =>
      val bc = mctx.childContext(s"branch.${b.name}")
      branchResults.get(b.name) match {
        case Some(r) =>
          bc.counter("records.routed").inc(r.routed)
          bc.counter("records.written").inc(r.written)
          if (b.writeSpec.format != "jdbc")
            try {
              val p = new org.apache.hadoop.fs.Path(b.outDir)
              val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              bc.counter("bytes.written").inc(fs.getContentSummary(p).getLength)
            } catch { case _: java.io.IOException => }
        case None if skippedBranches(b.name) => // empty delta, output kept
          bc.counter("branch.skipped").inc()
        case None => // partial commit: branch didn't publish this run
          bc.counter("branch.failed").inc()
      }
    }

    // lineage: the source/extractor sets one dataset descriptor, each
    // branch that PUBLISHED this run puts its destination (failed and
    // skipped branches put nothing — lineage records what happened, not
    // the plan); the deduped event set is submitted through the context
    // tree like any tracking event and persisted by run()
    val lineageC = new LineageCollector(spec.name)
    lineageC.setSource(DatasetDescriptor(spec.source.format, spec.source.path))
    spec.branches.zipWithIndex.foreach { case (b, i) =>
      if (branchResults.contains(b.name)) {
        val md = if (b.partitionBy.isEmpty) Map.empty[String, String]
                 else Map("partitioned_by" -> b.partitionBy.mkString(","))
        lineageC.putDestination(i + 1,
          Seq(DatasetDescriptor(b.format, b.outDir, md)))
      }
    }
    val lineageEvents = lineageC.events(System.currentTimeMillis())
    lineageEvents.foreach(mctx.submitEvent)

    // ---- 3b. state commit ----
    val wmMax: Option[String] = spec.source.watermarkColumn.flatMap(_ =>
      if (extracted == 0) None else Option(obsSrc.get("wm_max")).map(fmtWm))
    val newWm: Option[String] = spec.source.watermarkColumn.flatMap { _ =>
      // empty extract preserves the previous watermark (QueryBasedSource.java:195-199);
      // so does a partial commit — the JOB-level watermark only advances
      // past rows once every branch has published them
      if (extracted == 0 || failedBranches.nonEmpty) prevWm else wmMax
    }
    // per-branch state (COMMIT_SUCCESSFUL_TASKS): published and
    // already-current branches advance their OWN watermark even when a
    // sibling failed — the repair run then re-extracts only for the
    // laggard, and current branches skip
    val branchEntries: Map[(String, String), String] =
      if (spec.commitPolicy != "successful") Map.empty
      else wmMax.fold(Map.empty[(String, String), String]) { w =>
        (branchResults.keySet ++ skippedBranches).map { n =>
          // a skipped branch may already be AHEAD of this run's max
          // (rows near its watermark aged out of the source) — a
          // watermark only ever moves forward
          val own = branchPrev.getOrElse(n, None)
          (spec.name, s"branch.$n") -> own.fold(w)(o => maxWm(o, w))
        }.toMap
      }
    mctx.timer("time.state_commit").time {
      store.foreach { s =>
        val entries = newWm.map(w => (spec.name, "") -> w).toMap ++ branchEntries
        if (entries.nonEmpty) s.commit(entries, runId)
      }
    }

    JobResult(runId, extracted, rejectedCount,
      branchResults.map { case (k, v) => k -> v.written }, newWm,
      mctx.snapshotRecursive(), failedBranches, skippedBranches,
      lineageEvents)
    // a FAIL-policy abort or branch failure must not leak the cached source
    } finally if (needBoth) { input.unpersist(); () }
    // the plugin face stops exporting this run's tree on ANY exit path
    } finally graft.metrics.SparkMetricsBridge.deregister(mctx)
  }

  /** Canonical "yyyy-MM-dd HH:mm:ss[.f...]" watermark string from whatever
    * the observed max() returns (Timestamp, or Instant when
    * spark.sql.datetime.java8API is on). */
  private def fmtWm(v: Any): String = v match {
    case t: Timestamp => t.toString
    case i: java.time.Instant => Timestamp.from(i).toString
    case l: java.time.LocalDateTime => Timestamp.valueOf(l).toString
    case other => other.toString
  }

  /** Watermark literal: numeric (SIMPLE watermark type) or timestamp
    * (DATE/HOUR/TIMESTAMP types) — Partitioner.java:50's WatermarkType
    * split, inferred from the stored string. */
  private def parseWm(wm: String): Any =
    wm.toLongOption.getOrElse(parseTs(wm))

  /** The earlier of two watermark strings under [[parseWm]]'s typing. */
  private def minWm(a: String, b: String): String = (parseWm(a), parseWm(b)) match {
    case (x: Long, y: Long) => if (x <= y) a else b
    case (x: Timestamp, y: Timestamp) => if (!x.after(y)) a else b
    case _ => if (a <= b) a else b // mixed typing: lexical tiebreak
  }

  private def maxWm(a: String, b: String): String =
    if (minWm(a, b) == a) b else a

  private def parseTs(wm: String): Timestamp =
    try Timestamp.valueOf(wm)
    catch { case _: IllegalArgumentException =>
      try Timestamp.from(java.time.Instant.parse(wm))
      catch { case _: java.time.format.DateTimeParseException =>
        Timestamp.valueOf(java.time.LocalDateTime.parse(wm)) } }

  private def read(spark: SparkSession, s: SourceSpec): DataFrame = {
    // catalog-table source: `source.path` is a (qualified) table name,
    // so a hop can read what an upstream hive-copy hop registered —
    // through the metastore, partition pruning and all. A schema spec
    // is refused: the catalog owns a table's schema.
    if (s.format == "table") {
      require(s.schemaDDL.isEmpty && s.schemaJson.isEmpty,
        s"source.format=table reads the catalog's schema for " +
          s"'${s.path}'; drop source.schema / source.schema.json")
      return spark.read.options(s.options).table(s.path)
    }
    // media-dump source: a directory tree of image/audio files read
    // through binaryFile into the canonical media schema (media_type /
    // mime by extension, stable path-hash ids); optional `glob` option
    // narrows the extension filter AT LISTING time
    if (s.format == "media") {
      require(s.schemaDDL.isEmpty && s.schemaJson.isEmpty,
        "source.format=media produces the canonical media schema; " +
          "drop source.schema / source.schema.json")
      return s.options.get("glob")
        .map(g => graft.multimodal.Multimodal.readMediaDir(spark, s.path, g))
        .getOrElse(graft.multimodal.Multimodal.readMediaDir(spark, s.path))
    }
    var r = spark.read.format(s.format).options(s.options)
    s.schemaDDL.foreach(ddl => r = r.schema(ddl))
    s.schemaJson.foreach(j =>
      r = r.schema(graft.sources.JsonSchemaDialect.parse(j)))
    s.format match {
      // jdbc carries its target in options (url/dbtable), not a path;
      // watermark + transform filters push into the generated SQL
      case "jdbc" => r.load()
      case _      => r.load(s.path)
    }
  }
}
