package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val variants =
    Multimodal.syntheticAudioVariants(spark, docs, groups = 20)

  test("G.711 and 8-bit PCM WAVs decode through the whole audio stack") {
    def wav(data: Array[Byte],
            fmt: javax.sound.sampled.AudioFormat): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, data.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
      bos.toByteArray
    }
    val n = 900
    val pcm16 = new Array[Int](n)
    (0 until n).foreach(i =>
      pcm16(i) = (math.sin(2 * math.Pi * 300 * i / 8000) * 8000).toInt)
    import javax.sound.sampled.AudioFormat
    // A-law WAV: decoded samples == the G.711 reference expansion
    val alawBytes = Array.tabulate(n)(i => G711.linearToAlaw(pcm16(i).toShort))
    val alawWav = wav(alawBytes, new AudioFormat(
      AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false))
    val (decA, rateA) = AudioDedup.decodeMonoWithRate(alawWav)
    assert(rateA == 8000f && decA.length == n)
    assert((0 until n).forall(i =>
      decA(i) == G711.alawToLinear(alawBytes(i)).toInt))
    // µ-law WAV likewise
    val ulawBytes = Array.tabulate(n)(i => G711.linearToUlaw(pcm16(i).toShort))
    val ulawWav = wav(ulawBytes, new AudioFormat(
      AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false))
    assert(AudioDedup.decodeMonoWithRate(ulawWav)._1.toSeq ==
      ulawBytes.map(b => G711.ulawToLinear(b).toInt).toSeq)
    // 8-bit unsigned PCM WAV rescales by the (v - 128) << 8 convention
    val u8 = Array.tabulate(n)(i => ((pcm16(i) >> 8) + 128).toByte)
    val u8Wav = wav(u8, new AudioFormat(
      AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false))
    assert(AudioDedup.decodeMonoWithRate(u8Wav)._1.toSeq ==
      u8.map(b => ((b & 0xff) - 128) << 8).toSeq)
    // the full stack runs: signals + fingerprints over telephony WAVs
    val media = Seq((1L, "audio", alawWav, "audio/wav", "t"),
      (2L, "audio", ulawWav, "audio/wav", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val sig = MediaQuality.audioSignals(media)
    assert(sig.filter(col("n_frames") =!= n.toLong).count() == 0)
    assert(AudioDedup.hashAudio(media).select("ahash").distinct()
      .count() >= 1)
  }

  test("fingerprint: volume-invariant, pitch-sensitive, deterministic") {
    val h = AudioDedup.hashAudio(variants)
      .withColumn("base", pmod(col("media_id"), lit(20L)))
      .withColumn("halved", expr("(media_id div 20) % 2 = 1"))
      .persist()
    try {
      // byte-identical renders -> one hash per (base, parity)
      assert(h.groupBy("base", "halved").agg(countDistinct("ahash").as("n"))
        .filter(col("n") =!= 1).count() == 0)
      // VOLUME variants fingerprint identically to their full-amplitude base
      val full = h.filter(!col("halved"))
        .select(col("base"), col("ahash").as("h0")).distinct()
      val diverged = h.filter(col("halved")).join(full, "base")
        .filter(col("ahash") =!= col("h0")).count()
      assert(diverged == 0, s"$diverged halved clips diverged from their base")
      // distinct pitches land on distinct fingerprints
      assert(full.select("h0").distinct().count() == 20)
    } finally { h.unpersist(); () }
  }

  test("exactGroups recovers the planted groups across volume variants") {
    val g = AudioDedup.exactGroups(variants)
    val wrong = g.filter(col("group_rep") =!= pmod(col("media_id"), lit(20L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
  }

  test("incrementalSurvivors == exact anti-join; committed content drops") {
    val committed = AudioDedup.hashAudio(
      Multimodal.syntheticAudioVariants(spark,
        docs.filter(col("doc_id") < 250), groups = 10))
      .select(col("ahash").cast("string").as("h"))
    val batch = Multimodal.syntheticAudioVariants(spark,
      docs.filter(col("doc_id") >= 250), groups = 20)
    val out = AudioDedup.incrementalSurvivors(batch, committed)
    val want = graft.dedup.IncrementalDedup.survivorsExact(
      AudioDedup.hashAudio(batch), committed, "media_id",
      col("ahash").cast("string"))
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
    // bases 0..9 were committed (same pitches); bases 10..19 are new
    assert(out.filter(pmod(col("media_id"), lit(20L)) < 10).count() == 0)
    assert(out.count() > 0)
  }

  private lazy val nearVariants =
    Multimodal.syntheticAudioNearVariants(spark, docs, groups = 20)

  test("near-variant geometry: within-group <= 8 bits, cross-group >= 10") {
    // the distance structure maxHamming = 8 depends on, pinned at the
    // hash level across ALL 20 bases x 3 kinds (deterministic payloads,
    // so these bounds hold at any SF)
    val reps = AudioDedup.hashAudio(nearVariants)
      .withColumn("base", pmod(col("media_id"), lit(20L)))
      .withColumn("kind", expr("(media_id div 20) % 3"))
      .groupBy("base", "kind").agg(first("ahash").as("h"))
      .as[(Long, Long, Long)].collect()
    def d(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val within = for {
      (ba, _, ha) <- reps; (bb, _, hb) <- reps if ba == bb
    } yield d(ha, hb)
    val cross = for {
      (ba, _, ha) <- reps; (bb, _, hb) <- reps if ba < bb
    } yield d(ha, hb)
    assert(within.max <= 8, s"within-group spread ${within.max} bits")
    assert(cross.min >= 10, s"two groups only ${cross.min} bits apart")
  }

  test("clusters pull volume AND detuned variants into their base's cluster") {
    val out = AudioDedup.clusters(nearVariants, maxHamming = 8)
    try {
      val wrong = out.filter(col("cluster_id") =!= pmod(col("media_id"), lit(20L)))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.select("cluster_id").distinct().count() == 20)
      assert(out.count() == docs.count())
    } finally { out.unpersist(); () }
  }

  test("nearDupPairs: banding complete within the bound, exact beyond it") {
    // flipped-bit constructions, no audio: the shared banding path must
    // find exactly the pairs within Hamming <= 4 for the audio face too
    val base = 0x13572468ace0bd9fL
    val rows = Seq(
      (1L, base), (2L, base ^ 1L),
      (3L, base ^ ((1L << 9) | (1L << 33) | (1L << 60))),
      (4L, base ^ 0x1111111100000000L),
      (5L, ~base)).toDF("media_id", "ahash")
    val got = AudioDedup.nearDupPairs(rows, maxHamming = 4)
    try {
      val pairs = got.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, ha) <- Seq((1L, base), (2L, base ^ 1L),
          (3L, base ^ ((1L << 9) | (1L << 33) | (1L << 60))),
          (4L, base ^ 0x1111111100000000L), (5L, ~base))
        (ib, hb) <- Seq((1L, base), (2L, base ^ 1L),
          (3L, base ^ ((1L << 9) | (1L << 33) | (1L << 60))),
          (4L, base ^ 0x1111111100000000L), (5L, ~base))
        if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 4
      } yield (ia, ib)).toSet
      assert(pairs == want, s"got $pairs want $want")
    } finally { got.unpersist(); () }
  }

  test("decontaminate flags exactly the eval groups' clips, corpus never shuffles") {
    // eval = bases 0..4's base renders; every corpus variant of those
    // groups (half-volume AND detuned) must flag, nothing else
    val eval = nearVariants.filter(col("media_id") < 5)
    val out = AudioDedup.decontaminate(nearVariants, eval, maxHamming = 8)
    try {
      val wrong = out.filter(col("contaminated") =!=
        (pmod(col("media_id"), lit(20L)) < 5))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == docs.count())
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    } finally { out.unpersist(); () }
    val e = intercept[IllegalArgumentException] {
      AudioDedup.decontaminate(nearVariants, nearVariants, maxHamming = 8,
        maxEval = 10L)
    }
    assert(e.getMessage.contains("maxEval"), e.getMessage)
  }

  test("one decode per clip per job: the hash frame is persisted") {
    val n = nearVariants.count()
    val c = Multimodal.MediaCounters.audioReads
    var before = c.get()
    AudioDedup.clusters(nearVariants, maxHamming = 8).unpersist()
    assert(c.get() - before == n,
      s"clusters decoded ${c.get() - before} times for $n clips")
    before = c.get()
    AudioDedup.nearDupPairs(AudioDedup.hashAudio(nearVariants), maxHamming = 8)
      .unpersist()
    assert(c.get() - before == n,
      s"nearDupPairs decoded ${c.get() - before} times for $n clips")
  }

  test("shift variants: whole-clip fingerprints diverge, windows re-align") {
    val shifted = Multimodal.syntheticAudioShiftVariants(spark, docs,
      groups = 10).persist()
    try {
      // the defect class is REAL: a trimmed copy re-buckets the 8
      // clip-spanning segments, so the whole-clip fingerprint lands far
      // from its base — whole-clip clustering cannot see these copies
      val whole = AudioDedup.hashAudio(shifted)
        .withColumn("base", pmod(col("media_id"), lit(10L)))
        .withColumn("kind", expr("(media_id div 10) % 3"))
      val baseH = whole.filter(col("kind") === 0)
        .select(col("base"), col("ahash").as("h0")).distinct()
      val minDist = whole.filter(col("kind") =!= 0).join(baseH, "base")
        .select(bit_count(col("ahash").bitwiseXOR(col("h0"))).as("d"))
        .agg(min("d")).as[Int].head()
      // (~7 bits: the envelope segments all re-bucket; ZCR bits stay —
      // the pitch doesn't move. Far past the window face's maxHamming.)
      assert(minDist > 4,
        s"trimmed/padded copy only $minDist whole-clip bits from base — " +
          "fixture no longer exercises the shift-tolerance gap")
      // window hashes re-align: trimmed (3 of 4 windows) and padded
      // (4 windows at idx 1..4, silent idx 0 dropped) cluster with base
      val out = AudioDedup.shiftClusters(shifted, windowFrames = 400,
        hopFrames = 400, maxHamming = 2, minShared = 2)
      try {
        val wrong = out.filter(
          col("cluster_id") =!= pmod(col("media_id"), lit(10L)))
        assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
        assert(out.select("cluster_id").distinct().count() == 10)
        assert(out.count() == docs.count())
      } finally { out.unpersist(); () }
      // silent padding windows are dropped, content windows survive
      val w = AudioDedup.hashWindows(shifted.filter(col("media_id") < 30),
        windowFrames = 400, hopFrames = 400)
        .withColumn("kind", expr("(media_id div 10) % 3"))
      assert(w.filter(col("kind") === 2 && col("window_idx") === 0)
        .count() == 0, "silent lead-in windows must be dropped")
      val counts = w.groupBy("kind").agg(
        countDistinct("media_id").as("clips"), count("*").as("wins"))
        .collect().map(r => r.getLong(2) / r.getLong(1))
      assert(counts.sorted.toSeq == Seq(3L, 4L, 4L),
        s"windows per clip by kind: ${counts.mkString(",")}")
    } finally { shifted.unpersist(); () }
  }

  test("shift faces decode each clip exactly once per job") {
    val shifted = Multimodal.syntheticAudioShiftVariants(spark,
      docs.filter(col("doc_id") < 120), groups = 10)
    val n = shifted.count()
    val c = Multimodal.MediaCounters.audioReads
    var before = c.get()
    AudioDedup.shiftClusters(shifted, 400, 400, maxHamming = 2).unpersist()
    assert(c.get() - before == n,
      s"shiftClusters decoded ${c.get() - before} times for $n clips")
    before = c.get()
    AudioDedup.sharedWindowPairs(shifted, 400, 400, maxHamming = 2)
      .unpersist()
    assert(c.get() - before == n,
      s"sharedWindowPairs decoded ${c.get() - before} times for $n clips")
  }

  test("non-audio records refuse loudly") {
    val imgs = Multimodal.syntheticImages(spark, docs.limit(1))
    val e = intercept[org.apache.spark.SparkException] {
      AudioDedup.hashAudio(imgs).collect()
    }
    assert(e.getMessage != null)
  }

  test("decontaminateWindows catches trimmed-eval leaks the whole-clip probe misses") {
    val corpus = Multimodal.syntheticAudioShiftVariants(spark,
      docs.filter(expr("(doc_id div 10) % 3 != 1")), groups = 10)
    val eval = Multimodal.syntheticAudioShiftVariants(spark,
      docs.filter(expr("(doc_id div 10) % 3 = 1 AND doc_id % 10 < 5")),
      groups = 10)
    // the gap is REAL: the whole-clip probe (q198's shape) sees none of
    // the trimmed-eval leaks at the window face's Hamming bound
    val whole = AudioDedup.decontaminate(corpus, eval, maxHamming = 2)
    try assert(whole.filter(col("contaminated")).count() == 0,
      "whole-clip probe unexpectedly catches shifted copies — fixture " +
        "no longer exercises the shift-tolerance gap")
    finally { whole.unpersist(); () }
    val out = AudioDedup.decontaminateWindows(corpus, eval,
      windowFrames = 400, hopFrames = 400, maxHamming = 2, minShared = 2)
    try {
      val wrong = out.filter(col("contaminated") =!=
        (pmod(col("media_id"), lit(10L)) < 5))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == corpus.count())
      // the bounded eval side broadcasts; corpus windows never shuffle
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    } finally { out.unpersist(); () }
    val e = intercept[IllegalArgumentException] {
      AudioDedup.decontaminateWindows(corpus, corpus, 400, 400,
        maxHamming = 2, maxEval = 10L)
    }
    assert(e.getMessage.contains("maxEval"), e.getMessage)
  }

  test("survivorsByWindows keeps the longest master per cluster from one decode") {
    val shifted = Multimodal.syntheticAudioShiftVariants(spark,
      docs.filter(col("doc_id") < 60), groups = 10)
    val n = shifted.count()
    val c = Multimodal.MediaCounters.audioReads
    val before = c.get()
    val out = AudioDedup.survivorsByWindows(shifted,
      windowFrames = 400, hopFrames = 400, maxHamming = 2, minShared = 2)
    try {
      // window counts come from the SAME pass as the overlap edges
      assert(c.get() - before == n,
        s"decoded ${c.get() - before} times for $n clips")
      // trimmed copies (3 windows) lose; base and padded tie at 4
      // content windows and the minimum id — the base render — wins
      val got = out.select("media_id", "n_windows").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      val want = (0 until 10).map(g => (g.toLong, 4L))
      assert(got == want, s"survivors: $got")
    } finally { out.unpersist(); () }
  }

  test("decontaminateWindows decodes each clip exactly once per side") {
    val corpus = Multimodal.syntheticAudioShiftVariants(spark,
      docs.filter(col("doc_id") < 60), groups = 10)
    val eval = Multimodal.syntheticAudioShiftVariants(spark,
      docs.filter(col("doc_id") >= 10 && col("doc_id") < 15), groups = 10)
    val n = corpus.count()
    val ne = eval.count()
    val c = Multimodal.MediaCounters.audioReads
    val before = c.get()
    AudioDedup.decontaminateWindows(corpus, eval, 400, 400, maxHamming = 2)
      .unpersist()
    assert(c.get() - before == n + ne,
      s"decoded ${c.get() - before} times for $n corpus + $ne eval clips")
  }
}
