package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.dedup.{MinHashDedup, SimHash}

class TextAndDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("tokenCount counts whitespace tokens") {
    val df = Seq("a b c", "one").toDF("text")
    assert(df.select(TextStats.tokenCount($"text")).as[Int].collect().toSeq ==
      Seq(3, 1))
  }

  test("maxTokenRun measures consecutive repeats only") {
    val df = Seq(
      "a b a b a b",        // frequent but never adjacent -> 1
      "go go go stop go",   // run of 3
      "x",                  // single token -> 1
      "y y").toDF("text")   // run of 2
    assert(df.select(TextStats.maxTokenRun($"text")).as[Long]
      .collect().toSeq == Seq(1L, 3L, 1L, 2L))
  }

  test("quality columns are populated and sane") {
    val out = TextStats.withQuality(docs, "text")
    val row = out.select("n_tokens", "punct_ratio", "avg_token_len").head
    assert(row.getLong(0) > 0)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) > 0.0)
  }

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      "the cat and the dog in the house",
      "el gato y la casa de los perros que",
      "zzz qqq xxx").toDF("text")
    val out = df.select(TextStats.langId($"text")).as[String].collect()
    assert(out(0) == "en")
    assert(out(1) == "es")
    assert(out(2) == "und")
  }

  test("rollingFingerprint is order-sensitive, contentFingerprint is md5") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
    val fp = df.select(TextStats.rollingFingerprint($"text")).as[Long].collect()
    assert(fp(0) != fp(1))
    assert(fp(0) == fp(2))
    val md = df.select(TextStats.contentFingerprint($"text")).head.getString(0)
    assert(md.length == 32)
  }

  test("minhash shingles produce n-grams") {
    val df = Seq("a b c d").toDF("text")
    val sh = df.select(MinHashDedup.shingles($"text", 3)).as[Seq[String]].head
    assert(sh == Seq("a b c", "b c d"))
    // shorter than n -> whole text as one shingle
    val short = Seq("a b").toDF("text")
      .select(MinHashDedup.shingles($"text", 3)).as[Seq[String]].head
    assert(short == Seq("a b"))
  }

  test("minhash signature is deterministic and identical for identical text") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now")).toDF("id", "text")
    val sigs = df.select($"id", MinHashDedup.signature($"text", 3, 16).as("sig"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(sigs(0)._2 == sigs(1)._2)
    assert(sigs(0)._2 != sigs(2)._2)
  }

  test("minhash native expression: edge cases and shingle-range semantics") {
    // empty text, single token, multi-space (empty tokens), short docs —
    // must not crash and must stay deterministic
    val df = Seq((1L, ""), (2L, "solo"), (3L, "a  b"), (4L, "a b"),
      (5L, "a b c d e")).toDF("id", "text")
    val sigs = df.select($"id", MinHashDedup.signature($"text", 3, 8).as("s"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(sigs.forall(_._2.length == 8))
    assert(sigs.map(_._2).distinct.length == 5)
    // a shingle is a byte range of the text: docs sharing all n-grams of
    // each other have signatures built from the same shingle set
    val same = Seq((1L, "x y z"), (2L, "x y z")).toDF("id", "text")
      .select(MinHashDedup.signature($"text", 3, 8)).as[Seq[Long]].collect()
    assert(same(0) == same(1))
    // band hashes: numBands wide
    val b = df.select(graft.functions.MinHash.bandHashes($"text", 3, 8, 4))
      .as[Seq[Long]].head
    assert(b.length == 4)
  }

  test("minhash LSH finds exact duplicates as candidate pairs") {
    val dup = docs.limit(20)
      .union(docs.limit(20).withColumn("doc_id", $"doc_id" + 1000000L))
    val pairs = MinHashDedup.candidatePairs(dup, "doc_id", "text")
    // every duplicated doc must appear in at least one candidate pair
    assert(pairs.filter($"id_b" === $"id_a" + 1000000L).count() == 20)
  }

  test("a mega-bucket above maxBucketSize is shed instead of exploding O(n^2)") {
    // 40 identical docs share EVERY band bucket: bucket size 40
    val clones = (0 until 40).map(i => (i.toLong, "same boilerplate text here"))
      .toDF("doc_id", "text")
    val shed = MinHashDedup.candidatePairs(clones, "doc_id", "text",
      maxBucketSize = 10)
    assert(shed.count() == 0, "bucket of 40 must shed at cap 10")
    // the safe DEFAULT still finds ordinary duplicate groups
    val kept = MinHashDedup.candidatePairs(clones, "doc_id", "text")
    assert(kept.count() == 40L * 39 / 2)
  }

  test("verifyJaccard computes exact jaccard on candidates") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = MinHashDedup.verifyJaccard(pairs, df, "doc_id", "text", 0.5)
    assert(out.count() == 1)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("dup-cluster resolution: components, singletons, survivors") {
    import graft.dedup.DupClusters
    // chain 1-2-3 (transitive), pair 10-11, singleton 20
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val resolved = DupClusters.resolve(docs, "doc_id", pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(resolved == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    val surv = DupClusters.survivors(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(surv == Set(1L, 10L, 20L))
    // a longer chain still converges (diameter > 2)
    val chain = (1L to 8L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val cc = DupClusters.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L))
    // driver union-find and the distributed loop produce identical labels
    // (driverMaxEdges = 0 forces the loop on the same edges)
    val viaLoop = DupClusters.connectedComponents(chain, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaLoop == cc)
    val pairsLoop = DupClusters
      .connectedComponents(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val pairsDriver = DupClusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(pairsLoop == pairsDriver)
  }

  test("star contraction: long chain converges diameter-independently") {
    import graft.dedup.DupClusters
    // a 200-node chain has diameter 199; min-label propagation would need
    // 199 rounds, large-star/small-star contracts it in O(log n) — the
    // tight maxIter only holds for the star algorithm
    val n = 200L
    val chain = (1L to n).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val cc = DupClusters
      .connectedComponents(chain, maxIter = 12, driverMaxEdges = 0L)
      .as[(Long, Long)].collect()
    assert(cc.length == n.toInt)
    assert(cc.forall(_._2 == 1L))
    // random graph (self-pairs included) parity vs driver union-find
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)(
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .toDF("id_a", "id_b")
    val dist = DupClusters.connectedComponents(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val drv = DupClusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(dist == drv)
  }

  test("components: a session checkpoint dir routes round state to reliable storage") {
    import graft.dedup.DupClusters
    val sc = spark.sparkContext
    val dir = tmpDir("cc-checkpoint")
    sc.setCheckpointDir(dir)
    try {
      val chain = (1L to 50L).sliding(2).map(s => (s.head, s.last)).toSeq
        .toDF("id_a", "id_b")
      val cc = DupClusters.connectedComponents(chain, driverMaxEdges = 0L)
        .as[(Long, Long)].collect()
      assert(cc.length == 50 && cc.forall(_._2 == 1L))
      // per-round state must have materialized as rdd-* checkpoint dirs
      // (survives executor loss, unlike localCheckpoint blocks)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(sc.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var sawRdd = false
      while (it.hasNext && !sawRdd)
        sawRdd = it.next().getPath.toString.contains("/rdd-")
      assert(sawRdd, "reliable checkpoint files must exist under the dir")
    } finally sc.setCheckpointDir(null)
    assert(sc.getCheckpointDir.isEmpty,
      "suite must not leak a checkpoint dir into other tests")
  }

  test("simhash: identical texts equal, near texts close, disjoint texts far") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again tomorrow"),
      (3L, "entirely unrelated vocabulary cluster banana apple orange kiwi")
    ).toDF("id", "text")
    val sig = df.select($"id", SimHash.simhash($"text").as("s"))
      .orderBy("id").as[(Long, Long)].collect().map(_._2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0), sig(1)) < ham(sig(0), sig(2)))
  }

  test("simhash candidatePairs finds near-dups within hamming bound") {
    val dup = docs.limit(10)
      .union(docs.limit(10).withColumn("doc_id", $"doc_id" + 500000L))
    val pairs = SimHash.candidatePairs(dup, "doc_id", "text", maxDist = 3)
    assert(pairs.filter($"id_b" === $"id_a" + 500000L).count() == 10)
  }

  test("survivorsBy keeps the highest-quality member per cluster") {
    val d = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L),  // cluster {1,2,3}: 2 wins (tie->min id)
      (7L, 5L),                          // singleton survives
      (8L, 1L), (9L, 2L)                 // cluster {8,9}: 9 wins
    ).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val out = graft.dedup.DupClusters
      .survivorsBy(d, "doc_id", pairs, $"n_chars")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 7L, 9L))
  }

  test("tuneBands: optimal among all factorizations, threshold-monotone") {
    import graft.dedup.MinHashDedup.{candidateProb, tuneBands}
    val k = 128
    def err(b: Int, r: Int, t: Double): Double = {
      val steps = 1000
      (0 until steps).map { i =>
        val s = (i + 0.5) / steps
        val p = candidateProb(s, b, r)
        if (s < t) 0.5 * p else 0.5 * (1.0 - p)
      }.sum / steps
    }
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val (b, r) = tuneBands(k, t)
      assert(b * r == k, s"banding must use the whole signature: ($b, $r)")
      val best = err(b, r, t)
      for (cb <- 1 to k if k % cb == 0)
        assert(best <= err(cb, k / cb, t) + 1e-12,
          s"t=$t chose ($b,$r) but ($cb,${k / cb}) is better")
    }
    // higher threshold -> steeper curve wanted -> more rows, fewer bands
    assert(tuneBands(k, 0.8)._1 < tuneBands(k, 0.3)._1)
    // the chosen banding's 50%-candidacy point sits near the threshold:
    // s50 = (1 - (1/2)^(1/b))^(1/r)
    val (b5, r5) = tuneBands(k, 0.5)
    val s50 = math.pow(1.0 - math.pow(0.5, 1.0 / b5), 1.0 / r5)
    assert(math.abs(s50 - 0.5) < 0.12, s"S-curve midpoint $s50 far from 0.5")
  }

  test("candidatePairsAtThreshold reproduces candidatePairs at the tuned banding") {
    val d = Tables.load(spark, sf, "documents").limit(300)
    val (b, _) = graft.dedup.MinHashDedup.tuneBands(64, 0.7)
    val auto = graft.dedup.MinHashDedup
      .candidatePairsAtThreshold(d, "doc_id", "text", 0.7)
    val manual = graft.dedup.MinHashDedup
      .candidatePairs(d, "doc_id", "text", numBands = b)
    assert(auto.exceptAll(manual).isEmpty && manual.exceptAll(auto).isEmpty)
  }

  test("segmentStats: duplicate lines and paragraphs, trims and drops empties") {
    import org.apache.spark.sql.functions.col
    // 4 lines, "dup me" twice (7 chars each); blank + padded lines noise
    val text = "dup me\n  dup me  \n\nunique one\nanother"
    val df = Seq(text).toDF("text")
    val byLine = graft.text.TextStats.segmentStats(col("text"), "\n")
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }.head()
    assert(byLine.getAs[Long]("n_segments") == 4)
    assert(byLine.getAs[Long]("n_distinct_segments") == 3)
    assert(byLine.getAs[Long]("seg_chars") == 6 + 6 + 10 + 7)
    assert(byLine.getAs[Long]("distinct_seg_chars") == 6 + 10 + 7)
    // paragraphs: split on blank lines
    val paras = "para one\nstill para one\n\npara two\n\npara two"
    val byPara = graft.text.TextStats
      .segmentStats(col("text"), "\n{2,}")
      .foldLeft(Seq(paras).toDF("text")) {
        case (d, (n, c)) => d.withColumn(n, c) }.head()
    assert(byPara.getAs[Long]("n_segments") == 3)
    assert(byPara.getAs[Long]("n_distinct_segments") == 2)
  }
}
