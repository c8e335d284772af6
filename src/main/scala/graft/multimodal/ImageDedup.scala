package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Multimodal.{ImageCodec, MediaRecord}

/** Perceptual image deduplication over REAL pixels: a 64-bit difference
  * hash (dHash) computed from each payload's decoded, 9x8-downscaled
  * grayscale — re-encodes, resizes and format changes that preserve the
  * content map to the same (or nearly the same) hash, so exact dedup is
  * a hash groupBy and near-dup is Hamming proximity.
  *
  * Scale shape mirrors the TEXT near-dup stack (reference compaction +
  * MinHash banding, `dedup/MinHashDedup.scala`): the hash pass is
  * map-only (decode confined to mapPartitions, one decoder per
  * partition); near-dup pairing splits the 64-bit hash into
  * `maxHamming + 1` bands, so by pigeonhole any pair within the Hamming
  * bound shares at least one full band — candidates come from an
  * equi-join on (band index, band value), never an all-pairs scan, and
  * each candidate is verified exactly with one XOR + bit_count.
  * Degenerate band buckets (a constant-color corpus) are capped loudly
  * like every other pairing in this engine.
  */
object ImageDedup {

  /** 64-bit dHash of a decoded image: downscale to 9x8 luminance via
    * area-averaging over the source grid (deterministic integer
    * arithmetic — unlike Graphics2D filtering, identical across JDK
    * implementations), then one bit per horizontal neighbor comparison. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val gray = downscaleGray(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(y)(x + 1) > gray(y)(x))
          bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Integer area-average downscale to w x h luminance (0..255). */
  private[multimodal] def downscaleGray(img: java.awt.image.BufferedImage,
                                        w: Int, h: Int): Array[Array[Int]] = {
    val sw = img.getWidth
    val sh = img.getHeight
    val out = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      val y0 = y * sh / h
      val y1 = math.max(y0 + 1, (y + 1) * sh / h)
      var x = 0
      while (x < w) {
        val x0 = x * sw / w
        val x1 = math.max(x0 + 1, (x + 1) * sw / w)
        var sum = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val rgb = img.getRGB(xx, yy)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            xx += 1
          }
          yy += 1
        }
        out(y)(x) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Map-only hash pass: (media_id, dhash) with one decode per record,
    * decoder machinery initialized per partition. Non-image or
    * undecodable payloads refuse loudly — a silently skipped image is a
    * duplicate that survives. */
  def hashImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "image",
        s"media_id=${r.media_id}: dHash is an IMAGE hash (got ${r.media_type})")
      val img = ImageCodec.read(r.payload)
      require(img != null,
        s"media_id=${r.media_id}: payload is not a decodable image")
      (r.media_id, dHash64(img))
    }).toDF("media_id", "dhash")
  }

  /** Exact perceptual dedup: every image labeled with its group's
    * representative (min media_id sharing the hash) — one hash shuffle,
    * the compaction-dedup shape over content instead of keys. */
  def exactGroups(media: DataFrame): DataFrame = {
    val h = hashImages(media)
    h.withColumn("group_rep",
      min(col("media_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))))
      .select("media_id", "dhash", "group_rep")
  }

  /** Near-duplicate pairs among (media_id, dhash) rows: banded candidate
    * generation + exact Hamming verify. Output (id_a, id_b, hamming),
    * id_a < id_b, each pair once. `maxBucket` caps a band bucket's
    * size — a bucket past it is shed LOUDLY (constant-content corpora
    * would otherwise quadratically explode one bucket; shed pairs are
    * exact-duplicates of each other anyway whenever the full hash
    * matches, which [[exactGroups]] already handles). */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int,
                   maxBucket: Long = 100000L): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 16,
      s"maxHamming $maxHamming not in [1,16]")
    val bands = maxHamming + 1
    val width = 64 / bands
    // band b covers bits [b*width, (b+1)*width) — the last band absorbs
    // the remainder; any pair with <= maxHamming differing bits shares
    // at least one band unchanged (pigeonhole over bands+ buckets)
    val banded = hashes.select(col("media_id"), col("dhash"),
      explode(array((0 until bands).map { b =>
        val lo = b * width
        val w = if (b == bands - 1) 64 - lo else width
        val mask = if (w == 64) -1L else (1L << w) - 1L
        struct(lit(b).as("band"),
          (shiftrightunsigned(col("dhash"), lo)
            .bitwiseAND(lit(mask))).as("value"))
      }: _*)).as("bv"))
      .select(col("media_id"), col("dhash"),
        col("bv.band").as("band"), col("bv.value").as("value"))
    val big = banded.groupBy("band", "value").count()
      .filter(col("count") > maxBucket)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    if (big.nonEmpty)
      System.err.println(s"[image-dedup] shedding ${big.length} band " +
        s"buckets past $maxBucket: " +
        big.map { case (b, v, n) => s"band$b=$v($n)" }.mkString(", "))
    val shed = big.map { case (b, v, _) => (b, v) }.toSet
    val kept =
      if (shed.isEmpty) banded
      else {
        val shedDf = hashes.sparkSession
          .createDataFrame(shed.toSeq).toDF("band", "value")
        banded.join(broadcast(shedDf), Seq("band", "value"), "left_anti")
      }
    val a = kept.select(col("band"), col("value"),
      col("media_id").as("id_a"), col("dhash").as("h_a"))
    val b = kept.select(col("band"), col("value"),
      col("media_id").as("id_b"), col("dhash").as("h_b"))
    a.join(b, Seq("band", "value"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a close pair can share several bands
  }

  /** INCREMENTAL image dedup — the image face of
    * [[graft.dedup.IncrementalDedup]]: admit only batch images whose
    * perceptual hash was never committed, at O(batch) cost (Bloom
    * prefilter over the committed store, exact anti-join only for the
    * positives). The committed store is one string column `h` holding
    * prior dHashes (`survivors` output's `content_hash`); within-batch
    * duplicates collapse to the min media_id. The decode+hash pass is
    * map-only; nothing about the committed corpus is re-read beyond the
    * sketch build. */
  def incrementalSurvivors(batch: DataFrame, committedHashes: DataFrame,
                           fpp: Double = 0.01): DataFrame =
    graft.dedup.IncrementalDedup.survivors(
      hashImages(batch), committedHashes, "media_id",
      col("dhash").cast("string"), fpp)

  /** Image DECONTAMINATION — the image face of the n-gram/semantic eval
    * decontamination pass: flag every corpus image whose perceptual hash
    * lies within `maxHamming` of ANY eval image, so benchmark imagery
    * (and its re-encoded/brightness-shifted near-copies) never leaks
    * into training data. The eval set is bounded (`maxEval`, refused
    * loudly past it) and BROADCAST — the corpus never shuffles: one
    * map-only hash pass, one broadcast band join, exact bit_count
    * verify. Output: every corpus row's (media_id, contaminated). */
  def decontaminate(corpus: DataFrame, eval: DataFrame, maxHamming: Int,
                    maxEval: Long = 100000L): DataFrame = {
    val evalHashes = hashImages(eval)
    val nEval = evalHashes.count()
    require(nEval <= maxEval,
      s"eval set has $nEval images > maxEval=$maxEval — a broadcast this " +
        "size would flood the executors; raise maxEval deliberately")
    require(maxHamming >= 0 && maxHamming <= 16,
      s"maxHamming $maxHamming not in [0,16]")
    val bands = math.max(maxHamming, 1) + 1
    val width = 64 / bands
    def banded(df: DataFrame, idAs: String, hashAs: String): DataFrame =
      df.select(col("media_id").as(idAs), col("dhash").as(hashAs),
        explode(array((0 until bands).map { b =>
          val lo = b * width
          val w = if (b == bands - 1) 64 - lo else width
          val mask = if (w == 64) -1L else (1L << w) - 1L
          struct(lit(b).as("band"),
            (shiftrightunsigned(col("dhash"), lo)
              .bitwiseAND(lit(mask))).as("value"))
        }: _*)).as("bv"))
        .select(col(idAs), col(hashAs),
          col("bv.band").as("band"), col("bv.value").as("value"))
    val corpusHashes = hashImages(corpus)
    val hits = banded(corpusHashes, "media_id", "h_c")
      .join(broadcast(banded(evalHashes, "eval_id", "h_e")),
        Seq("band", "value"))
      .filter(bit_count(col("h_c").bitwiseXOR(col("h_e"))) <= maxHamming)
      .select("media_id").distinct()
    corpusHashes.select("media_id")
      .join(hits.withColumn("contaminated", lit(true)), Seq("media_id"),
        "left")
      .select(col("media_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Near-dup clusters over a media table: hash, pair, resolve connected
    * components ([[graft.dedup.DupClusters.resolve]] — same star
    * contraction as the text dedup path). Output (media_id, cluster_id),
    * singletons their own cluster. */
  def clusters(media: DataFrame, maxHamming: Int,
               maxBucket: Long = 100000L): DataFrame = {
    val h = hashImages(media)
    val pairs = nearDupPairs(h, maxHamming, maxBucket)
      .select(col("id_a"), col("id_b"))
    graft.dedup.DupClusters.resolve(
      h.select(col("media_id")), "media_id", pairs)
  }
}
