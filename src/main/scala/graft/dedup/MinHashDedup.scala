package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over a text column.
  *
  * Pipeline (all DataFrame-native, ONE shuffle on band buckets):
  *   1. shingle: sliding word n-grams per document;
  *   2. minhash signature: k independent hash functions folded in a SINGLE
  *      `aggregate` pass that maintains an array of k running minima — each
  *      shingle string is materialized exactly once and gets k cheap
  *      xxhash64 evaluations (codegen does not CSE across higher-order
  *      functions, so the naive "k array_min(transform(...))" formulation
  *      rebuilds the shingle array k times — a measured ~20x slowdown);
  *   3. banding: split the k-signature into b bands of r rows; hash each
  *      band; explode to (band_idx, band_hash, doc_id);
  *   4. candidate pairs: group by (band_idx, band_hash), collect the
  *      bucket's ids, and emit intra-bucket pairs with a generator
  *      expression. This replaces a self-join of the band table against
  *      itself — the join re-evaluated the whole signature pipeline twice
  *      (different aliases defeat ReuseExchange) and shuffled both sides;
  *      the groupBy shuffles once and evaluates signatures once.
  *
  * Scale: the only shuffle key space is O(docs x bands); a pathological
  * bucket (identical boilerplate across millions of docs) would emit
  * O(bucket^2) pairs from one task, so buckets above `maxBucketSize` are
  * dropped (boilerplate that frequent is better handled by exact dedup
  * first); exact verification touches only candidate pairs, never the
  * full cross product.
  *
  * Reference semantics: near-dup candidate generation for training-data
  * dedup; the reference engine has only exact key dedup
  * (gobblin-compaction/.../mapreduce/avro/AvroKeyMapper.java:48) — this is
  * the LLM-pipeline extension of it.
  */
object MinHashDedup {

  /** Sliding word n-grams as an array column (empty-safe: short docs
    * collapse to one whole-text shingle). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** k-wide minhash signature (array<bigint>): one native-expression eval
    * per row maintaining k running minima over the shingle hashes — each
    * shingle is hashed in place as a byte range of the text, exactly once
    * (see [[graft.functions.MinHashSignature]] for why this is an
    * Expression, not higher-order functions). */
  def signature(text: Column, n: Int, k: Int): Column =
    graft.functions.MinHash.signature(text, n, k)

  /** (band_idx, band_hash) rows per document. The band hashes come out of
    * the same single-pass native expression (the k-wide signature never
    * materializes in the plan). */
  def bands(df: DataFrame, idCol: String, textCol: String,
            n: Int, k: Int, numBands: Int): DataFrame =
    df.select(col(idCol), posexplode(
      graft.functions.MinHash.bandHashes(col(textCol), n, k, numBands))
      .as(Seq("band_idx", "band_hash")))

  /** The S-curve: P(candidate | jaccard s) for a (bands, rows) banding. */
  def candidateProb(s: Double, numBands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), numBands)

  /** Pick the (numBands, rowsPerBand) banding of a k-hash signature that
    * best separates pairs at `threshold`: minimize the weighted area of
    * the S-curve's false-positive region (below t) plus its false-
    * negative region (above t), integrated numerically — the standard
    * LSH parameter optimization (Leskovec/Rajaraman/Ullman, Mining of
    * Massive Datasets §3.4.3; same objective as datasketch's
    * _optimal_param). Only exact factorizations b*r = k are considered
    * so no signature hash is wasted. Driver-side pure math — O(d(k) *
    * steps) — run once at plan time. */
  def tuneBands(k: Int, threshold: Double, fpWeight: Double = 0.5,
                fnWeight: Double = 0.5): (Int, Int) = {
    require(k >= 2, s"signature size must be >= 2: $k")
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    val steps = 1000
    def error(b: Int, r: Int): Double = {
      var fp = 0.0; var fn = 0.0
      var i = 0
      while (i < steps) {
        val s = (i + 0.5) / steps
        val p = candidateProb(s, b, r)
        if (s < threshold) fp += p else fn += 1.0 - p
        i += 1
      }
      (fpWeight * fp + fnWeight * fn) / steps
    }
    val divisorPairs = (1 to k).filter(k % _ == 0).map(b => (b, k / b))
    divisorPairs.minBy { case (b, r) => error(b, r) }
  }

  /** [[candidatePairs]] with the banding derived from a target Jaccard
    * threshold via [[tuneBands]] instead of a hand-picked band count. */
  def candidatePairsAtThreshold(df: DataFrame, idCol: String,
                                textCol: String, threshold: Double,
                                n: Int = 3, k: Int = 64,
                                maxBucketSize: Int = 10000): DataFrame = {
    val (b, _) = tuneBands(k, threshold)
    candidatePairs(df, idCol, textCol, n, k, numBands = b,
      maxBucketSize = maxBucketSize)
  }

  /** Near-duplicate candidate pairs (id_a < id_b), distinct.
    *
    * numBands trades recall for candidate volume: rows-per-band r = k/b,
    * P(candidate | jaccard j) = 1 - (1 - j^r)^b. The default r=2, b=32
    * keeps the miss probability below ~1e-4 even at j=0.5 (and ~1e-22 at
    * j=0.9) at the cost of more false candidates — which the exact-verify
    * stage filters anyway; pick band counts from the target threshold
    * when tuning. `maxBucketSize` BOUNDS each bucket's O(bucket²) pair
    * fan-out: one boilerplate mega-bucket at corpus scale would otherwise
    * emit billions of pairs from a single task, so the safe cap is the
    * DEFAULT and unbounded (`Int.MaxValue`) is the explicit opt-in. Pairs
    * wholly inside a shed bucket are lost — run exact dedup first so
    * degenerate buckets don't exist, and treat a shed as a data-quality
    * signal, not noise. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, k: Int = 64, numBands: Int = 32,
                     maxBucketSize: Int = 10000): DataFrame = {
    val b = bands(df, idCol, textCol, n, k, numBands)
    val ids = col("ids")
    b.groupBy(col("band_idx"), col("band_hash"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(ids) > 1 && size(ids) <= maxBucketSize)
      .select(explode(flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + lit(2), size(ids)),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
  }

  /** Exact n-gram shingle-set Jaccard for given pairs (verification stage
    * — measures the same set similarity the minhash signature estimates). */
  def verifyShingleJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                           textCol: String, n: Int,
                           threshold: Double): DataFrame =
    verifySets(pairs,
      docs.select(col(idCol), array_distinct(shingles(col(textCol), n)).as("tokset")),
      idCol, threshold)

  /** Exact word-set Jaccard for given pairs (verification stage). */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, threshold: Double): DataFrame =
    verifySets(pairs,
      docs.select(col(idCol), array_distinct(split(col(textCol), " ")).as("tokset")),
      idCol, threshold)

  private def verifySets(pairs: DataFrame, withTokens: DataFrame,
                         idCol: String, threshold: Double): DataFrame =
    // sort-merge hint: the token-set (corpus) side must never be
    // auto-broadcast — Catalyst undercounts array columns through
    // generate/union and a mis-broadcast corpus OOMs the driver (seen in
    // ScaleProbe's embedding twin, Ann.nearDupPairs); SMJ spills safely
    // on both sides at any scale
    pairs
      .join(withTokens.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("tokset", "tok_a").hint("merge"), "id_a")
      .join(withTokens.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("tokset", "tok_b").hint("merge"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
          size(array_union(col("tok_a"), col("tok_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
}
