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
