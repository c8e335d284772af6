package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over a text column.
  *
  * Pipeline (all DataFrame-native, shuffle only on band buckets):
  *   1. shingle: sliding word n-grams per document;
  *   2. minhash signature: k independent hash functions, each the min over
  *      shingles of xxhash64(seed_i ++ shingle);
  *   3. banding: split the k-signature into b bands of r rows; hash each
  *      band; explode to (band_idx, band_hash, doc_id);
  *   4. candidate pairs: self-join within (band_idx, band_hash) buckets.
  *
  * Scale: the only shuffle is the groupBy/join on band buckets whose
  * cardinality is O(docs × b); skew (a giant bucket from boilerplate
  * documents) is handled by AQE skew-join; exact verification of
  * candidates (ngram Jaccard) touches only the candidate pairs, never the
  * full cross product.
  */
object MinHashDedup {

  /** Sliding word n-grams as an array column (empty-safe). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** k-wide minhash signature (array<bigint>). Deterministic: hash i of
    * shingle s = xxhash64(i, s). */
  def signature(text: Column, n: Int, k: Int): Column = {
    val sh = shingles(text, n)
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)
  }

  /** (band_idx, band_hash) rows per document. */
  def bands(df: DataFrame, idCol: String, textCol: String,
            n: Int, k: Int, numBands: Int): DataFrame = {
    require(k % numBands == 0, s"k=$k must divide into numBands=$numBands")
    val r = k / numBands
    val withSig = df.select(col(idCol), signature(col(textCol), n, k).as("sig"))
    withSig.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(lit("band"), b, concat_ws(",",
          slice(col("sig"), b * lit(r) + lit(1), lit(r)))))).as(Seq("band_idx", "band_hash")))
  }

  /** Near-duplicate candidate pairs (id_a < id_b), distinct. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, k: Int = 32, numBands: Int = 8): DataFrame = {
    val b = bands(df, idCol, textCol, n, k, numBands)
    val l = b.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val r = b.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact word-set Jaccard for given pairs (verification stage). */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, threshold: Double): DataFrame = {
    val withTokens = docs.select(col(idCol),
      array_distinct(split(col(textCol), " ")).as("tokset"))
    pairs
      .join(withTokens.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("tokset", "tok_a"), "id_a")
      .join(withTokens.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("tokset", "tok_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
          size(array_union(col("tok_a"), col("tok_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
