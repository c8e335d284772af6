package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * choose pretraining documents that LOOK LIKE a small target corpus by
  * scoring each raw document under a hashed-n-gram bag-of-words
  * importance weight log p_target(x) - log p_raw(x), then keeping the
  * top-weighted slice. This is the principled replacement for "filter by
  * heuristics then hope": the weight is a likelihood ratio under two
  * explicit bucket models, and resampling by it provably shifts the
  * selected distribution toward the target's feature distribution.
  *
  * The reference's analog is its per-row quality/sampling converter
  * family (SamplingConverter and the row policies under gobblin-core's
  * policies package) — this adds the corpus-trained target-matching
  * selector a 100 TB training-data pipeline needs.
  *
  * Float-free adaptation (the q93 trick): each word hashes to one of
  * `buckets` buckets via the first 15 hex chars of md5 (bit-identical in
  * any engine with md5; bigram buckets derive arithmetically from the
  * word buckets — see [[withWordBuckets]]), and bucket log-probabilities
  * quantize to
  * floor(log2(count+1)) computed as `length(bin(cnt+1)) - 1` — pure
  * integer/string arithmetic. A doc's importance score is the mean
  * per-gram quantized log-ratio, scaled to integer permille:
  *   dsir_q = sum(lam[bucket(g)]) * 1000 div n_grams,
  *   lam[b] = floor_log2(cnt_target[b]+1) - floor_log2(cnt_raw[b]+1).
  * The dropped additive constant log2(N_raw/N_target) shifts every
  * per-gram mean equally, so the top-k ordering the selector consumes is
  * unchanged, and the whole pipeline is oracle-checkable bit-for-bit.
  *
  * Scale shape: fitting is one explode + one map-side-combined count per
  * corpus with OUTPUT BOUNDED BY `buckets` rows (the hashing trick's
  * point: the model never grows with the corpus — at 100 TB you fit the
  * raw model on a hash-sampled slice and the target model on the small
  * target corpus, both bounded). The lambda table (≤ buckets rows)
  * broadcast-joins the exploded grams; scoring pays one combiner-reduced
  * shuffle on doc ids; top-k select is a TakeOrderedAndProject, never a
  * full materialized sort.
  */
object Dsir {

  /** Lower-cased word tokens: split on non-alphanumeric runs, empties
    * dropped (ASCII token alphabet keeps regex semantics identical
    * across engines' regex dialects). */
  def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** The DSIR feature bag: word unigrams ++ adjacent bigrams (joined
    * with '_'), in document order. */
  def ngramFeatures(text: Column): Column = {
    val toks = wordTokens(text)
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit("_"), element_at(toks, i + 1))))
    concat(toks, bigrams)
  }

  /** Hash a gram to a bucket in [0, buckets): the first 15 hex chars of
    * md5 as a 60-bit integer, mod buckets — the cross-engine-stable
    * hash this repo uses wherever an oracle must re-derive it. */
  def bucket(gram: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast("long"), lit(buckets))
  }

  /** Feature buckets of a document, one md5 per WORD: unigram bucket =
    * h(w); bigram bucket = (31·h(a) + h(b)) mod buckets, derived
    * arithmetically from the word buckets instead of hashing the joined
    * string — half the digest work on the hot path (a hashed-feature
    * model only needs A hash family, not a specific one; 31·x+y is the
    * classic pair combiner and stays < 2^19 for buckets ≤ 2^14, exact in
    * any engine). The word-bucket array is materialized in its own
    * projection so the md5 transform is evaluated once, not re-expanded
    * per reference (HOF subtrees are not CSE'd — the assignCell lesson). */
  private def withWordBuckets(df: DataFrame, textCol: String, buckets: Int,
                              out: String): DataFrame =
    df.withColumn(out,
      transform(wordTokens(col(textCol)), w => bucket(w, buckets)))

  private def explodeBuckets(wb: Column, buckets: Int): Column = {
    val bigrams = when(size(wb) < 2, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(wb) - 1),
        i => pmod(element_at(wb, i) * 31 + element_at(wb, i + 1),
          lit(buckets.toLong))))
    explode(concat(wb, bigrams))
  }

  /** Fit a hashed bucket model: (bucket, cnt) over every feature gram of
    * `textCol`. Output ≤ `buckets` rows regardless of corpus size. */
  def fitBucketCounts(df: DataFrame, textCol: String,
                      buckets: Int = 1 << 14): DataFrame =
    withWordBuckets(df, textCol, buckets, "__wb")
      .select(explodeBuckets(col("__wb"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  private def floorLog2P1(c: Column): Column =
    (length(bin(coalesce(c, lit(0L)) + 1)) - 1).cast("long")

  /** The per-bucket quantized log-ratio table lam[b] =
    * floor_log2(cnt_target[b]+1) - floor_log2(cnt_raw[b]+1); buckets
    * absent from both corpora are absent from the table (their lam is 0
    * by the scorer's coalesce). ≤ `buckets` rows — always broadcastable.
    * Built as tagged-union + re-aggregate rather than a full-outer join:
    * same semantics (a missing side sums to 0), one tiny exchange, no
    * join node in the model path. */
  def importanceTable(targetCounts: DataFrame, rawCounts: DataFrame): DataFrame =
    targetCounts.select(col("bucket"), col("cnt").as("cnt_t"), lit(0L).as("cnt_r"))
      .unionAll(rawCounts.select(col("bucket"), lit(0L).as("cnt_t"),
        col("cnt").as("cnt_r")))
      .groupBy("bucket")
      .agg((floorLog2P1(sum("cnt_t")) - floorLog2P1(sum("cnt_r"))).as("lam"))

  /** Score every document of `df`: per `idCol`, the feature-gram count
    * `n_grams` and the permille importance `dsir_q` (docs with no grams
    * are dropped — no features, no evidence).
    *
    * The per-gram ratio rides shifted by +64 (a quantized log-ratio's
    * max magnitude: counts are < 2^60, so |lam| ≤ 60) purely to keep the
    * division's dividend non-negative — engines disagree on NEGATIVE
    * integer division (Spark `div` truncates toward zero, DuckDB `//`
    * floors), and a constant shift of the mean preserves the ordering
    * the selector consumes. Neutral (OOV/absent-bucket) score is
    * therefore 64000, not 0. */
  def score(df: DataFrame, table: DataFrame, idCol: String, textCol: String,
            buckets: Int = 1 << 14): DataFrame =
    scoreCounts(docBucketCounts(df, idCol, textCol, buckets), table, idCol)

  /** The one scoring implementation (shared by [[score]] and
    * [[selectLikeTarget]] so the parity-critical shift/division can
    * never fork): fold a per-doc bucket histogram against the broadcast
    * lambda table. */
  private def scoreCounts(perDoc: DataFrame, table: DataFrame,
                          idCol: String): DataFrame =
    perDoc
      .join(broadcast(table), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_grams"),
        sum((coalesce(col("lam"), lit(0L)) + 64L) * col("cnt")).as("lam_sum"))
      .withColumn("dsir_q", expr("lam_sum * 1000L div n_grams"))
      .drop("lam_sum")

  /** The selector: the `k` highest-scoring documents, ties broken by id
    * so selection is deterministic (the paper's Gumbel-top-k adds noise
    * for diversity; a seeded variant would add a salted-hash tiebreak
    * column — the deterministic face is what an oracle can check). */
  def selectTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("dsir_q").desc, col(idCol).asc).limit(k)

  /** Per-document bucket histogram: (idCol, bucket, cnt). The one pass
    * that pays the gram explode + hash; both the raw model and the
    * scorer derive from it below, so its exchange is planned ONCE and
    * reused (Spark's ReuseExchange dedups identical subtrees — the
    * Tfidf two-level-agg pattern). */
  def docBucketCounts(df: DataFrame, idCol: String, textCol: String,
                      buckets: Int = 1 << 14): DataFrame =
    withWordBuckets(df.select(col(idCol), col(textCol)), textCol, buckets, "__wb")
      .select(col(idCol), explodeBuckets(col("__wb"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** End-to-end: fit target + raw bucket models, score `raw`, keep the
    * top `k` target-most documents. The raw corpus is exploded/hashed
    * exactly once (its model and its scores both fold the shared
    * [[docBucketCounts]] frame); the target — small by definition in
    * DSIR — pays its own explode, so it may be a different corpus
    * entirely (the canonical Wikipedia-vs-CommonCrawl setup). */
  def selectLikeTarget(raw: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, k: Int,
                       buckets: Int = 1 << 14): DataFrame = {
    val perDoc = docBucketCounts(raw, idCol, textCol, buckets)
    val rawCounts = perDoc.groupBy("bucket").agg(sum("cnt").as("cnt"))
    val table = importanceTable(
      fitBucketCounts(target, textCol, buckets), rawCounts)
    selectTopK(scoreCounts(perDoc, table, idCol), idCol, k)
  }
}
