package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram language-model familiarity scoring — the CCNet-style
  * "does this look like the reference corpus?" quality gate (Wenzek et
  * al. 2020 score documents with a KenLM model and keep the low-
  * perplexity head; the reference's quality hooks are the per-row policy
  * predicates under gobblin-core's policies package, which this extends
  * with a corpus-trained signal).
  *
  * Instead of float log-probabilities, the score quantizes each gram's
  * corpus frequency to floor(log2(count)) computed as
  * `length(bin(count)) - 1` — pure integer/string arithmetic, so the
  * whole pipeline (train + score) is bit-identical across engines and
  * oracle-checkable. A doc's familiarity is the mean quantized
  * frequency of its grams, scaled to integer permille:
  *   fam_q = sum(floor_log2(cnt(g))) * 1000 div n_grams.
  * Common character sequences score high; gibberish / wrong-alphabet
  * text scores near zero. Thresholding fam_q (or taking corpus
  * percentiles of it) reproduces CCNet's head/middle/tail bucketing
  * without a float in sight.
  *
  * Scale shape: training is one explode + one map-side-combined count
  * per distinct gram (vocab-bounded output — at 100 TB you train on a
  * hash-sampled slice, e.g. `SamplingConverter`, exactly as CCNet trains
  * on a Wikipedia-sized sample). Scoring explodes the docs' grams,
  * broadcast-joins the (bounded) model, and re-aggregates per doc: the
  * corpus pays one combiner-reduced shuffle on doc ids and never
  * shuffles the model.
  */
object NgramLm {

  /** The stricter [[trainCollected]] `maxGrams` bound new pipelines
    * should opt into explicitly (the compatible default remains 2M). */
  val RecommendedMaxGrams: Int = 200000

  /** All char n-grams of `text` in order (length-n windows, step 1);
    * empty array when the text is shorter than n. */
  def charGrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be positive: $n")
    // sequence(1, 0) DESCENDS in Spark, so short texts need an explicit
    // empty-array branch rather than relying on an empty sequence
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
  }

  /** Train the gram-frequency model: (gram, cnt) for every char n-gram
    * occurring at least `minCount` times in `textCol`. LAZY — the
    * returned frame carries the corpus aggregate as its lineage, so a
    * consumer that references the model twice (or caches a plan built
    * on it) pays the corpus scan per reference. Single-consumer
    * pipelines (q93's one-shot scoring) are fine; anything that fans
    * the model out should use [[trainCollected]]. */
  def train(df: DataFrame, textCol: String, n: Int = 3,
            minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    df.select(explode(charGrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** [[train]] MATERIALIZED to a small driver-built table — the
    * bounded-trainer pattern every other trainer in this repo uses
    * (ivfTrain, PQ, BPE): the (gram, cnt) vocab is bounded (charset^n
    * at most, minCount prunes the tail), so collecting it once means
    * downstream plans embed a literal-sized table instead of the
    * corpus aggregate. Round-10 finding: leaving the model lazy made
    * CCNet tiering recompute the corpus trigram aggregate under its
    * cache and DOUBLED q110's wall time. `maxGrams` guards the pull —
    * a blown guard means minCount (or n) is wrong for the corpus. The
    * default stays at the original 2,000,000 so no existing caller's
    * model is refused by an upgrade; [[RecommendedMaxGrams]] (200k, an
    * order of magnitude over the ~50k trigrams a real tiering model
    * carries) is the stricter OPT-IN bound new pipelines should pass
    * explicitly — a driver pull (and the local relation embedded in
    * every downstream plan) past that size is rarely what anyone
    * wants. Pass `metrics` to gauge the collected size
    * (`ngram_lm.collected_grams`) so a near-blown guard is diagnosable
    * from the stage metrics, not just the refusal. */
  def trainCollected(df: DataFrame, textCol: String, n: Int = 3,
                     minCount: Long = 2L,
                     maxGrams: Int = 2000000,
                     metrics: Option[graft.metrics.MetricContext] = None)
      : DataFrame = {
    val spark = df.sparkSession
    val rows = train(df, textCol, n, minCount).limit(maxGrams + 1).collect()
    metrics.foreach(_.gauge("ngram_lm.collected_grams", rows.length.toLong))
    require(rows.length <= maxGrams,
      s"n-gram model exceeds maxGrams=$maxGrams — raise minCount " +
        "or train on a sample")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("gram",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** floor(log2(c)) for a positive BIGINT column, via the binary-string
    * length — integer-exact in any engine with bin() (no float log). */
  private[text] def floorLog2(c: Column): Column =
    (length(bin(c)) - 1).cast("long")

  /** Score `df` against a trained model: per `idCol`, the gram count
    * `n_grams` and the permille familiarity `fam_q` (docs shorter than
    * n grams are dropped — they have no signal). Model grams absent
    * from a doc contribute nothing; doc grams absent from the model
    * (rare/OOV sequences) contribute zero — the smoothing floor. */
  def familiarity(df: DataFrame, model: DataFrame, idCol: String,
                  textCol: String, n: Int = 3): DataFrame = {
    val grams = df.select(col(idCol),
      explode(charGrams(col(textCol), n)).as("gram"))
    grams.join(broadcast(model.select(col("gram"), col("cnt"))),
        Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("cnt").isNull, 0L)
          .otherwise(floorLog2(col("cnt")))).as("fam_raw"))
      .filter(col("n_grams") > 0)
      .withColumn("fam_q", expr("fam_raw * 1000L div n_grams"))
      .drop("fam_raw")
  }
}
