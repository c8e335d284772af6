package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * fastText/CCNet-shaped corpus filter (Wenzek et al. 2020 §4.3;
  * GPT-3's WebText-vs-CommonCrawl quality model, Brown et al. 2020
  * appendix A): train a logistic regression on a labeled sample, then
  * score the whole corpus and keep what looks like the reference
  * distribution.
  *
  * 100 TB shape: the TRAINING set is bounded (`maxTrainDocs`,
  * deterministic hash-sample like IVF's quantizer sample — a quality
  * model needs 10⁴–10⁶ labeled docs, never the corpus), so each
  * gradient epoch shuffles only sample-sized frames; SCORING is the
  * corpus-scale pass and is one broadcast join + one per-doc aggregate
  * — no epoch loop, no driver data. Features are hashed-unigram term
  * frequencies (portable md5 word hash mod `buckets`, the same trick
  * as DSIR's buckets), so the weight table is a dense ≤`buckets`-row
  * broadcast, never a vocabulary-sized map.
  *
  * Training is full-batch gradient descent with classical momentum on
  * the logistic loss with L2: v ← βv + ∇L; w ← w − lr·v. Momentum is
  * what makes FULL-batch practical here — it compounds the persistent
  * gradient directions ~1/(1−β)× without the divergence risk of a
  * 10× raw step. Each epoch: one broadcast
  * weight join + per-doc margin aggregate, one join back + per-bucket
  * gradient aggregate (≤ buckets rows to the driver). Float sums
  * commute only approximately — scores are floats, so this operator
  * ships rows-only (no SQL oracle), pinned by behavioral units
  * (planted-rule recovery, holdout accuracy, sign of learned weights).
  */
object QualityClassifier {

  /** Dense weights indexed by bucket; bias at the end. */
  final case class LrModel(weights: Array[Double], bias: Double,
                           buckets: Int) {
    require(weights.length == buckets)
  }

  private val MaxBuckets = 1 << 20

  /** Per-doc hashed-unigram features: (idCol, carry…, bucket, x) with
    * x = raw term count. Raw counts (not tf fractions) keep margins
    * O(counts) so full-batch gradient steps move decisively; the L2
    * term bounds the weights where a fraction scheme would instead
    * shrink every gradient by the doc length. */
  private def features(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int, carry: Seq[String]): DataFrame = {
    val words = df
      .select((col(idCol) +: carry.map(col)) :+
        explode(split(col(textCol), " ")).as("__word"): _*)
      .filter(length(col("__word")) > 0)
    val bucketed = words.withColumn("__bucket",
      pmod(TextStats.portableHash60(col("__word")), lit(buckets.toLong)))
    bucketed
      .groupBy((col(idCol) +: carry.map(col)) :+ col("__bucket"): _*)
      .agg(count(lit(1)).cast("double").as("__x"))
  }

  /** Train on a BOUNDED deterministic sample of `df` (hash of idCol;
    * refuses to silently truncate — the sample rate derives from an
    * exact count so the cap is honored layout-independently). */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
            buckets: Int = 4096, epochs: Int = 60, lr: Double = 1.0,
            l2: Double = 1e-4, momentum: Double = 0.9,
            maxTrainDocs: Long = 200000L): LrModel = {
    require(buckets > 0 && buckets <= MaxBuckets,
      s"buckets must be in (0, $MaxBuckets], got $buckets")
    require(epochs > 0 && maxTrainDocs > 0)
    val spark = df.sparkSession
    val n0 = df.count()
    val sampled =
      if (n0 <= maxTrainDocs) df
      else {
        // deterministic hash-sample down to ≈maxTrainDocs
        val mod = 1000000L
        val keep = maxTrainDocs * mod / n0
        df.filter(pmod(TextStats.portableHash60(
          concat(lit("qc-sample:"), col(idCol).cast("string"))),
          lit(mod)) < lit(keep))
      }
    val feats = features(sampled, idCol, textCol, buckets,
        carry = Seq(labelCol))
      .withColumn("__y", col(labelCol).cast("double"))
      .select(col(idCol).as("__id"), col("__y"), col("__bucket"), col("__x"))
      .persist()
    val n = feats.select("__id").distinct().count()
    require(n > 0, "training set is empty")

    var w = new Array[Double](buckets)
    var bias = 0.0
    val vel = new Array[Double](buckets)
    var velBias = 0.0
    try {
      (0 until epochs).foreach { _ =>
        val wDf = spark.createDataFrame(
          w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq)
          .toDF("__bucket", "__w")
        val margins = feats
          .join(broadcast(wDf), "__bucket")
          .groupBy("__id", "__y")
          .agg((sum(col("__x") * col("__w")) + lit(bias)).as("__m"))
          .withColumn("__p", lit(1.0) / (lit(1.0) + exp(-col("__m"))))
          .select("__id", "__y", "__p")
        val resid = margins.withColumn("__r", col("__p") - col("__y"))
        val gradRows = feats
          .join(resid.select("__id", "__r"), "__id")
          .groupBy("__bucket")
          .agg(sum(col("__r") * col("__x")).as("__g"))
          .collect()
        val biasGrad = resid.agg(sum("__r")).collect()(0).getDouble(0) / n
        val grad = new Array[Double](buckets)
        gradRows.foreach(r => grad(r.getLong(0).toInt) = r.getDouble(1) / n)
        var i = 0
        while (i < buckets) {
          vel(i) = momentum * vel(i) + grad(i) + l2 * w(i)
          w(i) -= lr * vel(i)
          i += 1
        }
        velBias = momentum * velBias + biasGrad
        bias -= lr * velBias
      }
    } finally feats.unpersist()
    LrModel(w, bias, buckets)
  }

  /** Corpus-scale scoring: broadcast the ≤buckets-row weight table,
    * one per-doc aggregate → P(label=1). Appends `scoreCol` (and a
    * boolean `predCol` at 0.5) to one row per input doc. */
  def score(df: DataFrame, model: LrModel, idCol: String, textCol: String,
            scoreCol: String = "quality_score",
            predCol: String = "quality_pred"): DataFrame = {
    val spark = df.sparkSession
    val wDf = spark.createDataFrame(
      model.weights.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq)
      .toDF("__bucket", "__w")
    val feats = features(df, idCol, textCol, model.buckets, carry = Seq.empty)
    val scored = feats
      .join(broadcast(wDf), "__bucket")
      .groupBy(idCol)
      .agg((sum(col("__x") * col("__w")) + lit(model.bias)).as("__m"))
      .withColumn(scoreCol, lit(1.0) / (lit(1.0) + exp(-col("__m"))))
      .withColumn(predCol, col(scoreCol) >= lit(0.5))
      .select(col(idCol), col(scoreCol), col(predCol))
    // a doc with no tokens never reaches the aggregate: it scores at
    // the bias alone rather than silently dropping from the output
    val biasP = 1.0 / (1.0 + math.exp(-model.bias))
    df.join(scored, Seq(idCol), "left")
      .withColumn(scoreCol, coalesce(col(scoreCol), lit(biasP)))
      .withColumn(predCol, coalesce(col(predCol), lit(biasP >= 0.5)))
  }
}
