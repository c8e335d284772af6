package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted corpus mixing — the "data mixing" step of a
  * pretraining pipeline: each source s should contribute weight w_s
  * epochs of its documents to the training stream (w_s > 1 upsamples by
  * repetition, w_s < 1 downsamples).
  *
  * The reference's ingestion side of this is per-dataset copy/sample
  * configuration (gobblin-data-management CopyableDataset prioritization
  * + the SamplingConverter family, gobblin-core/.../converter/
  * SamplingConverter.java); the epoch-weighted mix itself is the
  * LLM-corpus extension of those semantics.
  *
  * Determinism: the integer part of w_s becomes full copies; the
  * fractional part admits a document iff a salted md5-derived hash of
  * its key falls under round(frac*100)/100 — the same portable-hash
  * contract as the stratified sampler, so the mix is reproducible
  * run-to-run AND oracle-checkable in any engine with md5.
  *
  * Scale shape: MAP-ONLY. `copies` is a row-local expression and the
  * epoch expansion is a generator (explode of a sequence) — no shuffle,
  * no state; at 100 TB the mix pipelines straight from the scan into
  * the writer, and per-epoch shuffling for training order is the
  * downstream shuffle job's concern, not the mix's.
  */
object CorpusMix {

  /** Per-source copy count: floor(w) + 1{hash(key) mod 100 < frac%}. */
  private[text] def copiesExpr(sourceCol: String, keyCol: String,
                               weights: Map[String, Double], default: Double,
                               salt: String): Column = {
    def parts(w: Double): (Int, Int) = {
      require(w >= 0 && w < 1000, s"weight out of range: $w")
      val whole = math.floor(w).toInt
      (whole, math.round((w - whole) * 100).toInt)
    }
    val (defWhole, defFrac) = parts(default)
    val sorted = weights.toSeq.sortBy(_._1)
    val whole = sorted.foldLeft[Column](lit(defWhole)) {
      case (els, (s, w)) => when(col(sourceCol) === lit(s),
        lit(parts(w)._1)).otherwise(els)
    }
    val frac = sorted.foldLeft[Column](lit(defFrac)) {
      case (els, (s, w)) => when(col(sourceCol) === lit(s),
        lit(parts(w)._2)).otherwise(els)
    }
    val h = pmod(TextStats.portableHash60(
      concat(lit(salt), col(keyCol).cast("string"))), lit(100L))
    (whole + when(h < frac, 1).otherwise(0)).cast("long")
  }

  /** Expand the corpus to its weighted mix: every surviving row appears
    * once per epoch with `epochCol` in [0, copies). Weights are
    * per-`sourceCol` value; unlisted sources get `default`. Fractional
    * weights are honored to 1/100 precision. */
  def mixByWeights(sourceCol: String, keyCol: String,
                   weights: Map[String, Double], default: Double = 1.0,
                   epochCol: String = "epoch", salt: String = "mix")(
      df: DataFrame): DataFrame = {
    val copies = copiesExpr(sourceCol, keyCol, weights, default, salt)
    df.withColumn("__graft_copies", copies)
      .filter(col("__graft_copies") > 0)
      .withColumn(epochCol,
        explode(sequence(lit(0L), col("__graft_copies") - 1)))
      .drop("__graft_copies")
  }

  /** Temperature-scaled per-source mix targets — the multilingual /
    * multi-source balancing rule (mT5, Xue et al. 2021 §3.1): source s
    * with corpus mass n_s is drawn with probability proportional to
    * (n_s / N)^alpha. alpha = 1 keeps natural proportions; alpha -> 0
    * flattens toward uniform, upsampling small sources.
    *
    * Input: any corpus frame. Output: ONE row per `sourceCol` value with
    *   n_w   — the source's total `weightCol` mass (BIGINT),
    *   w_pct — the epoch weight, in integer percent, that
    *           [[mixByWeightTable]] must apply so the source contributes
    *           ~ budgetFraction * N * (n_s^alpha / sum_t n_t^alpha) of
    *           mass to the mix.
    * w_pct is the ONLY float-derived value and it is rounded to an
    * integer here, so everything downstream of this frame is
    * integer-exact and oracle-checkable.
    *
    * Scale shape: one map-side-combined aggregation over the corpus into
    * <= distinct-source rows, then a broadcast of the one-row denominator
    * back across them — the corpus is scanned once and nothing bigger
    * than the source list ever moves. */
  def temperatureTargets(df: DataFrame, sourceCol: String,
                         weightCol: String, alpha: Double,
                         budgetFraction: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(budgetFraction > 0, s"budgetFraction must be positive: $budgetFraction")
    val perSource = df.groupBy(col(sourceCol))
      .agg(sum(col(weightCol).cast("long")).as("n_w"))
    val denom = perSource.agg(
      sum(pow(col("n_w").cast("double"), lit(alpha))).as("__graft_denom"),
      sum(col("n_w")).as("__graft_total"))
    perSource.crossJoin(broadcast(denom))
      .withColumn("w_pct",
        round(lit(100.0) * pow(col("n_w").cast("double"), lit(alpha)) /
          col("__graft_denom") *
          (col("__graft_total").cast("double") * lit(budgetFraction)) /
          col("n_w").cast("double")).cast("long"))
      .drop("__graft_denom", "__graft_total")
  }

  /** [[mixByWeights]] with the weights as a TABLE instead of a driver
    * Map — the scale path when the cell list is itself data (e.g. the
    * output of [[temperatureTargets]], or thousands of (source, lang)
    * cells from a profile). Weights are integer percent (`w_pct`):
    * copies = w_pct div 100 full epochs + one more iff the salted
    * portable hash of the key falls under w_pct mod 100 — identical
    * semantics to [[mixByWeights]]'s (whole, frac) gate, fully integer.
    * Sources absent from `weights` get `defaultPct`.
    *
    * Scale shape: the weights side is broadcast, so the corpus pays a
    * map-side hash join plus the generator — still no shuffle. */
  def mixByWeightTable(weights: DataFrame, sourceCol: String,
                       keyCol: String, epochCol: String = "epoch",
                       salt: String = "mix", defaultPct: Long = 100L)(
      df: DataFrame): DataFrame = {
    require(defaultPct >= 0, s"defaultPct must be non-negative: $defaultPct")
    val w = weights.select(col(sourceCol), col("w_pct"))
    val h = pmod(TextStats.portableHash60(
      concat(lit(salt), col(keyCol).cast("string"))), lit(100L))
    df.join(broadcast(w), Seq(sourceCol), "left")
      .withColumn("__graft_wp", coalesce(col("w_pct"), lit(defaultPct)))
      .withColumn("__graft_copies",
        expr("__graft_wp div 100L") +
          when(h < col("__graft_wp") % 100, 1L).otherwise(0L))
      .filter(col("__graft_copies") > 0)
      .withColumn(epochCol,
        explode(sequence(lit(0L), col("__graft_copies") - 1)))
      .drop("w_pct", "__graft_wp", "__graft_copies")
  }
}
