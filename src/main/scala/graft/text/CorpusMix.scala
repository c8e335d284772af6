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
}
