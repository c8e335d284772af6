package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking — the "make training sequences" step
  * of a pretraining pipeline: each document's token stream is cut into
  * windows of `seqLen` tokens starting every `stride` tokens, so
  * consecutive windows overlap by `seqLen - stride` (the standard way to
  * keep context across sequence boundaries). The trailing partial window
  * is kept and can be dropped downstream via `minTokens`.
  *
  * The reference's analogue is the 1:N flatMap converter family
  * (gobblin-core/.../converter/string/StringSplitterConverter.java:43 —
  * see `operators/Converters.scala` splitCol); chunking is the corpus
  * variant where the split is positional over tokens, not delimiter-based.
  *
  * Scale shape: pure higher-order array expressions (sequence → transform
  * → slice) followed by one posexplode — a single map-only narrow stage,
  * no shuffle, no UDF, stays inside whole-stage codegen. Output volume is
  * the only cost: ~seqLen/stride × input tokens, which is the inherent
  * price of overlapped windows at any corpus size. Per-row memory is
  * O(doc tokens), the same bound the rest of the text stack carries.
  */
object Chunker {

  /** Explode `df` into one row per token window. Window k (k = 0, 1, …)
    * covers tokens [k·stride, k·stride + seqLen) and exists while
    * k·stride < n_tokens. Emits `chunk_idx` (window ordinal within the
    * doc), `chunk_text` (space-rejoined window), and `n_chunk_tokens`;
    * windows shorter than `minTokens` (only ever trailing ones when
    * stride ≤ seqLen) are dropped. The text column itself is replaced by
    * the chunk columns; all other columns pass through. */
  def chunkByTokens(df: DataFrame, textCol: String,
                    seqLen: Int, stride: Int,
                    minTokens: Int = 1): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(stride > 0, s"stride must be positive: $stride")
    // fail loudly instead of silently overwriting (or tripping an
    // AMBIGUOUS_REFERENCE later) when the input already carries an
    // output column — e.g. re-chunking chunked output: rename first
    val reserved = Seq("chunk_idx", "chunk_text", "n_chunk_tokens", "__graft_win")
    val clash = df.columns.filter(_ != textCol).toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns collide with chunk output columns: ${clash.mkString(", ")}")
    val toks = TextStats.tokens(col(textCol))
    // number of windows = floor((n-1)/stride) + 1; split("", " ") yields
    // [""] so n >= 1 always and sequence() never gets an empty range
    val windows = transform(
      sequence(lit(0), floor((size(toks) - 1) / stride).cast("int")),
      k => slice(toks, k * stride + 1, lit(seqLen)))
    val passThrough = df.columns.filter(_ != textCol).map(col).toSeq
    df.select(passThrough :+ posexplode(windows).as(Seq("chunk_idx", "__graft_win")): _*)
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .withColumn("chunk_text", array_join(col("__graft_win"), " "))
      .withColumn("n_chunk_tokens", size(col("__graft_win")).cast("long"))
      .drop("__graft_win")
      .filter(col("n_chunk_tokens") >= minTokens)
  }
}
