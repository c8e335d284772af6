package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document training-sequence packing — the GPT-style dataloader
  * layout: concatenate the corpus in a deterministic pseudo-random
  * order and cut the token stream into fixed-length sequences of
  * `seqLen`, sequences crossing document boundaries (no padding, no
  * per-doc truncation — every token lands in exactly one sequence
  * slot). This is the step after [[Chunker]] (per-doc windows) and
  * [[ShardPack]] (shard-budget layout): it emits the exact
  * (document, sequence) SLICE ASSIGNMENT a training job consumes —
  *   seq_id    which sequence the slice belongs to,
  *   seq_pos   where in the sequence it starts,
  *   doc_off   where in the document it starts,
  *   n_tokens  slice length
  * — pure integer arithmetic over token COUNTS, so the full assignment
  * is engine-reproducible and oracle-checkable; actual token material
  * is sliced later by whatever tokenizer produced the counts.
  *
  * Scale shape: the global token offset (`cum_before`) comes from
  * [[ShardPack.packByBudget]]'s distributed bucketed prefix sum (never
  * a single-partition window); everything after it — the per-doc
  * sequence-range explode and the slice arithmetic — is map-only. A
  * document of w tokens emits ⌈w/seqLen⌉+1 rows at most, the inherent
  * output size.
  */
object SeqPack {

  /** Assign every token of every row to a training sequence. Rows with
    * NULL or zero `weightCol` carry no tokens and are dropped. Output
    * adds (cum_before, seq_id, seq_pos, doc_off, n_tokens).
    * `startOffset` continues a previous run's token stream for
    * incremental ingest, like ShardPack's. */
  def packSequences(df: DataFrame, keyCol: String, weightCol: String,
                    seqLen: Long, salt: String = "seq",
                    buckets: Int = 1024,
                    startOffset: Long = 0L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val clash = df.columns.toSet.intersect(
      Set("seq_id", "seq_pos", "doc_off", "n_tokens", "__graft_fs", "__graft_w2"))
    require(clash.isEmpty,
      s"input columns collide with seq-pack columns: ${clash.mkString(", ")}")
    val packed = ShardPack.packByBudget(df, keyCol, weightCol,
      budget = seqLen, salt = salt, buckets = buckets,
      shardCol = "__graft_fs", startOffset = startOffset)
    packed
      .withColumn("__graft_w2", coalesce(col(weightCol).cast("long"), lit(0L)))
      .filter(col("__graft_w2") > 0)
      .withColumn("seq_id", explode(sequence(col("__graft_fs"),
        expr(s"(cum_before + __graft_w2 - 1) div ${seqLen}L"))))
      .withColumn("seq_pos",
        greatest(lit(0L), col("cum_before") - col("seq_id") * lit(seqLen)))
      .withColumn("doc_off",
        greatest(lit(0L), col("seq_id") * lit(seqLen) - col("cum_before")))
      .withColumn("n_tokens",
        least((col("seq_id") + 1) * lit(seqLen),
          col("cum_before") + col("__graft_w2")) -
          greatest(col("seq_id") * lit(seqLen), col("cum_before")))
      .drop("__graft_fs", "__graft_w2")
  }
}
