package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document EXACT substring deduplication (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): any
  * `w`-token window occurring in more than one document is a duplicated
  * passage, and every occurrence outside the keeper document (the
  * lowest doc id containing that window) is scrubbed. This is the
  * boilerplate/licence-block/syndicated-article remover that MinHash
  * (whole-doc near-dup, [[graft.dedup.MinHashDedup]]) and C4 span dedup
  * (WITHIN-doc lines, [[SpanDedup]]) both miss: two long documents
  * sharing one verbatim paragraph are neither near-duplicates nor
  * self-repetitive.
  *
  * The paper builds a corpus-wide suffix array; the distributed
  * re-expression is the standard rolling-window equivalent: explode
  * every w-token window to its 60-bit portable fingerprint
  * ([[TextStats.portableHash60]] of the window text — DuckDB-exact, so
  * the oracle recomputes it), take min(doc) per fingerprint, and a
  * position is duplicated iff a lower doc id carries the same window.
  * Overlapping duplicated windows merge into spans via the lag/gap
  * trick (one window per doc), exactly like sessionization.
  *
  * Scale shape: two shuffles on the 8-byte fingerprint — the min(doc)
  * aggregate is map-side combined, and the join back to positions
  * reuses the same key — plus one doc-keyed window for the span merge
  * (over the DUPLICATED positions only, a small fraction of the
  * corpus). Work is O(total tokens) rows; no driver state, no per-doc
  * quadratic anywhere. At 100 TB, raise
  * `spark.sql.shuffle.partitions` with corpus size and the plan is
  * unchanged — the fingerprint space (2^60) keeps collision-driven
  * over-deletion negligible (expected collisions ~ (positions)^2 /
  * 2^61).
  *
  * Tokenization is single-space splitting, matching every other text
  * operator here (q91/q102/q104 oracles); `w` defaults to 50 tokens,
  * the paper's span threshold. */
object SubstringDedup {

  private def toks(textCol: Column): Column = split(textCol, " ")

  /** One row per w-token window: (idCol, pos, h) with pos 1-based. */
  private[text] def gramTable(df: DataFrame, idCol: String, textCol: String,
                              w: Int): DataFrame = {
    val tk = toks(col(textCol))
    val nG = size(tk) - (w - 1)
    // sequence(1, 0) DESCENDS in Spark — guard the short-doc branch
    val hashes = when(nG < 1, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), nG), i =>
        TextStats.portableHash60(concat_ws(" ", slice(tk, i, lit(w))))))
    df.select(col(idCol), posexplode(hashes).as(Seq("__i0", "h")))
      .select(col(idCol), (col("__i0") + 1).cast("long").as("pos"), col("h"))
  }

  /** Duplicated window positions: (idCol, pos) where some lower doc id
    * contains the same w-token window. */
  def dupPositions(df: DataFrame, idCol: String, textCol: String,
                   w: Int = 50): DataFrame = {
    val g = gramTable(df, idCol, textCol, w)
    val keeper = g.groupBy("h").agg(min(col(idCol)).as("__keeper"))
    g.join(keeper, Seq("h"))
      .filter(col(idCol) > col("__keeper"))
      .select(col(idCol), col("pos"))
  }

  /** Per-doc duplication stats — the corpus-health face (and the
    * oracle-checkable output): total windows, duplicated windows, and
    * the token count covered by the MERGED duplicated spans. Docs
    * shorter than w tokens carry no signal and are excluded. */
  def stats(df: DataFrame, idCol: String, textCol: String,
            w: Int = 50): DataFrame =
    statsOf(df, dupPositions(df, idCol, textCol, w), idCol, textCol, w)

  private def statsOf(df: DataFrame, dup: DataFrame, idCol: String,
                      textCol: String, w: Int): DataFrame = {
    val nG = greatest(size(toks(col(textCol))) - (w - 1), lit(0)).cast("long")
    val base = df.select(col(idCol), nG.as("n_grams"))
      .filter(col("n_grams") > 0)
    val lagW = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val cov = dup
      .withColumn("__gap", col("pos") - lag(col("pos"), 1).over(lagW))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_windows"),
        sum(least(coalesce(col("__gap"), lit(w.toLong)), lit(w.toLong)))
          .as("dup_tokens"))
    base.join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** The gram index an ingestion pipeline COMMITS after each batch: the
    * distinct window fingerprints (`h`) of the accepted docs. The
    * committed corpus participates in future dedup only through this
    * index — it is never re-tokenized. */
  def gramIndex(df: DataFrame, idCol: String, textCol: String,
                w: Int = 50): DataFrame =
    gramTable(df, idCol, textCol, w).select(col("h")).distinct()

  /** Incremental face — the continuously-ingesting shape (same Bloom
    * discipline as [[graft.dedup.IncrementalDedup]]): a batch position
    * is duplicated when its window is in the COMMITTED gram index (any
    * committed doc keeps priority) or when a lower-id batch doc carries
    * it (batch-internal keeper rule). The committed side collapses to a
    * Bloom sketch: bloom negatives are DEFINITELY novel and skip the
    * join, so the shuffled volume is `dup_rate + fpp` of the batch's
    * positions, never the index — ingestion cost stays O(batch), not
    * O(corpus), and the result is byte-identical to the exact join
    * (the sketch only prunes). */
  def incrementalDupPositions(batch: DataFrame, idCol: String,
                              textCol: String, committedGrams: DataFrame,
                              w: Int = 50, fpp: Double = 0.01): DataFrame = {
    val g = gramTable(batch, idCol, textCol, w)
    val keeper = g.groupBy("h").agg(min(col(idCol)).as("__keeper"))
    val internal = g.join(keeper, Seq("h"))
      .filter(col(idCol) > col("__keeper"))
      .select(col(idCol), col("pos"))
    val committed = committedGrams.select(col("h")).distinct()
    val n = committed.count()
    val vsCommitted =
      if (n == 0) internal.limit(0)
      else {
        val bloom = committed.stat.bloomFilter("h", n, fpp)
        val bc = batch.sparkSession.sparkContext.broadcast(bloom)
        // scalar UDF deliberate (the IncrementalDedup rationale): no
        // public Bloom membership expression exists, the sketch is
        // opaque driver state, and it is a PREFILTER only — the exact
        // semi join below removes the fpp sliver
        val mightMatch = udf((h: Long) => bc.value.mightContainLong(h))
        g.filter(mightMatch(col("h"))) // map-side: skip definite-novel
          .join(committed, Seq("h"), "left_semi") // exact: drop fpp sliver
          .select(col(idCol), col("pos"))
      }
    internal.unionByName(vsCommitted).distinct()
  }

  /** [[stats]] for an incremental batch against the committed index. */
  def incrementalStats(batch: DataFrame, idCol: String, textCol: String,
                       committedGrams: DataFrame, w: Int = 50,
                       fpp: Double = 0.01): DataFrame =
    statsOf(batch,
      incrementalDupPositions(batch, idCol, textCol, committedGrams, w, fpp),
      idCol, textCol, w)

  /** The scrubbing face: every token covered by a duplicated window is
    * removed (keeper occurrences survive untouched); returns
    * (idCol, textCol) with the cleaned text — a doc whose every token
    * was duplicated comes back EMPTY rather than dropped, so the caller
    * sees the scrub, not a vanished row. */
  def clean(df: DataFrame, idCol: String, textCol: String,
            w: Int = 50): DataFrame =
    cleanFrom(df, dupPositions(df, idCol, textCol, w), idCol, textCol, w)

  /** [[clean]] for an incremental batch: scrub passages duplicated
    * against the COMMITTED gram index (committed docs keep priority)
    * or against a lower-id doc of the same batch. The continuously-
    * ingesting counterpart of [[clean]], O(batch) by the same Bloom
    * discipline as [[incrementalDupPositions]]. */
  def cleanIncremental(batch: DataFrame, idCol: String, textCol: String,
                       committedGrams: DataFrame, w: Int = 50,
                       fpp: Double = 0.01): DataFrame =
    cleanFrom(batch,
      incrementalDupPositions(batch, idCol, textCol, committedGrams, w, fpp),
      idCol, textCol, w)

  private def cleanFrom(df: DataFrame, dup: DataFrame, idCol: String,
                        textCol: String, w: Int): DataFrame = {
    val covered = dup
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("__t"))
      .distinct()
    val tokens = df
      .select(col(idCol), posexplode(toks(col(textCol))).as(Seq("__i0", "__tok")))
      .withColumn("__t", col("__i0") + 1)
    val kept = tokens.join(covered, Seq(idCol, "__t"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("__t"), col("__tok")))),
          s => s.getField("__tok"))).as(textCol))
    // a fully-scrubbed doc has no surviving token rows — re-anchor on
    // the input's ids so it surfaces as "" instead of disappearing
    df.select(col(idCol))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }
}
