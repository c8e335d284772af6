package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style span-level exact dedup across the whole corpus: every
  * document is cut into fixed non-overlapping word spans (the stand-in
  * for C4's "three-sentence span" — the unit at which boilerplate
  * repeats), each distinct span keeps its FIRST occurrence in corpus
  * order (min (doc, pos)), and every later occurrence is cut out of its
  * document before reassembly.
  *
  * Reference scope: the reference dedups whole records
  * (gobblin-compaction/.../MRCompactorAvroKeyDedupJobRunner.java); this
  * is the sub-document LLM-corpus extension of the same
  * keep-one-copy-globally semantics.
  *
  * Scale shape (the 100 TB story):
  *  - span generation is a row-local `transform`/`posexplode` — map-only;
  *  - the winner per span comes from ONE hash aggregation
  *    `min(struct(doc, pos))` — partial map-side combine collapses hot
  *    spans (the empty line / boilerplate case that makes a windowed
  *    `row_number() OVER (PARTITION BY span)` skew-bound) before the
  *    shuffle, and the aggregated state is 16 bytes per distinct span;
  *  - survivors rejoin on the span hash (equi-join, no cartesian) and
  *    documents reassemble with ONE groupBy(doc) whose per-group state
  *    is the document's own spans — O(doc length), never O(corpus).
  */
object SpanDedup {

  /** The span array for one text value; null text yields an empty array
    * (size(null) is -1, which would otherwise make sequence(0, -1)
    * emit garbage [0, -1] spans). ONE definition for both dedup faces so
    * their tokenization can never diverge. */
  private def spanArray(textCol: String, spanWords: Int): Column = {
    require(spanWords > 0, "spanWords must be positive")
    val words = split(col(textCol), " ")
    val nSpans = ceil(size(words).cast("double") / lit(spanWords.toDouble))
      .cast("int")
    when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSpans - 1),
        (i: Column) => array_join(
          slice(words, i * spanWords + 1, lit(spanWords)), " ")))
  }

  /** (id, pos, span) — `spanWords`-word non-overlapping chunks. */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            spanWords: Int): DataFrame =
    docs.select(col(idCol),
      posexplode(spanArray(textCol, spanWords)).as(Seq("pos", "span")))

  /** WITHIN-document repeated-span removal (C4 also dedups spans inside
    * each page before the corpus pass): keep each span's first occurrence
    * in its own document only. Entirely row-local — a single codegen'd
    * indexed `filter` over the span array, ZERO shuffles at any corpus
    * size. */
  def dedupSpansWithinDoc(docs: DataFrame, idCol: String, textCol: String,
                          spanWords: Int = 3): DataFrame = {
    val arr = spanArray(textCol, spanWords)
    docs.select(col(idCol),
      array_join(filter(arr, (x: Column, i: Column) =>
        array_position(arr, x) === i.cast("long") + 1L), " ")
        .as("text_dedup"))
  }

  /** Dedup to (idCol, text_dedup): documents rebuilt from their
    * surviving spans in original order; a document whose every span
    * first appeared elsewhere disappears entirely (C4 drops it too). */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 spanWords: Int = 8): DataFrame = {
    val sp = spans(docs, idCol, textCol, spanWords)
    val winners = sp.groupBy("span")
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
    sp.join(winners, "span")
      .filter(col(idCol) === col(s"w.$idCol") && col("pos") === col("w.pos"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          s => s.getField("span")), " ").as("text_dedup"))
  }
}
