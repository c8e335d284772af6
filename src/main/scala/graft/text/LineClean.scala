package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2 — the rules
  * that produced C4 from Common Crawl; the paper's exact wording:
  * "only retained lines that contained at least 3 words" and
  * "discarded any page with fewer than 5 sentences", hence the 3/5
  * defaults): keep only lines that end in a
  * terminal punctuation mark, carry at least `minLineWords` words and
  * don't mention "javascript"; then drop whole PAGES that end up with
  * fewer than `minSentences` sentences, contain "lorem ipsum" or a
  * curly brace, or hit the caller's bad-word list. The page rules are
  * evaluated over the CLEANED text — a page is judged by what would
  * survive, not by boilerplate the line pass already removed.
  *
  * Scale shape: every rule is a column expression over `split(text)`
  * (higher-order filter + regex) — map-only, zero shuffles, applied in
  * a single projection. The funnel report is the only aggregate (one
  * map-side-combined pass), mirroring the Gopher filter's per-rule
  * accounting in [[TextStats]].
  */
object LineClean {

  /** C4's line test: ends in `.`/`!`/`?` (optionally a closing quote),
    * ≥ `minLineWords` whitespace words, no "javascript". */
  def keptLines(text: Column, minLineWords: Int = 3): Column =
    filter(split(text, "\n"), l => {
      val t = trim(l)
      t.rlike("[.!?]\"?$") &&
        (size(split(t, "\\s+")) >= minLineWords) &&
        !lower(t).contains("javascript")
    })

  /** Lines surviving the line pass, rejoined. */
  def cleanedText(text: Column, minLineWords: Int = 3): Column =
    array_join(keptLines(text, minLineWords), "\n")

  /** Count of terminal punctuation marks — the sentence proxy the page
    * rule thresholds on (deterministic and engine-portable, unlike a
    * tokenizer-backed sentence splitter). */
  def sentenceCount(cleaned: Column): Column =
    length(regexp_replace(cleaned, "[^.!?]", ""))

  /** Page-level keep predicate over the CLEANED text. */
  def pageKeep(cleaned: Column, minSentences: Int = 5,
               badWords: Seq[String] = Nil): Column = {
    val base = (sentenceCount(cleaned) >= minSentences) &&
      !lower(cleaned).contains("lorem ipsum") &&
      !cleaned.contains("{")
    if (badWords.isEmpty) base
    else base && !lower(cleaned).rlike(
      "\\b(?:" + badWords.map(java.util.regex.Pattern.quote)
        .mkString("|") + ")\\b")
  }

  /** The cleaning pass: `textCol` replaced by its surviving lines,
    * pages failing the page rules dropped. One map-only projection +
    * filter. */
  def clean(docs: DataFrame, textCol: String, minLineWords: Int = 3,
            minSentences: Int = 5, badWords: Seq[String] = Nil): DataFrame = {
    val cleaned = docs.withColumn(textCol,
      cleanedText(col(textCol), minLineWords))
    cleaned.filter(pageKeep(col(textCol), minSentences, badWords))
  }

  /** Per-rule page-drop funnel (counts are NON-exclusive — a page can
    * fail several rules; `pages_kept` is the conjunction), one
    * aggregate pass: how much each rule costs before committing to it. */
  def funnel(docs: DataFrame, textCol: String, minLineWords: Int = 3,
             minSentences: Int = 5, badWords: Seq[String] = Nil): DataFrame = {
    // the line pass is PROJECTED once per row before aggregating —
    // Catalyst does not common-subexpression-eliminate higher-order
    // functions, so referencing cleanedText in all six predicates would
    // split+filter+regex every row six times
    val cleaned = col("__cleaned")
    def cnt(pred: Column, name: String) =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(name)
    val badPred =
      if (badWords.isEmpty) lit(false)
      else lower(cleaned).rlike("\\b(?:" +
        badWords.map(java.util.regex.Pattern.quote).mkString("|") + ")\\b")
    docs.select(cleanedText(col(textCol), minLineWords).as("__cleaned"))
      .agg(
        cnt(lit(true), "pages"),
        cnt(sentenceCount(cleaned) < minSentences, "too_few_sentences"),
        cnt(lower(cleaned).contains("lorem ipsum"), "lorem_ipsum"),
        cnt(cleaned.contains("{"), "curly_brace"),
        cnt(badPred, "bad_words"),
        cnt(pageKeep(cleaned, minSentences, badWords), "pages_kept"))
  }
}
