package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All are pure Catalyst column expressions (no UDFs) so they stay inside
  * whole-stage codegen and scale linearly with input — at 100 TB these run
  * as a single map-only pass over the documents table, no shuffle.
  */
object TextStats {

  /** Whitespace tokenization (single-space delimiter — matches the
    * testdata's generator; swap the delimiter for real corpora). */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish token estimate: ceil(chars/4) is the common public rule of
    * thumb; combined with word count for a cheap bound. */
  def tokenEstimateBpe(text: Column): Column = ceil(length(text) / lit(4.0))

  /** Normalized text: lowercase, punctuation stripped, whitespace
    * collapsed — the canonicalization pass run before dedup/fingerprints
    * so cosmetic variants collapse to one form. Pure codegen map. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[.,!?;:]", ""), "\\s+", " "))

  /** Token repetition ratio in [0, 1): 1 - distinct/total tokens — the
    * cheap repetition signal (high = boilerplate/degenerate text, the
    * first filter large corpus-quality pipelines apply). */
  def repetitionRatio(text: Column): Column =
    lit(1.0) - size(array_distinct(tokens(text))).cast("double") /
      size(tokens(text)).cast("double")

  /** Quality-scoring components (length / punctuation / stopword ratios). */
  def qualityColumns(text: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val nChars = length(text)
    val toks = tokens(text)
    val nToks = size(toks)
    val punct = nChars - length(regexp_replace(text, "[.,!?;:]", ""))
    val stopHits = size(array_intersect(toks, lit(stopwords.toArray)))
    Seq(
      "n_chars_calc" -> nChars.cast("bigint"),
      "n_tokens" -> nToks.cast("bigint"),
      "avg_token_len" -> (nChars - (nToks - 1)).cast("double") / nToks.cast("double"),
      "punct_ratio" -> punct.cast("double") / nChars.cast("double"),
      "stopword_hits" -> stopHits.cast("bigint"))
  }

  def withQuality(df: DataFrame, textCol: String,
                  stopwords: Seq[String] = defaultStopwords): DataFrame =
    qualityColumns(col(textCol), stopwords).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Language-ID by stopword-profile hit counting (the classic cheap
    * n-gram/stopword heuristic): score = |tokens ∩ profile| per language,
    * argmax wins, first-listed language wins ties, "und" when all zero. */
  def langIdProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "nicht"))

  def langId(text: Column,
             profiles: Seq[(String, Seq[String])] = langIdProfiles): Column = {
    val toks = tokens(text)
    val scores = profiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, lit(words.toArray)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language reaching the max wins (deterministic tie-break)
    scores.foldRight(lit("und")) { case ((lang, sc), els) =>
      when(best > 0 && sc === best, lit(lang)).otherwise(els)
    }
  }

  /** Gopher-style n-gram repetition signals (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", §A1.1: duplicate/top n-gram fractions —
    * the published thresholds drop docs whose top 2-gram exceeds 0.20 of
    * the text or whose duplicate 3-grams exceed 0.18). Both are pure
    * higher-order array expressions over the in-row shingle list: map-only,
    * no explode, no shuffle — the signal costs one scan at any corpus
    * size. Per-row cost is O(n log n) in the document's n-gram count
    * (sorted run-length fold — see [[maxNgramCount]]). */

  /** Occurrence count of the document's single most frequent n-gram.
    * Sorted run-length single pass: sort once, fold once — O(n log n)
    * per row. The naive shape (`transform(distinct, x -> count(filter(
    * ngrams, = x)))`) is not just O(distinct × total): Catalyst does NOT
    * eliminate common subexpressions across higher-order-function
    * lambdas, so the n-gram construction itself re-evaluates inside
    * every filter — measured 94 s for 50 k docs where this form takes
    * well under a second. */
  def maxNgramCount(ngrams: Column): Column = {
    val sorted = array_sort(ngrams)
    val st0 = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("mx"))
    aggregate(sorted, st0, (st, x) => {
      val run = when(st.getField("prev").isNotNull && x === st.getField("prev"),
        st.getField("run") + 1).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        greatest(st.getField("mx"), run).as("mx"))
    }).getField("mx")
  }

  /** Longest run of CONSECUTIVE identical tokens ("batch batch batch" →
    * 3) — the repetition-LOOP signal. The frequency-based signals
    * ([[maxNgramCount]], [[dupNgramFraction]]) see how often something
    * repeats anywhere in the document; this sees degenerate generation
    * loops and copy-paste stutter, which repeat IN PLACE. Same map-only
    * aggregate-HOF fold, but over the tokens in ORIGINAL order (no
    * sort — adjacency is the signal). */
  def maxTokenRun(text: Column): Column = {
    val st0 = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("mx"))
    aggregate(tokens(text), st0, (st, x) => {
      val run = when(st.getField("prev").isNotNull && x === st.getField("prev"),
        st.getField("run") + 1).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        greatest(st.getField("mx"), run).as("mx"))
    }).getField("mx")
  }

  /** Fraction of the document's n-grams taken by its single most frequent
    * n-gram, in (0, 1]. High = looping/boilerplate text. */
  def topNgramFraction(ngrams: Column): Column =
    maxNgramCount(ngrams).cast("double") / size(ngrams).cast("double")

  /** Fraction of the document's n-grams that are repeats of an earlier
    * one: 1 - distinct/total, in [0, 1). */
  def dupNgramFraction(ngrams: Column): Column =
    lit(1.0) - size(array_distinct(ngrams)).cast("double") /
      size(ngrams).cast("double")

  /** Gopher duplicate-SEGMENT signals — the document-structure half of
    * §A1.1 next to the n-gram fractions: over segments = non-empty
    * trimmed splits of `text` by `sep` ("\n" for lines, "\n{2,}" for
    * paragraphs),
    *   duplicate segments  = n_segments − n_distinct_segments
    *   duplicate chars     = seg_chars − distinct_seg_chars
    * (every repeat beyond the first counts its FULL length, matching
    * the paper's "fraction of characters contained within duplicate
    * lines/paragraphs"; Gopher drops docs past 0.30 / 0.20). All four
    * outputs are integers so thresholds cross-multiply exactly in any
    * engine. Map-only column expressions. */
  def segmentStats(text: Column, sep: String): Seq[(String, Column)] = {
    val segs = filter(transform(split(text, sep), s => trim(s)),
      s => length(s) > 0)
    val dist = array_distinct(segs)
    def chars(a: Column) =
      aggregate(transform(a, s => length(s).cast("long")),
        lit(0L), (acc, x) => acc + x)
    Seq(
      "n_segments" -> size(segs).cast("bigint"),
      "n_distinct_segments" -> size(dist).cast("bigint"),
      "seg_chars" -> chars(segs),
      "distinct_seg_chars" -> chars(dist))
  }

  /** Exact-duplicate fingerprint: md5 of the text (portable across
    * engines; used by exact-dedup-by-content). */
  def contentFingerprint(text: Column): Column = md5(text)

  /** 60-bit non-negative hash portable across engines: the first 15 hex
    * chars of md5 as a bigint. Spark: conv(substring(md5,…),16,10); DuckDB:
    * ('0x' || substr(md5(x),1,15))::BIGINT — bit-identical, so any
    * fingerprint built on it is oracle-checkable (xxhash64 is Spark-only). */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Rolling polynomial fingerprint over tokens — order-sensitive (same
    * words in a different order produce a different value), the
    * document-fingerprinting primitive for near-line dedup keys.
    * Modular arithmetic mod 2^31-1 keeps every intermediate below 2^52 so
    * it is ANSI-safe (no long overflow) and engine-reproducible. */
  def rollingFingerprint(text: Column): Column = {
    val m = lit(2147483647L) // 2^31 - 1 (prime)
    aggregate(transform(tokens(text), t => portableHash60(t)),
      lit(1000003L),
      (acc, h) => pmod(acc * lit(1000003L) + pmod(h, m), m))
  }
}
