package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus DATA CARD: per-stratum accounting a mixture plan or a
  * dataset release needs up front — document/char/token masses, token
  * estimates, language spread, and each stratum's exact share of the
  * corpus. The numbers feed [[CorpusMix.temperatureTargets]] /
  * [[graft.operators.QuotaCap]] decisions and the "composition" table
  * every corpus release publishes.
  *
  * Scale shape: ONE map-side-combined aggregate over the corpus, then
  * a window over the per-stratum rows (bounded by the stratum count) —
  * the corpus is scanned exactly once. Shares are integer permille
  * (`chars·1000 div total`), exact in any engine.
  */
object CorpusReport {

  /** Per-`stratumCol` accounting: `(stratum, n_docs, chars, tokens,
    * tokens_bpe_est, n_langs, char_share_permille)`. Whitespace tokens
    * and the chars/4 BPE estimate are [[TextStats]]' portable
    * definitions; `n_langs` is the exact distinct count. */
  def byStratum(docs: DataFrame, stratumCol: String, textCol: String,
                langCol: String): DataFrame = {
    val t = col(textCol)
    docs.groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(t).cast("long")).as("chars"),
        sum(TextStats.tokenCount(t).cast("long")).as("tokens"),
        sum(TextStats.tokenEstimateBpe(t).cast("long")).as("tokens_bpe_est"),
        countDistinct(col(langCol)).as("n_langs"))
      .withColumn("char_share_permille",
        expr("(chars * 1000) div (sum(chars) OVER ())"))
  }
}
