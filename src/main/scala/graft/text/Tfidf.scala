package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-weighted term scoring (TF-IDF) with per-document top-k terms —
  * the standard keyword/topic signal a training-data pipeline attaches to
  * documents for mixing, filtering, and cluster labeling.
  *
  * Plan shape at scale: tokenize+explode is map-only; term frequency is
  * one (doc, term) hash aggregation; document frequency re-aggregates the
  * TF result by term (already map-side combined, and the TF rows are one
  * per (doc, term), so df = a plain count); the TF⋈DF join is keyed on
  * term, co-partitioned with the DF aggregation's output so it reuses
  * that exchange; the final top-k is a WindowGroupLimit-prunable
  * row_number over docs. No driver-side state beyond the corpus row
  * count.
  */
object Tfidf {

  /** Top-k terms per document by TF-IDF.
    *
    * @param logIdf true → classic `tf * ln(N/df)`. false → the rational
    *               form `tf * (N/df)`: same ranking (ln is monotonic),
    *               but built only from IEEE-exact ops (multiply/divide),
    *               so an external oracle recomputing the score matches
    *               bit-for-bit — `ln` implementations are not required to
    *               be correctly rounded and may differ across engines in
    *               the last ulp.
    * @return (idCol, term, score_r, rk) — rk in [1, k], deterministic
    *         tie-break by term ascending
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
               logIdf: Boolean = true): DataFrame = {
    val n = docs.count().toDouble
    val tf = docs
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = if (logIdf) log(lit(n) / col("df")) else lit(n) / col("df")
    val scored = tf.join(dfreq, "term").withColumn("score", col("tf") * idf)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"),
        round(col("score"), 6).as("score_r"), col("rk"))
  }
}
