package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (Chaudhuri et
  * al. 2006 SSJoin; Xiao et al. 2008 PPJoin) — the deterministic
  * counterpart of the MinHash-LSH near-dup candidates: every pair with
  * Jaccard ≥ t is found (NO false negatives, where banded LSH trades
  * recall for speed), and the verify is integer-exact.
  *
  * Prefix-filtering theorem: order every set by one GLOBAL token order
  * (rarest first — hot tokens sink to the suffix) and keep only the
  * first |s| − ⌈t·|s|⌉ + 1 tokens as the "prefix"; two sets with
  * J ≥ t MUST share a prefix token. So candidates come from an
  * equi-join on prefix tokens — and because prefixes prefer RARE
  * tokens, the join's buckets stay small exactly where a naive
  * token join would explode (stopwords live in suffixes).
  *
  * Pipeline: one token-frequency aggregate → rarest-first set arrays →
  * prefix explode → token equi-join with the length filter
  * (t·|a| ≤ |b|) → distinct pairs → exact verify via array_intersect
  * with the cross-multiplied integer Jaccard test. Output
  * (id_a, id_b, inter, uni) is all BIGINT — float-free, so the whole
  * join is oracle-checkable bit-for-bit.
  */
object SetSimJoin {

  /** All pairs with |A∩B| / |A∪B| ≥ thresholdPermille/1000 over the
    * DISTINCT whitespace tokens of `textCol`. */
  def selfJoin(df: DataFrame, idCol: String, textCol: String,
               thresholdPermille: Int): DataFrame = {
    require(thresholdPermille > 0 && thresholdPermille <= 1000,
      s"threshold must be in (0, 1000] permille: $thresholdPermille")
    val p = thresholdPermille
    val toks = df
      .select(col(idCol).as("id"),
        explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .filter(length(col("tok")) > 0)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    // rarest-first global order; (tf, tok) is a total order so every
    // set agrees on it
    val sets = toks.join(freq, "tok")
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("tf"), col("tok")))),
        e => e.getField("tok")).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      // prefix length |s| - ceil(t*|s|) + 1, integer ceil (div, not
      // the float '/' Column operator)
      .withColumn("pfx", col("sz") - expr(s"(sz * $p + 999) div 1000") + 1)
    val prefixes = sets.select(col("id"), col("sz"),
      explode(slice(col("toks"), lit(1), col("pfx").cast("int"))).as("tok"))
    val cands = prefixes.as("a").join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          // length filter: J >= t forces t|a| <= |b| and t|b| <= |a|
          col("b.sz") * 1000 >= col("a.sz") * p &&
          col("a.sz") * 1000 >= col("b.sz") * p)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(sets.select(col("id").as("id_a"), col("toks").as("ta"),
        col("sz").as("sa")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("tb"),
        col("sz").as("sb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .filter(col("inter") * 1000 >= col("uni") * p)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }
}
