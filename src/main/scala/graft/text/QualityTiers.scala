package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style quality tiering (Wenzek et al. 2020 split Common Crawl
  * into head/middle/tail by LM perplexity percentile): cut a scored
  * corpus into `k` equal-count tiers, tier 1 = best scores.
  *
  * Tiers are VALUE-based: every row sharing a score lands in the same
  * tier (a percentile interpolation or a row_number split would break
  * ties arbitrarily — and interpolated float boundaries are not
  * reproducible across engines, so they could never be oracle-checked).
  * The cut logic is pure integer arithmetic: distinct scores get a
  * descending cumulative row count, and a score joins tier i when fewer
  * than i·n/k rows strictly outscore it — ties can make tier SIZES
  * approximate, never membership ambiguous.
  *
  * Scale shape: one combiner-reduced groupBy on the score (output =
  * distinct scores — for permille-quantized signals like
  * [[NgramLm.familiarity]]'s fam_q this is bounded in the tens of
  * thousands regardless of corpus size), a single-partition window over
  * that TINY frame (the ShardPack bucket-totals justification), and a
  * broadcast join back. The corpus itself is never globally sorted.
  *
  * Lineage discipline (the round-9 finding: this operator once ran its
  * input's lineage THREE times — an eager count plus the two plan
  * subtrees): the total row count is now a window aggregate over the
  * same tiny per-score frame (no separate action at all), and the
  * scored input feeds exactly two plan consumers — the per-score
  * aggregate and the output join. With `cacheScored` (default) the
  * input lineage is persisted so it computes ONCE; disable it for
  * corpora too large to pin, which costs one recompute of the input
  * lineage instead. */
object QualityTiers {

  /** [[tiers]] plus a `release` handle that unpersists the scored-input
    * cache once the caller has materialized the frame — long-lived
    * sessions calling the library repeatedly should use this face so
    * cache blocks don't accumulate until LRU pressure (plain [[tiers]]
    * leaves release to the ContextCleaner, i.e. whenever the frame is
    * garbage collected). */
  final case class Tiered(frame: DataFrame, release: () => Unit)

  def tiersReleasable(df: DataFrame, scoreCol: String, k: Int = 3,
                      tierCol: String = "tier",
                      cacheScored: Boolean = true): Tiered = {
    val (out, cached) = build(df, scoreCol, k, tierCol, cacheScored)
    Tiered(out, () => cached.foreach(_.unpersist()))
  }

  def tiers(df: DataFrame, scoreCol: String, k: Int = 3,
            tierCol: String = "tier",
            cacheScored: Boolean = true): DataFrame =
    build(df, scoreCol, k, tierCol, cacheScored)._1

  private def build(df: DataFrame, scoreCol: String, k: Int,
                    tierCol: String,
                    cacheScored: Boolean): (DataFrame, Option[DataFrame]) = {
    require(k >= 2, s"k must be >= 2: $k")
    require(!df.columns.contains(tierCol),
      s"column $tierCol already exists — pick another tierCol")
    // NULL scores are EXCLUDED, not tiered: an equi-join on the score
    // would silently drop them anyway while still counting them in n,
    // skewing every boundary — excluding them from BOTH sides keeps the
    // total-membership contract exact over the scored rows. Callers
    // tier unscored rows separately if they want them.
    val scored0 = df.filter(col(scoreCol).isNotNull)
    val scored = if (cacheScored) scored0.persist() else scored0
    val w = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perScore = scored.groupBy(col(scoreCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__before", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
    // smallest i in 1..k with __before < i*n/k (same floor division the
    // oracle does; n rides the frame, so no eager count() action)
    val tier = (1 until k).reverse.foldLeft(lit(k): Column) { (acc, i) =>
      when(col("__before") < expr(s"(${i}L * __n) div ${k}L"), lit(i))
        .otherwise(acc)
    }
    val out = scored.join(
      broadcast(perScore.select(col(scoreCol), tier.as(tierCol))),
      Seq(scoreCol))
    (out, if (cacheScored) Some(scored) else None)
  }
}
