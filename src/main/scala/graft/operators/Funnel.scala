package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis: how far does each user get through
  * stage₀ → stage₁ → … → stageₙ₋₁, where stage k counts only if it
  * happens AT OR AFTER the earliest certified stage k-1?
  *
  * Depth-k semantics: reach₀(r) = min ts of a stage₀ event among the
  * user's first r events; reachₖ(r) = min ts of a stageₖ event e with
  * ts(e) ≥ reachₖ₋₁(e) — i.e. the earliest stage-k event that happens
  * after an already-certified k-1 prefix. A user's depth is the
  * largest k with reachₖ₋₁ defined anywhere. This is the classic
  * product-analytics funnel (strictly ordered, unbounded window).
  *
  * Plan shape: every reachₖ is a running `min` over the SAME window
  * spec — one hash exchange on the user key and ONE sort carry all n
  * window passes (Catalyst chains WindowExecs without re-sorting), then
  * a map-side-combined aggregate folds per-user depth. No joins, no
  * self-join per stage (the naive SQL formulation), no collect_list
  * (unbounded per-user state). Ties at equal ts are totalized by
  * `tieCol` so results are layout-independent and engine-exact.
  */
object Funnel {

  /** Per-user funnel depth: (userCol, depth) with depth in 0..stages.n.
    * Users present in `df` but never reaching stage₀ report depth 0. */
  def depth(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
            stages: Seq[String], tieCol: String): DataFrame =
    depth(df, Seq(userCol), tsCol, typeCol, stages, tieCol)

  /** Composite-key face (e.g. per (user, session) for within-session
    * conversion): same recursion, the window partitions on every key. */
  def depth(df: DataFrame, userCols: Seq[String], tsCol: String,
            typeCol: String, stages: Seq[String],
            tieCol: String): DataFrame = {
    require(userCols.nonEmpty, "funnel needs at least one key column")
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"stages must be distinct: $stages")
    val w = Window.partitionBy(userCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withReach = stages.zipWithIndex.foldLeft(df) {
      case (d, (stage, 0)) =>
        d.withColumn(reachCol(0),
          min(when(col(typeCol) === stage, col(tsCol))).over(w))
      case (d, (stage, k)) =>
        d.withColumn(reachCol(k),
          min(when(col(typeCol) === stage &&
            col(tsCol) >= col(reachCol(k - 1)), col(tsCol))).over(w))
    }
    // row-wise deepest certified stage, folded per user: ascending fold
    // leaves the DEEPEST stage's check outermost in the CASE chain
    val rowDepth = stages.indices.foldLeft[Column](lit(0)) {
      case (els, k) => when(col(reachCol(k)).isNotNull, lit(k + 1)).otherwise(els)
    }
    withReach
      .groupBy(userCols.map(col): _*)
      .agg(max(rowDepth).cast("bigint").as("depth"))
  }

  /** Funnel report: users reaching AT LEAST each stage (the classic
    * conversion bar chart) — one row per stage 1..n even when no user
    * stops exactly there, derived from [[depth]] by a tiny suffix-sum
    * join over ≤ n+1 aggregated depth counts. */
  def report(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String], tieCol: String): DataFrame = {
    val d = depth(df, userCol, tsCol, typeCol, stages, tieCol)
    val counts = d.groupBy(col("depth")).agg(count(lit(1)).as("n"))
    val levels = df.sparkSession.range(1, stages.length + 1L)
      .toDF("stage_depth")
    // ≤ n × (n+1) nested-loop over already-reduced rows — trivially tiny
    levels.join(counts, col("depth") >= col("stage_depth"), "left")
      .groupBy(col("stage_depth").as("depth"))
      .agg(coalesce(sum(col("n")), lit(0L)).cast("bigint").as("users_at_least"))
  }

  private def reachCol(k: Int): String = s"__graft_reach_$k"
}
