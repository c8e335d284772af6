package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution drift between two dataset versions as EXACT
  * total-variation distance — the shape-drift complement to
  * `RunLedger.countDrift`'s volume gate: "did the VALUES move", not
  * just "did the count move". Catches a upstream bug that halves
  * purchases while doubling errors with the row count unchanged.
  *
  * Why TV and not PSI/KL/χ²: those need logarithms or float division
  * inside the aggregate, which no two engines (or two partition
  * orders) compute identically — a drift GATE that flickers at the
  * boundary is noise. TV = ½·Σ|p_i − q_i| is a pure rational:
  * cross-multiplied as Σ|c_i·m − d_i·n| over n·m it needs only
  * integer arithmetic (widened through DECIMAL(38,0) so 10⁹-row
  * snapshots cannot overflow), so the permille score is
  * bit-reproducible anywhere and usable as a hard CI gate.
  *
  * Scale shape: each side reduces to (group, bin) counts map-side;
  * the full-outer bin join and the group-total windows run over the
  * REDUCED frames only (same bounded-domain contract as Profile —
  * quantize unbounded columns first). With `byCols` the windows
  * partition per group; without, the single window covers just the
  * distinct bins.
  */
object DriftCheck {

  /** Per-`byCols` group: (byCols…, n_a, n_b, tv_permille) where
    * tv_permille = ⌊1000·TV⌋ ∈ [0, 1000]. A group present on only one
    * side scores 1000 (complete drift). NULL bins are excluded on
    * both sides (quantize or coalesce upstream if NULL is a value). */
  def tvDrift(a: DataFrame, b: DataFrame, binCol: String,
              byCols: Seq[String] = Nil): DataFrame = {
    def reduce(df: DataFrame, out: String) =
      df.filter(col(binCol).isNotNull)
        .groupBy((byCols :+ binCol).map(col): _*)
        .agg(count(lit(1)).as(out))
    tvDriftCounts(reduce(a, "ca"), reduce(b, "cb"), binCol, byCols)
  }

  /** Counts-based core for callers that already hold reduced
    * (bin, count) frames — the streaming monitor folds cumulative
    * counts and compares WITHOUT re-touching raw rows. `a`/`b` carry
    * (byCols…, binCol, ca) and (byCols…, binCol, cb). */
  def tvDriftCounts(a: DataFrame, b: DataFrame, binCol: String,
                    byCols: Seq[String] = Nil): DataFrame = {
    val joined = a.withColumnRenamed("ca", "__ca")
      .join(b.withColumnRenamed("cb", "__cb"), byCols :+ binCol, "full")
      .na.fill(0L, Seq("__ca", "__cb"))
    val w =
      if (byCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(byCols.map(col): _*)
    val terms = joined
      .withColumn("__na", sum(col("__ca")).over(w))
      .withColumn("__nb", sum(col("__cb")).over(w))
      .withColumn("__term", expr(
        "abs(CAST(__ca AS DECIMAL(38, 0)) * __nb - " +
          "CAST(__cb AS DECIMAL(38, 0)) * __na)"))
    val grouped =
      if (byCols.isEmpty) terms.groupBy()
      else terms.groupBy(byCols.map(col): _*)
    grouped
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__term")).as("__s"))
      .withColumn("tv_permille",
        when(col("n_a") === 0 || col("n_b") === 0, lit(1000L))
          .otherwise(expr(
            "CAST(500 AS DECIMAL(38, 0)) * __s div " +
              "(CAST(n_a AS DECIMAL(38, 0)) * n_b)").cast("bigint")))
      .drop("__s")
  }
}
