package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling with ENGINE-EXACT discrete percentiles: per column
  * — row count, null count, distinct count, min, max, and the discrete
  * percentile values (the smallest value v whose cumulative count
  * reaches p% of the non-null rows: `100·cum(v) >= p·n`, pure integer
  * comparison). No interpolation, no sketch: two engines computing
  * this profile agree bit-for-bit, which is what makes a profile
  * usable as a cross-system quality GATE rather than a dashboard
  * estimate (the same reproducibility argument as the CCNet tier cuts
  * in [[graft.text.QualityTiers]]).
  *
  * Reference: the reference's quality checkers count rows and compare
  * schemas (RowCountPolicy, our [[Quality]]) but have no distribution
  * profile; its audit pipeline ships counts only. This operator is the
  * distribution face of the same dataset-health story.
  *
  * Scale shape: ONE map-side-combined shuffle reduces the column to
  * (value, count) — every later step (cumulative window, percentile
  * cuts, min/max/distinct) runs over the DISTINCT VALUES only. The
  * cumulative window is single-partition BY DESIGN over that reduced
  * frame, so the contract is: profile bounded-cardinality columns
  * (enums, quantities, quantized scores). For a continuous column,
  * quantize first (e.g. `floor(price)`) — refusing unbounded domains
  * is what keeps the percentiles exact at 100 TB; `maxDistinct`
  * enforces it loudly instead of silently sorting a corpus.
  */
object Profile {

  /** One profile row per requested column:
    * (colname, n, nulls, n_distinct, vmin, vmax, p<P1>, p<P2>, ...) —
    * values cast to double for the uniform cross-column schema. */
  def numericProfile(df: DataFrame, cols: Seq[String],
                     percentiles: Seq[Int] = Seq(50, 90, 99),
                     maxDistinct: Long = 1000000L): DataFrame = {
    require(cols.nonEmpty)
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100))
    cols.map(c => profileOne(df, c, percentiles, maxDistinct))
      .reduce(_ unionByName _)
  }

  /** Per-GROUP engine-exact discrete percentiles — the grouped face of
    * [[numericProfile]] (per-source length p50/p95 reports, per-type
    * value distributions): one map-side-combined reduction to
    * (group, value, count), then the cumulative window runs PARTITIONED
    * BY GROUP — as many-way parallel as there are groups, never the
    * single-partition window of the ungrouped profile. Same integer-cut
    * semantics, same quantize-first contract; the guard bounds the
    * distinct values of the LARGEST group. */
  def groupedPercentiles(df: DataFrame, groupCol: String, c: String,
                         ps: Seq[Int] = Seq(50, 90, 99),
                         maxDistinctPerGroup: Long = 1000000L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100))
    val v = col(c).cast("double")
    val per = df.filter(v.isNotNull)
      .groupBy(col(groupCol), v.as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wOrder = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    // the unbounded-domain guard rides the plan (raise_error on the
    // per-group distinct count) instead of running a separate eager
    // aggregate — one raw scan total, same loud refusal. It gates the
    // CONSUMED `n` column: a free-standing guard column would be
    // column-pruned away, raise_error included.
    val cum = per
      .withColumn("cum", sum(col("cnt")).over(wOrder))
      .withColumn("n",
        when(count(lit(1)).over(wAll) <= maxDistinctPerGroup,
          sum(col("cnt")).over(wAll))
        .otherwise(raise_error(concat(
          lit(s"a group has more than $maxDistinctPerGroup distinct $c "),
          lit("values: quantize before profiling — exact percentiles over "),
          lit("an unbounded domain would sort the whole group")))))
    val pAggs = ps.map(p =>
      min(when(col("cum") * 100 >= col("n") * p, col("v"))).as(s"p$p"))
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), pAggs: _*)
  }

  /** Winsorize: clamp `c` into its exact [pLo, pHi] discrete
    * percentile band — the outlier-clipping cleanup step, using the
    * SAME integer-cut percentile math as the profile so the clip
    * bounds are engine-reproducible (a sketch-based clip moves with
    * partitioning; this one never does). The two cuts are computed
    * once over the reduced (value, count) frame; the clip itself is
    * map-only. NULLs pass through as NULL. Same quantize-first
    * contract as [[numericProfile]] for unbounded domains. */
  def winsorize(df: DataFrame, c: String, pLo: Int, pHi: Int,
                outCol: String = "clipped",
                maxDistinct: Long = 1000000L): DataFrame = {
    require(1 <= pLo && pLo < pHi && pHi <= 100,
      s"need 1 <= pLo < pHi <= 100, got ($pLo, $pHi)")
    val row = profileOne(df, c, Seq(pLo, pHi), maxDistinct)
      .select(col(s"p$pLo"), col(s"p$pHi")).collect()(0)
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"cannot winsorize $c: no non-null values")
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    // greatest/least SKIP nulls (a NULL would clamp to lo) — pass
    // NULL through explicitly
    df.withColumn(outCol, when(col(c).isNull, lit(null).cast("double"))
      .otherwise(least(greatest(col(c).cast("double"), lit(lo)), lit(hi))))
  }

  private def profileOne(df: DataFrame, c: String, ps: Seq[Int],
                         maxDistinct: Long): DataFrame = {
    val spark = df.sparkSession
    val v = col(c).cast("double")
    // ONE scan of the table: the reduction keeps the NULL group so the
    // null count comes from the reduced frame, and the frame is cached
    // so the guard probe and the final aggregate never re-read the
    // input (the profile previously cost 3 full scans per column)
    val per = df.groupBy(v.as("v")).agg(count(lit(1)).as("cnt")).persist()
    try {
      val meta = per.agg(
        count(when(col("v").isNotNull, 1)).as("nd"),
        coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("nulls"))
        .collect()(0)
      val (nDistinct, nulls) = (meta.getLong(0), meta.getLong(1))
      // loud guard: an unbounded domain must be quantized by the
      // caller, not silently single-partition-sorted
      require(nDistinct <= maxDistinct,
        s"$c has $nDistinct distinct values (max $maxDistinct): quantize " +
          "before profiling — exact percentiles over an unbounded domain " +
          "would globally sort the corpus")
      val wOrder = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = per.filter(col("v").isNotNull)
        .withColumn("cum", sum(col("cnt")).over(wOrder))
        .withColumn("n", sum(col("cnt")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val pAggs = ps.map(p =>
        min(when(col("cum") * 100 >= col("n") * p, col("v"))).as(s"p$p"))
      val aggs = Seq(max(col("n")).as("n"), min(col("v")).as("vmin"),
        max(col("v")).as("vmax")) ++ pAggs
      val result = cum.agg(aggs.head, aggs.tail: _*)
        .select(Seq(lit(c).as("colname"), col("n"), lit(nulls).as("nulls"),
          lit(nDistinct).as("n_distinct"), col("vmin"), col("vmax")) ++
          ps.map(p => col(s"p$p")): _*)
      // ≤ 1 row: materialize off the cached reduction so the frame this
      // returns holds no reference to the unpersisted cache
      val rows = result.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), result.schema)
    } finally { per.unpersist(); () }
  }
}
