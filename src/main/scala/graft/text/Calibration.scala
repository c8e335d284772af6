package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Classifier calibration over a scored corpus: confusion counts at a
  * threshold grid, and the operating point that meets a precision
  * floor — how a quality classifier's cut ([[QualityClassifier]],
  * CCNet tiers, any score column) gets CHOSEN before it filters a
  * 100 TB corpus. The fastText/CCNet pipelines pick their quality
  * thresholds exactly this way: score a labeled sample, sweep
  * thresholds, take the most permissive cut that still meets the
  * precision bar.
  *
  * Scale shape: [[confusionAt]] computes ALL thresholds' confusion
  * counts in ONE aggregate pass (4·K conditional sums, map-side
  * combined — zero shuffles beyond the single-row reduce; K is the
  * grid size, driver-bounded by construction), then melts the one
  * collected row into K output rows. Never K passes, never an
  * explode-by-threshold K× blowup.
  */
object Calibration {

  /** Confusion counts at each threshold (prediction = score >=
    * threshold): rows `(threshold, tp, fp, fn, tn)`, one per grid
    * point, counts as BIGINT. Null scores/labels are refused by
    * construction (they would silently drop from every count and the
    * four cells would stop summing to the corpus size). */
  def confusionAt(df: DataFrame, scoreCol: String, labelCol: String,
                  thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds.distinct.size == thresholds.size,
      s"duplicate thresholds: $thresholds")
    val spark = df.sparkSession
    val score = col(scoreCol).cast("double")
    val label = col(labelCol).cast("boolean")
    val guarded = df.select(
      when(score.isNull || label.isNull,
        raise_error(lit(s"calibration: null $scoreCol/$labelCol row — " +
          "fill or filter before calibrating"))).otherwise(score).as("s"),
      label.as("y"))
    def cnt(pred: org.apache.spark.sql.Column) =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      val pos = col("s") >= lit(t)
      Seq(cnt(pos && col("y")).as(s"tp_$i"),
        cnt(pos && !col("y")).as(s"fp_$i"),
        cnt(!pos && col("y")).as(s"fn_$i"),
        cnt(!pos && !col("y")).as(s"tn_$i"))
    }
    val r = guarded.agg(aggs.head, aggs.tail: _*).head()
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      Row(t, r.getAs[Long](s"tp_$i"), r.getAs[Long](s"fp_$i"),
        r.getAs[Long](s"fn_$i"), r.getAs[Long](s"tn_$i"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("threshold", DoubleType, nullable = false),
        StructField("tp", LongType, nullable = false),
        StructField("fp", LongType, nullable = false),
        StructField("fn", LongType, nullable = false),
        StructField("tn", LongType, nullable = false))))
  }

  final case class OperatingPoint(threshold: Double, tp: Long, fp: Long,
                                  fn: Long, tn: Long) {
    def precision: Double =
      if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double =
      if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
  }

  /** The most permissive grid threshold (max recall = lowest cut)
    * whose precision meets `minPrecision`; None when no grid point
    * does. `curve` is [[confusionAt]] output — K rows, collected. */
  def operatingPoint(curve: DataFrame,
                     minPrecision: Double): Option[OperatingPoint] =
    curve.collect()
      .map(r => OperatingPoint(r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter(_.precision >= minPrecision)
      .sortBy(p => (-p.recall, p.threshold)).headOption

  /** Area under the precision-recall curve of the GRID (trapezoid over
    * recall-sorted grid points, endpoints extended flat) — a single
    * comparable number for "is the new classifier better", from the
    * same one collected pass. */
  def prAuc(curve: DataFrame): Double = {
    val pts = curve.collect()
      .map(r => OperatingPoint(r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .map(p => (p.recall, p.precision)).sortBy(_._1)
    require(pts.nonEmpty, "empty calibration curve")
    val ext = ((0.0, pts.head._2) +: pts.toSeq) :+ (1.0, pts.last._2)
    ext.sliding(2).map { case Seq((r1, p1), (r2, p2)) =>
      (r2 - r1) * (p1 + p2) / 2.0
    }.sum
  }
}
