package graft.text

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  // 4 positives scoring (9, 7, 5, 1), 4 negatives scoring (8, 3, 2, 0)
  private def scored = Seq(
    (9.0, true), (7.0, true), (5.0, true), (1.0, true),
    (8.0, false), (3.0, false), (2.0, false), (0.0, false))
    .toDF("score", "label")

  test("confusionAt computes every grid point's cells in one pass") {
    val curve = Calibration.confusionAt(scored, "score", "label",
      Seq(0.0, 4.0, 8.5))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(curve(0.0) == ((4L, 4L, 0L, 0L)))  // everything predicted +
    assert(curve(4.0) == ((3L, 1L, 1L, 3L)))  // 9,7,5 tp; 8 fp
    assert(curve(8.5) == ((1L, 0L, 3L, 4L)))  // only the 9
    // exactly ONE aggregate over the input: the plan has a single scan
    val plan = Calibration.confusionAt(scored, "score", "label",
      Seq(0.0, 4.0, 8.5)).queryExecution // already-collected local rows
    assert(plan.analyzed.toString.contains("LogicalRDD"),
      "curve output must be a bounded local relation, not a re-scan")
  }

  test("operatingPoint: most permissive cut meeting the precision floor") {
    val curve = Calibration.confusionAt(scored, "score", "label",
      Seq(0.0, 4.0, 6.0, 8.5))
    // precision: 0.0 -> 0.5, 4.0 -> 0.75, 6.0 -> 2/3, 8.5 -> 1.0
    val p75 = Calibration.operatingPoint(curve, 0.75).get
    assert(p75.threshold == 4.0 && p75.recall == 0.75, p75)
    val p100 = Calibration.operatingPoint(curve, 0.99).get
    assert(p100.threshold == 8.5, p100)
    assert(Calibration.operatingPoint(
      curve.filter($"threshold" === 0.0), 0.9).isEmpty)
  }

  test("prAuc orders by recall and extends endpoints flat") {
    val curve = Calibration.confusionAt(scored, "score", "label",
      Seq(0.0, 4.0, 8.5))
    val auc = Calibration.prAuc(curve)
    // grid points (recall, precision): (1.0, .5), (.75, .75), (.25, 1.0)
    // extended: (0,1)..(0.25,1)..(0.75,.75)..(1,.5) -> trapezoids
    val expected = 0.25 * 1.0 + 0.5 * (1.0 + 0.75) / 2 + 0.25 * (0.75 + 0.5) / 2
    assert(math.abs(auc - expected) < 1e-12, s"$auc vs $expected")
  }

  test("null scores or labels refuse loudly; empty grid refuses") {
    val bad = Seq((Some(1.0), Some(true)), (None, Some(false)))
      .toDF("score", "label")
    val e = intercept[Exception] {
      Calibration.confusionAt(bad, "score", "label", Seq(0.5)).collect()
    }
    assert(e.getMessage.contains("null"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Calibration.confusionAt(scored, "score", "label", Nil)
    }
    assert(e2.getMessage.contains("threshold"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Calibration.confusionAt(scored, "score", "label", Seq(1.0, 1.0))
    }
    assert(e3.getMessage.contains("duplicate"), e3.getMessage)
  }
}
