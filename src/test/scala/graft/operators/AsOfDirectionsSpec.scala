package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfDirectionsSpec extends SparkSpec {
  import spark.implicits._

  private def lts(rows: (Long, String)*) =
    rows.toSeq.toDF("k", "t")
      .select(col("k"), to_timestamp(col("t")).as("lt"))
  private def rts(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("k", "t", "rv")
      .select(col("k"), to_timestamp(col("t")).as("rt"), col("rv"))

  test("forward: earliest right at-or-after, inclusive, null after last") {
    val l = lts((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
      (1L, "2024-01-01 13:00:00"))
    val r = rts((1L, "2024-01-01 11:00:00", 1.0),
      (1L, "2024-01-01 12:00:00", 2.0))
    val got = TemporalJoin.asOfForward(l, r, Seq("k"), "lt", "rt")
      .select(col("lt").cast("string"), col("rv"))
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "2024-01-01 10:00:00" -> Some(1.0), // next right after
      "2024-01-01 11:00:00" -> Some(1.0), // exact ts: inclusive
      "2024-01-01 13:00:00" -> None))     // after last right
  }

  test("nearest: closer side wins, ties go backward") {
    val l = lts((1L, "2024-01-01 10:00:00"), // only fwd exists
      (1L, "2024-01-01 11:30:00"),           // back 30m vs fwd 30m: tie
      (1L, "2024-01-01 11:40:00"),           // back 40m vs fwd 20m: fwd
      (1L, "2024-01-01 14:00:00"))           // only back exists
    val r = rts((1L, "2024-01-01 11:00:00", 1.0),
      (1L, "2024-01-01 12:00:00", 2.0))
    val got = TemporalJoin.asOfNearest(l, r, Seq("k"), "lt", "rt")
      .select(col("lt").cast("string"), col("rv"))
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "2024-01-01 10:00:00" -> Some(1.0),
      "2024-01-01 11:30:00" -> Some(1.0), // tie -> backward
      "2024-01-01 11:40:00" -> Some(2.0),
      "2024-01-01 14:00:00" -> Some(2.0)))
  }

  test("forward and nearest plans: ONE exchange each, no join node") {
    val l = lts((1L, "2024-01-01 10:00:00"))
    val r = rts((1L, "2024-01-01 11:00:00", 1.0))
    for ((name, df) <- Seq(
      "forward" -> TemporalJoin.asOfForward(l, r, Seq("k"), "lt", "rt"),
      "nearest" -> TemporalJoin.asOfNearest(l, r, Seq("k"), "lt", "rt"))) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
      assert(exchanges == 1, s"$name: want exactly 1 shuffle, got $exchanges")
      assert(!plan.contains("Join"), s"$name must not plan a join:\n$plan")
      val sorts = """\(\d+\) Sort""".r.findAllIn(plan).size
      assert(sorts == 1, s"$name: want ONE sort (shared by both frames), got $sorts")
    }
  }

  test("forward equals the brute-force theta-join on real events") {
    val ev = Tables.load(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(max("value").as("pval"))
    val fast = TemporalJoin.asOfForward(clicks, purchases,
      Seq("user_id"), "ts", "pts")
      .select(col("event_id"), col("pts").cast("string"), col("pval"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    // brute force: min pts >= click ts per click via theta-join + window
    val p2 = purchases.withColumnRenamed("user_id", "pu")
    val w = Window.partitionBy(col("event_id")).orderBy(col("pts"))
    val slow = clicks.join(p2,
        col("user_id") === col("pu") && col("pts") >= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || col("pts").isNull)
      .select(col("event_id"), col("pts").cast("string"), col("pval"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(fast == slow)
    assert(fast.nonEmpty)
  }
}
