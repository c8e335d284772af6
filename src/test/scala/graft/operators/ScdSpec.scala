package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("versions chain into [from, to) intervals; the last stays open") {
    val ch = Seq(
      ("k1", ts("10:00:00"), "v1"),
      ("k1", ts("11:00:00"), "v2"),
      ("k1", ts("12:00:00"), "v3"),
      ("k2", ts("10:30:00"), "w1")).toDF("k", "ts", "p")
    val h = Scd.scd2(ch, Seq("k"), "ts")
      .select("k", "p", "valid_from", "valid_to")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(h == Set(
      ("k1", "v1", ts("10:00:00"), ts("11:00:00")),
      ("k1", "v2", ts("11:00:00"), ts("12:00:00")),
      ("k1", "v3", ts("12:00:00"), null),
      ("k2", "w1", ts("10:30:00"), null)))
  }

  test("current() equals the latest-per-key compaction") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val hist = Scd.scd2(ev, Seq("user_id"), "ts",
      delta = Seq(col("event_id").desc))
    val cur = Scd.current(hist)
      .select("user_id", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ev
      .transform(Dedup.keyDeltaTop1(Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc)))
      .select("user_id", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cur == expected)
    // exactly one open interval per key
    assert(cur.size == ev.select("user_id").distinct().count())
  }

  test("same-(key, ts) duplicates collapse deterministically via delta") {
    val ch = Seq(
      ("k", ts("10:00:00"), 1L, "low"),
      ("k", ts("10:00:00"), 9L, "high"), // survivor: event_id desc
      ("k", ts("11:00:00"), 2L, "next")).toDF("k", "ts", "id", "p")
    val h = Scd.scd2(ch, Seq("k"), "ts", delta = Seq(col("id").desc))
      .select("p", "valid_from", "valid_to").orderBy("valid_from")
      .collect().map(r => (r.getString(0), r.getTimestamp(2)))
    assert(h.toSeq == Seq(("high", ts("11:00:00")), ("next", null)))
  }

  test("intervals tile the timeline: a point-in-interval probe equals asOf") {
    val ev = Tables.load(spark, sf, "events")
    val dim = ev.filter(col("event_type") === "purchase")
      .transform(Dedup.keyDeltaTop1(Seq("user_id", "ts"),
        Seq(col("event_id").desc)))
      .select(col("user_id"), col("ts").as("dts"), col("value").as("dv"))
    val hist = Scd.scd2(dim, Seq("user_id"), "dts")
    val probes = ev.select(col("user_id"), col("event_id"), col("ts"))
    // interval probe: exactly one interval matches any in-range point
    val viaIntervals = probes.join(hist,
        probes("user_id") === hist("user_id") &&
          probes("ts") >= hist("valid_from") &&
          (hist("valid_to").isNull || probes("ts") < hist("valid_to")),
        "left_outer")
      .select(probes("event_id"), hist("dv"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val viaAsOf = TemporalJoin.asOf(probes, hist
        .select(col("user_id"), col("dts"), col("dv")),
        Seq("user_id"), "ts", "dts")
      .select(col("event_id"), col("dv"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaIntervals == viaAsOf)
    assert(viaIntervals.values.exists(_.nonEmpty))
  }

  test("asOf reads the version valid at the point, boundaries inclusive-exclusive") {
    val ch = Seq(
      ("k1", ts("10:00:00"), "v1"),
      ("k1", ts("12:00:00"), "v2"),
      ("k2", ts("13:00:00"), "w1")).toDF("k", "ts", "p")
    val h = Scd.scd2(ch, Seq("k"), "ts")
    def at(t: String): Set[(String, String)] =
      Scd.asOf(h, lit(ts(t))).select("k", "p")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(at("09:00:00") == Set.empty)
    assert(at("10:00:00") == Set("k1" -> "v1"), "valid_from is inclusive")
    assert(at("11:59:59") == Set("k1" -> "v1"))
    assert(at("12:00:00") == Set("k1" -> "v2"), "valid_to is exclusive")
    assert(at("14:00:00") == Set("k1" -> "v2", "k2" -> "w1"),
      "open versions catch everything after their start")
  }

  test("clashing interval column names are refused") {
    val ch = Seq(("k", ts("10:00:00"), "x")).toDF("k", "ts", "valid_from")
    val e = intercept[IllegalArgumentException] {
      Scd.scd2(ch, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("valid_from"))
  }
}
