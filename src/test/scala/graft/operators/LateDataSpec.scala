package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sinks.CatalogRegister
import graft.sources.DatePartitionedSource

class LateDataSpec extends SparkSpec {
  import spark.implicits._

  test("late split + spill is hidden from main reads; recompact merges and dedups") {
    val dir = tmpDir("late") + "/ds"
    val wm = Timestamp.valueOf("2024-01-02 00:00:00")
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), "late"),
      (2L, Timestamp.valueOf("2024-01-03 05:00:00"), "ontime"),
      (3L, Timestamp.valueOf("2024-01-03 06:00:00"), "ontime")).toDF("id", "ts", "v")
    val (onTime, late) = LateData.splitLate(df, "ts", wm)
    onTime.write.parquet(dir)
    LateData.appendLate(late, dir, "run1")

    // main read must not see the spill
    assert(spark.read.parquet(dir).count() == 2)
    assert(LateData.lateRows(spark, dir, df).count() == 1)

    // conditions: ratio 1/2 >= 0.3 -> recompact; below threshold -> not
    val st = LateData.LateState(mainRows = 2, lateRows = 1,
      lastCompactionMs = System.currentTimeMillis())
    assert(LateData.shouldRecompact(st, ratioThreshold = 0.3))
    assert(!LateData.shouldRecompact(st, ratioThreshold = 0.9))
    // staleness forces it even under the ratio
    assert(LateData.shouldRecompact(
      st.copy(lastCompactionMs = 0L), ratioThreshold = 0.9, maxAgeMs = 1000L))
    // no late rows -> never
    assert(!LateData.shouldRecompact(st.copy(lateRows = 0), 0.0))

    LateData.recompact(spark, dir, Seq("id"), Seq(col("ts").desc), "run2")
    val after = spark.read.parquet(dir)
    assert(after.count() == 3)
    assert(after.filter($"v" === "late").count() == 1)
    // spill dir gone
    assert(LateData.lateRows(spark, dir, df).count() == 0)
  }

  test("date-partitioned tree prunes below the watermark at plan time") {
    val root = tmpDir("datetree")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/2024/01/01")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$root/2024/01/02")
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$root/2024/01/03")
    val parts = DatePartitionedSource.partitions(spark, root)
    assert(parts.map(_.date.toString).sorted ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    val pruned = DatePartitionedSource.read(spark, root,
      lowWatermark = Some(java.time.LocalDate.parse("2024-01-01")))
    assert(pruned.select("id").as[Long].collect().toSet == Set(2L, 3L))
    // pruning happens at plan time: the pruned-out dir's files are not
    // even part of the scan's file list
    assert(!pruned.inputFiles.exists(_.contains("2024/01/01")))
    // lookback window bounds the scan from below
    val look = DatePartitionedSource.read(spark, root, lookback = Some(1))
    assert(look.select("id").as[Long].collect().toSet == Set(2L, 3L))
    // nothing in range -> empty with schema
    val none = DatePartitionedSource.read(spark, root,
      lowWatermark = Some(java.time.LocalDate.parse("2030-01-01")))
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
  }

  test("catalog registration exposes published partitioned dirs to SQL") {
    val dir = tmpDir("register") + "/tbl"
    Tables.load(spark, sf, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").parquet(dir)
    CatalogRegister.register(spark, "graft_reg_orders", dir,
      partitionCols = Seq("status"))
    try {
      val viaSql = spark.table("graft_reg_orders")
      assert(viaSql.count() == Tables.load(spark, sf, "orders").count())
      // partition filter works through the catalog
      val f = spark.sql(
        "SELECT count(*) FROM graft_reg_orders WHERE status = 'F'").head.getLong(0)
      assert(f > 0 && f < viaSql.count())
    } finally CatalogRegister.deregister(spark, "graft_reg_orders")
  }

  test("re-registration accepts evolved schemas, refuses incompatible ones") {
    val base = tmpDir("reg-evolve")
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    orders.write.parquet(s"$base/v1")
    CatalogRegister.register(spark, "graft_evolve_t", s"$base/v1")
    try {
      // valid evolution: new nullable column appears in the publish
      orders.withColumn("note", lit("x"))
        .write.parquet(s"$base/v2")
      CatalogRegister.reregisterEvolved(spark, "graft_evolve_t", s"$base/v2")
      assert(spark.table("graft_evolve_t").columns.contains("note"))
      // invalid: a published type narrowing must be refused loudly
      orders.withColumn("o_totalprice", col("o_totalprice").cast("int"))
        .write.parquet(s"$base/v3")
      val e = intercept[IllegalArgumentException] {
        CatalogRegister.reregisterEvolved(spark, "graft_evolve_t", s"$base/v3")
      }
      assert(e.getMessage.contains("cannot promote"))
      // the registration is untouched after the refusal
      assert(spark.table("graft_evolve_t").schema("o_totalprice")
        .dataType.typeName != "integer")
      // a re-point that fails AFTER the compat check restores the old
      // registration (bogus partition column -> CREATE fails mid-way)
      val rowsBefore = spark.table("graft_evolve_t").count()
      intercept[Exception] {
        CatalogRegister.reregisterEvolved(spark, "graft_evolve_t",
          s"$base/v2", partitionCols = Seq("no_such_col"))
      }
      assert(spark.table("graft_evolve_t").count() == rowsBefore)
    } finally CatalogRegister.deregister(spark, "graft_evolve_t")
  }

  test("avro->orc conversion swaps only affected partitions") {
    import graft.sources.AvroIO
    val base = tmpDir("avro2orc")
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type")
    AvroIO.write(ev, s"$base/avro")
    val swapped = FormatConvert.avroToOrc(spark, s"$base/avro", s"$base/orc",
      partitionBy = Seq("event_type"), runId = "c1")
    assert(swapped.nonEmpty)
    val orc = spark.read.orc(s"$base/orc")
    assert(orc.count() == ev.count())

    // second conversion carrying ONE partition must leave the others alone
    val one = ev.filter($"event_type" === "click").limit(5)
    AvroIO.write(one, s"$base/avro2")
    val swapped2 = FormatConvert.avroToOrc(spark, s"$base/avro2", s"$base/orc",
      partitionBy = Seq("event_type"), runId = "c2")
    assert(swapped2 == Seq("event_type=click"))
    val after = spark.read.orc(s"$base/orc")
    assert(after.filter($"event_type" === "click").count() == 5)
    assert(after.filter($"event_type" =!= "click").count() ==
      ev.filter($"event_type" =!= "click").count())
  }

  test("file-size policy bounds written files") {
    val dir = tmpDir("fsize")
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/out")
    assert(Quality.fileSizesWithin(spark, s"$dir/out", 1L, 10L * 1024 * 1024))
    assert(!Quality.fileSizesWithin(spark, s"$dir/out", 1L, 10L))
  }
}
