package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.FormatConvert

/** Golden-string checks for the Avro→ORC Hive publish DDL/DML — the
  * statements must be byte-stable (they land in metastore audit logs and
  * replay scripts), so these assert exact text, not just shape. */
class HiveDdlSpec extends SparkSpec {

  private val nested = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DecimalType(12, 2)),
    StructField("tags", ArrayType(StringType)),
    StructField("attrs", MapType(StringType, IntegerType)),
    StructField("addr", StructType(Seq(
      StructField("street", StringType),
      StructField("geo", StructType(Seq(
        StructField("lat", DoubleType),
        StructField("lon", DoubleType))))))),
    StructField("ds", StringType),
    StructField("hr", IntegerType)))

  test("hiveType maps nested Catalyst types with escaped inner names") {
    assert(HiveDdl.hiveType(nested("addr").dataType) ==
      "struct<`street`:string,`geo`:struct<`lat`:double,`lon`:double>>")
    assert(HiveDdl.hiveType(nested("price").dataType) == "decimal(12,2)")
    assert(HiveDdl.hiveType(MapType(StringType, ArrayType(ByteType))) ==
      "map<string,array<tinyint>>")
  }

  test("createTableDdl golden: partitioned nested ORC table") {
    val ddl = HiveDdl.createTableDdl(nested, "orders_orc", "/data/orders_orc",
      db = "warehouse", partitionBy = Seq("ds", "hr"),
      tableProperties = Map("orc.compress" -> "ZLIB"))
    val expected =
      """CREATE EXTERNAL TABLE IF NOT EXISTS `warehouse`.`orders_orc` (
        |  `id` bigint,
        |  `name` string,
        |  `price` decimal(12,2),
        |  `tags` array<string>,
        |  `attrs` map<string,int>,
        |  `addr` struct<`street`:string,`geo`:struct<`lat`:double,`lon`:double>>
        |)
        |PARTITIONED BY (`ds` string, `hr` int)
        |STORED AS ORC
        |LOCATION '/data/orders_orc'
        |TBLPROPERTIES ('orc.compress'='ZLIB')
        |""".stripMargin
    assert(ddl == expected, s"DDL drifted:\n$ddl")
  }

  test("insertOverwriteDml golden: static + dynamic partition mix") {
    val dml = HiveDdl.insertOverwriteDml(nested, "orders_avro_staging",
      "orders_orc", db = "warehouse", partitionBy = Seq("ds", "hr"),
      staticPartition = Map("ds" -> "2024-01-01"))
    val expected =
      """INSERT OVERWRITE TABLE `warehouse`.`orders_orc`
        |PARTITION (`ds`='2024-01-01', `hr`)
        |SELECT
        |  `id`,
        |  `name`,
        |  `price`,
        |  `tags`,
        |  `attrs`,
        |  `addr`,
        |  `hr`
        |FROM `warehouse`.`orders_avro_staging`
        |""".stripMargin
    assert(dml == expected, s"DML drifted:\n$dml")
  }

  test("add/drop partition DDL + path spec round-trip (URL-encoded values)") {
    val spec = HiveDdl.specFromPath("ds=2024-01-01/name=a%20b")
    assert(spec == Seq("ds" -> "2024-01-01", "name" -> "a b"))
    assert(HiveDdl.addPartitionDdl("t", spec, "/data/t/ds=2024-01-01/name=a%20b") ==
      "ALTER TABLE `default`.`t` ADD IF NOT EXISTS PARTITION " +
        "(`ds`='2024-01-01', `name`='a b') LOCATION '/data/t/ds=2024-01-01/name=a%20b'")
    assert(HiveDdl.dropPartitionDdl("t", Seq("ds" -> "2024-01-01")) ==
      "ALTER TABLE `default`.`t` DROP IF EXISTS PARTITION (`ds`='2024-01-01')")
  }

  test("quoting: partition values and properties escape quotes/backslashes") {
    val ddl = HiveDdl.addPartitionDdl("t", Seq("k" -> "o'brien\\x"), "/p")
    assert(ddl.contains("""`k`='o\'brien\\x'"""))
  }

  test("createTableDdl refuses unknown partition columns and empty bodies") {
    intercept[IllegalArgumentException] {
      HiveDdl.createTableDdl(nested, "t", "/p", partitionBy = Seq("nope"))
    }
    val onlyPart = StructType(Seq(StructField("ds", StringType)))
    intercept[IllegalArgumentException] {
      HiveDdl.createTableDdl(onlyPart, "t", "/p", partitionBy = Seq("ds"))
    }
  }

  test("evolutionDdl: widen -> CHANGE COLUMN, new -> ADD COLUMNS, narrow -> throw") {
    val existing = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType)))
    val evolved = StructType(Seq(
      StructField("id", LongType),          // widened
      StructField("name", StringType),      // unchanged
      StructField("score", DoubleType)))    // new
    val ddl = HiveDdl.evolutionDdl(existing, evolved, "t", db = "wh",
      tableProperties = Map("orc.compress" -> "ZLIB"))
    assert(ddl == Seq(
      "ALTER TABLE `wh`.`t` CHANGE COLUMN `id` `id` bigint",
      "ALTER TABLE `wh`.`t` ADD COLUMNS (`score` double)",
      "ALTER TABLE `wh`.`t` SET TBLPROPERTIES ('orc.compress'='ZLIB')"))
    // narrowing long -> int must throw, not emit corrupting DDL
    val e = intercept[IllegalArgumentException] {
      HiveDdl.evolutionDdl(
        StructType(Seq(StructField("id", LongType))),
        StructType(Seq(StructField("id", IntegerType))), "t")
    }
    assert(e.getMessage.contains("incompatible type evolution"))
  }

  test("validation queries run against registered tables and agree") {
    import spark.implicits._
    val base = tmpDir("hiveval")
    val src = Seq((1L, "x", 1.5), (2L, "y", 2.5), (3L, "z", 3.5))
      .toDF("id", "v", "score")
    src.write.mode("overwrite").parquet(s"$base/src")
    src.write.mode("overwrite").orc(s"$base/dst")
    CatalogRegister.register(spark, "hv_src", s"$base/src", "parquet")
    CatalogRegister.register(spark, "hv_dst", s"$base/dst", "orc")
    try {
      val Seq(srcQ, dstQ) = HiveDdl.countValidationQueries("hv_src", "hv_dst")
      val srcN = spark.sql(srcQ).collect()(0).getLong(0)
      val dstN = spark.sql(dstQ).collect()(0).getLong(0)
      assert(srcN == 3 && dstN == 3)
      // null-safe join-match count equals the source count on equal data
      val matchQ = HiveDdl.dataValidationQuery(src.schema, "hv_src", "hv_dst")
      assert(matchQ.contains("<=>") && !matchQ.contains("map"))
      assert(spark.sql(matchQ).collect()(0).getLong(0) == 3)
    } finally {
      CatalogRegister.deregister(spark, "hv_src")
      CatalogRegister.deregister(spark, "hv_dst")
    }
  }

  test("dataValidationQuery excludes map columns from the join") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("attrs", MapType(StringType, StringType)),
      StructField("nested_map", StructType(Seq(
        StructField("m", MapType(StringType, IntegerType)))))))
    val qy = HiveDdl.dataValidationQuery(schema, "s", "t")
    assert(qy.contains("s.`id`<=>t.`id`"))
    assert(!qy.contains("attrs") && !qy.contains("nested_map"))
    intercept[IllegalArgumentException] {
      HiveDdl.dataValidationQuery(
        StructType(Seq(StructField("m", MapType(StringType, StringType)))),
        "s", "t")
    }
  }

  test("publishDdl describes the actually-published ORC, partitions included") {
    import spark.implicits._
    val base = tmpDir("hiveddl")
    graft.sources.AvroIO.write(
      Seq((1L, "x", "2024-01-01"), (2L, "y", "2024-01-02"))
        .toDF("id", "v", "d"),
      s"$base/avro")
    val swapped = FormatConvert.avroToOrc(spark, s"$base/avro", s"$base/orc",
      partitionBy = Seq("d"), runId = "r1")
    val script = FormatConvert.publishDdl(spark, s"$base/orc", "ev_orc",
      partitionBy = Seq("d"), swappedPartitions = swapped)
    assert(script.head.startsWith(
      "CREATE EXTERNAL TABLE IF NOT EXISTS `default`.`ev_orc`"))
    // Spark's layout discovery types the partition column (date here)
    assert(script.head.contains("PARTITIONED BY (`d` date)"))
    assert(script.head.contains("`id` bigint"))
    assert(script.tail.toSet ==
      swapped.map(rel => HiveDdl.addPartitionDdl("ev_orc",
        HiveDdl.specFromPath(rel), s"$base/orc/$rel")).toSet)
    assert(script.tail.exists(_.contains("PARTITION (`d`='2024-01-01')")))
  }
}
