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
