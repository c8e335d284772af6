package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class AvroSpec extends SparkSpec {

  test("orders round-trip preserves rows, schema and timestamps") {
    val out = tmpDir("avro-orders") + "/data"
    val orders = Tables.load(spark, sf, "orders")
    AvroIO.write(orders, out, "orders")
    val back = AvroIO.read(spark, out)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      orders.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("nested record / array / map / nulls round-trip") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("props", MapType(StringType, LongType)),
      StructField("ts", TimestampType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType, nullable = true),
        StructField("b", DoubleType, nullable = false))), nullable = true)))
    val rows = java.util.List.of(
      Row(1L, "x", Seq("p", null, "q"), Map("k" -> 7L),
        Timestamp.valueOf("2001-02-03 04:05:06.123456"),
        Array[Byte](1, 2, 3), Row(5, 2.5)),
      Row(2L, null, Seq.empty[String], Map.empty[String, Long],
        null, null, null))
    val df = spark.createDataFrame(rows, schema)
    val out = tmpDir("avro-nested") + "/data"
    AvroIO.write(df, out)
    val back = AvroIO.read(spark, out).orderBy("id").collect()
    assert(back(0).getLong(0) == 1L)
    assert(back(0).getSeq[String](2) == Seq("p", null, "q"))
    assert(back(0).getMap[String, Long](3) == Map("k" -> 7L))
    assert(back(0).getTimestamp(4) == Timestamp.valueOf("2001-02-03 04:05:06.123456"))
    assert(back(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert(back(0).getStruct(6) == Row(5, 2.5))
    assert(back(1).isNullAt(1) && back(1).isNullAt(4) && back(1).isNullAt(6))
  }

  test("schema mapping is faithful in both directions") {
    val st = StructType(Seq(
      StructField("s", StringType, nullable = true),
      StructField("l", LongType, nullable = false),
      StructField("d", DateType, nullable = true)))
    val avro = AvroIO.avroSchemaFor(st, "t")
    val round = AvroIO.sparkSchemaFor(avro)
    assert(round == st)
  }
}
