package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.pipeline.{BranchSpec, PipelineRunner, PipelineSpec, SourceSpec}

class JsonSchemaDialectSpec extends SparkSpec {
  import spark.implicits._

  test("parses the reference fixture shape: primitives, array, map, enum, timestamp") {
    val json =
      """{"schema":[
        |{"columnName":"Id","dataType":{"type":"string"},"length":18,
        | "primaryKey":1,"isNullable":false,"comment":"Account ID"},
        |{"columnName":"IsDeleted","dataType":{"type":"boolean"},"isNullable":false},
        |{"columnName":"Salutation","dataType":{"type":"array","items":"string"},
        | "isNullable":true},
        |{"columnName":"MapAccount","dataType":{"type":"map","values":"string"},
        | "isNullable":true},
        |{"columnName":"Industry","dataType":{"type":"enum",
        | "symbols":["IT","SALES"],"name":"Industry"},"isNullable":true},
        |{"columnName":"LastModifiedDate","dataType":{"type":"timestamp"},
        | "waterMark":true,"isNullable":false}
        |]}""".stripMargin
    val st = JsonSchemaDialect.parse(json)
    assert(st.fieldNames.toSeq == Seq("Id", "IsDeleted", "Salutation",
      "MapAccount", "Industry", "LastModifiedDate"))
    assert(st("Id").dataType == StringType && !st("Id").nullable)
    assert(st("Id").metadata.getLong("length") == 18L)
    assert(st("Id").metadata.getString("comment") == "Account ID")
    assert(st("IsDeleted").dataType == BooleanType)
    assert(st("Salutation").dataType == ArrayType(StringType))
    assert(st("MapAccount").dataType == MapType(StringType, StringType))
    assert(st("Industry").dataType == StringType)
    assert(st("Industry").metadata.getStringArray("enumSymbols").toSeq ==
      Seq("IT", "SALES"))
    assert(st("LastModifiedDate").dataType == TimestampType)
    assert(st("LastModifiedDate").metadata.getBoolean("waterMark"))
  }

  test("record, nested array-of-record, union, fixed, date/time") {
    val json =
      """[
        |{"columnName":"addr","dataType":{"type":"record","values":[
        |  {"columnName":"city","dataType":{"type":"string"},"isNullable":true},
        |  {"columnName":"zip","dataType":{"type":"int"},"isNullable":false}
        |]},"isNullable":true},
        |{"columnName":"tags","dataType":{"type":"array","items":
        |  {"dataType":{"type":"record","values":[
        |    {"columnName":"k","dataType":{"type":"string"}}]}}},"isNullable":false},
        |{"columnName":"opt","dataType":{"type":["null","long"]}},
        |{"columnName":"mixed","dataType":{"type":["int","string"]},"isNullable":true},
        |{"columnName":"hash","dataType":{"type":"fixed","size":16}},
        |{"columnName":"d","dataType":{"type":"date"}},
        |{"columnName":"t","dataType":{"type":"time"}}
        |]""".stripMargin
    val st = JsonSchemaDialect.parse(json)
    assert(st("addr").dataType == StructType(Seq(
      StructField("city", StringType, nullable = true),
      StructField("zip", IntegerType, nullable = false))))
    assert(st("tags").dataType ==
      ArrayType(StructType(Seq(StructField("k", StringType, nullable = false)))))
    // [null, long] = Avro optional: nullable even without isNullable
    assert(st("opt").dataType == LongType && st("opt").nullable)
    // multi-member union -> spark-avro member struct
    assert(st("mixed").dataType == StructType(Seq(
      StructField("member0", IntegerType, nullable = true),
      StructField("member1", StringType, nullable = true))))
    assert(st("hash").dataType == BinaryType)
    assert(st("hash").metadata.getLong("size") == 16L)
    assert(st("d").dataType == DateType)
    assert(st("t").dataType == TimeType(6))
  }

  test("property: render/parse round-trips randomized dialect schemas") {
    val prims = Vector[DataType](StringType, BinaryType, IntegerType, LongType,
      FloatType, DoubleType, BooleanType, DateType, TimestampType, TimeType(6))
    def randType(r: scala.util.Random, depth: Int): DataType =
      r.nextInt(if (depth >= 2) 10 else 13) match {
        case 10 => ArrayType(randType(r, depth + 1))
        case 11 => MapType(StringType, randType(r, depth + 1))
        case 12 => StructType((0 to r.nextInt(3)).map(i =>
          StructField(s"n$i", randType(r, depth + 1), r.nextBoolean())))
        case p => prims(p)
      }
    (1 to 200).foreach { seed =>
      val r = new scala.util.Random(seed)
      val schema = StructType((0 to r.nextInt(5)).map(i =>
        StructField(s"c$i", randType(r, 0), r.nextBoolean())))
      val back = JsonSchemaDialect.parse(JsonSchemaDialect.render(schema))
      // compare names/types/nullability (metadata is additive, not identity)
      assert(back.sql == schema.sql, s"seed $seed:\n${schema.sql}\nvs\n${back.sql}")
      assert(back.fields.map(_.nullable).toSeq ==
        schema.fields.map(_.nullable).toSeq, s"seed $seed nullability")
    }
  }

  test("a pipeline job declared with the reference schema dialect runs e2e") {
    val dir = tmpDir("dialect-e2e")
    // source data as headerless CSV — the dialect supplies the schema
    Seq((1L, "alice", true), (2L, "bob", false), (3L, "carol", true))
      .toDF("id", "name", "active")
      .write.option("header", "false").csv(s"$dir/in")
    val schemaJson =
      """{"schema":[
        |{"columnName":"id","dataType":{"type":"long"},"isNullable":false},
        |{"columnName":"name","dataType":{"type":"string"},"isNullable":true},
        |{"columnName":"active","dataType":{"type":"boolean"},"isNullable":true}
        |]}""".stripMargin
    val spec = PipelineSpec(
      name = "dialect-job",
      source = SourceSpec(format = "csv", path = s"$dir/in",
        schemaJson = Some(schemaJson)),
      branches = Seq(BranchSpec(name = "main", outDir = s"$dir/out",
        filterExpr = Some("active"))))
    val res = PipelineRunner.run(spark, spec, "r1")
    assert(res.branchCounts("main") == 2)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.schema("id").dataType == LongType)
    assert(out.select("name").as[String].collect().sorted.toSeq ==
      Seq("alice", "carol"))
  }
}
