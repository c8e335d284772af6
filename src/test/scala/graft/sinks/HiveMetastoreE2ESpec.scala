package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** The generated Hive DDL/DML EXECUTED against a real (embedded-derby)
  * metastore — reference behavior: AbstractAvroToOrcConverter.java:84
  * runs these statements, it does not print them. Golden-string
  * coverage lives in HiveDdlSpec; this suite proves the strings are
  * live HiveQL: register, publish, swap partitions, evolve, validate,
  * and read back THROUGH the metastore. */
class HiveMetastoreE2ESpec extends SparkSpec {

  private val db = "graft_e2e"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // the reference publishes per-partition (static inserts); the
    // dynamic-partition fallback needs nonstrict like Hive's own jobs
    spark.sql("SET hive.exec.dynamic.partition.mode=nonstrict")
  }

  private def srcFrame = Tables.load(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("value"),
      date_format(col("ts"), "yyyy-MM-dd").as("dt"))

  test("create + insert-overwrite + read back through the metastore") {
    val loc = tmpDir("hive-orc") + "/events_orc"
    val schema = srcFrame.schema
    srcFrame.write.mode("overwrite").saveAsTable(s"$db.ev_src")
    val create = HiveDdl.createTableDdl(schema, "events_orc", loc, db,
      partitionBy = Seq("dt"),
      tableProperties = Map("orc.compress" -> "SNAPPY"))
    spark.sql(create)
    // the table is REGISTERED: metastore knows columns + partition keys
    val desc = spark.sql(s"DESCRIBE TABLE $db.events_orc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("event_id") == "bigint" && desc("dt") == "string", desc)

    // full dynamic-partition publish (the multi-partition conversion)
    spark.sql(HiveDdl.insertOverwriteDml(schema, "ev_src", "events_orc",
      db, partitionBy = Seq("dt")))
    val n = srcFrame.count()
    assert(spark.table(s"$db.events_orc").count() == n)
    // partitions landed in the metastore, not just on disk
    val parts = spark.sql(s"SHOW PARTITIONS $db.events_orc").collect()
    assert(parts.length > 1, s"expected >1 registered partitions: ${parts.length}")

    // static single-partition overwrite (the reference's per-partition
    // conversion unit, fed by a partition-scoped source) is idempotent:
    // rerun one partition, totals hold
    val firstDt = srcFrame.agg(min("dt")).head().getString(0)
    srcFrame.filter(col("dt") === firstDt)
      .write.mode("overwrite").saveAsTable(s"$db.ev_src_p")
    spark.sql(HiveDdl.insertOverwriteDml(schema, "ev_src_p", "events_orc",
      db, partitionBy = Seq("dt"), staticPartition = Map("dt" -> firstDt)))
    assert(spark.table(s"$db.events_orc").count() == n)

    // the validation queries the reference compares — executed here
    val Seq(srcQ, dstQ) = HiveDdl.countValidationQueries("ev_src",
      "events_orc", srcDb = db, dstDb = db,
      partition = Seq("dt" -> firstDt))
    val srcCnt = spark.sql(srcQ).head().getLong(0)
    val dstCnt = spark.sql(dstQ).head().getLong(0)
    assert(srcCnt == dstCnt && srcCnt > 0)
    val dv = HiveDdl.dataValidationQuery(schema, "ev_src", "events_orc",
      srcDb = db, dstDb = db, partition = Seq("dt" -> firstDt))
    assert(spark.sql(dv).head().getLong(0) == srcCnt)
  }

  test("partition swap publish: ADD PARTITION registers, DROP PARTITION retires") {
    val loc = tmpDir("hive-swap") + "/swapped"
    val data = srcFrame.filter(col("dt") < "2024-01-03")
    val schema = data.schema
    // files land OUTSIDE the metastore first (the staged-swap protocol),
    // written as ORC partition dirs
    data.write.partitionBy("dt").orc(loc)
    spark.sql(HiveDdl.createTableDdl(schema, "swapped", loc, db,
      partitionBy = Seq("dt")))
    assert(spark.table(s"$db.swapped").count() == 0,
      "external table sees nothing before ADD PARTITION")
    val dts = data.select("dt").distinct().collect().map(_.getString(0)).sorted
    dts.foreach { d =>
      spark.sql(HiveDdl.addPartitionDdl("swapped",
        HiveDdl.specFromPath(s"dt=$d"), s"$loc/dt=$d", db))
    }
    assert(spark.table(s"$db.swapped").count() == data.count())
    // retention drops the oldest partition from the CATALOG
    spark.sql(HiveDdl.dropPartitionDdl("swapped", Seq("dt" -> dts.head), db))
    assert(spark.table(s"$db.swapped").count() ==
      data.filter(col("dt") =!= dts.head).count())
  }

  test("evolution DDL executes: ADD COLUMNS via metastore, widened reads") {
    val loc = tmpDir("hive-evolve") + "/evolving"
    val v1 = StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType)))
    spark.sql(HiveDdl.createTableDdl(v1, "evolving", loc, db))
    val v2 = StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType),
      StructField("note", StringType)))
    val ddl = HiveDdl.evolutionDdl(v1, v2, "evolving", db)
    assert(ddl.exists(_.contains("ADD COLUMNS")), ddl.mkString("; "))
    ddl.foreach(spark.sql(_))
    val desc = spark.sql(s"DESCRIBE TABLE $db.evolving").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("note") == "string", desc)
    // data written pre-evolution still reads through the evolved table
    spark.sql(s"INSERT INTO $db.evolving VALUES (1L, 2, 'x'), (3L, 4, NULL)")
    assert(spark.table(s"$db.evolving").count() == 2)
    // incompatible narrowing refuses to emit DDL at all
    val narrowed = StructType(Seq(
      StructField("k", IntegerType), StructField("v", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      HiveDdl.evolutionDdl(v2, narrowed, "evolving", db)
    }
    assert(e.getMessage.contains("incompatible type evolution"))
  }
}
