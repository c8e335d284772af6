package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.SchemaEvolution

class EvolvingSinkSpec extends SparkSpec {

  private def putJson(dir: String, name: String, mtime: Long,
                      lines: String*): Unit = {
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    Files.setLastModifiedTime(p, FileTime.fromMillis(mtime)): Unit
  }

  /** Per-batch decode: payload text -> typed rows with the schema the
    * payload carries (the envelope shape that makes schemas batch-local). */
  private def decode(batch: DataFrame): DataFrame =
    spark.read.json(batch.selectExpr("value").as[String](
      org.apache.spark.sql.Encoders.STRING))

  test("merge: LUB laws — backward compatible with both inputs") {
    val a = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType)))
    val b = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType)))
    val m = SchemaEvolution.merge(a, b)
    assert(m.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(m("id").dataType == LongType && m("id").nullable)
    assert(m("name").nullable && m("score").nullable)
    assert(SchemaEvolution.backwardCompatible(a, m))
    assert(SchemaEvolution.backwardCompatible(b, m))
    // no common widening -> loud failure
    val c = StructType(Seq(StructField("id", StringType)))
    intercept[IllegalArgumentException](SchemaEvolution.merge(a, c))
  }

  test("mid-stream widening lands in one dir; reads back at latest schema") {
    val in = tmpDir("evo-in"); val out = tmpDir("evo-out")
    val ckpt = tmpDir("evo-ckpt")
    val t0 = System.currentTimeMillis() - 60000
    putJson(in, "f1.json", t0, """{"id":1,"name":"a"}""")
    putJson(in, "f2.json", t0 + 1000,
      """{"id":2,"name":"b","score":1.5}""")
    putJson(in, "f3.json", t0 + 2000, """{"id":3,"score":7}""")

    val stream = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("maxFilesPerTrigger", 1).text(in)
    EvolvingSink.evolvingParquetSink(stream, out, ckpt, decode)
      .awaitTermination()

    val gens = EvolvingSink.schemaLog(spark, out)
    // f1 opens gen 0 (id,name); f2 widens to (id,name,score) = gen 1;
    // f3's (id, score bigint) promotes INTO gen 1 — no third generation
    assert(gens.map(_.gen) == Seq(0, 1))
    assert(gens.last.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(gens.last.schema("score").dataType == DoubleType)

    val got = EvolvingSink.readEvolved(spark, out)
    assert(got.schema == gens.last.schema)
    val rows = got.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(rows == Set((1L, Some("a"), None), (2L, Some("b"), Some(1.5)),
      (3L, None, Some(7.0))))

    // batch/stream parity: one batch json read over the same files,
    // evolved to the same target, is row-identical
    val batch = SchemaEvolution.evolve(spark.read.json(in), gens.last.schema)
    assert(batch.collect().toSet == got.collect().toSet)
  }

  test("restart with same checkpoint appends only the new file") {
    val in = tmpDir("evo2-in"); val out = tmpDir("evo2-out")
    val ckpt = tmpDir("evo2-ckpt")
    val t0 = System.currentTimeMillis() - 60000
    putJson(in, "f1.json", t0, """{"id":1,"name":"a"}""")
    putJson(in, "f2.json", t0 + 1000,
      """{"id":2,"name":"b","score":1.5}""")
    val schema = StructType(Seq(StructField("value", StringType)))
    def run(): Unit = EvolvingSink.evolvingParquetSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).text(in),
      out, ckpt, decode).awaitTermination()
    run()
    assert(EvolvingSink.readEvolved(spark, out).count() == 2)
    putJson(in, "f4.json", t0 + 3000, """{"id":4,"name":"d","score":2.5}""")
    run()
    val gens = EvolvingSink.schemaLog(spark, out)
    assert(gens.map(_.gen) == Seq(0, 1)) // f4 fits gen 1 — log unchanged
    assert(EvolvingSink.readEvolved(spark, out).count() == 3)
  }

  test("a batch with no common widening aborts the query") {
    val in = tmpDir("evo3-in"); val out = tmpDir("evo3-out")
    val ckpt = tmpDir("evo3-ckpt")
    val t0 = System.currentTimeMillis() - 60000
    putJson(in, "f1.json", t0, """{"id":1,"name":"a"}""")
    putJson(in, "f2.json", t0 + 1000, """{"id":"not-a-number"}""")
    val schema = StructType(Seq(StructField("value", StringType)))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      EvolvingSink.evolvingParquetSink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).text(in),
        out, ckpt, decode).awaitTermination()
    }
    assert(ex.getMessage.contains("no common widening") ||
      Option(ex.getCause).exists(_.getMessage.contains("no common widening")))
    // the good first epoch still committed; the bad one left no slice
    assert(EvolvingSink.readEvolved(spark, out).count() == 1)
  }
}
