package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Codecs

class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val v1 =
    """{"type":"record","name":"ev","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
      .stripMargin.replaceAll("\n", "")
  private val v2 =
    """{"type":"record","name":"ev","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"},
      |{"name":"tag","type":"string","default":"none"}]}"""
      .stripMargin.replaceAll("\n", "")

  test("mixed schema versions decode against the reader schema (defaults filled)") {
    val oldRows = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val newRows = Seq((3L, "c", "hot")).toDF("id", "name", "tag")
    val envelopes = Envelope.encodeAvro(oldRows, v1, schemaId = 1L)
      .union(Envelope.encodeAvro(newRows, v2, schemaId = 2L))
    val decoded = Envelope.decodeAvro(envelopes, "schema_id", "payload",
      Map(1L -> v1, 2L -> v2), readerSchemaJson = v2)
    assert(decoded.columns.toSeq == Seq("id", "name", "tag"))
    assert(decoded.orderBy("id").collect().toSeq == Seq(
      Row(1L, "a", "none"), Row(2L, "b", "none"), Row(3L, "c", "hot")))
  }

  test("unknown schema id fails loudly") {
    val env = Envelope.encodeAvro(Seq((1L, "a")).toDF("id", "name"), v1, 99L)
    intercept[org.apache.spark.SparkException] {
      Envelope.decodeAvro(env, "schema_id", "payload", Map(1L -> v1), v1).collect()
    }
  }

  test("gzip and aes codecs round-trip binary payloads") {
    val df = Seq("hello world " * 50, "").toDF("t")
      .select(encode(col("t"), "UTF-8").as("b"), col("t"))
    val rt = df.select(col("t"),
      decode(Codecs.gunzip(Codecs.gzip(col("b"))), "UTF-8").as("gz"),
      decode(Codecs.aesDecrypt(
        Codecs.aesEncrypt(col("b"), "0123456789abcdef"), "0123456789abcdef"),
        "UTF-8").as("aes"))
    rt.collect().foreach { r =>
      assert(r.getString(1) == r.getString(0))
      assert(r.getString(2) == r.getString(0))
    }
    // compression actually compresses repetitive payloads
    val sizes = df.limit(1).select(
      length(col("b")).as("raw"), length(Codecs.gzip(col("b"))).as("gz")).head
    assert(sizes.getInt(1) < sizes.getInt(0))
  }
}
