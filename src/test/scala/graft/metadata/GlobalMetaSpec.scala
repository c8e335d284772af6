package graft.metadata

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GlobalMetaSpec extends SparkSpec {

  private val base = GlobalMeta(
    dataset = Map(GlobalMeta.DatasetUrnKey -> "urn:graft:documents",
      GlobalMeta.ContentTypeKey -> "text/plain"),
    transferEncodings = Seq("identity"))

  test("canonical JSON is sorted-key deterministic; id is its md5") {
    assert(base.canonicalJson ==
      """{"dataset-level":{"Content-Type":"text/plain",""" +
        """"Dataset-URN":"urn:graft:documents",""" +
        """"Transfer-Encoding":["identity"]},"file-level":{}}""")
    // content-addressed: same content -> same id regardless of insert order
    val reordered = GlobalMeta(
      dataset = Map(GlobalMeta.ContentTypeKey -> "text/plain",
        GlobalMeta.DatasetUrnKey -> "urn:graft:documents"),
      transferEncodings = Seq("identity"))
    assert(base.id == reordered.id && base.id.length == 32)
    assert(GlobalMeta().id == GlobalMeta.EmptyId)
    // round-trip through parse
    assert(GlobalMeta.parse(base.canonicalJson) == base)
  }

  test("mergeWithDefaults: absent keys fill, encodings CONCATENATE (own first)") {
    val defaults = GlobalMeta(
      dataset = Map("Owner" -> "team-data", GlobalMeta.ContentTypeKey -> "json"),
      transferEncodings = Seq("gzip"))
    val merged = base.mergeWithDefaults(defaults)
    assert(merged.dataset("Owner") == "team-data")
    assert(merged.dataset(GlobalMeta.ContentTypeKey) == "text/plain",
      "own keys beat defaults")
    assert(merged.transferEncodings == Seq("identity", "gzip"),
      "the codec chain concatenates, own first")
    // no own encodings -> defaults alone
    assert(GlobalMeta(Map("a" -> "b")).mergeWithDefaults(defaults)
      .transferEncodings == Seq("gzip"))
  }

  test("collector dedups by id, LRU-evicts, returns only NEW records") {
    val c = new MetaCollector(cacheSize = 2)
    val m1 = GlobalMeta(Map("a" -> "1"))
    val m2 = GlobalMeta(Map("a" -> "2"))
    val m3 = GlobalMeta(Map("a" -> "3"))
    assert(c.process(m1).isDefined)
    assert(c.process(m1).isEmpty, "repeat -> None")
    assert(c.lastSeenId == m1.id)
    assert(c.process(m2).isDefined)
    assert(c.process(m1).isEmpty, "still cached; LRU refreshed")
    assert(c.process(m3).isDefined, "evicts m2 (m1 was refreshed)")
    assert(c.process(m2).isDefined, "m2 was evicted -> new again")
    assert(c.process(GlobalMeta()).isEmpty, "empty metadata never emits")
    assert(c.records.size == 2)
  }

  test("collector merges defaults before dedup") {
    val c = new MetaCollector(Some(GlobalMeta(Map("Owner" -> "x"))), -1)
    val out = c.process(GlobalMeta(Map("a" -> "1"))).get
    assert(out.dataset == Map("a" -> "1", "Owner" -> "x"))
    // a record that differs only pre-merge dedups post-merge
    assert(c.process(GlobalMeta(Map("a" -> "1", "Owner" -> "x"))).isEmpty)
  }

  test("envelope round-trips records column-natively; content types rewrite") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val em = MetaEnvelope.envelopeMeta(base)
    assert(em.contentType.contains(MetaEnvelope.ContentType))
    assert(em.dataset(GlobalMeta.InnerContentTypeKey) == "text/plain")
    val env = docs.select(col("doc_id"), MetaEnvelope.envelope(
      col("text"), map(lit("docId"), col("doc_id").cast("string")),
      em.id).as("env"))
    val back = env.select(col("doc_id"), MetaEnvelope.decode(col("env")).as("d"))
      .select(col("doc_id"), col("d.mId"), col("d.rMd"), col("d.r"))
    val rows = back.collect()
    assert(rows.forall(_.getString(1) == em.id))
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r => orig(r.getLong(0)) == r.getString(3)),
      "record payload must survive the envelope byte-exactly")
    assert(rows.forall(r =>
      r.getMap[String, String](2).get("docId").contains(r.getLong(0).toString)))
  }

  test("Transfer-Encoding chain encodes in order, decodes in reverse; unknown refuses") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(100)
    val meta = GlobalMeta(transferEncodings = Seq("identity", "gzip"))
    val enc = docs.select(col("doc_id"), TransferEncoding.encode(
      col("text").cast("binary"), meta.transferEncodings).as("payload"))
    val back = enc.select(col("doc_id"),
      TransferEncoding.decode(col("payload"), meta).cast("string").as("text"))
    assert(back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    // a codec this engine cannot undo refuses at plan time, loudly
    val e = intercept[IllegalArgumentException] {
      TransferEncoding.decode(col("payload"),
        GlobalMeta(transferEncodings = Seq("zstd")))
    }
    assert(e.getMessage.contains("unknown Transfer-Encoding"), e.getMessage)
  }

  test("sidecar publishes .metadata.json atomically next to the data") {
    val dir = tmpDir("meta-sidecar")
    Tables.load(spark, sf, "region").write.mode("overwrite").parquet(dir)
    MetaSidecar.publish(spark, dir, base)
    // the dot-prefixed sidecar is invisible to readers
    assert(spark.read.parquet(dir).count() ==
      Tables.load(spark, sf, "region").count())
    assert(MetaSidecar.read(spark, dir).contains(base))
    intercept[IllegalArgumentException] {
      MetaSidecar.publish(spark, dir, GlobalMeta())
    }
    assert(MetaSidecar.read(spark, tmpDir("meta-none")).isEmpty)
  }
}
