package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MediaBytesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  // under groups=25, payload bytes are determined by (base, parity) =
  // doc_id % 50: unperturbed and perturbed cycles of a base each render
  // byte-identical PNGs
  private lazy val variants =
    Multimodal.syntheticImageVariants(spark, docs, groups = 25)

  test("byte-exact groups collapse identical payloads with ZERO decodes") {
    val before = Multimodal.MediaCounters.imageReads.get()
    val g = MediaBytes.exactGroups(variants)
    val wrong = g.filter(col("group_rep") =!= pmod(col("media_id"), lit(50L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(g.count() == docs.count())
    val surv = MediaBytes.survivors(variants)
    assert(surv.count() == 50)
    assert(surv.columns.toSeq == variants.columns.toSeq,
      "survivors must carry the full original row")
    assert(Multimodal.MediaCounters.imageReads.get() == before,
      "byte dedup must never decode")
  }

  test("incremental byte admission is O(batch) and exact") {
    val committed = MediaBytes.exactGroups(
      variants.filter(col("media_id") < 250)).select(col("sha").as("h"))
    val batch = variants.filter(col("media_id") >= 250)
    // ids 250..499 repeat the (base, parity) cycle: all committed
    val out = MediaBytes.incrementalSurvivors(batch, committed)
    assert(out.isEmpty, s"expected no survivors, got ${out.count()}")
    // equality with the exact anti-join on a half-committed store
    val half = MediaBytes.exactGroups(
      variants.filter(col("media_id") < 25)).select(col("sha").as("h"))
    val got = MediaBytes.incrementalSurvivors(batch, half)
    val want = graft.dedup.IncrementalDedup.survivorsExact(
      batch.withColumn("__h", sha2(col("payload"), 256)), half,
      "media_id", col("__h"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // an empty store admits the batch collapsed by content
    val first = MediaBytes.incrementalSurvivors(batch, committed.limit(0))
    assert(first.count() == 50)
  }
}
