package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SeqPackSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")
    .withColumn("w", size(split(col("text"), " ")).cast("long"))

  private val L = 128L

  test("every sequence except the last is exactly seqLen tokens") {
    val out = SeqPack.packSequences(docs, "doc_id", "w", seqLen = L)
    val perSeq = out.groupBy("seq_id").agg(sum("n_tokens").as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxSeq = perSeq.keys.max
    perSeq.foreach { case (seq, tok) =>
      if (seq < maxSeq) assert(tok == L, s"seq $seq has $tok tokens")
      else assert(tok <= L && tok > 0, s"last seq $seq has $tok")
    }
    // sequences are contiguous from 0
    assert(perSeq.keySet == (0L to maxSeq).toSet)
  }

  test("every document's tokens are fully covered, in order, no overlap") {
    val out = SeqPack.packSequences(docs, "doc_id", "w", seqLen = L)
    val byDoc = out.select("doc_id", "w", "doc_off", "n_tokens")
      .collect().groupBy(_.getLong(0))
    val weights = docs.select("doc_id", "w").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, rows) =>
      val slices = rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      // tiles [0, w): each slice starts where the previous ended
      slices.foldLeft(0L) { case (expected, (off, n)) =>
        assert(off == expected, s"doc $id gap at $off"); off + n
      } match { case end => assert(end == weights(id), s"doc $id end $end") }
    }
    // zero-token docs emit nothing
    assert(weights.values.forall(_ > 0) || byDoc.size < weights.size)
  }

  test("sequence interiors tile [0, seqLen) contiguously") {
    val out = SeqPack.packSequences(docs, "doc_id", "w", seqLen = L)
    val bySeq = out.select("seq_id", "seq_pos", "n_tokens")
      .collect().groupBy(_.getLong(0))
    bySeq.foreach { case (seq, rows) =>
      val slices = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      slices.foldLeft(0L) { case (expected, (pos, n)) =>
        assert(pos == expected, s"seq $seq gap at $pos"); pos + n
      }
    }
  }

  test("assignment is invariant to the bucket count") {
    val a = SeqPack.packSequences(docs, "doc_id", "w", seqLen = L, buckets = 8)
      .select("doc_id", "seq_id", "seq_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = SeqPack.packSequences(docs, "doc_id", "w", seqLen = L,
        buckets = 4096)
      .select("doc_id", "seq_id", "seq_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("startOffset continues the token stream across batches") {
    val batch1 = docs.filter(col("doc_id") % 2 === 0)
    val batch2 = docs.filter(col("doc_id") % 2 === 1)
    val out1 = SeqPack.packSequences(batch1, "doc_id", "w", seqLen = L)
    val total1 = out1.agg(sum("n_tokens")).collect()(0).getLong(0)
    val out2 = SeqPack.packSequences(batch2, "doc_id", "w", seqLen = L,
      startOffset = total1)
    val min2 = out2.agg(min(col("seq_id") * lit(L) + col("seq_pos")))
      .collect()(0).getLong(0)
    // batch 2's first token slot is exactly where batch 1 ended
    assert(min2 == total1)
    // the union still tiles every sequence to L tokens
    val union = out1.select("seq_id", "n_tokens")
      .unionByName(out2.select("seq_id", "n_tokens"))
    val perSeq = union.groupBy("seq_id").agg(sum("n_tokens").as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxSeq = perSeq.keys.max
    perSeq.foreach { case (seq, tok) =>
      if (seq < maxSeq) assert(tok == L, s"seq $seq has $tok") }
  }

  test("zero-weight rows are dropped, colliding columns refused") {
    import spark.implicits._
    val d = Seq((1L, 5L), (2L, 0L)).toDF("doc_id", "w")
    val out = SeqPack.packSequences(d, "doc_id", "w", seqLen = 4L)
    assert(out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L))
    intercept[IllegalArgumentException] {
      SeqPack.packSequences(d.withColumn("seq_id", lit(1)), "doc_id", "w", 4L)
    }
  }
}
