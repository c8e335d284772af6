package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("windows cover [k*stride, k*stride+seqLen) with the trailing partial kept") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val out = Chunker.chunkByTokens(docs(1L -> text), "text", seqLen = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_chunk_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (0L, "t1 t2 t3 t4", 4L),
      (1L, "t4 t5 t6 t7", 4L),
      (2L, "t7 t8 t9 t10", 4L),
      (3L, "t10", 1L)))
  }

  test("consecutive windows overlap by seqLen - stride tokens") {
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val rows = Chunker.chunkByTokens(docs(7L -> text), "text", seqLen = 8, stride = 5)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (ta, tb) = (a.split(" "), b.split(" "))
        if (tb.length == 8) // full successor window
          assert(ta.takeRight(3).sameElements(tb.take(3)),
            s"no 3-token overlap between [$a] and [$b]")
      case _ =>
    }
  }

  test("minTokens drops short trailing windows; every doc still covered") {
    val out = Chunker.chunkByTokens(
      docs(1L -> (1 to 10).map(i => s"t$i").mkString(" ")),
      "text", seqLen = 4, stride = 3, minTokens = 4)
    assert(out.count() == 3) // the 1-token trailing window is dropped
    assert(out.agg(min("n_chunk_tokens")).as[Long].head() == 4L)
  }

  test("a doc shorter than seqLen yields exactly one whole-doc chunk") {
    val out = Chunker.chunkByTokens(docs(1L -> "a b c"), "text", 32, 24)
      .select("chunk_idx", "chunk_text", "n_chunk_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((0L, "a b c", 3L)))
  }

  test("non-text columns pass through onto every chunk") {
    val df = Seq((1L, "x", "a b c d e")).toDF("doc_id", "source", "text")
    val out = Chunker.chunkByTokens(df, "text", seqLen = 3, stride = 2)
    assert(out.columns.toSet ==
      Set("doc_id", "source", "chunk_idx", "chunk_text", "n_chunk_tokens"))
    assert(out.select("source").distinct().as[String].collect().toSeq == Seq("x"))
  }

  test("the plan is map-only: no exchange, no shuffle") {
    val df = spark.range(100).toDF("doc_id")
      .withColumn("text", lit((1 to 40).map(i => s"t$i").mkString(" ")))
    val plan = Chunker.chunkByTokens(df, "text", 16, 12)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
  }
}
