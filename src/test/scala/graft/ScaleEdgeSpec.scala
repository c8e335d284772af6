package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.text.{Bpe, Dsir}

/** Adversarial-shape probes for the round-9 operators: the inputs a
  * 100 TB crawl actually contains (megabyte "words", book-length docs,
  * one mega-key) must degrade gracefully, not quadratically. */
class ScaleEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE: a 100k-char junk word encodes atomically, instantly, losslessly") {
    val junk = "x" * 100000
    val model = Bpe.train(Seq("the quick fox", junk).toDF("text"),
      "text", numMerges = 64)
    val t0 = System.nanoTime()
    val toks = model.encodeWord(junk)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(toks.toSeq == Seq(junk + Bpe.EndOfWord))
    assert(ms < 1000, s"overlong word must bypass the merge loop: $ms ms")
    // and the junk never pollutes the learned merges
    assert(model.merges.forall { case (a, b) => (a + b).length < 300 })
    // normal words still encode through the loop
    assert(model.encodeWord("the").mkString("")
      .stripSuffix(Bpe.EndOfWord) == "the")
  }

  test("DSIR: a 50k-word document scores with the exact feature count") {
    val words = Seq.tabulate(50000)(i => s"w${i % 997}").mkString(" ")
    val raw = Seq((1L, words), (2L, "tiny doc here")).toDF("doc_id", "text")
    val target = Seq((10L, "tiny doc here")).toDF("doc_id", "text")
    val scored = Dsir.score(raw,
      Dsir.importanceTable(
        Dsir.fitBucketCounts(target, "text"),
        Dsir.fitBucketCounts(raw, "text")),
      "doc_id", "text")
    val n = scored.filter(col("doc_id") === 1L)
      .select("n_grams").head().getLong(0)
    assert(n == 50000L + 49999L, s"uni+bigram count must be exact: $n")
  }

  test("splitSkewJoin: one 50k-row mega-key equals the plain join") {
    val fact = spark.range(50000).select(lit(7L).as("k"), col("id").as("v"))
      .unionByName(spark.range(100)
        .select((col("id") % 50 + 100L).as("k"), col("id").as("v")))
    val dim = (Seq(7L -> "hot") ++ (100L until 150L).map(_ -> "cold"))
      .toDF("dk", "w")
    val split = Skew.splitSkewJoin(fact, dim, "k", "dk", hotKeyMaxRows = 1000)
    val plain = fact.join(dim, col("k") === col("dk")).drop("dk")
    assert(split.count() == plain.count())
    assert(split.agg(sum("v")).head().getLong(0) ==
      plain.agg(sum("v")).head().getLong(0))
  }
}
