package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the most frequent pair first, deterministically") {
    val corpus = Seq("ab ab ab cd").toDF("text")
    val model = Bpe.train(corpus, "text", numMerges = 2)
    // ("a","b") occurs 3x -> first; then ("ab","</w>") 3x beats ("c","d") 1x
    assert(model.merges == IndexedSeq("a" -> "b", "ab" -> Bpe.EndOfWord))
  }

  test("training ties break lexicographically (stable across runs)") {
    // "xy" and "pq" both occur twice; ("p","q") < ("x","y") lexicographically
    val corpus = Seq("xy pq", "xy pq").toDF("text")
    val model = Bpe.train(corpus, "text", numMerges = 1)
    assert(model.merges == IndexedSeq("p" -> "q"))
  }

  test("encodeWord applies merges by rank and stops when none apply") {
    val model = Bpe.BpeModel(IndexedSeq("a" -> "b", "ab" -> Bpe.EndOfWord))
    assert(model.encodeWord("ab").toSeq == Seq("ab" + Bpe.EndOfWord))
    assert(model.encodeWord("cab").toSeq == Seq("c", "ab" + Bpe.EndOfWord))
    assert(model.encodeWord("ba").toSeq == Seq("b", "a", Bpe.EndOfWord))
    assert(model.encodeWord("").toSeq == Seq(Bpe.EndOfWord))
  }

  test("rank priority beats left-to-right position") {
    // word "abc": pair (b,c) has rank 0, (a,b) rank 1 -> merge bc first,
    // leaving a,(bc): (a,bc) not a merge -> ["a","bc","</w>"]
    val model = Bpe.BpeModel(IndexedSeq("b" -> "c", "a" -> "b"))
    assert(model.encodeWord("abc").toSeq == Seq("a", "bc", Bpe.EndOfWord))
  }

  test("tokens always reconstruct the word (lossless segmentation)") {
    val docs = Tables.load(spark, sf, "documents")
    val model = Bpe.train(docs, "text", numMerges = 128)
    val rng = new scala.util.Random(7)
    val words = Seq.fill(200)(
      (0 until 1 + rng.nextInt(12)).map(_ => ('a' + rng.nextInt(26)).toChar)
        .mkString) ++ Seq("the", "and", "compression", "a")
    words.foreach { w =>
      val toks = model.encodeWord(w)
      assert(toks.mkString("").stripSuffix(Bpe.EndOfWord) == w,
        s"tokens must spell the word: $w -> ${toks.toSeq}")
      assert(toks.last.endsWith(Bpe.EndOfWord))
    }
  }

  test("the expression column equals the driver-side encoder, word by word") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val model = Bpe.train(docs, "text", numMerges = 64)
    val viaCol = docs.select(col("doc_id"),
        Bpe.encode(col("text"), model).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaDriver = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) ->
        Bpe.splitWords(r.getString(1)).flatMap(model.encodeWord).toSeq
    }.toMap
    assert(viaCol == viaDriver)
  }

  test("training compresses: mean tokens per word < mean chars per word") {
    val docs = Tables.load(spark, sf, "documents")
    val model = Bpe.train(docs, "text", numMerges = 256)
    val Seq(nToks, nWords, nChars) = docs
      .select(Bpe.tokenCount(col("text"), model).cast("long").as("t"),
        size(Dsir.wordTokens(col("text"))).cast("long").as("w"),
        length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
          .cast("long").as("c"))
      .agg(sum("t"), sum("w"), sum("c")).head().toSeq
      .map(_.asInstanceOf[Long])
    // chars + one </w> per word is the no-merge baseline
    assert(nToks < (nChars + nWords) / 2,
      s"256 merges must at least halve the naive token count: " +
        s"toks=$nToks chars=$nChars words=$nWords")
  }

  test("training twice over the same corpus yields identical merge tables") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Bpe.train(docs, "text", numMerges = 100)
    val b = Bpe.train(docs, "text", numMerges = 100)
    assert(a.merges == b.merges)
  }

  test("merge exhaustion: tiny corpus stops early instead of looping") {
    val model = Bpe.train(Seq("ab").toDF("text"), "text", numMerges = 1000)
    // "ab</w>" fully merges in 2 steps; no further pairs exist
    assert(model.merges.length <= 2)
    assert(model.encodeWord("ab").toSeq == Seq("ab" + Bpe.EndOfWord))
  }

  test("encode plan is map-only: no exchange anywhere") {
    val docs = Tables.load(spark, sf, "documents")
    val model = Bpe.train(docs, "text", numMerges = 16)
    val plan = docs.select(Bpe.encode(col("text"), model))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
