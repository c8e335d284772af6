package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LineCleanSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """This is a proper first sentence.
      |no terminal punctuation here
      |Enable JavaScript to view this site.
      |Two words.
      |A second proper sentence, quite long!
      |"A quoted sentence ends in a quote."
      |Is this a question?""".stripMargin

  test("line pass: terminal punctuation, min words, javascript") {
    val kept = Seq(page).toDF("text")
      .select(LineClean.keptLines($"text").as("k"))
      .as[Seq[String]].head()
    assert(kept == Seq(
      "This is a proper first sentence.",
      "A second proper sentence, quite long!",
      "\"A quoted sentence ends in a quote.\"",
      "Is this a question?"), kept)
  }

  test("page pass: sentence floor, lorem ipsum, brace, bad words — over CLEANED text") {
    val pages = Seq(
      (1L, page),                                      // keeps: 4 sentences
      (2L, "Just one good sentence here."),            // < minSentences
      (3L, page + "\nA Lorem Ipsum generator page."),  // lorem (case-blind)
      (4L, page + "\nfunction f() { return 1; }"),     // brace line has no
                                                       // terminal punct: the
                                                       // LINE pass removes it,
                                                       // page survives
      (5L, page + "\nBad stuff { inline }."),          // brace SURVIVES lines
      (6L, page + "\nThey sell contraband openly."))   // bad word
      .toDF("doc_id", "text")
    val out = LineClean.clean(pages, "text", minSentences = 4,
      badWords = Seq("contraband")).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 4L), out)
    val f = LineClean.funnel(pages, "text", minSentences = 4,
      badWords = Seq("contraband")).head()
    assert(f.getAs[Long]("pages") == 6 && f.getAs[Long]("pages_kept") == 2)
    assert(f.getAs[Long]("too_few_sentences") == 1)
    assert(f.getAs[Long]("lorem_ipsum") == 1)
    assert(f.getAs[Long]("curly_brace") == 1)
    assert(f.getAs[Long]("bad_words") == 1)
  }

  test("bad words match as words, not substrings") {
    val pages = Seq((1L, "The Scunthorpe problem is classic.\n" +
      "Second sentence for the floor!\nThird one right here."))
      .toDF("doc_id", "text")
    // "thorpe" is a substring of a word — must NOT fire
    assert(LineClean.clean(pages, "text", minSentences = 3,
      badWords = Seq("thorpe")).count() == 1)
    assert(LineClean.clean(pages, "text", minSentences = 3,
      badWords = Seq("scunthorpe")).count() == 0)
  }
}
