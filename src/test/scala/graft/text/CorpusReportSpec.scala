package graft.text

import graft.SparkSpec

class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  test("byStratum: one-scan data card with exact integer shares") {
    val docs = Seq(
      ("web", "en", "four words right here"),    // 21 chars, 4 tokens
      ("web", "de", "abc"),                      // 3 chars, 1 token
      ("books", "en", "a much longer book text")) // 23 chars, 5 tokens
      .toDF("source", "lang", "text")
    val r = CorpusReport.byStratum(docs, "source", "text", "lang")
      .collect().map(x => x.getString(0) -> x).toMap
    val web = r("web")
    assert(web.getAs[Long]("n_docs") == 2)
    assert(web.getAs[Long]("chars") == 24)
    assert(web.getAs[Long]("tokens") == 5)
    assert(web.getAs[Long]("tokens_bpe_est") == 6 + 1) // ceil(21/4)+ceil(3/4)
    assert(web.getAs[Long]("n_langs") == 2)
    assert(web.getAs[Long]("char_share_permille") == 24L * 1000 / 47)
    val books = r("books")
    assert(books.getAs[Long]("n_langs") == 1)
    assert(books.getAs[Long]("char_share_permille") == 23L * 1000 / 47)
    // shares are exact permille of ONE total: they sum to ~1000
    val s = r.values.map(_.getAs[Long]("char_share_permille")).sum
    assert(s == 999 || s == 1000, s)
  }
}
