package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.MinHashDedup

class RedactTfidfSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, IPs and phones with typed tokens") {
    val df = Seq(
      "write to jane.doe+x@sub.example.org now",
      "server at 192.168.0.1 and 10.0.255.7 down",
      "call 555-123-4567 or +123 456 7890",
      "no pii here").toDF("text")
    val out = df.select(Redact.redactPii($"text")).as[String].collect()
    assert(out(0) == "write to <EMAIL> now")
    assert(out(1) == "server at <IP> and <IP> down")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "no pii here")
  }

  test("pii counts match the replacements") {
    val df = Seq("a@b.io c@d.co 1.2.3.4").toDF("text")
    val row = df.select(
      Redact.emailCount($"text"), Redact.ipv4Count($"text"),
      Redact.phoneCount($"text")).head
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((2, 1, 0)))
  }

  test("gopher repetition fractions on known text") {
    val df = Seq(
      "a b a b a b", // bigrams: ab ba ab ba ab -> top 3/5, dup 1-2/5
      "x y z w", // all bigrams distinct -> top 1/3, dup 0
      "solo").toDF("text") // <2 tokens -> [text]: top 1.0, dup 0.0
    val g = MinHashDedup.shingles($"text", 2)
    val out = df.select(TextStats.topNgramFraction(g).as("t"),
      TextStats.dupNgramFraction(g).as("d")).collect()
    assert(math.abs(out(0).getDouble(0) - 0.6) < 1e-9)
    assert(math.abs(out(0).getDouble(1) - 0.6) < 1e-9)
    assert(math.abs(out(1).getDouble(0) - 1.0 / 3) < 1e-9)
    assert(out(1).getDouble(1) == 0.0)
    assert(out(2).getDouble(0) == 1.0)
    assert(out(2).getDouble(1) == 0.0)
  }

  test("tfidf ranks corpus-rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2 common"),
      (3L, "common common filler")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(out(1L) == "rare1")
    assert(out(2L) == "rare2")
    // doc 3: no unique term; "filler" (df=1) still beats "common" (df=3)
    assert(out(3L) == "filler")
  }

  test("tfidf rational-idf scores and tie-breaks are exact") {
    // n=2; tf(d1)=a:2,b:1; tf(d2)=a:1,c:1; df: a=2, b=1, c=1
    // rational scores: d1 a=2*(2/2)=2, b=1*(2/1)=2 (tie -> term asc);
    //                  d2 a=1, c=2
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(docs, "doc_id", "text", k = 3, logIdf = false)
      .select("doc_id", "term", "score_r", "rk")
      .as[(Long, String, Double, Int)].collect().sortBy(r => (r._1, r._4))
      .toSeq
    assert(out == Seq(
      (1L, "a", 2.0, 1), (1L, "b", 2.0, 2),
      (2L, "c", 2.0, 1), (2L, "a", 1.0, 2)))
  }
}
