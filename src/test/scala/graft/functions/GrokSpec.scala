package graft.functions

import graft.SparkSpec

class GrokSpec extends SparkSpec {
  import spark.implicits._

  test("compile: named macros capture in order, unnamed do not") {
    val c = Grok.compile("%{INT:num}-%{WORD}-%{WORD:tag}")
    assert(c.fields.map(f => (f.name, f.group)) == Seq("num" -> 1, "tag" -> 2))
    assert("42-foo-bar".matches(c.regex))
  }

  test("nested library patterns expand (NUMBER -> BASE10NUM, TIMESTAMP_ISO8601)") {
    val c = Grok.compile("%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{GREEDYDATA:msg}")
    val m = java.util.regex.Pattern.compile(c.regex)
      .matcher("2024-03-01 12:34:56 ERROR disk full")
    assert(m.matches())
    assert(m.group(1) == "2024-03-01 12:34:56")
    assert(m.group(2) == "ERROR")
    assert(m.group(3) == "disk full")
  }

  test("parse: typed fields, NULLs for unmatched lines") {
    val df = Seq(
      "10.0.0.1 alice 200 0.125",
      "not a log line at all!!!").toDF("line")
    val out = Grok.parse(df, "line",
      "%{IPV4:ip} %{USERNAME:user} %{INT:status:int} %{NUMBER:dur:double}")
    val rows = out.select("ip", "user", "status", "dur")
      .as[(Option[String], Option[String], Option[Int], Option[Double])]
      .collect()
    assert(rows(0) == ((Some("10.0.0.1"), Some("alice"), Some(200), Some(0.125))))
    assert(rows(1) == ((None, None, None, None)))
    assert(out.schema("status").dataType.typeName == "integer")
    assert(out.schema("dur").dataType.typeName == "double")
  }

  test("user capture groups in raw segments do not shift field numbering") {
    val c = Grok.compile("(GET|POST) %{INT:code} \\(x\\) %{WORD:who}")
    // group 1 = the user's (GET|POST); fields follow at 2 and 3
    assert(c.fields.map(f => (f.name, f.group)) == Seq("code" -> 2, "who" -> 3))
    val m = java.util.regex.Pattern.compile(c.regex)
      .matcher("POST 201 (x) alice")
    assert(m.find() && m.group(2) == "201" && m.group(3) == "alice")
    val df = Seq("GET 404 (x) bob").toDF("line")
    val out = Grok.parse(df, "line", "(GET|POST) %{INT:code:int} \\(x\\) %{WORD:who}")
    assert(out.select("code", "who").as[(Int, String)].head == ((404, "bob")))
  }

  test("char-class parens and named groups in raw segments count correctly") {
    // '(' inside a character class is a literal, NOT a capture group
    val c1 = Grok.compile("x[(]%{WORD:w}[)] %{INT:n}")
    assert(c1.fields.map(f => (f.name, f.group)) == Seq("w" -> 1, "n" -> 2))
    val m1 = java.util.regex.Pattern.compile(c1.regex).matcher("x(hello) 42")
    assert(m1.find() && m1.group(1) == "hello" && m1.group(2) == "42")

    // (?<name>...) IS capturing and shifts the numbering; (?:...), (?=...)
    // and lookbehinds do not
    val c2 = Grok.compile("(?<num>\\d+)-(?:ab) %{WORD:w}")
    assert(c2.fields.map(f => (f.name, f.group)) == Seq("w" -> 2))
    val m2 = java.util.regex.Pattern.compile(c2.regex).matcher("17-ab tail")
    assert(m2.find() && m2.group(2) == "tail")

    val c3 = Grok.compile("(?=\\d)(?<num>\\d+) %{WORD:w}")
    assert(c3.fields.map(f => (f.name, f.group)) == Seq("w" -> 2))

    // Java classes nest: [[ab](] is ONE class (union of [ab] and '('),
    // so neither its inner brackets nor its '(' shift the numbering
    val c4 = Grok.compile("[[ab](] %{WORD:w}")
    assert(c4.fields.map(f => (f.name, f.group)) == Seq("w" -> 1))
    val m4 = java.util.regex.Pattern.compile(c4.regex).matcher("a hello")
    assert(m4.find() && m4.group(1) == "hello")

    // \Q...\E quotes literally: the '(' inside is not a group
    val c5 = Grok.compile("\\Q(x)\\E %{WORD:w}")
    assert(c5.fields.map(f => (f.name, f.group)) == Seq("w" -> 1))
    val m5 = java.util.regex.Pattern.compile(c5.regex).matcher("(x) hi")
    assert(m5.find() && m5.group(1) == "hi")
  }

  test("parse runs ONE grok_struct node however many fields the pattern has") {
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate the plan
    val dir = tmpDir("grok-plan")
    Seq("2024-03-01 12:34:56 ERROR web01 10.0.0.1 alice 500 0.75")
      .toDF("line").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = Grok.parse(df, "line",
      "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{WORD:host} %{IPV4:ip} " +
        "%{USERNAME:user} %{INT:status:int} %{NUMBER:dur:double}")
      .select("ts", "lvl", "host", "ip", "user", "status", "dur")
    val plan = out.queryExecution.optimizedPlan.toString
    val n = "grok_struct".r.findAllMatchIn(plan).length
    assert(n == 1, s"expected exactly one grok_struct in the plan, got $n:\n$plan")
    assert(out.as[(String, String, String, String, String, Int, Double)].head ==
      (("2024-03-01 12:34:56", "ERROR", "web01", "10.0.0.1", "alice", 500, 0.75)))
  }

  test("grok struct: unmatched line yields null fields, optional group yields empty string") {
    val df = Seq("ab 7", "zzz").toDF("line")
    // the INT is optional: a matched line without it must give "" (the
    // regexp_extract parity contract), an unmatched line null
    val out = Grok.parse(df, "line", "%{WORD:w}(?: %{INT:n})?")
    val rows = out.select("w", "n").as[(Option[String], Option[String])].collect()
    assert(rows(0) == ((Some("ab"), Some("7"))))
    assert(rows(1) == ((Some("zzz"), Some("")))) // WORD matches, INT absent
    val unmatched = Grok.parse(Seq("!!!").toDF("line"), "line", "^%{WORD:w}$")
    assert(unmatched.select("w").as[Option[String]].head.isEmpty)
  }

  test("literal regex between macros is honored; unknown pattern rejected") {
    val c = Grok.compile("""^\[%{WORD:a}\]$""")
    val m = java.util.regex.Pattern.compile(c.regex).matcher("[xyz]")
    assert(m.find() && m.group(1) == "xyz")
    assert(!java.util.regex.Pattern.compile(c.regex).matcher("no brackets").find())
    intercept[IllegalArgumentException] { Grok.compile("%{NOPE:x}") }
    intercept[IllegalArgumentException] {
      Grok.parse(Seq("x").toDF("line"), "line", "%{WORD:w:complex128}")
        .collect()
    }
  }
}
