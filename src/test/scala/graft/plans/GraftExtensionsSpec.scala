package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MinHash

class GraftExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("gzip/gunzip round-trip from pure SQL") {
    import spark.implicits._
    val out = spark.sql(
      "SELECT cast(graft_gunzip(graft_gzip(cast('hello graft' AS binary))) AS string) AS s")
      .as[String].collect()
    assert(out.toSeq == Seq("hello graft"))
  }

  test("graft_minhash in SQL equals the Scala column API") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps", "pack my box with five dozen")
      .toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT graft_minhash(text, 3, 8) AS sig FROM ext_docs")
      .as[Seq[Long]].collect().toSeq
    val viaApi = df.select(MinHash.signature($"text", n = 3, k = 8).as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(viaSql == viaApi)
    // banded form agrees on length and is SQL-callable
    val bands = spark.sql(
      "SELECT graft_minhash_bands(text, 3, 8, 4) AS b FROM ext_docs")
      .as[Seq[Long]].collect()
    assert(bands.forall(_.length == 4))
  }

  test("graft_srp over an embedding column from SQL") {
    import spark.implicits._
    Seq(Seq(1.0f, 0.0f, -1.0f), Seq(0.5f, 0.5f, 0.5f)).toDF("emb")
      .createOrReplaceTempView("ext_embs")
    val sigs = spark.sql("SELECT graft_srp(emb, 8, 2) AS s FROM ext_embs")
      .as[Seq[Long]].collect()
    assert(sigs.forall(s => s.length == 2 && s.forall(v => v >= 0 && v < 256)))
  }

  test("graft_grok parses named fields from SQL") {
    import spark.implicits._
    Seq("GET /index.html 200", "POST /api/v1 503")
      .toDF("line").createOrReplaceTempView("ext_logs")
    val rows = spark.sql(
      """SELECT g.verb, g.path, g.status
        |FROM (SELECT graft_grok(line,
        |  '%{WORD:verb} %{NOTSPACE:path} %{INT:status}') AS g
        |  FROM ext_logs)""".stripMargin)
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(("GET", "/index.html", "200"), ("POST", "/api/v1", "503")))
  }

  test("declarative pipeline transforms can call registered functions") {
    import spark.implicits._
    // the §2.9 payoff: a PipelineSpec transform written as a plain SQL
    // string uses the custom expression with no Scala imports
    val base = tmpDir("extpipe")
    Seq(("d1", "alpha beta gamma delta"), ("d2", "one two three four"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$base/in")
    val spec = graft.pipeline.PipelineSpec(
      name = "ext",
      source = graft.pipeline.SourceSpec(format = "parquet", path = s"$base/in"),
      transformExprs = Seq(
        "selectExpr:doc_id;graft_minhash_bands(text, 2, 8, 4) AS bands"),
      branches = Seq(graft.pipeline.BranchSpec(name = "main",
        outDir = s"$base/out")))
    val res = graft.pipeline.PipelineRunner.run(spark, spec, runId = "ext1")
    assert(res.branchCounts.values.sum == 2)
    val out = spark.read.parquet(s"$base/out").as[(String, Seq[Long])].collect()
    assert(out.forall(_._2.length == 4))
  }

  test("graft_zvalue from SQL matches the interleave truth table") {
    import spark.implicits._
    val z = spark.sql("SELECT graft_zvalue(1L, 0L, 2) AS z, " +
      "graft_zvalue(0L, 1L, 2) AS z2, graft_zvalue(3L, 3L, 2) AS z3")
      .as[(Long, Long, Long)].collect()(0)
    assert(z == ((1L, 2L, 15L)))
  }

  test("non-literal parameters are refused with a diagnostic") {
    import spark.implicits._
    Seq(("x", 3)).toDF("text", "n").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(text, n, 8) FROM ext_bad").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("; ")
    assert(msgs.contains("integer literal"), s"got $msgs")
  }

  test("graft_vec_dot from SQL equals the Scala column API; bad types refuse") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.0, 2.0), Seq(2.0, 0.0, 0.25))).toDF("a", "b")
    df.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql("SELECT graft_vec_dot(a, b) AS d FROM ext_vecs")
      .as[Double].collect().toSeq
    val viaApi = df.select(graft.ann.Ann.dot($"a", $"b").as("d"))
      .as[Double].collect().toSeq
    assert(viaSql == viaApi && viaSql == Seq(32.0, 1.5))
    // the type check (not a mixin) still refuses non-array<double> input
    val e = intercept[Exception] {
      spark.sql("SELECT graft_vec_dot('x', 'y')").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("; ")
    assert(msgs.contains("array<double>"), s"got $msgs")
  }

  test("constructor injection applies every registration to an extensions set") {
    // the spark.sql.extensions path: the class must apply cleanly to a
    // SparkSessionExtensions (the suite can't build a second session in
    // this JVM, so functional coverage rides on the register() tests —
    // both paths share the same `registrations` list by construction)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.registrations.map(_._1).distinct.size ==
      GraftExtensions.registrations.size)
  }
}
