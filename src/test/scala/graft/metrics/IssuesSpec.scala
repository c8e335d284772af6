package graft.metrics

import graft.SparkSpec
import graft.pipeline.{PipelineRunner, PipelineSpec}
import org.apache.spark.sql.functions._

class IssuesSpec extends SparkSpec {
  import spark.implicits._

  private def boom(msg: String): Throwable =
    try { throw new IllegalStateException(msg) }
    catch { case t: Throwable => t }

  test("issue code hashes the stack SHAPE: same failure site, different messages -> one code") {
    def fail(msg: String) = boom(msg) // same throw site for both
    val (a, b) = (fail("run-1 /tmp/x123"), fail("run-2 /tmp/y456"))
    assert(Issues.codeOf(a) == Issues.codeOf(b))
    assert(Issues.codeOf(a).matches("T[0-9A-F]{6}"))
    // a different failure site hashes differently
    val other = try { throw new IllegalStateException("run-1 /tmp/x123") }
                catch { case t: Throwable => t }
    assert(Issues.codeOf(a) != Issues.codeOf(other))
  }

  test("cause chains participate in the code; summary carries the root cause") {
    val root = boom("disk full")
    val wrapped = try { throw new RuntimeException("job failed", root) }
                  catch { case t: Throwable => t }
    assert(Issues.codeOf(wrapped) != Issues.codeOf(root))
    val i = Issues.fromThrowable(wrapped, "graft.test", 5L, context = "ctx")
    assert(i.summary == "disk full | ctx")
    assert(i.exceptionClass == "java.lang.IllegalStateException")
    assert(i.details.contains("Caused by"))
  }

  test("repository dedups by code, keeps insertion order, bounds size") {
    val repo = new IssueRepository(maxSize = 3)
    val i1 = Issue(1L, "ERROR", "TAAAAAA", "first")
    repo.put(i1)
    repo.put(Issue(2L, "WARN", "TAAAAAA", "dup — must not replace first"))
    repo.put(Issue(3L, "WARN", "TBBBBBB", "second"))
    repo.put(Issue(4L, "ERROR", "TCCCCCC", "third"))
    repo.put(Issue(5L, "FATAL", "TDDDDDD", "dropped: over capacity"))
    assert(repo.getAll.map(_.code) == Seq("TAAAAAA", "TBBBBBB", "TCCCCCC"))
    assert(repo.getAll.head.summary == "first")
    // dedup of an EXISTING code still works at capacity
    repo.put(Issue(6L, "WARN", "TBBBBBB", "dup again"))
    assert(repo.getAll.size == 3)
    assert(repo.mostRecentErrors(5).map(_.code) == Seq("TCCCCCC", "TAAAAAA"))
  }

  test("refinery: severity desc, time asc, metrics-sourced noise demoted") {
    val issues = Seq(
      Issue(10L, "WARN", "T1", "w1"),
      Issue(5L, "ERROR", "T2", "e-metrics", sourceClass = "graft.metrics.Reporters"),
      Issue(7L, "ERROR", "T3", "e-engine", sourceClass = "graft.operators.Fork"),
      Issue(1L, "FATAL", "T4", "f"))
    assert(Issues.refine(issues).map(_.code) == Seq("T4", "T3", "T1", "T2"))
  }

  test("IssueListener converts executor task failures into deduped issues") {
    val repo = new IssueRepository()
    val listener = new IssueListener(repo)
    spark.sparkContext.addSparkListener(listener)
    try {
      val thrown = intercept[Exception] {
        spark.range(100).repartition(4)
          .filter(udf((x: Long) => {
            if (x >= 0) throw new IllegalStateException(s"bad row $x")
            true
          }).apply(col("id")))
          .count()
      }
      assert(thrown != null)
      // listener events arrive async; poll until the bus drains
      val deadline = System.currentTimeMillis() + 30000L
      while (repo.getAll.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val all = repo.getAll
      assert(all.nonEmpty, "no issues captured from task failures")
      // every captured failure has the same stack shape -> ONE code even
      // though each task's message names a different row
      assert(all.size == 1, s"expected 1 deduped issue, got: ${all.map(_.code)}")
      // Spark 4 surfaces UDF failures wrapped ([FAILED_EXECUTE_UDF]); the
      // original failure still defines the stack shape and the details
      assert(all.head.exceptionClass.endsWith("Exception"))
      assert(all.head.details.contains("IllegalStateException"))
      assert(all.head.severity == "WARN")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pipeline e2e: an executor-side failure lands BOTH the WARN task issue and the ERROR job issue") {
    val dir = tmpDir("issues-exec")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(s"$dir/in")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "exec-fail-job",
      "source.format" -> "parquet",
      "source.path" -> s"$dir/in",
      // raise_error evaluates executor-side -> task failure -> job failure
      "transform.1" -> "selectExpr:k;CASE WHEN v > 0 THEN raise_error('task boom') ELSE 'x' END AS z",
      "fork.1.name" -> "out",
      "fork.1.out" -> s"$dir/out",
      "state.dir" -> s"$dir/state"))
    intercept[Exception] { PipelineRunner.run(spark, spec, "erun1") }
    val sevs = Issues.table(new EventStore(spark, s"$dir/state/events").table)
      .select("severity").as[String].collect().toSeq.sorted
    assert(sevs.contains("ERROR"), s"missing job-level issue in $sevs")
    assert(sevs.contains("WARN"), s"missing task-level issue in $sevs")
  }

  test("pipeline e2e: a failed run lands an ERROR issue event in the state store") {
    val dir = tmpDir("issues-e2e")
    Seq((1L, 10L)).toDF("k", "v").write.parquet(s"$dir/in")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "issue-job",
      "source.format" -> "parquet",
      "source.path" -> s"$dir/in",
      "rowpolicy.1.name" -> "never",
      "rowpolicy.1.predicate" -> "v < 0",
      "rowpolicy.1.type" -> "FAIL",
      "fork.1.name" -> "out",
      "fork.1.out" -> s"$dir/out",
      "state.dir" -> s"$dir/state"))
    intercept[Exception] { PipelineRunner.run(spark, spec, "irun1") }
    val issues = Issues.table(new EventStore(spark, s"$dir/state/events").table)
    val rows = issues.select("code", "severity", "summary")
      .as[(String, String, String)].collect()
    assert(rows.length == 1)
    assert(rows.head._2 == "ERROR")
    assert(rows.head._3.contains("issue-job"))
    assert(rows.head._1.matches("T[0-9A-F]{6}"))
  }
}
