package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{PipelineRunner, PipelineSpec}
import graft.sinks.AtomicPublisher.WriteSpec
import graft.state.{RunLedger, StateStore}

class PartialCommitSpec extends SparkSpec {

  private def poison(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("chk", assert_true(col("id") < 0)) // throws at execution

  test("runPartial publishes healthy branches while a poison branch aborts") {
    val base = tmpDir("partial-fork")
    val df = spark.range(100).toDF("id")
    val o = Fork.runPartial(df, Seq(
      Fork.Branch("good", Some(col("id") % 2 === 0), identity,
        s"$base/good", WriteSpec()),
      Fork.Branch("bad", None, poison, s"$base/bad", WriteSpec()),
      Fork.Branch("alsogood", None, _.select(col("id") * 2 as "id2"),
        s"$base/alsogood", WriteSpec())), "pr-1")
    assert(o.succeeded.keySet == Set("good", "alsogood"))
    assert(o.succeeded("good") == Fork.BranchResult(50, 50))
    assert(o.failed.keySet == Set("bad"))
    assert(spark.read.parquet(s"$base/good").count() == 50)
    assert(spark.read.parquet(s"$base/alsogood").count() == 100)
    // the failed branch published nothing and left no staging debris
    val dir = new java.io.File(base)
    assert(!new java.io.File(base, "bad").exists)
    assert(dir.listFiles.map(_.getName).forall(!_.startsWith(".staging")))
  }

  test("abort path: staging swept even with straggler write tasks in flight") {
    // provoke the r15 race: one partition poisons the job FAST while
    // sibling write tasks are still sleeping — their abort/commit
    // machinery used to re-create the staging dir AFTER the catch-block
    // delete. stage() now cancels the job group and waits for task
    // quiesce before sweeping, so this must hold deterministically.
    val slowPoison = (df: org.apache.spark.sql.DataFrame) => {
      val f = udf { (id: Long) =>
        if (id == 0L) sys.error("poison: fail fast")
        try Thread.sleep(400) catch { case _: InterruptedException => }
        id
      }
      df.repartition(8, col("id")).withColumn("chk", f(col("id")))
    }
    for (i <- 1 to 3) {
      val base = tmpDir(s"partial-race-$i")
      val o = Fork.runPartial(spark.range(64).toDF("id"), Seq(
        Fork.Branch("bad", None, slowPoison, s"$base/bad", WriteSpec()),
        Fork.Branch("good", None, identity, s"$base/good", WriteSpec())),
        s"race-$i")
      assert(o.failed.keySet == Set("bad"))
      assert(o.succeeded.keySet == Set("good"))
      val names = new java.io.File(base).listFiles.map(_.getName)
      assert(names.forall(!_.startsWith(".staging")),
        s"round $i left staging debris: ${names.mkString(", ")}")
    }
  }

  test("a failed branch's PREVIOUS output stays untouched") {
    val base = tmpDir("partial-prev")
    val prev = spark.range(7).toDF("id")
    graft.sinks.AtomicPublisher.publish(prev, s"$base/bad", "seed")
    val o = Fork.runPartial(spark.range(100).toDF("id"), Seq(
      Fork.Branch("bad", None, poison, s"$base/bad", WriteSpec()),
      Fork.Branch("good", None, identity, s"$base/good", WriteSpec())), "pr-2")
    assert(o.failed.keySet == Set("bad") && o.succeeded.keySet == Set("good"))
    assert(spark.read.parquet(s"$base/bad").count() == 7) // last good version
  }

  test("a branch failing its gate aborts alone; siblings still publish") {
    val base = tmpDir("partial-gate")
    val o = Fork.runPartial(spark.range(10).toDF("id"), Seq(
      Fork.Branch("a", None, identity, s"$base/a", WriteSpec()),
      Fork.Branch("b", None, identity, s"$base/b", WriteSpec())), "pr-3",
      branchGate = (name, _) =>
        require(name != "b", s"task policy rejected $name"))
    assert(o.succeeded.keySet == Set("a"))
    assert(o.failed.keySet == Set("b"))
    assert(o.failed("b").contains("task policy rejected b"))
    assert(!new java.io.File(base, "b").exists)
  }

  test("pipeline COMMIT_SUCCESSFUL_TASKS: partial ledger row, watermark held back") {
    val base = tmpDir("partial-pipe")
    spark.range(50)
      .selectExpr("id", "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts")
      .write.parquet(s"$base/in")
    def props(badOut: String) = Map(
      "job.name" -> "pjob",
      "job.commit.policy" -> "successful",
      "source.format" -> "parquet",
      "source.path" -> s"$base/in",
      "source.watermark.column" -> "ts",
      "source.watermark.default" -> "2024-01-01 00:00:00",
      "fork.1.name" -> "good",
      "fork.1.out" -> s"$base/out/good",
      "fork.2.name" -> "bad",
      "fork.2.filter" -> "assert_true(id < 0) IS NULL", // throws at execution
      "fork.2.out" -> badOut,
      "state.dir" -> s"$base/state")
    val r = PipelineRunner.run(spark,
      PipelineSpec.fromProperties(props(s"$base/out/bad")), "prun-1")
    assert(r.failedBranches.keySet == Set("bad"))
    assert(r.branchCounts == Map("good" -> 50L))
    assert(spark.read.parquet(s"$base/out/good").count() == 50)
    // watermark must NOT advance past rows the failed branch never wrote
    val wm = new StateStore(spark, s"$base/state").highWatermark("pjob")
    assert(wm.contains("2024-01-01 00:00:00")) // still the default
    // ledger distinguishes partial from full success
    val row = new RunLedger(spark, s"$base/state/runs").history
      .filter("run_id = 'prun-1'").collect().head
    assert(row.getAs[String]("status") == "COMMITTED_PARTIAL")
    assert(row.getAs[String]("detail").contains("bad:"))

    // the re-run (branch fixed) publishes and advances the watermark
    val r2 = PipelineRunner.run(spark,
      PipelineSpec.fromProperties(props(s"$base/out/bad") +
        ("fork.2.filter" -> "id >= 0")), "prun-2")
    assert(r2.failedBranches.isEmpty)
    assert(r2.committedWatermark.contains("2024-03-01 00:00:49.0"))
    assert(new StateStore(spark, s"$base/state").highWatermark("pjob")
      .contains("2024-03-01 00:00:49.0"))
  }

  test("task retry: a transiently-failing gate succeeds on attempt 2") {
    val base = tmpDir("retry-transient")
    // gate fails the FIRST attempt only (flaky sink / transient policy)
    var calls = 0
    val flakyGate: (String, Fork.BranchResult) => Unit = (_, _) => {
      calls += 1
      if (calls == 1) sys.error("transient: connection reset")
    }
    val o = Fork.runPartial(spark.range(10).toDF("id"),
      Seq(Fork.Branch("a", None, identity, s"$base/a", WriteSpec())),
      "retry-1", branchGate = flakyGate, maxAttempts = 3)
    assert(o.succeeded.keySet == Set("a") && o.failed.isEmpty)
    assert(calls == 2, s"gate must have been retried exactly once, saw $calls")
    assert(spark.read.parquet(s"$base/a").count() == 10)
    // no staging debris from the aborted first attempt
    assert(new java.io.File(base).listFiles
      .map(_.getName).forall(!_.startsWith(".staging")))
  }

  test("task retry: a permanent failure exhausts attempts and says so") {
    val base = tmpDir("retry-perm")
    val o = Fork.runPartial(spark.range(10).toDF("id"),
      Seq(Fork.Branch("bad", None, poison, s"$base/bad", WriteSpec()),
        Fork.Branch("good", None, identity, s"$base/good", WriteSpec())),
      "retry-2", maxAttempts = 3)
    assert(o.succeeded.keySet == Set("good"))
    assert(o.failed("bad").startsWith("after 3 attempts:"),
      s"failure text must carry the attempt count: ${o.failed("bad")}")
    assert(!new java.io.File(base, "bad").exists)
  }

  test("task.maxretries flows from the declarative spec to the branch loop") {
    val base = tmpDir("retry-spec")
    spark.range(20).toDF("id").write.mode("overwrite").parquet(s"$base/in")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "retrying",
      "source.format" -> "parquet",
      "source.path" -> s"$base/in",
      "job.commit.policy" -> "successful",
      "task.maxretries" -> "4",
      "fork.1.name" -> "main",
      "fork.1.out" -> s"$base/out"))
    assert(spec.taskMaxRetries == 4)
    val res = PipelineRunner.run(spark, spec, runId = "retry-3")
    assert(res.branchCounts("main") == 20L)
  }

  test("task.maxretries counts RETRIES like the reference: 0 = one attempt") {
    val base = tmpDir("retry-zero")
    spark.range(5).toDF("id").write.mode("overwrite").parquet(s"$base/in")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "r0", "source.format" -> "parquet",
      "source.path" -> s"$base/in", "job.commit.policy" -> "successful",
      "task.maxretries" -> "0",
      "fork.1.name" -> "bad", "fork.1.filter" -> "no_such_column > 0",
      "fork.1.out" -> s"$base/out"))
    val e = intercept[Exception] { PipelineRunner.run(spark, spec, "r0") }
    assert(e.getMessage.contains("after 1 attempts:"),
      s"0 retries must mean exactly one attempt: ${e.getMessage}")
  }

  test("runPartial skipEmpty: empty delta keeps previous output intact") {
    val base = tmpDir("partial-skip")
    graft.sinks.AtomicPublisher.publish(
      spark.range(7).toDF("id"), s"$base/a", "seed")
    val o = Fork.runPartial(
      spark.range(100).filter("id < 0").toDF("id"),
      Seq(Fork.Branch("a", None, identity, s"$base/a", WriteSpec()),
        Fork.Branch("b", None, identity, s"$base/b", WriteSpec())),
      "pr-skip", skipEmpty = Set("a"))
    assert(o.skipped == Set("a") && o.succeeded.keySet == Set("b"))
    assert(spark.read.parquet(s"$base/a").count() == 7) // untouched
    assert(new java.io.File(base, "b").exists) // no flag -> publishes empty
  }

  test("per-branch watermarks: repair run re-extracts only for the laggard") {
    val base = tmpDir("partial-wm")
    def addBatch(ids: Range, day: String): Unit =
      spark.range(ids.start, ids.end)
        .selectExpr("id",
          s"timestamp'$day' + make_interval(0,0,0,0,0,0,id) AS ts")
        .write.mode("append").parquet(s"$base/in")
    addBatch(0 until 10, "2024-03-01 00:00:00")
    def props(badFilter: String) = Map(
      "job.name" -> "wjob", "job.commit.policy" -> "successful",
      "source.format" -> "parquet", "source.path" -> s"$base/in",
      "source.watermark.column" -> "ts",
      "fork.1.name" -> "good", "fork.1.out" -> s"$base/out/good",
      "fork.2.name" -> "bad", "fork.2.filter" -> badFilter,
      "fork.2.out" -> s"$base/out/bad",
      "state.dir" -> s"$base/state")
    // run 1: bad poisons; good publishes batch 1, advancing ITS watermark
    val r1 = PipelineRunner.run(spark, PipelineSpec.fromProperties(
      props("assert_true(id < 0) IS NULL")), "w-1")
    assert(r1.failedBranches.keySet == Set("bad"))
    val st = new StateStore(spark, s"$base/state")
    assert(st.highWatermark("wjob", "branch.good")
      .contains("2024-03-01 00:00:09.0"))
    assert(st.highWatermark("wjob", "branch.bad").isEmpty)
    // batch 2 arrives; repair run: bad gets both batches, good only #2
    addBatch(10 until 15, "2024-03-02 00:00:00")
    val r2 = PipelineRunner.run(spark,
      PipelineSpec.fromProperties(props("id >= 0")), "w-2")
    assert(r2.failedBranches.isEmpty && r2.skippedBranches.isEmpty)
    assert(r2.branchCounts == Map("good" -> 5L, "bad" -> 15L))
    assert(spark.read.parquet(s"$base/out/good").count() == 5) // its delta
    assert(spark.read.parquet(s"$base/out/bad").count() == 15)
    assert(st.highWatermark("wjob", "branch.bad")
      .contains("2024-03-02 00:00:14.0"))
    // run 3: nothing new — both branches current, both skip, outputs kept
    val r3 = PipelineRunner.run(spark,
      PipelineSpec.fromProperties(props("id >= 0")), "w-3")
    assert(r3.skippedBranches == Set("good", "bad"))
    assert(r3.branchCounts.isEmpty)
    assert(spark.read.parquet(s"$base/out/good").count() == 5) // NOT clobbered
    assert(spark.read.parquet(s"$base/out/bad").count() == 15)
    assert(st.highWatermark("wjob", "branch.good")
      .contains("2024-03-02 00:00:14.0"))
  }

  test("a job-level watermark alone grants skip protection (no branch keys)") {
    val base = tmpDir("partial-jobwm")
    spark.range(10)
      .selectExpr("id",
        "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts")
      .write.parquet(s"$base/in")
    // a pre-branch-keys deployment: only the JOB watermark is committed,
    // already at the data's max — and the branch has published output
    new StateStore(spark, s"$base/state")
      .commit(Map(("jjob", "") -> "2024-03-01 00:00:09.0"), "seed")
    graft.sinks.AtomicPublisher.publish(
      spark.range(10).toDF("id"), s"$base/out/only", "seed")
    val r = PipelineRunner.run(spark, PipelineSpec.fromProperties(Map(
      "job.name" -> "jjob", "job.commit.policy" -> "successful",
      "source.format" -> "parquet", "source.path" -> s"$base/in",
      "source.watermark.column" -> "ts",
      "fork.1.name" -> "only", "fork.1.out" -> s"$base/out/only",
      "state.dir" -> s"$base/state")), "j-1")
    assert(r.skippedBranches == Set("only"))
    // the empty delta must NOT have clobbered the published output
    assert(spark.read.parquet(s"$base/out/only").count() == 10)
  }

  test("a skipped branch's watermark never regresses") {
    val base = tmpDir("partial-regress")
    spark.range(10)
      .selectExpr("id",
        "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts")
      .write.parquet(s"$base/in")
    val st = new StateStore(spark, s"$base/state")
    // ahead branch: watermark beyond anything in the source (its rows
    // aged out); behind branch: needs the full window
    st.commit(Map(("rjob", "branch.ahead") -> "2024-06-01 00:00:00.0",
      ("rjob", "branch.behind") -> "2024-01-01 00:00:00.0"), "seed")
    val r = PipelineRunner.run(spark, PipelineSpec.fromProperties(Map(
      "job.name" -> "rjob", "job.commit.policy" -> "successful",
      "source.format" -> "parquet", "source.path" -> s"$base/in",
      "source.watermark.column" -> "ts",
      "fork.1.name" -> "ahead", "fork.1.out" -> s"$base/out/ahead",
      "fork.2.name" -> "behind", "fork.2.out" -> s"$base/out/behind",
      "state.dir" -> s"$base/state")), "r-1")
    assert(r.skippedBranches == Set("ahead"))
    assert(r.branchCounts.keySet == Set("behind"))
    // ahead keeps its own (later) watermark; behind advances to the max
    assert(st.highWatermark("rjob", "branch.ahead")
      .contains("2024-06-01 00:00:00.0"))
    assert(st.highWatermark("rjob", "branch.behind")
      .contains("2024-03-01 00:00:09.0"))
  }

  test("all branches failing fails the job and ledgers FAILED") {
    val base = tmpDir("partial-all")
    spark.range(5).toDF("id").write.parquet(s"$base/in")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "alljob",
      "job.commit.policy" -> "successful",
      "source.format" -> "parquet",
      "source.path" -> s"$base/in",
      "fork.1.name" -> "b1",
      "fork.1.filter" -> "assert_true(id < 0) IS NULL",
      "fork.1.out" -> s"$base/out/b1",
      "state.dir" -> s"$base/state"))
    intercept[IllegalStateException] {
      PipelineRunner.run(spark, spec, "arun-1")
    }
    val row = new RunLedger(spark, s"$base/state/runs").history
      .filter("run_id = 'arun-1'").collect().head
    assert(row.getAs[String]("status") == "FAILED")
  }
}
