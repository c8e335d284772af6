package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.state.StateStore

class PipelineSpecSuite extends SparkSpec {

  test("fromProperties parses the reference's flat key style") {
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "demo",
      "source.format" -> "parquet",
      "source.path" -> "/x",
      "source.watermark.column" -> "ts",
      "source.watermark.default" -> "1990-01-01 00:00:00",
      "transform.1" -> "selectExpr:a;b",
      "rowpolicy.1.name" -> "nn",
      "rowpolicy.1.predicate" -> "a IS NOT NULL",
      "rowpolicy.1.type" -> "FAIL",
      "taskpolicy.rowcount.range" -> "0.0",
      "fork.1.name" -> "main",
      "fork.1.out" -> "/out/main",
      "fork.2.name" -> "audit",
      "fork.2.filter" -> "b > 0",
      "fork.2.out" -> "/out/audit",
      "state.dir" -> "/state"))
    assert(spec.name == "demo")
    assert(spec.source.watermarkColumn.contains("ts"))
    assert(spec.transformExprs == Seq("selectExpr:a;b"))
    assert(spec.rowPolicies.head.typ == "FAIL")
    assert(spec.branches.map(_.name) == Seq("main", "audit"))
    assert(spec.rowCountRange.contains(0.0))
  }

  test("pull-config e2e: reference schema dialect drives converters, policies, partitioned publish, watermark") {
    val dir = tmpDir("pull-e2e")
    def writeCsv(name: String, rows: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(s"$dir/in")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve(name),
        rows.mkString("\n").getBytes("UTF-8")): Unit
    }
    // the reference declares report schemas inline in its .pull files
    // using the JSON-intermediate dialect (gobblin-example/src/main/
    // resources/google-web-master.pull:39, GobblinTest1.pull job shape);
    // this job is that config style end-to-end: headerless CSV + dialect
    // schema -> transform -> ERR_FILE policy -> partitioned publish ->
    // watermark committed to the state store, incrementally across runs
    val schemaJson =
      """[{"columnName":"Date","isNullable":"false",
        |  "dataType":{"type":"timestamp"},"waterMark":true},
        | {"columnName":"Country","isNullable":"true","dataType":{"type":"string"}},
        | {"columnName":"Page","isNullable":"true","dataType":{"type":"string"}},
        | {"columnName":"Clicks","isNullable":"false","dataType":{"type":"long"}}]"""
        .stripMargin
    def props(out: String) = Map(
      "job.name" -> "web-master-report",
      "source.format" -> "csv",
      "source.path" -> s"$dir/in",
      "source.option.timestampFormat" -> "yyyy-MM-dd HH:mm:ss",
      "source.schema.json" -> schemaJson,
      "source.watermark.column" -> "Date",
      "source.watermark.default" -> "2023-12-31 00:00:00",
      "transform.1" -> ("selectExpr:Date;Country;Page;Clicks;" +
        "date_format(Date, 'yyyy-MM-dd') AS datepartition"),
      "rowpolicy.1.name" -> "nonNullPage",
      "rowpolicy.1.predicate" -> "Page IS NOT NULL",
      "rowpolicy.1.type" -> "ERR_FILE",
      "qualitychecker.err.dir" -> s"$dir/err",
      "taskpolicy.rowcount.range" -> "0.0",
      "fork.1.name" -> "report",
      "fork.1.out" -> out,
      "fork.1.format" -> "parquet",
      "fork.1.partitionBy" -> "datepartition",
      "state.dir" -> s"$dir/state")

    writeCsv("day12.csv", Seq(
      "2024-01-01 10:00:00,us,/home,5",
      "2024-01-01 11:00:00,de,/docs,3",
      "2024-01-02 09:00:00,us,,7", // null Page -> ERR_FILE divert
      "2024-01-02 10:00:00,fr,/home,2"))
    val r1 = PipelineRunner.run(spark,
      PipelineSpec.fromProperties(props(s"$dir/out1")), "run1")
    assert(r1.extracted == 3 && r1.rejected == 1)
    assert(r1.branchCounts("report") == 3)
    assert(r1.committedWatermark.exists(_.startsWith("2024-01-02 10:00:00")))
    val out1 = spark.read.parquet(s"$dir/out1")
    assert(out1.count() == 3)
    // partition-column type inference reads the dir values back as dates
    assert(out1.select(col("datepartition").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq ==
      Seq("2024-01-01", "2024-01-02"))
    assert(spark.read.parquet(s"$dir/err/web-master-report").count() == 1,
      "the diverted row must land in the err file, not the report")

    // run 2: a new day arrives plus a LATE row below the committed
    // watermark — the incremental scan picks up only the new day
    writeCsv("day3.csv", Seq(
      "2024-01-01 12:00:00,uk,/late,9",
      "2024-01-03 08:00:00,jp,/home,4"))
    val r2 = PipelineRunner.run(spark,
      PipelineSpec.fromProperties(props(s"$dir/out2")), "run2")
    assert(r2.extracted == 1 && r2.rejected == 0)
    assert(r2.committedWatermark.exists(_.startsWith("2024-01-03 08:00:00")))
    val out2 = spark.read.parquet(s"$dir/out2")
    assert(out2.select("Country").collect().map(_.getString(0)).toSeq == Seq("jp"))
    // run 3 would resume from the state store's run-2 watermark
    val store = new StateStore(spark, s"$dir/state")
    assert(store.highWatermark("web-master-report") == r2.committedWatermark)
    // stateful runs auto-record in the run-history ledger beside the store
    val runs = new graft.state.RunLedger(spark, s"$dir/state/runs").history
    assert(runs.count() == 2)
    assert(runs.filter("run_id = 'run2'").head()
      .getAs[String]("committed_watermark")
      .startsWith("2024-01-03 08:00:00"))
  }

  test("aborted stateful runs land in the ledger with status FAILED") {
    val dir = tmpDir("ledger-fail")
    val spec = PipelineSpec(
      name = "doomed",
      source = SourceSpec(format = "parquet", path = s"$sf/nation.parquet"),
      rowPolicies = Seq(RowPolicySpec("impossible", "n_nationkey < 0", "FAIL")),
      errDir = Some(s"$dir/err"),
      branches = Seq(BranchSpec(name = "main", outDir = s"$dir/out")),
      stateDir = Some(s"$dir/state"))
    intercept[IllegalArgumentException] {
      PipelineRunner.run(spark, spec, "failrun1")
    }
    val hist = new graft.state.RunLedger(spark, s"$dir/state/runs").history
    val row = hist.filter("status = 'FAILED'").head()
    assert(row.getAs[String]("run_id") == "failrun1")
    assert(row.getAs[String]("detail").contains("impossible"))
  }

  test("end-to-end: source -> transforms -> policies -> fork -> publish -> state") {
    val out = tmpDir("pipe")
    val spec = PipelineSpec(
      name = "e2e",
      source = SourceSpec(format = "parquet", path = s"$sf/orders.parquet",
        watermarkColumn = Some("o_orderdate"),
        watermarkDefault = Some("1990-01-01 00:00:00")),
      transformExprs = Seq(
        "selectExpr:o_orderkey;o_orderstatus;o_totalprice;o_orderdate"),
      rowPolicies = Seq(RowPolicySpec("pos", "o_totalprice > 0", "ERR_FILE")),
      errDir = Some(s"$out/err"),
      rowCountRange = Some(0.0),
      branches = Seq(
        BranchSpec("all", None, Seq("o_orderkey", "o_totalprice"), s"$out/all"),
        BranchSpec("f_only", Some("o_orderstatus = 'F'"), Nil, s"$out/f")),
      stateDir = Some(s"$out/state"))

    val r1 = PipelineRunner.run(spark, spec, "run1")
    assert(r1.extracted > 0)
    assert(r1.branchCounts("all") == r1.extracted)
    assert(r1.committedWatermark.isDefined)

    // published output is readable and matches the branch predicate
    val f = spark.read.parquet(s"$out/f")
    assert(f.filter(col("o_orderstatus") =!= "F").count() == 0)

    // re-run: watermark advanced to max(o_orderdate), so nothing new
    val r2 = PipelineRunner.run(spark, spec, "run2")
    assert(r2.extracted == 0)
    // empty run preserves the previous watermark (QueryBasedSource:195-199)
    assert(r2.committedWatermark == r1.committedWatermark)
    val store = new StateStore(spark, s"$out/state")
    assert(store.highWatermark("e2e").contains(r1.committedWatermark.get))
  }

  test("single-pass metrics: exactly one action per sink, none for counting") {
    // err write + 2 branch writes = 3 SQL executions; every count
    // (extracted/rejected/branch/watermark) must come from observe()
    // metrics of those same actions, so any extra execution is a re-scan
    // regression (the runner used to issue ~7).
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.incrementAndGet(): Unit
          case _ =>
        }
    }
    val out = tmpDir("pipe-actions")
    val spec = PipelineSpec(
      name = "actions",
      source = SourceSpec(format = "parquet", path = s"$sf/orders.parquet"),
      rowPolicies = Seq(RowPolicySpec("pos", "o_totalprice > 0", "ERR_FILE")),
      errDir = Some(s"$out/err"),
      rowCountRange = Some(0.0),
      branches = Seq(
        BranchSpec("all", None, Seq("o_orderkey", "o_totalprice"), s"$out/all"),
        BranchSpec("f_only", Some("o_orderstatus = 'F'"), Nil, s"$out/f")))
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = PipelineRunner.run(spark, spec, "runActions")
      assert(r.extracted > 0 && r.branchCounts.size == 2)
      // listener events are async: wait for the count to stabilize
      var last = -1
      var stable = 0
      var i = 0
      while (stable < 5 && i < 100) {
        val c = execs.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(50); i += 1
      }
      assert(execs.get() == 3,
        s"expected 3 sink actions (err + 2 branches), saw ${execs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("commit-on-full-success: failed task policy leaves previous outputs intact") {
    import graft.operators.Fork
    val out = tmpDir("fork-staged")
    val orders = Tables.load(spark, sf, "orders")
    val branches = Seq(
      Fork.Branch("a", None, _.select("o_orderkey"), s"$out/a"),
      Fork.Branch("b", None, _.select("o_orderkey", "o_totalprice"), s"$out/b"))

    // run 1 publishes good data
    val r1 = Fork.run(orders, branches, "runGood")
    val rowsA = spark.read.parquet(s"$out/a").count()
    assert(rowsA == r1("a").written && rowsA > 0)

    // run 2 stages a DIFFERENT (smaller) dataset, then the task policy
    // (beforePromote) rejects it: both run-1 outputs must survive and the
    // staging dirs must be cleaned up
    val smaller = orders.limit(5)
    intercept[IllegalStateException] {
      Fork.run(smaller, branches, "runBad",
        beforePromote = counts =>
          if (counts("a").written != rowsA)
            throw new IllegalStateException("row-count policy failed"))
    }
    assert(spark.read.parquet(s"$out/a").count() == rowsA)
    assert(spark.read.parquet(s"$out/b").count() == rowsA)
    val stagingLeft = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith(".staging"))
    assert(stagingLeft.isEmpty, s"staging not cleaned: ${stagingLeft.mkString(",")}")

    // observed counts: routed sees pre-transform rows, written post-write
    assert(r1("b") == Fork.BranchResult(rowsA, rowsA))
  }

  test("declarative transform chain: grok/split/drop/rename") {
    val out = tmpDir("pipe-transforms")
    val spec = PipelineSpec(
      name = "transforms",
      source = SourceSpec(format = "parquet", path = s"$sf/orders.parquet"),
      transformExprs = Seq(
        "selectExpr:o_orderkey;o_orderpriority",
        "grok:o_orderpriority;%{INT:prio_num}-%{WORD:prio_name}",
        "drop:o_orderpriority",
        "rename:prio_num=pn",
        "filter:pn IS NOT NULL"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/main")))
    val r = PipelineRunner.run(spark, spec, "runT")
    val back = spark.read.parquet(s"$out/main")
    assert(back.columns.toSeq == Seq("o_orderkey", "pn", "prio_name"))
    assert(back.count() == r.extracted && r.extracted > 0)
  }

  test("declarative sample + stratified transforms") {
    val out = tmpDir("pipe-sample")
    val spec = PipelineSpec(
      name = "sampled",
      source = SourceSpec(format = "parquet", path = s"$sf/documents.parquet"),
      transformExprs = Seq("stratified:doc_id;lang;en=100;0"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/main")))
    val r = PipelineRunner.run(spark, spec, "runS")
    val back = spark.read.parquet(s"$out/main")
    // rate 100 keeps every 'en' doc, default 0 drops everything else
    assert(back.filter(col("lang") =!= "en").count() == 0)
    assert(back.count() == r.extracted && r.extracted > 0)

    val spec2 = spec.copy(name = "sampled2",
      transformExprs = Seq("sample:doc_id;1;2"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/mod")))
    val r2 = PipelineRunner.run(spark, spec2, "runS2")
    val mod = spark.read.parquet(s"$out/mod")
    assert(mod.filter(pmod(col("doc_id"), lit(2)) =!= 0).count() == 0)
    assert(r2.extracted > 0)
  }

  test("declarative dedup + scd2 + tiers + redact transforms") {
    val out = tmpDir("pipe-cdc")
    // events as a CDC changelog: dedup same-(user, ts) by event_id desc
    // happens INSIDE scd2 via its delta; the declarative scd2 (no delta)
    // composes with an explicit dedup step instead
    val spec = PipelineSpec(
      name = "cdc-history",
      source = SourceSpec(format = "parquet", path = s"$sf/events.parquet"),
      transformExprs = Seq(
        "selectExpr:user_id;ts;event_type;event_id",
        "dedup:user_id,ts;event_id.desc",
        "scd2:user_id;ts"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/main")))
    val r = PipelineRunner.run(spark, spec, "runCdc")
    val back = spark.read.parquet(s"$out/main")
    assert(back.columns.contains("valid_from") && back.columns.contains("valid_to"))
    assert(back.filter(col("valid_to").isNull).count() ==
      back.select("user_id").distinct().count(),
      "exactly one open version per key")
    assert(back.count() == r.extracted && r.extracted > 0)

    val spec2 = PipelineSpec(
      name = "tiered",
      source = SourceSpec(format = "parquet", path = s"$sf/documents.parquet"),
      transformExprs = Seq(
        "selectExpr:doc_id;n_chars;concat(text, ' mail me at a@b.com') AS text",
        "redact:text",
        "tiers:n_chars;3"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/tiers")))
    val r2 = PipelineRunner.run(spark, spec2, "runTier")
    val t = spark.read.parquet(s"$out/tiers")
    assert(t.filter(col("text").contains("a@b.com")).count() == 0,
      "injected email must be redacted")
    assert(t.filter(col("text").contains("<EMAIL>")).count() == r2.extracted)
    assert(t.select("tier").distinct().count() == 3)
  }

  test("declarative gapfill + maxrun transforms") {
    val out = tmpDir("pipe-gap")
    val spec = PipelineSpec(
      name = "gapfill",
      source = SourceSpec(format = "parquet", path = s"$sf/events.parquet"),
      transformExprs = Seq(
        "selectExpr:user_id;CAST(ts AS TIMESTAMP) AS ts;value",
        "gapfill:user_id;ts;1 hour;hour;value"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/main")))
    val r = PipelineRunner.run(spark, spec, "runGap")
    val back = spark.read.parquet(s"$out/main")
    assert(back.filter(col("value").isNull).count() == 0)
    assert(back.count() == r.extracted && r.extracted > 0)

    val spec2 = PipelineSpec(
      name = "maxrun",
      source = SourceSpec(format = "parquet", path = s"$sf/documents.parquet"),
      transformExprs = Seq(
        "maxrun:text=max_run",
        "filter:max_run < 3"), // drop looping docs declaratively
      branches = Seq(BranchSpec("main", None, Nil, s"$out/runs")))
    PipelineRunner.run(spark, spec2, "runMax")
    val t = spark.read.parquet(s"$out/runs")
    assert(t.columns.contains("max_run"))
    assert(t.agg(org.apache.spark.sql.functions.max("max_run")).head.getLong(0) < 3)
    assert(t.count() > 0)
  }

  test("declarative hashsplit transform cuts a train/val/test corpus") {
    val out = tmpDir("pipe-split")
    val spec = PipelineSpec(
      name = "split",
      source = SourceSpec(format = "parquet", path = s"$sf/documents.parquet"),
      transformExprs = Seq(
        "hashsplit:doc_id;train=80,val=10,test=10",
        "filter:split = 'train'"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/train")))
    val r = PipelineRunner.run(spark, spec, "runSplit")
    val back = spark.read.parquet(s"$out/train")
    assert(back.count() == r.extracted && r.extracted > 0)
    // matches the library call exactly
    val want = graft.Tables.load(spark, sf, "documents")
      .transform(graft.operators.Converters.hashSplit("doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .filter(col("split") === "train").count()
    assert(back.count() == want)
  }

  test("declarative winsorize, wsample, urlcanon and blockdomains transforms") {
    val out = tmpDir("pipe-w9")
    val spec = PipelineSpec(
      name = "clean",
      source = SourceSpec(format = "parquet", path = s"$sf/events.parquet"),
      transformExprs = Seq(
        "selectExpr:event_id;floor(value) AS v",
        "winsorize:v;5;95;vc",
        "selectExpr:event_id;vc;abs(vc) + 1 AS w",
        "wsample:event_id;w;200"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/main")))
    PipelineRunner.run(spark, spec, "runW9")
    val back = spark.read.parquet(s"$out/main")
    assert(back.count() == 200)
    assert(back.columns.contains("vc"))

    val spec2 = PipelineSpec(
      name = "urls",
      source = SourceSpec(format = "parquet", path = s"$sf/documents.parquet"),
      transformExprs = Seq(
        "selectExpr:doc_id;source;concat('http://', source, '.example.com/d?utm_source=x&id=', doc_id) AS url",
        "blockdomains:url;src1.example.com,src2.example.com",
        "urlcanon:url=curl"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/urls")))
    PipelineRunner.run(spark, spec2, "runW9u")
    val urls = spark.read.parquet(s"$out/urls")
    assert(urls.filter(col("source").isin("src1", "src2")).count() == 0,
      "blocked domains must be gone")
    assert(urls.count() > 0)
    assert(urls.filter(col("curl").contains("utm_source")).count() == 0,
      "canonical URLs must drop tracking params")
  }

  test("declarative encrypt/decrypt transforms round-trip through a key store") {
    val out = tmpDir("pipe-crypto")
    // 16-byte AES-128 key, hex JSON credential store
    val key = (0 until 16).map(i => f"${(i * 7 + 3) % 256}%02x").mkString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/keys.json"), s"""{"1": "$key"}""")
    val spec = PipelineSpec(
      name = "enc",
      source = SourceSpec(format = "parquet", path = s"$sf/documents.parquet"),
      transformExprs = Seq(
        "selectExpr:doc_id;text",
        s"encrypt:text;$out/keys.json"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/enc")))
    PipelineRunner.run(spark, spec, "runEnc")
    val enc = spark.read.parquet(s"$out/enc")
    val plain = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
    assert(enc.join(plain.withColumnRenamed("text", "orig"), "doc_id")
      .filter(col("text") === col("orig")).count() == 0,
      "ciphertext must differ from every plaintext")
    val spec2 = PipelineSpec(
      name = "dec",
      source = SourceSpec(format = "parquet", path = s"$out/enc"),
      transformExprs = Seq(s"decrypt:text;$out/keys.json"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/dec")))
    PipelineRunner.run(spark, spec2, "runDec")
    val roundTrip = spark.read.parquet(s"$out/dec")
      .withColumnRenamed("text", "rt")
    assert(roundTrip.join(plain, "doc_id")
      .filter(col("rt") =!= col("text")).count() == 0,
      "decrypt∘encrypt must be identity")
  }

  test("drift task policy: a shape-shifted publish is refused before visibility") {
    val out = tmpDir("pipe-drift")
    graft.Tables.load(spark, sf, "events").select("event_id", "value")
      .write.parquet(s"$out/ref")
    // dropping everything below the median halves the value mass →
    // TV far beyond the 200-permille gate
    val drifty = PipelineSpec(
      name = "drifty",
      source = SourceSpec(format = "parquet", path = s"$sf/events.parquet"),
      transformExprs = Seq("selectExpr:event_id;value", "filter:value > 35"),
      driftPolicy = Some(DriftPolicySpec("floor(value)", s"$out/ref", 200L)),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/main")))
    val e = intercept[Exception] { PipelineRunner.run(spark, drifty, "runDr") }
    assert(e.getMessage.contains("drift policy failed"), e.getMessage)
    assert(!new java.io.File(s"$out/main").exists, "nothing may publish")
    // the un-skewed pipeline passes the same gate and publishes
    val clean = drifty.copy(name = "clean",
      transformExprs = Seq("selectExpr:event_id;value"))
    PipelineRunner.run(spark, clean, "runDr2")
    assert(spark.read.parquet(s"$out/main").count() > 0)
    // properties face parses the policy
    val parsed = PipelineSpec.fromProperties(Map(
      "job.name" -> "p", "source.format" -> "parquet",
      "source.path" -> s"$sf/events.parquet",
      "taskpolicy.drift.bin" -> "floor(value)",
      "taskpolicy.drift.ref" -> s"$out/ref",
      "taskpolicy.drift.max.permille" -> "150",
      "fork.1.name" -> "main", "fork.1.out" -> s"$out/x"))
    assert(parsed.driftPolicy.contains(
      DriftPolicySpec("floor(value)", s"$out/ref", 150L)))
  }

  test("numeric (SIMPLE) watermark advances and is honored on re-run") {
    val out = tmpDir("pipe-numwm")
    val spec = PipelineSpec(
      name = "numwm",
      source = SourceSpec(format = "parquet", path = s"$sf/orders.parquet",
        watermarkColumn = Some("o_orderkey"),
        watermarkDefault = Some("0")),
      branches = Seq(BranchSpec("main", None, Seq("o_orderkey"), s"$out/main")),
      stateDir = Some(s"$out/state"))
    val r1 = PipelineRunner.run(spark, spec, "n1")
    assert(r1.extracted > 0)
    assert(r1.committedWatermark.exists(_.toLongOption.isDefined))
    val r2 = PipelineRunner.run(spark, spec, "n2")
    assert(r2.extracted == 0) // nothing above max(o_orderkey)
    assert(r2.committedWatermark == r1.committedWatermark)
  }

  test("FAIL row policy aborts the job and releases the cached source") {
    val out = tmpDir("pipefail")
    val spec = PipelineSpec(
      name = "failjob",
      source = SourceSpec(format = "parquet", path = s"$sf/orders.parquet"),
      rowPolicies = Seq(RowPolicySpec("nope", "o_totalprice < 0", "FAIL")),
      branches = Seq(BranchSpec("b", None, Nil, s"$out/b")))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    intercept[IllegalArgumentException] {
      PipelineRunner.run(spark, spec, "runX")
    }
    // the abort path must unpersist the MEMORY_AND_DISK source cache
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(cachedBefore))
  }

  test("declarative enrich: pull-config pipeline joins an HTTP endpoint") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    srv.setExecutor(pool)
    srv.createContext("/seg", (ex: com.sun.net.httpserver.HttpExchange) => {
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      val name = java.net.URLDecoder.decode(
        Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .stripPrefix("name="), "UTF-8")
      val b = (if (auth == "Bearer tok") name.toLowerCase else "DENIED")
        .getBytes("UTF-8")
      ex.sendResponseHeaders(if (auth == "Bearer tok") 200 else 403, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    srv.start()
    try {
      val out = tmpDir("pipe-enrich")
      val port = srv.getAddress.getPort
      // the whole pipeline from PROPERTIES, the reference's config shape
      val spec = PipelineSpec.fromProperties(Map(
        "job.name" -> "enriched",
        "source.path" -> s"$sf/customer.parquet",
        "transform.1" -> "selectExpr:c_custkey;c_mktsegment",
        "transform.2" -> (s"enrich:http://127.0.0.1:$port/seg?name=$${c_mktsegment};" +
          "maxInFlight=8;header.Authorization=Bearer tok;responseCol=segment_lc"),
        "transform.3" -> "drop:http_status",
        "fork.1.name" -> "main",
        "fork.1.out" -> s"$out/main"))
      val r = PipelineRunner.run(spark, spec, "runEnrich")
      val back = spark.read.parquet(s"$out/main")
      assert(back.columns.toSeq ==
        Seq("c_custkey", "c_mktsegment", "segment_lc"))
      assert(back.filter(lower(col("c_mktsegment")) =!= col("segment_lc"))
        .count() == 0)
      assert(r.extracted > 0 && back.count() == r.extracted)

      // a template referencing an unknown column is a SPEC error,
      // surfaced at plan time before any request is issued
      val badSpec = PipelineSpec.fromProperties(Map(
        "job.name" -> "enrich-bad",
        "source.path" -> s"$sf/customer.parquet",
        "transform.1" -> "selectExpr:c_custkey",
        "transform.2" -> s"enrich:http://127.0.0.1:$port/seg?name=$${nope}",
        "fork.1.name" -> "main",
        "fork.1.out" -> s"$out/bad"))
      val e = intercept[IllegalArgumentException] {
        PipelineRunner.run(spark, badSpec, "runEnrichBad")
      }
      assert(e.getMessage.contains("unknown column"), e.getMessage)

      // a typo'd option key refuses instead of being silently ignored
      val typoSpec = badSpec.copy(transformExprs = Seq(
        s"enrich:http://127.0.0.1:$port/seg?name=$${c_custkey};maxInflight=4"))
      val e2 = intercept[IllegalArgumentException] {
        PipelineRunner.run(spark, typoSpec, "runEnrichTypo")
      }
      assert(e2.getMessage.contains("unknown enrich option"), e2.getMessage)
    } finally { srv.stop(0); pool.shutdownNow(); () }
  }

  test("declarative lineclean transform applies the C4 line + page rules") {
    val out = tmpDir("pipe-lineclean")
    val spec = PipelineSpec(
      name = "c4",
      source = SourceSpec(format = "parquet", path = s"$sf/documents.parquet"),
      transformExprs = Seq(
        "selectExpr:doc_id;concat('A good line one.\\n', text, " +
          "'\\nenable javascript now.', " +
          "CASE WHEN doc_id % 2 = 0 THEN '\\nSecond fine line here!' " +
          "ELSE '\\nbrace { page.' END) AS text",
        "lineclean:text;3;2"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/main")))
    PipelineRunner.run(spark, spec, "runLineClean")
    val back = spark.read.parquet(s"$out/main")
    // odd doc_ids carry a surviving brace line -> their pages dropped
    assert(back.count() > 0)
    assert(back.filter(col("doc_id") % 2 =!= 0).count() == 0, "brace pages kept")
    assert(back.filter(lower(col("text")).contains("javascript")).count() == 0)
  }

  test("declarative media transforms: real decode features + image dedup") {
    val media = tmpDir("pipe-media")
    val out = tmpDir("pipe-media-out")
    graft.multimodal.Multimodal.syntheticImageVariants(spark,
      spark.read.parquet(s"$sf/documents.parquet"), groups = 25)
      .write.parquet(s"$media/images")

    // mediafeatures: REAL ImageIO decode through the converter chain
    PipelineRunner.run(spark, PipelineSpec(
      name = "media-feats",
      source = SourceSpec(format = "parquet", path = s"$media/images"),
      transformExprs = Seq("mediafeatures:4"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/feats"))),
      "runMediaFeats")
    val feats = spark.read.parquet(s"$out/feats")
    assert(feats.filter(col("width") < 16 || col("height") < 16).count() == 0)
    assert(feats.count() == 500)

    // imagededup:near;3 recovers the planted groups declaratively
    PipelineRunner.run(spark, PipelineSpec(
      name = "media-dedup",
      source = SourceSpec(format = "parquet", path = s"$media/images"),
      transformExprs = Seq("imagededup:near;3"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/clusters"))),
      "runMediaDedup")
    val clusters = spark.read.parquet(s"$out/clusters")
    assert(clusters.filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(25L))).count() == 0)

    // media-dump SOURCE: real files on disk -> decode -> parquet, one
    // declarative pipeline (the crawl-dump ingestion shape end-to-end)
    val dump = tmpDir("pipe-media-dump")
    val bi = new java.awt.image.BufferedImage(10, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", baos)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dump/x.png"),
      baos.toByteArray)
    PipelineRunner.run(spark, PipelineSpec(
      name = "media-ingest",
      source = SourceSpec(format = "media", path = dump),
      transformExprs = Seq("mediafeatures:2"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/ingested"))),
      "runMediaIngest")
    val ing = spark.read.parquet(s"$out/ingested")
    assert(ing.count() == 1)
    assert(ing.select("width", "height").collect()(0).toSeq == Seq(10, 6))

    // bad spec refuses at transform time
    val e = intercept[IllegalArgumentException] {
      PipelineRunner.run(spark, PipelineSpec(
        name = "media-bad",
        source = SourceSpec(format = "parquet", path = s"$media/images"),
        transformExprs = Seq("imagededup:fuzzy"),
        branches = Seq(BranchSpec("main", None, Nil, s"$out/bad"))),
        "runMediaBad")
    }
    assert(e.getMessage.contains("imagededup"), e.getMessage)
  }

  test("declarative mediadedup + gifframes cover every modality") {
    val media = tmpDir("pipe-mm")
    val out = tmpDir("pipe-mm-out")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    graft.multimodal.Multimodal.syntheticAudioNearVariants(spark, docs,
      groups = 20).write.parquet(s"$media/audio")
    graft.multimodal.Multimodal.syntheticGifVariants(spark, docs,
      groups = 20).write.parquet(s"$media/video")
    graft.multimodal.Multimodal.syntheticImageResVariants(spark, docs,
      groups = 20).write.parquet(s"$media/res")

    // audio near-dup clusters as a declarative hop
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-audio",
      source = SourceSpec(format = "parquet", path = s"$media/audio"),
      transformExprs = Seq("mediadedup:audio;near;8"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/audio"))),
      "runMmAudio")
    assert(spark.read.parquet(s"$out/audio").filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)

    // video exact groups as a declarative hop
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-video",
      source = SourceSpec(format = "parquet", path = s"$media/video"),
      transformExprs = Seq("mediadedup:video;near;4"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/video"))),
      "runMmVideo")
    assert(spark.read.parquet(s"$out/video").filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)

    // image keep-best survivors as a declarative hop
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-best",
      source = SourceSpec(format = "parquet", path = s"$media/res"),
      transformExprs = Seq("mediadedup:image;best;3"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/best"))),
      "runMmBest")
    val best = spark.read.parquet(s"$out/best")
    assert(best.count() == 20 && best.filter(col("width") =!= 36).count() == 0)

    // video keep-LONGEST survivors + frame-overlap clusters as hops
    graft.multimodal.Multimodal.syntheticGifOverlapVariants(spark,
      docs.filter(col("doc_id") < 120), groups = 20)
      .write.parquet(s"$media/overlap")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-vbest",
      source = SourceSpec(format = "parquet", path = s"$media/overlap"),
      transformExprs = Seq("mediadedup:video;best;2"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/vbest"))),
      "runMmVBest")
    val vbest = spark.read.parquet(s"$out/vbest")
    assert(vbest.count() == 20 &&
      vbest.filter(col("n_frames") =!= 6).count() == 0)
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-voverlap",
      source = SourceSpec(format = "parquet", path = s"$media/overlap"),
      transformExprs = Seq("mediadedup:video;overlap;2"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/voverlap"))),
      "runMmVOverlap")
    assert(spark.read.parquet(s"$out/voverlap").filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)

    // fps-invariant exact groups as a hop: the VFR render and its
    // constant-rate re-render collapse to one group per timeline
    graft.multimodal.Multimodal.syntheticVfrVariants(spark,
      docs.filter(col("doc_id") < 80), groups = 20)
      .write.parquet(s"$media/vfr")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-vfps",
      source = SourceSpec(format = "parquet", path = s"$media/vfr"),
      transformExprs = Seq("mediadedup:video;fps;10"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/vfps"))),
      "runMmVFps")
    assert(spark.read.parquet(s"$out/vfps").filter(
      col("group_rep") =!= pmod(col("media_id"), lit(20L))).count() == 0)

    // shift-tolerant audio clusters as a hop
    graft.multimodal.Multimodal.syntheticAudioShiftVariants(spark,
      docs.filter(col("doc_id") < 60), groups = 10)
      .write.parquet(s"$media/shift")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-ashift",
      source = SourceSpec(format = "parquet", path = s"$media/shift"),
      transformExprs = Seq("mediadedup:audio;shift;2;400;400"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/ashift"))),
      "runMmAShift")
    assert(spark.read.parquet(s"$out/ashift").filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(10L))).count() == 0)

    // keep-longest audio survivors as a hop: the base render (4 content
    // windows, min id) survives each shift cluster
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-abest",
      source = SourceSpec(format = "parquet", path = s"$media/shift"),
      transformExprs = Seq("mediadedup:audio;best;2;400;400"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/abest"))),
      "runMmABest")
    val abest = spark.read.parquet(s"$out/abest")
    assert(abest.count() == 10 &&
      abest.filter(col("n_windows") =!= 4).count() == 0 &&
      abest.filter(col("media_id") >= 10).count() == 0)

    // crop-tolerant image clusters as a hop
    graft.multimodal.Multimodal.syntheticImageCropVariants(spark,
      docs.filter(col("doc_id") < 60), groups = 20)
      .write.parquet(s"$media/crop")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-crop",
      source = SourceSpec(format = "parquet", path = s"$media/crop"),
      transformExprs = Seq("mediadedup:image;crop;2;16;16"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/crop"))),
      "runMmCrop")
    assert(spark.read.parquet(s"$out/crop").filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)

    // rotation-tolerant image clusters as a hop
    graft.multimodal.Multimodal.syntheticImageRotationVariants(spark,
      docs.filter(col("doc_id") < 80), groups = 20)
      .write.parquet(s"$media/rot")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-rot",
      source = SourceSpec(format = "parquet", path = s"$media/rot"),
      transformExprs = Seq("mediadedup:image;rot;2"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/rot"))),
      "runMmRot")
    assert(spark.read.parquet(s"$out/rot").filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)

    // videoscenes: shot-boundary rows as a hop
    graft.multimodal.Multimodal.syntheticGifSceneVariants(spark,
      docs.filter(col("doc_id") < 40))
      .write.parquet(s"$media/scenes")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-scenes",
      source = SourceSpec(format = "parquet", path = s"$media/scenes"),
      transformExprs = Seq("videoscenes:8"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/scenes"))),
      "runMmScenes")
    assert(spark.read.parquet(s"$out/scenes").filter(
      col("start_frame") =!= col("scene_idx") * 2 ||
        col("scene_frames") =!= 2).count() == 0)

    // audiosegments: utterance rows as a hop
    graft.multimodal.Multimodal.syntheticAudioSegmentVariants(spark,
      docs.filter(col("doc_id") < 40))
      .write.parquet(s"$media/useg")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-useg",
      source = SourceSpec(format = "parquet", path = s"$media/useg"),
      transformExprs = Seq("audiosegments:400"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/useg"))),
      "runMmUseg")
    assert(spark.read.parquet(s"$out/useg").filter(
      col("start_window") =!= col("segment_idx") * 3 ||
        col("n_windows") =!= 2).count() == 0)

    // mediasplit: leak-safe perceptual-cluster split as a hop (the
    // variants fixture plants near-dups under the PLAIN dHash the split
    // keys on — the rotation fixture's members are deliberately far)
    graft.multimodal.Multimodal.syntheticImageVariants(spark,
      docs.filter(col("doc_id") < 100), groups = 20)
      .write.parquet(s"$media/vsplit")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-split",
      source = SourceSpec(format = "parquet", path = s"$media/vsplit"),
      transformExprs = Seq("mediasplit:image;3;train:80,val:10,test:10"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/msplit"))),
      "runMmSplit")
    val msplit = spark.read.parquet(s"$out/msplit")
    assert(msplit.filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)
    assert(graft.text.LeakSafeSplit.leakage(msplit, "cluster_id").isEmpty)

    // keyframes: scene keyframes as image rows, declaratively
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-keyframes",
      source = SourceSpec(format = "parquet", path = s"$media/scenes"),
      transformExprs = Seq("keyframes:8"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/keyframes"))),
      "runMmKeyframes")
    val kfr = spark.read.parquet(s"$out/keyframes")
    assert(kfr.filter(col("media_type") =!= "image").count() == 0)
    assert(kfr.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() == 0)

    // pairedcuration: caption + eval side inputs by parquet path
    val docsSlice = docs.filter(col("doc_id") < 100)
    graft.multimodal.Multimodal.syntheticMediaPipelineMix(spark, docsSlice)
      .filter(col("media_type") === "image")
      .write.parquet(s"$media/pairimgs")
    docsSlice.write.parquet(s"$media/captions")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-paired",
      source = SourceSpec(format = "parquet", path = s"$media/pairimgs"),
      transformExprs = Seq(
        s"pairedcuration:$media/captions;200;3"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/paired"))),
      "runMmPaired")
    val paired = spark.read.parquet(s"$out/paired")
    assert(paired.count() == 100)
    assert(paired.filter(col("stage") === "media_gated")
      .filter(pmod(col("media_id"), lit(5L)) =!= 0).count() == 0)

    // capeval=: caption-text decontamination as a hop option — eval
    // captions (ids % 50 = 0) self-flag their own pairs at minimum
    docsSlice.filter(col("doc_id") % 50 === 0)
      .write.parquet(s"$media/capeval")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-paired-capeval",
      source = SourceSpec(format = "parquet", path = s"$media/pairimgs"),
      transformExprs = Seq(
        s"pairedcuration:$media/captions;200;3;capeval=$media/capeval"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/pairedcap"))),
      "runMmPairedCapEval")
    val pairedCap = spark.read.parquet(s"$out/pairedcap")
    assert(pairedCap.count() == 100)
    // the contaminated stage equals the independent gram recompute
    // (restricted to length-gate survivors — caption_gated wins ties)
    val shingles = graft.dedup.MinHashDedup.shingles(col("text"), 4)
    val benchGrams = docsSlice.filter(col("doc_id") % 50 === 0)
      .select(explode(shingles).as("g")).distinct()
    val wantLeak = docsSlice.filter(col("n_chars") >= 200)
      .select(col("doc_id"), explode(shingles).as("g"))
      .join(broadcast(benchGrams), "g").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val gotLeak = pairedCap.filter(col("stage") === "caption_contaminated")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(gotLeak == wantLeak, s"${gotLeak.size} vs ${wantLeak.size}")

    // bytes: zero-decode byte-exact survivors chain into a perceptual hop
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-bytes",
      source = SourceSpec(format = "parquet", path = s"$media/vsplit"),
      transformExprs = Seq("mediadedup:bytes", "mediadedup:image;exact"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/bytes"))),
      "runMmBytes")
    // 100 ids under groups=20 -> 40 byte-distinct (id % 40: texture
    // group x perturbation parity) -> image-exact groups over the byte
    // survivors (ids 0..39)
    val bytesOut = spark.read.parquet(s"$out/bytes")
    assert(bytesOut.count() == 40)
    assert(bytesOut.filter(col("media_id") >= 40).count() == 0)

    // sharp: variance-of-Laplacian blur gate as a hop
    graft.multimodal.Multimodal.syntheticImageBlurMix(spark,
      docs.filter(col("doc_id") < 60))
      .write.parquet(s"$media/blur")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-sharp",
      source = SourceSpec(format = "parquet", path = s"$media/blur"),
      transformExprs = Seq("mediafilter:sharp"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/sharp"))),
      "runMmSharp")
    assert(spark.read.parquet(s"$out/sharp").filter(
      pmod(col("media_id"), lit(3L)) === 0).count() == 0)

    // cropbars + mediascrub: normalization/compliance passes as hops
    graft.multimodal.Multimodal.syntheticImageBarMix(spark,
      docs.filter(col("doc_id") < 81))
      .write.parquet(s"$media/bars")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-cropbars",
      source = SourceSpec(format = "parquet", path = s"$media/bars"),
      transformExprs = Seq("cropbars"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/cropbars"))),
      "runMmCropbars")
    val croppedDims = graft.multimodal.ImageDedup.hashImagesWithDims(
      spark.read.parquet(s"$out/cropbars"))
    assert(croppedDims.filter(col("width") =!= 24 || col("height") =!= 24)
      .count() == 0)
    graft.multimodal.Multimodal.syntheticImagesWithMetadata(spark,
      docs.filter(col("doc_id") < 40))
      .write.parquet(s"$media/meta")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-scrub",
      source = SourceSpec(format = "parquet", path = s"$media/meta"),
      transformExprs = Seq("mediascrub"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/scrubbed"))),
      "runMmScrub")
    assert(graft.multimodal.MediaScrub.scrubReport(
      spark.read.parquet(s"$out/scrubbed"))
      .filter(col("had_metadata")).count() == 0)

    // mp4audio: the ISO-BMFF soundtrack demux as a hop, chained after
    // mediascrub (which wipes the planted udta/trailing smuggling in
    // the same pass — mp4 dispatch rides the existing hop)
    graft.multimodal.Multimodal.syntheticM4aAudio(spark,
      docs.filter(col("doc_id") < 40), plantMetadata = true)
      .write.parquet(s"$media/m4a")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-mp4audio",
      source = SourceSpec(format = "parquet", path = s"$media/m4a"),
      transformExprs = Seq("mediascrub", "mp4audio"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/m4atracks"))),
      "runMmMp4Audio")
    val m4aTracks = spark.read.parquet(s"$out/m4atracks")
    assert(graft.multimodal.MediaQuality.audioSignals(m4aTracks)
      .filter(col("n_frames") =!=
        pmod(col("media_id"), lit(800L)) + 800L).count() == 0)

    // mkvaudio: the Matroska face of the soundtrack demux, chained
    // after mediascrub (which Void-wipes the planted Tags and strips
    // trailing smuggling in the same pass — EBML dispatch rides the
    // existing hop). The audio fixture has no metadata variant, so the
    // scrub is a pass-through proof there too
    graft.multimodal.Multimodal.syntheticMkvAudio(spark,
      docs.filter(col("doc_id") < 40))
      .write.parquet(s"$media/mkva")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-mkvaudio",
      source = SourceSpec(format = "parquet", path = s"$media/mkva"),
      transformExprs = Seq("mediascrub", "mkvaudio"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/mkvtracks"))),
      "runMmMkvAudio")
    val mkvTracks = spark.read.parquet(s"$out/mkvtracks")
    assert(graft.multimodal.MediaQuality.audioSignals(mkvTracks)
      .filter(col("n_frames") =!=
        pmod(col("media_id"), lit(800L)) + 800L).count() == 0)

    // imagetranscode: format normalization as a hop — the PNG corpus
    // re-encodes as in-JVM VP8L webp and the outputs REALLY decode
    graft.multimodal.Multimodal.syntheticImages(spark,
      docs.filter(col("doc_id") < 30))
      .write.parquet(s"$media/pngs")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-transcode",
      source = SourceSpec(format = "parquet", path = s"$media/pngs"),
      transformExprs = Seq("imagetranscode:webp"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/webps"))),
      "runMmTranscode")
    val webpRows = spark.read.parquet(s"$out/webps")
    assert(webpRows.filter(col("mime") =!= "image/webp").count() == 0)
    val webpDims = graft.multimodal.ImageDedup.hashImagesWithDims(webpRows)
    assert(webpDims.filter(
      col("width") =!= pmod(col("media_id"), lit(32L)) + 16 ||
        col("height") =!= pmod(col("media_id"), lit(24L)) + 16).count() == 0)

    // captioncues: SRT/WebVTT sidecars exploded into timed rows
    graft.multimodal.Multimodal.syntheticCaptionTracks(spark,
      docs.filter(col("doc_id") < 20))
      .write.parquet(s"$media/cuetracks")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-captions",
      source = SourceSpec(format = "parquet", path = s"$media/cuetracks"),
      transformExprs = Seq("captioncues"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/cues"))),
      "runMmCaptions")
    val cueRows = spark.read.parquet(s"$out/cues")
    assert(cueRows.filter(col("t_end_ms") =!= col("t_start_ms") + 1500)
      .count() == 0)
    assert(cueRows.count() ==
      (0L until 20L).map(id => 1 + (id % 4)).sum)

    // fpssample + aspectbuckets: sampling and packing as hops
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-fps",
      source = SourceSpec(format = "parquet", path = s"$media/scenes"),
      transformExprs = Seq("fpssample:5"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/fps"))),
      "runMmFps")
    assert(spark.read.parquet(s"$out/fps").filter(
      col("frame_idx") =!= col("tick") * 2 ||
        col("t_ms") =!= col("tick") * 200).count() == 0)
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-ab",
      source = SourceSpec(format = "parquet", path = s"$media/meta"),
      transformExprs = Seq("aspectbuckets:1:1,16:9"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/ab"))),
      "runMmAb")
    assert(spark.read.parquet(s"$out/ab")
      .filter(!col("bucket").isin("1:1", "16:9")).count() == 0)

    // audioresample: rate normalization as a hop
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-resample",
      source = SourceSpec(format = "parquet", path = s"$media/shift"),
      transformExprs = Seq("audioresample:16000"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/resampled"))),
      "runMmResample")
    val res16 = spark.read.parquet(s"$out/resampled")
    assert(graft.multimodal.MediaQuality.audioSignals(res16)
      .filter(col("n_frames") % 2 =!= 0).count() == 0) // frames doubled

    // gifframes: real per-frame sampling as a declarative hop
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-frames",
      source = SourceSpec(format = "parquet", path = s"$media/video"),
      transformExprs = Seq("gifframes:2;4"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/frames"))),
      "runMmFrames")
    val frames = spark.read.parquet(s"$out/frames")
    // 4 frames sampled every 2nd -> 2 rows per video
    assert(frames.groupBy("media_id").count()
      .filter(col("count") =!= 2).count() == 0)

    // framecard: the one-decode composed card as a hop
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-framecard",
      source = SourceSpec(format = "parquet", path = s"$media/video"),
      transformExprs = Seq("framecard:2"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/framecard"))),
      "runMmFramecard")
    assert(spark.read.parquet(s"$out/framecard")
      .filter(col("n_sampled") =!= 2).count() == 0)

    // mediaembed: decoded features become embeddings the vector stack
    // consumes — prove it by running the existing brute-force ANN over
    // the hop's output (same-content images land identical vectors)
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-embed",
      source = SourceSpec(format = "parquet", path = s"$media/res"),
      transformExprs = Seq("mediaembed:8"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/embed"))),
      "runMmEmbed")
    val emb = spark.read.parquet(s"$out/embed")
    assert(emb.columns.toSeq == Seq("media_id", "embedding"))
    val topk = graft.ann.Ann.bruteForceTopK(emb,
      emb.filter(col("media_id") < 2), "media_id", "embedding", k = 3)
    assert(topk.groupBy("query_id").count().filter(col("count") =!= 3)
      .count() == 0)

    // mediafilter: quality gates drop planted defects declaratively
    graft.multimodal.Multimodal.syntheticImageQualityMix(spark, docs)
      .write.parquet(s"$media/qmix")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-filter",
      source = SourceSpec(format = "parquet", path = s"$media/qmix"),
      transformExprs = Seq("mediafilter:image"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/filtered"))),
      "runMmFilter")
    val filtered = spark.read.parquet(s"$out/filtered")
    assert(filtered.filter(pmod(col("media_id"), lit(5L)) === 0 ||
      pmod(col("media_id"), lit(11L)) === 0 ||
      pmod(col("media_id"), lit(7L)) === 0).count() == 0)
    assert(filtered.count() > 0)

    // mediafilter:video — single-frame, static and 40 ms clips drop
    graft.multimodal.Multimodal.syntheticVideoQualityMix(spark, docs)
      .write.parquet(s"$media/vqmix")
    PipelineRunner.run(spark, PipelineSpec(
      name = "mm-vfilter",
      source = SourceSpec(format = "parquet", path = s"$media/vqmix"),
      transformExprs = Seq("mediafilter:video"),
      branches = Seq(BranchSpec("main", None, Nil, s"$out/vfiltered"))),
      "runMmVFilter")
    val vfiltered = spark.read.parquet(s"$out/vfiltered")
    assert(vfiltered.filter(pmod(col("media_id"), lit(5L)) === 0 ||
      pmod(col("media_id"), lit(11L)) === 0 ||
      pmod(col("media_id"), lit(7L)) === 0).count() == 0)
    assert(vfiltered.count() > 0)

    // unknown modality refuses loudly
    val e = intercept[IllegalArgumentException] {
      PipelineRunner.run(spark, PipelineSpec(
        name = "mm-bad",
        source = SourceSpec(format = "parquet", path = s"$media/audio"),
        transformExprs = Seq("mediadedup:text;near;4"),
        branches = Seq(BranchSpec("main", None, Nil, s"$out/bad"))),
        "runMmBad")
    }
    assert(e.getMessage.contains("mediadedup"), e.getMessage)
  }
}
