package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Dedup / retention / purge / copy-diff — the data-organization jobs. */
class DataOrgSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem = Tables.load(spark, sf, "lineitem")

  test("keyDeltaTop1 keeps one record per key, max by delta") {
    val df = Seq(
      (1, "a", 10), (1, "b", 20), (2, "c", 5)
    ).toDF("k", "v", "delta")
    val out = Dedup.keyDeltaTop1(Seq("k"), Seq(col("delta").desc))(df)
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "b") // max delta for k=1
  }

  test("keyDeltaTop1 on lineitem never exceeds distinct key count") {
    val out = Dedup.keyDeltaTop1(Seq("l_orderkey", "l_linenumber"),
      Seq(col("l_shipdate").desc, col("l_extendedprice").desc))(lineitem)
    assert(out.count() ==
      lineitem.select("l_orderkey", "l_linenumber").distinct().count())
  }

  test("exact dedup equals distinct") {
    assert(Dedup.exact()(lineitem).count() == lineitem.distinct().count())
  }

  test("threshold verifier gates recompaction") {
    assert(Dedup.thresholdVerify(30, 100, 0.2))
    assert(!Dedup.thresholdVerify(10, 100, 0.2))
  }

  test("retention newestK keeps K per dataset") {
    val versions = Seq(
      ("d1", Timestamp.valueOf("2024-01-01 00:00:00"), "p1"),
      ("d1", Timestamp.valueOf("2024-01-02 00:00:00"), "p2"),
      ("d1", Timestamp.valueOf("2024-01-03 00:00:00"), "p3"),
      ("d2", Timestamp.valueOf("2024-01-01 00:00:00"), "p4")
    ).toDF("dataset", "ts", "path")
    val out = Retention.newestK(Seq("dataset"),
      Seq(col("ts").desc, col("path").desc), 2)(versions)
    assert(out.count() == 3)
    assert(out.filter($"path" === "p1").count() == 0) // oldest d1 dropped
  }

  test("retention newerThan filters by cutoff; delete set is the complement") {
    val versions = Seq(
      ("d1", Timestamp.valueOf("2024-01-01 00:00:00"), "p1"),
      ("d1", Timestamp.valueOf("2024-06-01 00:00:00"), "p2")
    ).toDF("dataset", "ts", "path")
    val survivors = Retention.newerThan("ts",
      Timestamp.valueOf("2024-03-01 00:00:00"))(versions)
    assert(survivors.count() == 1)
    val deletes = Retention.deleteSet(versions, survivors, Seq("path"))
    assert(deletes.select("path").as[String].collect().toSeq == Seq("p1"))
  }

  test("retention combine intersect/union") {
    val versions = Seq(
      ("d1", Timestamp.valueOf("2024-01-01 00:00:00"), "p1"),
      ("d1", Timestamp.valueOf("2024-06-01 00:00:00"), "p2"),
      ("d1", Timestamp.valueOf("2024-07-01 00:00:00"), "p3")
    ).toDF("dataset", "ts", "path")
    val newest1 = Retention.newestK(Seq("dataset"), Seq(col("ts").desc), 1) _
    val newer = Retention.newerThan("ts", Timestamp.valueOf("2024-03-01 00:00:00")) _
    assert(Retention.combineIntersect(Seq(newest1, newer))(versions).count() == 1)
    assert(Retention.combineUnion(Seq(newest1, newer))(versions).count() == 2)
  }

  test("purge removes listed keys only") {
    val cust = Tables.load(spark, sf, "customer")
    val deletes = cust.filter($"c_custkey" % 7 === 0).select("c_custkey")
    val out = Purge.purge(cust, deletes, Seq("c_custkey"))
    assert(out.count() == cust.count() - deletes.distinct().count())
    assert(Purge.purged(cust, deletes, Seq("c_custkey")).count() ==
      deletes.distinct().count())
  }

  test("copy diff finds files missing at target") {
    val src = Seq(("/a", 1L), ("/b", 2L), ("/c", 3L)).toDF("path", "length")
    val dst = Seq(("/a", 1L), ("/b", 99L)).toDF("path", "length") // /b differs
    val out = CopyDiff.diff(src, dst).orderBy("path").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("/b", "/c"))
  }

  test("allocateUnderBudget keeps the highest-priority prefix") {
    val files = Seq(("/a", 10L, 1), ("/b", 10L, 2), ("/c", 10L, 3))
      .toDF("path", "length", "prio")
    val out = CopyDiff.allocateUnderBudget(files, "length",
      "prio", ascending = true, budgetBytes = 25L)
    assert(out.select("path").as[String].collect().toSet == Set("/a", "/b"))
  }

  test("allocateUnderBudget distributed prefix-sum matches a global window") {
    // 1000 files, distinct priorities -> result must equal the naive
    // single-task global-window allocation, without using one
    val files = spark.range(1000)
      .select(concat(lit("/f"), col("id")).as("path"),
        (pmod(col("id") * 37, lit(100)) + 1).as("length"),
        pmod(col("id") * 7919, lit(100000)).as("prio"))
    val budget = 9000L
    val got = CopyDiff.allocateUnderBudget(files, "length",
      "prio", ascending = true, budgetBytes = budget)
    // reference result via driver-side sort (test-only oracle)
    val all = files.orderBy(col("prio").asc)
      .select("path", "length").as[(String, Long)].collect()
    var acc = 0L
    val expect = all.takeWhile { case (_, l) => acc += l; acc <= budget }
      .map(_._1).toSet
    assert(got.select("path").as[String].collect().toSet == expect)
    // descending direction too
    val gotDesc = CopyDiff.allocateUnderBudget(files, "length",
      "prio", ascending = false, budgetBytes = budget)
    var acc2 = 0L
    val expectDesc = files.orderBy(col("prio").desc)
      .select("path", "length").as[(String, Long)].collect()
      .takeWhile { case (_, l) => acc2 += l; acc2 <= budget }.map(_._1).toSet
    assert(gotDesc.select("path").as[String].collect().toSet == expectDesc)
    // the plan must not contain a partition-less (global) Window
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      "global (partition-less) window found in plan")
  }

  test("copy executor streams bytes, renames into place, re-runs are idempotent") {
    val base = tmpDir("copyexec")
    val srcDir = new java.io.File(s"$base/src"); srcDir.mkdirs()
    val files = (1 to 5).map { i =>
      val f = new java.io.File(srcDir, s"f$i.bin")
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](1000 * i)(i.toByte))
      f
    }
    val tasks = files.map(f => CopyExec.CopyTask(
      f.getAbsolutePath, s"$base/dst/${f.getName}", f.length())).toDS()
    val s1 = CopyExec.execute(tasks, parallelism = 2)
    assert(s1 == CopyExec.CopyStats(5, 0, files.map(_.length()).sum))
    files.foreach { f =>
      val dst = java.nio.file.Paths.get(s"$base/dst/${f.getName}")
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(dst),
        java.nio.file.Files.readAllBytes(f.toPath)))
    }
    // re-run copies nothing (length match short-circuits)
    val s2 = CopyExec.execute(tasks, parallelism = 2)
    assert(s2 == CopyExec.CopyStats(0, 5, 0))
    // a truncated target is repaired
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/dst/f1.bin"), Array[Byte](9))
    val s3 = CopyExec.execute(tasks)
    assert(s3.filesCopied == 1 && s3.filesSkipped == 4)
  }

  test("listManifest walks a directory tree") {
    val dir = tmpDir("manifest")
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/t1")
    val m = CopyDiff.listManifest(spark, dir)
    assert(m.count() > 0)
    assert(m.columns.toSeq == Seq("path", "length", "mod_time"))
  }

  test("purgePartitioned rewrites only affected partitions, drops emptied ones") {
    val dir = tmpDir("purge-part")
    Seq((1L, "a", "P1"), (2L, "b", "P1"), (3L, "c", "P2"), (4L, "d", "P3"))
      .toDF("k", "v", "part").write.mode("overwrite")
      .partitionBy("part").parquet(dir)
    def filesOf(p: String) = Option(new java.io.File(s"$dir/part=$p").list())
      .map(_.toSet).getOrElse(Set.empty[String])
    val untouchedBefore = filesOf("P3")

    // P2 is fully purged (must vanish), P1 partially, P3 untouched
    val deletes = Seq(1L, 3L).toDF("k")
    val stats = Purge.purgePartitioned(spark, dir, "part", deletes, Seq("k"))
    assert(stats.affected.toSet == Set("P1", "P2"))
    assert(stats.removed == Seq("P2"))
    val back = spark.read.parquet(dir)
    assert(back.select("k").as[Long].collect().toSet == Set(2L, 4L))
    assert(filesOf("P2").isEmpty)
    assert(filesOf("P3") == untouchedBefore, "unaffected partition was rewritten")
  }

  test("purgePartitioned keepBackup parks displaced partitions; restore undoes one") {
    import graft.sinks.AtomicPublisher
    val dir = tmpDir("purge-backup")
    Seq((1L, "a", "P1"), (2L, "b", "P1"), (3L, "c", "P2"))
      .toDF("k", "v", "part").write.mode("overwrite")
      .partitionBy("part").parquet(dir)
    val deletes = Seq(1L, 3L).toDF("k") // row from P1; ALL of P2
    Purge.purgePartitioned(spark, dir, "part", deletes, Seq("k"),
      keepBackup = true)
    // purge took effect and backups exist (including the emptied P2)
    assert(spark.read.parquet(dir).select("k").collect().map(_.getLong(0))
      .toSeq == Seq(2L))
    assert(new java.io.File(s"$dir/.old-part=P1").exists)
    assert(new java.io.File(s"$dir/.old-part=P2").exists)
    // the purge was wrong: restore P1 to its pre-purge content
    AtomicPublisher.restoreBackup(spark, s"$dir/part=P1")
    assert(spark.read.parquet(dir).select("k").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L))
    // the backup still contains the purged subject — compliance deletion
    // completes only when backups age out (the documented contract)
    AtomicPublisher.restoreBackup(spark, s"$dir/part=P2")
    assert(spark.read.parquet(dir).select("k").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("purgePartitioned handles escaped and null partition values") {
    val dir = tmpDir("purge-esc")
    // 'A:B' is stored Hive-escaped (part=A%3AB); null lands in
    // __HIVE_DEFAULT_PARTITION__ and never matches isin
    Seq((1L, Some("A:B")), (2L, Some("A:B")), (3L, None), (4L, Some("OK")))
      .toDF("k", "part").write.mode("overwrite")
      .partitionBy("part").parquet(dir)
    val deletes = Seq(1L, 2L, 3L).toDF("k")
    val stats = Purge.purgePartitioned(spark, dir, "part", deletes, Seq("k"))
    assert(stats.removed.toSet == Set("A:B", null))
    assert(spark.read.parquet(dir).select("k").as[Long].collect().toSet == Set(4L))
    assert(!new java.io.File(s"$dir/part=A%3AB").exists())
    assert(!new java.io.File(s"$dir/part=__HIVE_DEFAULT_PARTITION__").exists())
  }

  test("saltedJoin equals the plain join (inner and left), salt never leaks") {
    // a skewed fact: every row of key 1 plus a thin tail
    val fact = (Seq.fill(500)((1L, "hot")) ++ Seq((2L, "a"), (3L, "b"), (9L, "no-dim")))
      .toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "unused"))
      .toDF("dk", "w")
    val plainInner = fact.join(dim, col("k") === col("dk")).drop("dk")
    val saltedInner = Skew.saltedJoin(fact, dim, "k", "dk", salts = 7)
    assert(saltedInner.columns.toSeq == plainInner.columns.toSeq)
    assert(saltedInner.exceptAll(plainInner).count() == 0)
    assert(plainInner.exceptAll(saltedInner).count() == 0)

    val plainLeft = fact.join(dim, col("k") === col("dk"), "left").drop("dk")
    val saltedLeft = Skew.saltedJoin(fact, dim, "k", "dk", salts = 7, "left")
    assert(saltedLeft.exceptAll(plainLeft).count() == 0)
    assert(plainLeft.exceptAll(saltedLeft).count() == 0)

    // the common shape: both sides name the key identically
    val dimSame = dim.withColumnRenamed("dk", "k")
    val saltedSame = Skew.saltedJoin(fact, dimSame, "k", "k", salts = 5)
    assert(saltedSame.columns.toSeq == Seq("k", "v", "w"))
    assert(saltedSame.count() == plainInner.count())
  }

  test("splitSkewJoin equals the plain join; hot branch broadcasts") {
    val fact = (Seq.fill(500)(Option(1L) -> "hot") ++
      Seq.fill(400)(Option(2L) -> "warm") ++
      Seq(Option(3L) -> "b", Option(9L) -> "no-dim",
        (None: Option[Long]) -> "nullk"))
      .toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "unused"))
      .toDF("dk", "w")
    assert(Skew.hotKeys(fact, "k", 100).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))

    val plainInner = fact.join(dim, col("k") === col("dk")).drop("dk")
    val split = Skew.splitSkewJoin(fact, dim, "k", "dk", hotKeyMaxRows = 100)
    assert(split.columns.toSeq == plainInner.columns.toSeq)
    assert(split.exceptAll(plainInner).count() == 0)
    assert(plainInner.exceptAll(split).count() == 0)

    // left join keeps the dim-less and null-key fact rows exactly once
    val plainLeft = fact.join(dim, col("k") === col("dk"), "left").drop("dk")
    val splitLeft = Skew.splitSkewJoin(fact, dim, "k", "dk", 100, "left")
    assert(splitLeft.exceptAll(plainLeft).count() == 0)
    assert(plainLeft.exceptAll(splitLeft).count() == 0)

    // the hot slice must ride a broadcast join
    val plan = split.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"hot branch must broadcast:\n$plan")

    // no hot keys at a high threshold: still exactly the plain join
    val none = Skew.splitSkewJoin(fact, dim, "k", "dk", hotKeyMaxRows = 10000)
    assert(none.exceptAll(plainInner).count() == 0 &&
      plainInner.exceptAll(none).count() == 0)

    // a "hot set" that is really the whole key space is refused
    val e = intercept[IllegalArgumentException] {
      Skew.splitSkewJoin(fact, dim, "k", "dk", hotKeyMaxRows = 1,
        maxHotKeys = 1)
    }
    assert(e.getMessage.contains("not skew"))
  }
}
