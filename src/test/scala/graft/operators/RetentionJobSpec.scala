package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.config.ConfigStore

class RetentionJobSpec extends SparkSpec {

  test("config-store subtree drives per-dataset finders and policies") {
    val base = tmpDir("retjob")
    // --- data: two datasets with different layouts ---
    val clickDays = (1 to 8).map(d => f"d=2024-02-0$d")
    clickDays.foreach { d =>
      Files.createDirectories(Paths.get(s"$base/data/click/$d"))
      Files.createFile(Paths.get(s"$base/data/click/$d/part-0")): Unit
    }
    val snaps = Seq("snap_1", "snap_2", "snap_3", "snap_4")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    snaps.zipWithIndex.foreach { case (s, i) =>
      Files.createDirectories(Paths.get(s"$base/data/state/$s"))
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$base/data/state/$s"),
        (i + 1) * 100000L, -1)
    }
    // --- config store on disk: a tag sets the K, datasets import it ---
    def put(rel: String, name: String, lines: Seq[String]): Unit = {
      val d = Paths.get(s"$base/conf", rel)
      Files.createDirectories(d)
      Files.write(d.resolve(name), lines.mkString("\n").getBytes("UTF-8")): Unit
    }
    put("", "main.conf", Seq("retention.newestk.k=2"))
    put("tags/keep3", "main.conf", Seq("retention.newestk.k=3"))
    put("datasets/click", "main.conf",
      Seq("version.datetime.pattern='d='yyyy-MM-dd"))
    put("datasets/click", "includes.conf", Seq("/tags/keep3"))
    put("datasets/state", "main.conf",
      Seq("version.finder=modtime", "version.globPattern=snap_*"))

    val store = ConfigStore.fromFs(spark, s"$base/conf")
    val out = RetentionJob.run(spark, store, "/datasets", s"$base/data")
      .map(o => o.dataset -> o).toMap

    // click: tag-imported K=3 of 8 daily dirs
    assert(out("click").found == 8 && out("click").kept == 3)
    assert(Files.exists(Paths.get(s"$base/data/click/d=2024-02-08/part-0")))
    assert(!Files.exists(Paths.get(s"$base/data/click/d=2024-02-05")))
    // state: root-default K=2 of 4 modtime snapshots
    assert(out("state").found == 4 && out("state").kept == 2)
    assert(Files.exists(Paths.get(s"$base/data/state/snap_4")))
    assert(!Files.exists(Paths.get(s"$base/data/state/snap_1")))

    val frame = RetentionJob.outcomesFrame(spark, out.values.toSeq)
    assert(frame.filter("dataset = 'click'").collect()
      .head.getAs[Long]("deleted") == 5)

    // re-run is a no-op (survivors already satisfy the policies) — and a
    // parallel run returns the same outcomes in the same dataset order
    val again = RetentionJob.run(spark, store, "/datasets", s"$base/data",
      parallelism = 4)
    assert(again.forall(_.deleted.isEmpty))
    assert(again.map(_.dataset) == Seq("click", "state"))
    assert(again.map(o => (o.found, o.kept)) == Seq((3L, 3L), (2L, 2L)))
  }

  test("unix-timestamp finder drives retention via the config keys") {
    val base = tmpDir("retjob-unix")
    Seq(1000000L, 2000000L, 3000000L).foreach(ts =>
      Files.createDirectories(Paths.get(s"$base/data/snaps/run-$ts-ok")))
    def put(lines: Seq[String]): Unit = {
      val d = Paths.get(s"$base/conf/datasets/snaps")
      Files.createDirectories(d)
      Files.write(d.resolve("main.conf"),
        lines.mkString("\n").getBytes("UTF-8")): Unit
    }
    put(Seq("version.finder=unix",
      "version.globPattern=run-*",
      "version.timestamp.regex=run-(\\d+)-ok",
      "retention.newestk.k=1"))
    val out = RetentionJob.run(spark,
      ConfigStore.fromFs(spark, s"$base/conf"), "/datasets", s"$base/data")
    assert(out.head.found == 3 && out.head.kept == 1)
    assert(Files.exists(Paths.get(s"$base/data/snaps/run-3000000-ok")))
    assert(!Files.exists(Paths.get(s"$base/data/snaps/run-1000000-ok")))
  }

  test("newerthan cutoff policy deletes only older versions") {
    val base = tmpDir("retjob-cutoff")
    Seq("2024/01/05", "2024/01/15", "2024/02/05").foreach(d =>
      Files.createDirectories(Paths.get(s"$base/data/logs/$d")))
    def put(rel: String, lines: Seq[String]): Unit = {
      val d = Paths.get(s"$base/conf", rel)
      Files.createDirectories(d)
      Files.write(d.resolve("main.conf"),
        lines.mkString("\n").getBytes("UTF-8")): Unit
    }
    put("datasets/logs", Seq(
      "version.datetime.pattern=yyyy/MM/dd",
      "retention.policy=newerthan",
      "retention.newerthan.cutoff=2024-01-10 00:00:00"))
    val out = RetentionJob.run(spark,
      ConfigStore.fromFs(spark, s"$base/conf"), "/datasets", s"$base/data")
    assert(out.head.deleted.size == 1)
    assert(out.head.deleted.head.endsWith("2024/01/05"))
    assert(Files.exists(Paths.get(s"$base/data/logs/2024/02/05")))
  }
}
