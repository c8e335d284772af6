package graft.sinks

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Fork
import graft.sinks.AtomicPublisher.WriteSpec

class SnapshotLogSpec extends SparkSpec {
  import spark.implicits._

  test("multi-branch commit is all-or-nothing: staged but unactivated data is invisible") {
    val log = new SnapshotLog(spark, tmpDir("snap-atomic"))
    log.commit(Map(
      "a" -> Seq(1, 2).toDF("v"),
      "b" -> Seq(10).toDF("v")))
    assert(log.currentId().contains(1L))
    assert(log.read("a").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(log.read("b").as[Int].collect().toSeq == Seq(10))

    // crash injection: stage snapshot 2 for BOTH branches, then "die"
    // before activate — readers must still see snapshot 1 on both
    val pending = log.stage(Map(
      "a" -> Seq(3).toDF("v"),
      "b" -> Seq(30).toDF("v")))
    assert(log.currentId().contains(1L), "pointer must not move before activate")
    assert(log.read("a").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(log.read("b").as[Int].collect().toSeq == Seq(10))

    // activate flips BOTH branches at once
    pending.activate()
    assert(log.currentId().contains(2L))
    assert(log.read("a").as[Int].collect().toSeq == Seq(3))
    assert(log.read("b").as[Int].collect().toSeq == Seq(30))
  }

  test("a commit after a crashed stage never reuses the orphan's id") {
    val log = new SnapshotLog(spark, tmpDir("snap-orphan"))
    log.commit(Map("a" -> Seq(1).toDF("v")))
    log.stage(Map("a" -> Seq(2).toDF("v"))) // orphan snap-2, never activated
    // the dead committer left the lock: the next commit must say so, and
    // proceed only after the operator clears it
    intercept[java.util.ConcurrentModificationException](
      log.commit(Map("a" -> Seq(3).toDF("v"))))
    log.breakLock()
    val id = log.commit(Map("a" -> Seq(3).toDF("v")))
    assert(id == 3L, "orphan manifest id must be skipped, its data may be partial")
    assert(log.read("a").as[Int].collect().toSeq == Seq(3))
  }

  test("writer lock: rival committers fail loudly; the holder's commit lands intact") {
    val root = tmpDir("snap-lock")
    val log = new SnapshotLog(spark, root)
    log.commit(Map("a" -> Seq(1).toDF("v")))
    val pending = log.stage(Map("a" -> Seq(2).toDF("v")))
    // a second committer process (fresh instance, same root) must not be
    // able to stage, commit, or expire while the lock is held
    val rival = new SnapshotLog(spark, root)
    val e = intercept[java.util.ConcurrentModificationException](
      rival.commit(Map("a" -> Seq(99).toDF("v"))))
    assert(e.getMessage.contains("locked"))
    intercept[java.util.ConcurrentModificationException](rival.expire(1))
    // loser's failure changed nothing; winner activates untouched
    pending.activate()
    assert(log.read("a").as[Int].collect().toSeq == Seq(2))
    // lock released at activate: the rival can now commit normally
    val id = rival.commit(Map("a" -> Seq(3).toDF("v")))
    assert(rival.read("a").as[Int].collect().toSeq == Seq(3))
    assert(log.history().head == id)
  }

  test("commitWithRetry lands once a rival's lock clears, gives up on a stuck one") {
    val root = tmpDir("snap-retry")
    val log = new SnapshotLog(spark, root)
    val pending = log.stage(Map("a" -> Seq(1).toDF("v")))
    // rival releases the lock after ~0.5 s on another thread
    val releaser = new Thread(() => { Thread.sleep(500); pending.activate(): Unit })
    releaser.start()
    val rival = new SnapshotLog(spark, root)
    val id = rival.commitWithRetry(Map("b" -> Seq(2).toDF("v")),
      attempts = 10, backoffMs = 200L)
    releaser.join()
    // both commits landed; the rival's carried branch 'a' resolves to
    // the releaser's snapshot, nothing clobbered
    assert(rival.read("a").as[Int].collect().toSeq == Seq(1))
    assert(rival.read("b").as[Int].collect().toSeq == Seq(2))
    assert(rival.history().head == id)
    // a STUCK lock (nobody releasing) exhausts attempts loudly
    val stuck = log.stage(Map("a" -> Seq(9).toDF("v")))
    intercept[java.util.ConcurrentModificationException](
      rival.commitWithRetry(Map("b" -> Seq(3).toDF("v")),
        attempts = 2, backoffMs = 50L))
    stuck.abort()
  }

  test("writer lock: an aborted pending releases the lock, publishes nothing") {
    val log = new SnapshotLog(spark, tmpDir("snap-abort"))
    log.commit(Map("a" -> Seq(1).toDF("v")))
    val pending = log.stage(Map("a" -> Seq(2).toDF("v")))
    pending.abort()
    assert(log.read("a").as[Int].collect().toSeq == Seq(1),
      "aborted stage must stay invisible")
    log.commit(Map("a" -> Seq(3).toDF("v"))) // no breakLock needed
    assert(log.read("a").as[Int].collect().toSeq == Seq(3))
  }

  test("partial commit carries forward untouched branches; time travel reads old snapshots") {
    val log = new SnapshotLog(spark, tmpDir("snap-carry"))
    log.commit(Map(
      "a" -> Seq("a1").toDF("v"),
      "b" -> Seq("b1").toDF("v")))
    val id2 = log.commit(Map("a" -> Seq("a2").toDF("v"))) // b untouched
    assert(id2 == 2L)
    assert(log.read("a").as[String].collect().toSeq == Seq("a2"))
    assert(log.read("b").as[String].collect().toSeq == Seq("b1"),
      "carried-forward branch must resolve through the new manifest")
    // time travel: snapshot 1 still shows the old "a"
    assert(log.read("a", asOf = Some(1L)).as[String].collect().toSeq == Seq("a1"))
    assert(log.history() == Seq(2L, 1L))
  }

  test("rollbackTo restores an old snapshot as a NEW commit, forward-only") {
    val log = new SnapshotLog(spark, tmpDir("snap-rollback"))
    log.commit(Map("a" -> Seq("good").toDF("v")))
    log.commit(Map("a" -> Seq("bad").toDF("v")))
    val id3 = log.rollbackTo(1L)
    assert(id3 == 3L, "rollback must mint a new id, never rewind the chain")
    assert(log.read("a").as[String].collect().toSeq == Seq("good"))
    // the bad snapshot stays time-travelable (forensics) until expire
    assert(log.read("a", asOf = Some(2L)).as[String].collect().toSeq ==
      Seq("bad"))
    assert(log.history() == Seq(3L, 2L, 1L))
    // rolling back to the live snapshot is refused
    intercept[IllegalArgumentException] { log.rollbackTo(3L) }
    // a later commit continues normally and the lock was released
    val id4 = log.commit(Map("a" -> Seq("new").toDF("v")))
    assert(id4 == 4L)
    assert(log.read("a").as[String].collect().toSeq == Seq("new"))
    // rollback to an EXPIRED snapshot is refused loudly
    log.expire(keepLast = 2)
    intercept[IllegalArgumentException] { log.rollbackTo(1L) }
  }

  test("expire keeps the recent chain and sweeps unreferenced + orphan data dirs") {
    val root = tmpDir("snap-expire")
    val log = new SnapshotLog(spark, root)
    log.commit(Map("a" -> Seq(1).toDF("v")))
    log.commit(Map("a" -> Seq(2).toDF("v")))
    log.stage(Map("a" -> Seq(99).toDF("v"))) // crashed commit's orphan
    log.breakLock() // operator clears the dead committer's lock
    log.commit(Map("a" -> Seq(3).toDF("v")))
    // ids: commits take 1 and 2, the crashed stage burns 3, final commit is 4
    log.expire(keepLast = 2)
    assert(log.read("a").as[Int].collect().toSeq == Seq(3))
    assert(log.read("a", asOf = Some(2L)).as[Int].collect().toSeq == Seq(2))
    intercept[IllegalArgumentException](log.read("a", asOf = Some(1L)))
    intercept[IllegalArgumentException](log.read("a", asOf = Some(3L)))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data/a"))
      .map(_.getPath.getName).sorted.toSeq
    assert(dataDirs == Seq("snap-2", "snap-4"),
      s"expired + orphan dirs must be swept, got $dataDirs")
  }

  test("csv branch round-trips its read options through the manifest") {
    val log = new SnapshotLog(spark, tmpDir("snap-csv"))
    log.commit(
      Map("c" -> Seq((1, "x"), (2, "y")).toDF("id", "s")),
      Map("c" -> WriteSpec(format = "csv",
        options = Map("header" -> "true"))))
    val back = log.read("c")
    assert(back.columns.toSeq == Seq("id", "s"))
    assert(back.count() == 2)
  }

  test("Fork.runSnapshot: policy failure publishes nothing; success flips all branches at once") {
    val log = new SnapshotLog(spark, tmpDir("snap-fork"))
    val df = Seq((1, "F"), (2, "O"), (3, "F")).toDF("k", "status")
    val branches = Seq(
      Fork.Branch("f_only", Some(col("status") === "F"), identity, outDir = ""),
      Fork.Branch("all", None, _.select("k"), outDir = ""))

    intercept[IllegalStateException] {
      Fork.runSnapshot(df, branches, log, "r1",
        beforePromote = _ => throw new IllegalStateException("policy failed"))
    }
    assert(log.currentId().isEmpty, "failed policy must leave no visible snapshot")

    val (id, counts) = Fork.runSnapshot(df, branches, log, "r2")
    assert(counts("f_only") == Fork.BranchResult(2, 2))
    assert(counts("all") == Fork.BranchResult(3, 3))
    assert(log.read("f_only", asOf = Some(id)).count() == 2)
    assert(log.read("all").columns.toSeq == Seq("k"))
  }
}
