package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotReplicateSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoots(): (String, String) = {
    val base = Files.createTempDirectory("graft-replica").toString
    (s"$base/src", s"$base/dst")
  }

  private def table(n: Int, tag: String) =
    (0 until n).map(i => (i.toLong, s"$tag-$i")).toDF("id", "v")

  test("bootstrap replicates every branch; replica reads equal source reads") {
    val (srcRoot, dstRoot) = freshRoots()
    val src = new SnapshotLog(spark, srcRoot)
    src.commit(Map("events" -> table(100, "e"), "dims" -> table(10, "d")))
    val stats = SnapshotReplicate.replicate(spark, srcRoot, dstRoot)
    assert(!stats.upToDate && stats.copy.filesCopied > 0)
    val dst = new SnapshotLog(spark, dstRoot)
    assert(dst.currentId() == src.currentId())
    Seq("events", "dims").foreach { b =>
      val a = src.read(b).orderBy("id").collect()
      val r = dst.read(b).orderBy("id").collect()
      assert(a.sameElements(r), s"branch $b must replicate byte-faithfully")
    }
  }

  test("incremental catch-up ships only the changed branch's new dir") {
    val (srcRoot, dstRoot) = freshRoots()
    val src = new SnapshotLog(spark, srcRoot)
    val id1 = src.commit(Map("events" -> table(100, "e"), "dims" -> table(10, "d")))
    SnapshotReplicate.replicate(spark, srcRoot, dstRoot)
    // snapshot 2 rewrites ONLY events; dims carries forward
    src.commit(Map("events" -> table(120, "e2")))
    val stats = SnapshotReplicate.replicate(spark, srcRoot, dstRoot)
    assert(stats.copy.filesSkipped == 0,
      "carried dirs must diff to nothing, not re-list as skips")
    // every copied file belongs to the new events dir
    val snap2 = src.current().get
    val eventsRel = snap2.branches("events").path
    assert(eventsRel.contains(s"snap-${snap2.id}"))
    val dst = new SnapshotLog(spark, dstRoot)
    assert(dst.read("events").count() == 120)
    assert(dst.read("dims").count() == 10)
    // time travel on the replica addresses source snapshot ids
    assert(dst.read("events", asOf = Some(id1)).count() == 100)
    assert(dst.history() == Seq(snap2.id, id1))
  }

  test("up-to-date replica is a no-op") {
    val (srcRoot, dstRoot) = freshRoots()
    new SnapshotLog(spark, srcRoot).commit(Map("t" -> table(5, "x")))
    SnapshotReplicate.replicate(spark, srcRoot, dstRoot)
    val again = SnapshotReplicate.replicate(spark, srcRoot, dstRoot)
    assert(again.upToDate && again.copy.filesCopied == 0)
  }

  test("re-run after a mid-copy crash skips completed files and commits") {
    val (srcRoot, dstRoot) = freshRoots()
    val src = new SnapshotLog(spark, srcRoot)
    src.commit(Map("t" -> table(50, "x")))
    // simulate a crashed first attempt: bytes of the data dir landed,
    // but the replica's manifest/pointer never flipped
    val rel = src.current().get.branches("t").path
    val from = new java.io.File(s"$srcRoot/$rel")
    val to = new java.io.File(s"$dstRoot/$rel")
    to.mkdirs()
    from.listFiles().filter(_.isFile).foreach { f =>
      Files.copy(f.toPath, new java.io.File(to, f.getName).toPath) }
    val stats = SnapshotReplicate.replicate(spark, srcRoot, dstRoot)
    // the landed files are planned away by the diff (not even "skipped");
    // only the commit remains to be done
    assert(stats.copy.filesCopied == 0 && stats.copy.bytesCopied == 0)
    assert(!stats.upToDate)
    assert(new SnapshotLog(spark, dstRoot).read("t").count() == 50)
  }

  test("non-monotonic replication fails loudly") {
    val (srcRoot, dstRoot) = freshRoots()
    val src = new SnapshotLog(spark, srcRoot)
    src.commit(Map("t" -> table(5, "x")))
    val old = src.current().get
    src.commit(Map("t" -> table(6, "y")))
    SnapshotReplicate.replicate(spark, srcRoot, dstRoot) // replica at id 2
    val dst = new SnapshotLog(spark, dstRoot)
    val e = intercept[IllegalArgumentException] {
      dst.commitReplicated(old)
    }
    assert(e.getMessage.contains("non-monotonic"))
    // and the failed attempt must not leave the lock behind
    assert(SnapshotReplicate.replicate(spark, srcRoot, dstRoot).upToDate)
  }
}
