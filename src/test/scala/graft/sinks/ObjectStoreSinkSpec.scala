package graft.sinks

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Purge
import graft.sinks.ObjectStoreSink.{Delete, Put}
import graft.sinks.RecordSinks.{RetryConfig, ThrottleConfig}

/** Local filesystem that counts every metadata/data RPC — stands in for
  * an object store where each call is an HTTP round trip. */
class CountingFs extends RawLocalFileSystem {
  import CountingFs._
  override def getScheme: String = "cnt"
  override def getUri: java.net.URI = java.net.URI.create("cnt:///")
  // count only CALLER-issued ops: RawLocalFileSystem.create internally
  // mkdirs/stats the parent, which a real object-store put would not —
  // the nested flag keeps those out of the per-record RPC budget. Both
  // public create overloads funnel into a private helper (never each
  // other), so counting both catches every entry without double counting.
  private def outer[A](counter: AtomicLong)(body: => A): A = {
    if (!nested.get()) { counter.incrementAndGet(); () }
    nested.set(true)
    try body finally nested.set(false)
  }
  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = outer(creates) {
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = outer(creates) {
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def rename(src: Path, dst: Path): Boolean =
    outer(renames) { super.rename(src, dst) }
  override def mkdirs(f: Path): Boolean =
    outer(mkdirCalls) { super.mkdirs(f) }
  override def mkdirs(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission): Boolean =
    outer(mkdirCalls) { super.mkdirs(f, permission) }
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    outer(statCalls) { super.getFileStatus(f) }
  override def delete(f: Path, recursive: Boolean): Boolean =
    outer(deletes) { super.delete(f, recursive) }
}

object CountingFs {
  val creates = new AtomicLong
  val renames = new AtomicLong
  val mkdirCalls = new AtomicLong
  val statCalls = new AtomicLong
  val deletes = new AtomicLong
  val nested: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)
  def reset(): Unit =
    Seq(creates, renames, mkdirCalls, statCalls, deletes).foreach(_.set(0))
}

class ObjectStoreSinkSpec extends SparkSpec {
  import spark.implicits._

  test("put-then-delete through the decorator stack: survivors equal the purge anti-join") {
    val root = tmpDir("objstore")
    val docs = (0L until 50L).map(i => (i, s"body-$i")).toDF("doc_id", "text")
    val deletes = docs.filter(pmod($"doc_id", lit(7)) === 0).select("doc_id")

    // 1. put every doc as an object, with retry + throttle composed
    RecordSinks.run(
      docs,
      () => ObjectStoreSink.fsSink(root, r =>
        Put(s"docs/${r.getLong(0)}.txt", r.getString(1).getBytes("UTF-8"))),
      retry = Some(RetryConfig()),
      throttle = Some(ThrottleConfig(recordsPerSecond = 10000, burst = 100)))
    assert(ObjectStoreSink.listKeys(spark, root).size == 50)

    // 2. the delete list becomes delete operations (the
    //    ObjectStoreDeleteConverter face); deletes are idempotent, so run
    //    them twice to prove retry safety
    (1 to 2).foreach { _ =>
      RecordSinks.run(
        deletes,
        () => ObjectStoreSink.fsSink(root, r =>
          Delete(s"docs/${r.getLong(0)}.txt")))
    }

    // 3. surviving keys == the engine's purge anti-join of the same lists
    val surviving = ObjectStoreSink.listKeys(spark, root)
      .map(k => k.stripPrefix("docs/").stripSuffix(".txt").toLong).sorted
    val oracle = Purge.purge(docs, deletes, Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(surviving == oracle)
    // object content survives byte-exact
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$root/docs/1.txt"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(body == "body-1")
  }

  test("fresh-key puts cost exactly create+rename; no per-record metadata probes") {
    val local = tmpDir("objstore-rpc")
    val root = s"cnt:$local/store"
    val conf = Map("fs.cnt.impl" -> classOf[CountingFs].getName)
    val n = 200
    val docs = (0L until n.toLong).map(i => (i, s"body-$i")).toDF("doc_id", "text")
      .repartition(4)
    CountingFs.reset()
    RecordSinks.run(docs, () => ObjectStoreSink.fsSink(root, r =>
      Put(s"docs/${r.getLong(0)}.txt", r.getString(1).getBytes("UTF-8")),
      hadoopConf = conf))
    assert(CountingFs.creates.get == n, "one create per put")
    assert(CountingFs.renames.get == n, "one rename per put")
    assert(CountingFs.deletes.get == 0, "fresh keys never pay a delete")
    // parent-dir setup is amortized per partition, not per record:
    // ≤ 2 dirs (root + docs/) x 4 partitions
    assert(CountingFs.mkdirCalls.get <= 8,
      s"mkdirs must be cached per partition, got ${CountingFs.mkdirCalls.get}")
    // no exists()/getFileStatus probes on the write path at all
    assert(CountingFs.statCalls.get == 0,
      s"per-record metadata probes crept back in: ${CountingFs.statCalls.get}")
    // and the data actually landed, readable through the plain local fs
    val fs = new Path(local).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(s"$local/store/docs")).length == n)
  }

  test("a put overwrite is atomic per object: no half-written state visible") {
    val root = tmpDir("objstore-atomic")
    val one = Seq((1L, "v1")).toDF("doc_id", "text")
    RecordSinks.run(one, () => ObjectStoreSink.fsSink(root, r =>
      Put("k.txt", r.getString(1).getBytes("UTF-8"))))
    val two = Seq((1L, "v2-longer-payload")).toDF("doc_id", "text")
    RecordSinks.run(two, () => ObjectStoreSink.fsSink(root, r =>
      Put("k.txt", r.getString(1).getBytes("UTF-8"))))
    assert(ObjectStoreSink.listKeys(spark, root) == Seq("k.txt"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$root/k.txt"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(body == "v2-longer-payload")
  }
}
