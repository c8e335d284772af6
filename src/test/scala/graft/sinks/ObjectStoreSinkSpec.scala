package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Purge
import graft.sinks.ObjectStoreSink.{Delete, Put}
import graft.sinks.RecordSinks.{RetryConfig, ThrottleConfig}

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
