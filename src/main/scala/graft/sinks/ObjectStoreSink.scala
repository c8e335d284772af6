package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Row

import graft.sinks.RecordSinks.RecordSink

/** Concrete object-store sink: put/delete operations against a
  * filesystem-backed key space, driven per partition through the
  * [[RecordSinks]] decorator stack (retry / throttle / async) — the
  * shipped implementation of the adapter pattern the decorators wrap.
  *
  * Reference: ObjectStoreWriter applies ObjectStoreOperation records
  * against a pluggable client (gobblin-core/.../writer/objectstore/
  * ObjectStoreWriter.java, ObjectStoreOperation.java);
  * ObjectStoreDeleteConverter.java:47 builds the delete requests from
  * records; AsyncHttpWriter.java:49 is the async service-writer face
  * the [[RecordSinks.runAsyncBatched]] decorator mirrors. A cloud
  * store (S3/Azure) plugs in by swapping the FileSystem URI — the Hadoop
  * FileSystem API is already the multi-store abstraction.
  *
  * Each put is write-temp-then-rename, matching object stores'
  * per-object atomicity: a reader never observes a half-written object,
  * and a task retry simply overwrites. Deletes are idempotent (deleting
  * an absent key is a no-op), so Spark task retries are safe end-to-end.
  *
  * RPC budget — against a real object store every filesystem call is an
  * HTTP round trip, so the per-record cost is exactly 1 `create` + 1
  * `rename` on the fresh-key path (overwrite pays delete + one retry
  * when the first rename reports the destination exists). There are NO
  * per-record `exists` probes: parent dirs are mkdir'd once per
  * directory per partition (cached in the sink instance), and
  * rename/delete return values convey what a pre-check would have asked.
  */
object ObjectStoreSink {

  sealed trait Op { def key: String }
  final case class Put(key: String, value: Array[Byte]) extends Op
  final case class Delete(key: String) extends Op

  /** One store instance per partition; `toOp` maps the partition's rows
    * to operations (the converter face). `hadoopConf` entries land on the
    * store's Configuration — scheme impls, credentials, endpoints. */
  def fsSink(root: String, toOp: Row => Op,
             hadoopConf: Map[String, String] = Map.empty): RecordSink[Row] =
    new RecordSink[Row] {
      @transient private var fs: FileSystem = _
      @transient private var knownDirs: scala.collection.mutable.HashSet[String] = _
      private def keyPath(key: String) = {
        require(!key.contains(".."), s"unsafe object key: $key")
        new Path(root, key)
      }
      override def open(pid: Int): Unit = {
        val conf = new org.apache.hadoop.conf.Configuration()
        hadoopConf.foreach { case (k, v) => conf.set(k, v) }
        fs = new Path(root).getFileSystem(conf)
        knownDirs = scala.collection.mutable.HashSet.empty
        fs.mkdirs(new Path(root)): Unit
        knownDirs += fs.makeQualified(new Path(root)).toString
      }
      def write(record: Row): Unit = toOp(record) match {
        case Put(key, value) =>
          val dst = keyPath(key)
          val parent = dst.getParent
          // amortized: one mkdirs the first time a partition sees a dir
          // (mkdirs is idempotent — no exists pre-check needed)
          if (knownDirs.add(fs.makeQualified(parent).toString))
            fs.mkdirs(parent): Unit
          val tmp = new Path(parent, s".tmp-${dst.getName}")
          val out = fs.create(tmp, true)
          try out.write(value) finally out.close()
          // the rename's own failure signals "destination exists" — only
          // the overwrite path pays the delete + retry
          if (!fs.rename(tmp, dst)) {
            fs.delete(dst, false)
            require(fs.rename(tmp, dst), s"object put failed: $key")
          }
        case Delete(key) =>
          fs.delete(keyPath(key), false): Unit // absent key: no-op
      }
    }

  /** Current object keys under the store root (relative paths). */
  def listKeys(spark: org.apache.spark.sql.SparkSession, root: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify so the relativize sees matching URI schemes
    val rootPath = fs.makeQualified(new Path(root))
    if (!fs.exists(rootPath)) Nil
    else {
      val it = fs.listFiles(rootPath, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (!name.startsWith(".") && !name.startsWith("_"))
          b += rootPath.toUri.relativize(st.getPath.toUri).getPath
      }
      b.result()
    }
  }
}
