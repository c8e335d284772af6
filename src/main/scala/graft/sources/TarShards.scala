package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tar-shard ("WebDataset"-convention) source and sink — the interchange
  * format multimodal training actually reads: a dataset is a directory
  * of sequentially-readable `.tar`/`.tar.gz` shards whose members are
  * named `<key>.<ext>`; all members sharing a key form one SAMPLE
  * (`000042.jpg` + `000042.txt` + `000042.json`), and samples never
  * straddle shard boundaries, so a reader streams one shard
  * independently of all others.
  *
  * Reference face: the copy/ingest pipelines treat archives as opaque
  * distcp payloads (TarArchiveInputStreamDataWriter — see
  * [[graft.operators.CopyStream]]); exposing the members as ROWS (and
  * packing rows back into shards) is this engine's training-data
  * extension.
  *
  * Scale: one Spark task streams one shard — read parallelism is the
  * shard count, byte-streaming, zero driver traffic (the driver lists
  * shard paths only). The writer packs each partition's rows into
  * rolling shards sealed at a byte budget, rolling ONLY at key
  * boundaries so the sample-adjacency invariant holds by
  * construction; shards land via staging + rename, so interrupted
  * jobs leave no half-written shard under the final name.
  */
object TarShards {

  /** Read every member of every shard under `dir` (non-recursive,
    * `.tar` / `.tar.gz` / `.tgz`): (shard, key, ext, content). The
    * WebDataset key split is at the FIRST dot of the basename, so
    * `000042.seg.png` is key `000042`, ext `seg.png`. */
  def readMembers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs.listStatus(root).filter(_.isFile).map(_.getPath.toString)
      .filter(p => p.endsWith(".tar") || p.endsWith(".tar.gz") ||
        p.endsWith(".tgz"))
      .sorted.toSeq
    require(shards.nonEmpty, s"no .tar/.tar.gz shards under $dir")
    spark.createDataset(shards)
      .repartition(shards.length) // one task per shard
      .mapPartitions { it =>
        val conf = hconf.value
        it.flatMap { shardPath =>
          val p = new Path(shardPath)
          val raw: InputStream = p.getFileSystem(conf).open(p)
          val in =
            if (shardPath.endsWith(".gz") || shardPath.endsWith(".tgz"))
              new GZIPInputStream(new BufferedInputStream(raw))
            else new BufferedInputStream(raw)
          val tar = new TarArchiveInputStream(in)
          val shardName = p.getName
          new Iterator[(String, String, String, Array[Byte])] {
            private var entry = advance()
            private def advance(): TarArchiveEntry = {
              var e = tar.getNextEntry
              while (e != null && e.isDirectory) e = tar.getNextEntry
              if (e == null) tar.close()
              e
            }
            def hasNext: Boolean = entry != null
            def next(): (String, String, String, Array[Byte]) = {
              val name = new Path(entry.getName).getName
              val dot = name.indexOf('.')
              val (key, ext) =
                if (dot < 0) (name, "")
                else (name.substring(0, dot), name.substring(dot + 1))
              val content = tar.readAllBytes()
              require(content.length == entry.getSize,
                s"short read of ${entry.getName} in $shardName")
              entry = advance()
              (shardName, key, ext, content)
            }
          }
        }
      }.toDF("shard", "key", "ext", "content")
  }

  /** Group members into SAMPLES: (key, exts map<ext, content>) — one
    * row per training sample. Members of a key live in one shard by
    * the format's invariant, so the groupBy shuffles only within what
    * a shard-local reader would see anyway. */
  def samples(members: DataFrame): DataFrame =
    members.groupBy("key")
      .agg(map_from_entries(collect_list(struct(col("ext"), col("content"))))
        .as("exts"))

  final case class ShardStats(shards: Long, members: Long, bytes: Long)

  /** Pack (key, ext, content) rows into tar shards under `dir`:
    * `shard-<partition>-<seq>.tar[.gz]`, sealed when the accumulated
    * member payload exceeds `maxShardBytes` — but only at KEY
    * boundaries, so a sample's members always share a shard. Rows
    * range-partition + sort by key (adjacency is the format's
    * contract and must hold even when one key's members arrive on
    * different input partitions); distinct partitions write distinct
    * shard files, so the pack itself is embarrassingly parallel. */
  def writeShards(members: DataFrame, dir: String,
                  maxShardBytes: Long = 1L << 30,
                  gzip: Boolean = false,
                  numPartitions: Int = 0): ShardStats = {
    val spark = members.sparkSession
    val sc = spark.sparkContext
    val nShards = sc.longAccumulator("graft.shards.files")
    val nMembers = sc.longAccumulator("graft.shards.members")
    val nBytes = sc.longAccumulator("graft.shards.bytes")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    import spark.implicits._
    val base = members.select(col("key").cast("string"), col("ext"),
      col("content"))
    val ranged =
      if (numPartitions > 0) base.repartitionByRange(numPartitions, col("key"))
      else base.repartitionByRange(col("key"))
    val ordered = ranged.sortWithinPartitions("key", "ext")
      .as[(String, String, Array[Byte])]
    ordered.foreachPartition { (it: Iterator[(String, String, Array[Byte])]) =>
      val conf = hconf.value
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val root = new Path(dir)
      val fs = root.getFileSystem(conf)
      fs.mkdirs(root)
      var seq = 0
      var tar: TarArchiveOutputStream = null
      var stagingPath: Path = null
      var finalPath: Path = null
      var shardBytes = 0L
      var lastKey: String = null
      val suffix = if (gzip) ".tar.gz" else ".tar"
      def openShard(): Unit = {
        finalPath = new Path(root, f"shard-$pid%05d-$seq%05d$suffix")
        stagingPath = new Path(root, f".shard-tmp-$pid%05d-$seq%05d$suffix")
        val out = fs.create(stagingPath, true)
        val o = if (gzip) new GZIPOutputStream(new BufferedOutputStream(out))
          else new BufferedOutputStream(out)
        tar = new TarArchiveOutputStream(o)
        tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
        shardBytes = 0L
        seq += 1
      }
      def sealShard(): Unit = if (tar != null) {
        tar.finish(); tar.close()
        require(fs.rename(stagingPath, finalPath),
          s"shard rename failed: $stagingPath -> $finalPath")
        nShards.add(1)
        tar = null
      }
      it.foreach { case (key, ext, content) =>
        if (tar == null) openShard()
        else if (shardBytes >= maxShardBytes && key != lastKey) {
          sealShard(); openShard()
        }
        val name = if (ext.isEmpty) key else s"$key.$ext"
        val e = new TarArchiveEntry(name)
        e.setSize(content.length.toLong)
        tar.putArchiveEntry(e)
        tar.write(content)
        tar.closeArchiveEntry()
        shardBytes += content.length
        lastKey = key
        nMembers.add(1)
        nBytes.add(content.length.toLong)
      }
      sealShard()
    }
    ShardStats(nShards.value, nMembers.value, nBytes.value)
  }
}
