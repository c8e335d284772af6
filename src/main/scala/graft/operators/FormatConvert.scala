package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sinks.{AtomicPublisher, CatalogRegister}
import graft.sinks.AtomicPublisher.WriteSpec
import graft.sources.AvroIO

/** Avro -> ORC conversion job with per-partition swap.
  *
  * Reference: AbstractAvroToOrcConverter / HiveAvroORCQueryGenerator
  * (gobblin-data-management/.../hive/converter/AbstractAvroToOrcConverter
  * .java:84, query/HiveAvroORCQueryGenerator.java:68,120,485) — generate
  * `CREATE TABLE ... STORED AS ORC` + `INSERT OVERWRITE ... SELECT` per
  * partition and swap the partition location at publish.
  *
  * Spark-first: ONE pass writes every affected partition to a staging
  * tree (`partitionBy` layout), then each produced partition directory is
  * rename-swapped into the destination — untouched destination partitions
  * survive, and a crash mid-swap loses no already-published partition
  * (same promote protocol as [[AtomicPublisher.Staged]]). Registration
  * reuses [[CatalogRegister]] (the reference's Hive DDL face).
  */
object FormatConvert {

  /** Convert an Avro dataset to ORC; with partition columns, only the
    * partitions present in the input are (atomically) replaced. Returns
    * the swapped partition sub-paths (empty for unpartitioned). */
  def avroToOrc(spark: SparkSession, avroDir: String, orcDir: String,
                partitionBy: Seq[String] = Nil, runId: String,
                registerAs: Option[String] = None): Seq[String] = {
    val df = AvroIO.read(spark, avroDir)
    val swapped: Seq[String] =
      if (partitionBy.isEmpty) {
        AtomicPublisher.publish(df, orcDir, runId, WriteSpec(format = "orc"))
        Nil
      } else {
        val dst = new Path(orcDir)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val staging = new Path(dst.getParent, s".convert-$runId-${dst.getName}")
        if (fs.exists(staging)) fs.delete(staging, true)
        df.write.mode("overwrite").partitionBy(partitionBy: _*)
          .orc(staging.toString)
        // swap each produced partition dir (depth = partition columns)
        def leaves(dir: Path, level: Int): Seq[Path] =
          if (level == partitionBy.size) Seq(dir)
          else fs.listStatus(dir).toSeq
            .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
            .flatMap(st => leaves(st.getPath, level + 1))
        val parts = leaves(staging, 0)
        val stagingUri = fs.makeQualified(staging).toString
        val rels = parts.map(p =>
          fs.makeQualified(p).toString.stripPrefix(stagingUri).stripPrefix("/"))
        parts.zip(rels).foreach { case (src, rel) =>
          AtomicPublisher.Staged(fs, src, new Path(dst, rel), runId).promote()
        }
        fs.delete(staging, true)
        rels
      }
    registerAs.foreach(t =>
      CatalogRegister.register(spark, t, orcDir, "orc", partitionBy))
    swapped
  }

  /** The HiveQL publish script for a completed conversion — CREATE
    * EXTERNAL TABLE ... STORED AS ORC plus ADD PARTITION per swapped
    * sub-path — for deployments fronted by a real Hive metastore rather
    * than the session catalog (the reference's QueryBasedHivePublishEntity;
    * HiveAvroORCQueryGenerator.java:120,315). The schema is read back
    * from the published ORC so the DDL always describes what was actually
    * written, partition columns included. */
  def publishDdl(spark: SparkSession, orcDir: String, table: String,
                 partitionBy: Seq[String] = Nil,
                 swappedPartitions: Seq[String] = Nil,
                 db: String = "default"): Seq[String] =
    graft.sinks.HiveDdl.publishScript(
      spark.read.orc(orcDir).schema, table, orcDir,
      swappedPartitions, db, partitionBy)
}
