package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.sinks.HiveDdl

/** Hive-table-aware replication: plan copy units from metastore
  * partitions (with partition-filter predicates), sync each partition's
  * files to the target filesystem, then register / deregister the
  * corresponding partitions on the target metastore.
  *
  * Reference: gobblin-data-management copy/hive —
  * HiveCopyEntityHelper.java:98 (per-partition file sets, full path diff,
  * existing-entity policies, deregister file sets),
  * HiveDatasetFinder.java:78 (db/table discovery with
  * whitelist/blacklist), HiveUtils.getPartitionsMap with
  * listPartitionsByFilter, LookbackPartitionFilterGenerator /
  * DateRangePartitionFilterGenerator (string partition predicates).
  *
  * Spark-first shape:
  *   - discovery and partition enumeration go through Spark's
  *     SessionCatalog (same statements work on the in-memory catalog and
  *     a real Hive metastore); the partition filter is parsed with
  *     Spark's SQL parser and pushed through
  *     `listPartitionsByFilter`, so a metastore that can prune
  *     server-side does.
  *   - the file-level plan is DataFrames end to end: a distributed
  *     listing job walks every selected partition directory in parallel,
  *     [[CopyDiff.diff]] anti-joins target vs source manifests (NOT
  *     broadcast: a replica's manifest is the same size as the
  *     source's), and [[CopyExec.execute]] streams the bytes with
  *     per-file staging + rename, so re-runs are idempotent.
  *   - only the partition SPEC list ever lands on the driver —
  *     metastore-bounded, exactly what the reference's planner holds.
  *
  * An incremental second run costs one listing job and copies only the
  * partitions whose files changed; unchanged partitions report
  * `in-sync` with zero tasks.
  */
object HiveCopy {

  /** What to do when the target table already exists
    * (HiveCopyEntityHelper.ExistingEntityPolicy). */
  sealed trait ExistingTablePolicy
  object ExistingTablePolicy {
    /** Refuse unless the existing registration matches exactly. */
    case object Abort extends ExistingTablePolicy
    /** Keep the existing registration and replicate into ITS location. */
    case object Update extends ExistingTablePolicy
    /** Deregister (files stay) and re-register with the source's shape. */
    case object Replace extends ExistingTablePolicy
  }

  /** File handling when a target partition is deregistered
    * (HiveCopyEntityHelper.DeregisterFileDeleteMethod). */
  sealed trait DeregisterDelete
  object DeregisterDelete {
    case object NoDelete extends DeregisterDelete
    case object Recursive extends DeregisterDelete
  }

  final case class Config(
      targetDb: String,
      targetRoot: String,
      partitionFilter: Option[String] = None,
      existingPolicy: ExistingTablePolicy = ExistingTablePolicy.Abort,
      deregisterDelete: DeregisterDelete = DeregisterDelete.NoDelete,
      copyParallelism: Int = 0)

  final case class PartitionReport(spec: Map[String, String], action: String,
                                   filesCopied: Long, filesDeleted: Long,
                                   bytesCopied: Long)

  final case class Report(source: String, target: String,
                          targetLocation: String,
                          partitions: Seq[PartitionReport],
                          filesCopied: Long, filesSkipped: Long,
                          filesDeleted: Long, bytesCopied: Long,
                          partitionsRegistered: Int,
                          partitionsDeregistered: Int)

  // ---------------------------------------------------------------- discovery

  /** One `db[.table]` pattern; `*` globs either side, `|` separates
    * table alternatives (WhitelistBlacklist.java:45 dialect). */
  private final case class TablePattern(db: String, tables: Seq[String]) {
    private def rx(glob: String) =
      ("(?i)^" + java.util.regex.Pattern.quote(glob).replace("*", "\\E.*\\Q") + "$").r
    def matchesDb(d: String): Boolean = rx(db).pattern.matcher(d).matches()
    def matches(d: String, t: String): Boolean =
      matchesDb(d) &&
        (tables.isEmpty || tables.exists(g => rx(g).pattern.matcher(t).matches()))
  }

  private def parsePattern(p: String): TablePattern = {
    val trimmed = p.trim
    require(trimmed.nonEmpty, "empty table pattern")
    val i = trimmed.indexOf('.')
    if (i < 0) TablePattern(trimmed, Nil)
    else TablePattern(trimmed.substring(0, i),
      trimmed.substring(i + 1).split('|').toSeq.map(_.trim).filter(_.nonEmpty))
  }

  /** Enumerate `db.table` identifiers from the catalog with
    * whitelist/blacklist patterns — HiveDatasetFinder.java:212 semantics:
    * blacklist wins; an empty whitelist accepts everything. Session temp
    * views are NOT tables: `listTables(db)` would return them alongside
    * the database's real tables, and a "discovered" temp view is not a
    * copyable dataset (and could shadow a same-named permanent table),
    * so discovery asks the catalog to exclude them and drops any
    * unqualified identifier that slips through. */
  def discover(spark: SparkSession, whitelist: Seq[String],
               blacklist: Seq[String] = Nil): Seq[TableIdentifier] = {
    val cat = spark.sessionState.catalog
    val white = whitelist.map(parsePattern)
    val black = blacklist.map(parsePattern)
    def accepted(db: String, table: String): Boolean =
      (white.isEmpty || white.exists(_.matches(db, table))) &&
        !black.exists(_.matches(db, table))
    cat.listDatabases()
      .filter(db => white.isEmpty || white.exists(_.matchesDb(db)))
      .flatMap { db =>
        cat.listTables(db, "*", includeLocalTempViews = false)
          .filter(_.database.isDefined)
          .map(_.table).filter(t => accepted(db, t))
          .map(t => TableIdentifier(t, Some(db)))
      }
  }

  // ------------------------------------------------------------ registration

  private def q(ident: String) = s"`$ident`"

  /** Datasource CREATE for the replica (and for test fixtures): explicit
    * schema so partition columns keep their catalog types instead of
    * being re-inferred from directory names. */
  def registerExternal(spark: SparkSession, db: String, table: String,
                       schema: org.apache.spark.sql.types.StructType,
                       partitionCols: Seq[String], location: String,
                       format: String = "parquet",
                       recoverPartitions: Boolean = false): Unit = {
    val cols = schema.fields
      .map(f => s"${q(f.name)} ${f.dataType.sql}").mkString(", ")
    val partClause =
      if (partitionCols.isEmpty) ""
      else s"PARTITIONED BY (${partitionCols.map(q).mkString(", ")}) "
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${q(db)}.${q(table)} ($cols) " +
      s"USING $format $partClause" +
      s"LOCATION '${location.replace("'", "\\'")}'"): Unit
    if (recoverPartitions && partitionCols.nonEmpty)
      spark.sql(s"ALTER TABLE ${q(db)}.${q(table)} RECOVER PARTITIONS"): Unit
  }

  /** The replica's file format: datasource provider when present, else
    * the Hive serde's format. Anything else refuses loudly — silently
    * replicating an unreadable format would corrupt the target. */
  private def tableFormat(meta: CatalogTable): String =
    meta.provider.filterNot(_.equalsIgnoreCase("hive")) match {
      case Some(p) => p
      case None =>
        val serde = meta.storage.serde.getOrElse("").toLowerCase
        if (serde.contains("orc")) "orc"
        else if (serde.contains("parquet")) "parquet"
        else throw new IllegalArgumentException(
          s"cannot derive a replica format for ${meta.identifier}: " +
            s"provider=${meta.provider}, serde=${meta.storage.serde}")
    }

  /** Bind a partition-filter string (e.g. `dt >= '2024-01-02'`) to the
    * table's partition schema so the catalog can prune server-side.
    * Refuses columns that are not partition keys — the reference's
    * filters are metastore filters by construction. */
  private def resolvePartitionFilter(spark: SparkSession, meta: CatalogTable,
                                     filterSql: String): Expression = {
    val partSchema = meta.partitionSchema
    require(partSchema.nonEmpty,
      s"partition filter '$filterSql' on unpartitioned table ${meta.identifier}")
    val resolver = spark.sessionState.conf.resolver
    spark.sessionState.sqlParser.parseExpression(filterSql).transformUp {
      case a: UnresolvedAttribute =>
        val f = partSchema.fields.find(f => resolver(f.name, a.name))
          .getOrElse(throw new IllegalArgumentException(
            s"partition filter references '${a.name}', not a partition " +
              s"column of ${meta.identifier} " +
              s"(${partSchema.fieldNames.mkString(", ")})"))
        AttributeReference(f.name, f.dataType, nullable = true)()
    }
  }

  // ---------------------------------------------------------------- listing

  private def stripSlash(s: String) = s.stripSuffix("/")

  /** Distributed recursive listing of `dirs` (pidx -> directory):
    * each task walks its directories and emits (pidx, rootRelPath,
    * length). Hidden files (`.`/`_` prefixes — staging temps, _SUCCESS)
    * are not data and are skipped. A missing directory lists empty. */
  private def listDirs(spark: SparkSession,
                       dirs: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val par = math.min(math.max(dirs.size, 1),
      spark.sparkContext.defaultParallelism * 2)
    spark.sparkContext.parallelize(dirs, par)
      .flatMap { case (pidx, root) =>
        val conf = hconf.value
        val p = new Path(root)
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) Iterator.empty
        else {
          val prefix = fs.makeQualified(p).toString
          def walk(dir: Path): Iterator[(Int, String, Long)] =
            fs.listStatus(dir).iterator.flatMap { st =>
              val name = st.getPath.getName
              if (name.startsWith(".") || name.startsWith("_")) Iterator.empty
              else if (st.isDirectory) walk(st.getPath)
              else Iterator((pidx,
                fs.makeQualified(st.getPath).toString.stripPrefix(prefix),
                st.getLen))
            }
          walk(p)
        }
      }.toDF("pidx", "path", "length")
  }

  // ------------------------------------------------------------------- copy

  /** Replicate one table. `source` is a (possibly db-qualified) table
    * name in the session catalog. */
  def copyTable(spark: SparkSession, source: String, cfg: Config): Report = {
    import spark.implicits._
    val cat = spark.sessionState.catalog
    val srcId0 = spark.sessionState.sqlParser.parseTableIdentifier(source)
    val srcId = if (srcId0.database.isDefined) srcId0
      else srcId0.copy(database = Some(cat.getCurrentDatabase))
    val meta = cat.getTableMetadata(srcId)
    val partCols = meta.partitionColumnNames
    val srcRoot = stripSlash(meta.location.toString)
    val format = tableFormat(meta)
    val tgtId = TableIdentifier(srcId.table, Some(cfg.targetDb))
    val defaultRoot =
      s"${stripSlash(cfg.targetRoot)}/${cfg.targetDb}/${srcId.table}"

    // -- target table policy (HiveCopyEntityHelper existing-entity checks)
    val existing =
      if (cat.tableExists(tgtId)) Some(cat.getTableMetadata(tgtId)) else None
    existing.foreach { t =>
      val samePartCols = t.partitionColumnNames == partCols
      cfg.existingPolicy match {
        case ExistingTablePolicy.Replace =>
          // the DROP is deferred to the post-publish step: dropping here
          // would leave readers without a table for the whole byte copy,
          // and a crashed copy would have deregistered a healthy replica.
          // When the existing replica already sits at the planned root,
          // the copy lands in a fresh VERSIONED root (tgtRoot below) so
          // the still-registered table's files are never rewritten or
          // deleted under live readers; the registration swaps to the
          // new root post-publish.
          ()
        case ExistingTablePolicy.Update =>
          require(samePartCols,
            s"${tgtId}: existing target partition keys " +
              s"${t.partitionColumnNames} != source $partCols (UPDATE " +
              "cannot reconcile partition keys)")
        case ExistingTablePolicy.Abort =>
          require(samePartCols && stripSlash(t.location.toString) == defaultRoot,
            s"$tgtId already exists with " +
              (if (samePartCols) s"location ${t.location} != $defaultRoot"
               else s"partition keys ${t.partitionColumnNames} != $partCols") +
              "; policy ABORT refuses (use Update or Replace)")
      }
    }
    val tgtRoot = existing match {
      case Some(t) if cfg.existingPolicy == ExistingTablePolicy.Update =>
        stripSlash(t.location.toString)
      case Some(t) if cfg.existingPolicy == ExistingTablePolicy.Replace && {
          // scheme-insensitive: the catalog stores file:/… URIs
          val oldPath = new org.apache.hadoop.fs.Path(
            t.location.toString).toUri.getPath
          val defPath = new org.apache.hadoop.fs.Path(defaultRoot).toUri.getPath
          stripSlash(oldPath)
            .matches(java.util.regex.Pattern.quote(stripSlash(defPath)) +
              "(__v\\d+)?")
        } =>
        // re-replication onto the live replica's own root: write a fresh
        // versioned sibling instead, swap the registration post-publish.
        // Readers keep the old root (left on disk for retention cleanup —
        // deleting it here would yank data from in-flight scans).
        val old = stripSlash(
          new org.apache.hadoop.fs.Path(t.location.toString).toUri.getPath)
        val v = "__v(\\d+)$".r.findFirstMatchIn(old)
          .map(_.group(1).toInt).getOrElse(0)
        s"${defaultRoot}__v${v + 1}"
      case _ => defaultRoot
    }
    require(tgtRoot != srcRoot,
      s"target location equals source location ($srcRoot): refusing to " +
        "copy a table onto itself")

    // -- partition enumeration, filter pushed to the catalog
    val filterExpr = cfg.partitionFilter
      .map(f => resolvePartitionFilter(spark, meta, f))
    def partsOf(id: TableIdentifier) = filterExpr match {
      case Some(e) => cat.listPartitionsByFilter(id, Seq(e))
      case None if partCols.nonEmpty => cat.listPartitions(id)
      case None => Nil
    }
    val srcParts = if (partCols.isEmpty) Nil else partsOf(srcId)
    // registration is deferred until the byte copy succeeds (reference:
    // register steps are post-publish), so a failed first run leaves NO
    // readable-but-empty replica table; on a first run the target table
    // does not exist yet and has no partitions to enumerate. Under a
    // pending REPLACE the old registration is about to be dropped —
    // its partitions go with the table, so none count as pre-registered
    val replacing = existing.isDefined &&
      cfg.existingPolicy == ExistingTablePolicy.Replace
    val tgtParts =
      if (partCols.isEmpty || replacing || !cat.tableExists(tgtId)) Nil
      else partsOf(tgtId)

    /** spec -> the partition's path relative to its table root; falls
      * back to the canonical col=value layout for exotic locations. */
    def relOf(loc: String, spec: Map[String, String]): String = {
      val l = stripSlash(loc)
      if (l.startsWith(srcRoot + "/")) l.stripPrefix(srcRoot)
      else "/" + partCols.map(c =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(c, spec(c))).mkString("/")
    }

    // (pidx, spec, srcDir, dstDir): the ONLY driver-side materialization,
    // bounded by the metastore's partition count
    val units: Seq[(Int, Map[String, String], String, String)] =
      if (partCols.isEmpty) Seq((0, Map.empty[String, String], srcRoot, tgtRoot))
      else srcParts.zipWithIndex.map { case (p, i) =>
        val rel = relOf(p.location.toString, p.spec)
        (i, p.spec, stripSlash(p.location.toString), tgtRoot + rel)
      }

    // -- file-level plan: distributed listing + manifest diff
    val srcFiles = listDirs(spark, units.map(u => (u._1, u._3)))
    val dstFiles = listDirs(spark, units.map(u => (u._1, u._4)))
    // replica manifests are source-sized — shuffle anti-join, no broadcast
    val toCopy = CopyDiff.diff(srcFiles, dstFiles,
      on = Seq("pidx", "path", "length"), broadcastDst = false)
      .persist()
    val toDelete = dstFiles.join(srcFiles.select("pidx", "path"),
        Seq("pidx", "path"), "left_anti")
      // a length-mismatched file is REPLACED by its copy task (CopyExec
      // stages + renames over it), so deletion is only for paths gone
      // from the source entirely
      .persist()

    val copyStats = try {
      val dirDf = broadcast(
        units.map(u => (u._1, u._3, u._4)).toDF("pidx", "src_dir", "dst_dir"))
      val tasks = toCopy.join(dirDf, "pidx").select(
        concat(col("src_dir"), col("path")).as("src"),
        concat(col("dst_dir"), col("path")).as("dst"),
        col("length")).as[CopyExec.CopyTask]
      CopyExec.execute(tasks, cfg.copyParallelism)
    } finally ()

    val copiedPer = toCopy.groupBy("pidx")
      .agg(count(lit(1)).as("n"), sum("length").as("b")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // delete AFTER the copy (reference: delete units are post-publish
    // steps) so a failed copy never leaves the target with files removed
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirMap = units.map(u => u._1 -> u._4).toMap
    val deletedPer = {
      val dirB = spark.sparkContext.broadcast(dirMap)
      val counts = toDelete.select("pidx", "path").as[(Int, String)].rdd
        .mapPartitions { it =>
          val conf = hconf.value
          val per = scala.collection.mutable.Map[Int, Long]()
          it.foreach { case (pidx, rel) =>
            val p = new Path(dirB.value(pidx) + rel)
            val fs = p.getFileSystem(conf)
            if (fs.delete(p, false)) per(pidx) = per.getOrElse(pidx, 0L) + 1
          }
          per.iterator
        }.reduceByKey(_ + _).collect().toMap
      counts
    }
    toCopy.unpersist(); toDelete.unpersist(): Unit

    // -- target metastore registration (post-publish: only reached once
    // every byte landed, so a crashed run never registers a half-replica
    // AND a pending REPLACE never deregisters a healthy one mid-copy —
    // the drop-and-re-register swap happens here, after the bytes)
    if (replacing)
      spark.sql(s"DROP TABLE IF EXISTS ${q(cfg.targetDb)}.${q(tgtId.table)}"): Unit
    registerExternal(spark, cfg.targetDb, tgtId.table, meta.schema, partCols,
      tgtRoot, format)
    val tgtSpecs = tgtParts.map(_.spec).toSet
    var registered = 0
    if (partCols.nonEmpty) units.foreach { case (_, spec, _, dstDir) =>
      if (!tgtSpecs.contains(spec)) {
        spark.sql(HiveDdl.addPartitionDdl(tgtId.table,
          partCols.map(c => c -> spec(c)), dstDir, cfg.targetDb)): Unit
        registered += 1
      }
    }
    // partitions present (in filter scope) at the target but gone from
    // the source: deregister, optionally deleting their files
    val srcSpecs = units.map(_._2).toSet
    val stale = tgtParts.filterNot(p => srcSpecs.contains(p.spec))
    stale.foreach { p =>
      spark.sql(HiveDdl.dropPartitionDdl(tgtId.table,
        partCols.map(c => c -> p.spec(c)), cfg.targetDb)): Unit
      if (cfg.deregisterDelete == DeregisterDelete.Recursive) {
        val loc = new Path(p.location)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(loc, true): Unit
      }
    }

    // file sets changed underneath the registration: drop any cached
    // file index so readers of the replica see the post-sync listing
    spark.catalog.refreshTable(s"${q(cfg.targetDb)}.${q(tgtId.table)}")

    val partReports = units.map { case (pidx, spec, _, _) =>
      val (n, b) = copiedPer.getOrElse(pidx, (0L, 0L))
      val d = deletedPer.getOrElse(pidx, 0L)
      val action =
        if (partCols.isEmpty) "table"
        else if (n > 0 || d > 0) "copied"
        else "in-sync"
      PartitionReport(spec, action, n, d, b)
    } ++ stale.map(p =>
      PartitionReport(p.spec, "deregistered", 0L, 0L, 0L))

    Report(srcId.unquotedString, tgtId.unquotedString, tgtRoot, partReports,
      copyStats.filesCopied, copyStats.filesSkipped,
      deletedPer.values.sum, copyStats.bytesCopied,
      registered, stale.size)
  }
}
