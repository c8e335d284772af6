package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}

import graft.operators.{FileCompaction, HiveCopy, Merge, Vacuum, ValueAudit}
import graft.planning.BackfillPlanner
import graft.sinks.SnapshotLog

/** Lakehouse maintenance jobs as SCHEDULABLE flow nodes. The operators
  * (merge, small-file compaction, staging vacuum, snapshot expire,
  * backfill planning) are library calls; the reference runs their
  * equivalents as job configs a scheduler owns (CompactionSource.java:99
  * builds compaction work units from a job config, HivePurgerSource
  * .java:66 the purge ones) — this gives a config-driven deployment the
  * same: a `job.type=<kind>` node in a flow's properties, ordered and
  * ledger-recorded like every ETL hop.
  *
  * Kinds and their properties (all values strings, reference
  * flat-property style):
  *   - `vacuum`: `dir`, optional `grace.ms` (default
  *     [[Vacuum.DefaultGraceMs]])
  *   - `compact-files`: `dir`, `partition.col`, `target.bytes`,
  *     optional `format`
  *   - `merge`: `dir`, `partition.col`, `changes.path`, `keys` (csv),
  *     `delete.when` (SQL predicate over the changelog), optional
  *     `delta.col` (latest-change-wins ordering), `changes.format`,
  *     `format`, `max.broadcast.keys`
  *   - `snapshot-expire`: `dir`, `keep`
  *   - `backfill-plan`: `dir`, `partition.col`, optional `pattern`,
  *     `from`, `to`, `out` (write the holes as parquet for a downstream
  *     backfill hop to consume)
  *   - `hive-copy`: `whitelist` (csv of `db[.table|table2]` patterns),
  *     `target.db`, `target.root`, optional `blacklist`,
  *     `partition.filter` (HiveCopyEntityHelper
  *     .COPY_PARTITIONS_FILTER_CONSTANT semantics: a predicate over
  *     partition columns pushed to the metastore), `existing.policy`
  *     (`ABORT`|`UPDATE_TABLE`|`REPLACE_TABLE` — the reference's
  *     EXISTING_ENTITY_POLICY_KEY values), `deregister.delete`
  *     (`NO_DELETE`|`RECURSIVE` — DELETE_FILES_ON_DEREGISTER),
  *     `copy.parallelism`
  *   - `value-audit`: `path` (+ optional `format`), `db`, `table`,
  *     `out.root`, optional `key.fields`/`delta.fields` (csv dotted
  *     paths), `projection` (`ALL` | `KEY_DELTA` | csv of paths),
  *     `selection` (`ALL` | `sample:<permille>` | `where:<sql>`),
  *     `phase`/`cluster`/`extract`/`snapshot`/`delta.id` (the
  *     FsAuditSink coordinates, "NA" defaults)
  *   - `value-audit-diff`: `dir.a`, `dir.b`, `keys` (csv), optional
  *     `out` (persist the diff as parquet), `fail.on.diff` (default
  *     `true`: any mismatch or one-sided key FAILS the node, so the
  *     flow's descendants never run over diverged phases)
  *   - `ann-index-maintain`: `index.path` (incremental IVF index),
  *     `batch.path` (+ optional `batch.format`) — recent data to measure
  *     drift against — `id.col`, `vec.col`; optional
  *     `drift.threshold.permille` (default 300), `rebuild.cells`
  *     (default: current model's cell count), `sq8` (default false),
  *     `compact` (default true: below-threshold runs fold committed
  *     batches, keeping the newest unfolded for in-flight replays),
  *     `compact.up.to` (explicit fold line). Above the threshold the
  *     node retrains the quantizer on the index's own rows and swaps the
  *     rebuilt index in atomically ([[graft.ann.Ann.ivfRebuildIndex]]);
  *     run it with the feeding stream quiesced. Optional
  *     `rebuild.source.path` (+ `rebuild.source.format`, `codec`
  *     (`float`|`sq8`|`pq` — defaults by sniffing `_codebooks.json` /
  *     the `sq8` prop), `pq.m`, `pq.k`) rebuilds from a SOURCE corpus
  *     instead — required for PQ indexes, whose own rows are lossy.
  */
final case class MaintenanceSpec(name: String, kind: String,
                                 props: Map[String, String])

object MaintenanceSpec {
  /** Kind keyed under `job.type`; everything else passes through as the
    * kind's properties (same flat style as [[PipelineSpec]]). */
  def fromProperties(props: Map[String, String]): MaintenanceSpec =
    MaintenanceSpec(
      name = props.getOrElse("job.name", "graft-maintenance"),
      kind = props.getOrElse("job.type",
        throw new IllegalArgumentException("maintenance job needs job.type")),
      props = props)
}

object MaintenanceRunner {

  val kinds: Set[String] =
    Set("vacuum", "compact-files", "merge", "snapshot-expire",
      "backfill-plan", "hive-copy", "value-audit", "value-audit-diff",
      "ann-index-maintain", "media-dedup-ingest")

  /** Run one maintenance job; returns a human-readable stats summary
    * (recorded as the flow ledger's detail). Throws loudly on missing
    * properties or operator refusals — a maintenance node fails its
    * flow descendants exactly like an ETL node. */
  def run(spark: SparkSession, spec: MaintenanceSpec, runId: String): String = {
    def p(k: String): String = spec.props.getOrElse(k,
      throw new IllegalArgumentException(
        s"maintenance job '${spec.name}' (${spec.kind}) needs property '$k'"))
    spec.kind match {
      case "vacuum" =>
        val st = Vacuum.sweepStaging(spark, p("dir"),
          spec.props.get("grace.ms").map(_.toLong)
            .getOrElse(Vacuum.DefaultGraceMs))
        s"vacuum: removed=${st.removed.size} kept=${st.kept.size}"
      case "compact-files" =>
        val st = FileCompaction.compact(spark, p("dir"), p("partition.col"),
          p("target.bytes").toLong, spec.props.getOrElse("format", "parquet"))
        s"compact-files: rewritten=${st.rewritten.size} " +
          s"files=${st.filesBefore}->${st.filesAfter}"
      case "merge" =>
        val changes = spark.read
          .format(spec.props.getOrElse("changes.format", "parquet"))
          .load(p("changes.path"))
        val delta = spec.props.get("delta.col")
          .map(c => Seq(col(c).desc)).getOrElse(Seq.empty)
        val st = Merge.mergePartitioned(spark, p("dir"), p("partition.col"),
          changes, p("keys").split(',').map(_.trim).toSeq,
          expr(p("delete.when")), delta,
          format = spec.props.getOrElse("format", "parquet"),
          maxBroadcastKeys = spec.props.get("max.broadcast.keys")
            .map(_.toLong).getOrElse(5000000L))
        s"merge: affected=${st.affected.size} upserted=${st.upserted} " +
          s"deleted=${st.deleted}"
      case "snapshot-expire" =>
        new SnapshotLog(spark, p("dir")).expire(p("keep").toInt)
        s"snapshot-expire: keep=${p("keep")}"
      case "backfill-plan" =>
        val holes = BackfillPlanner.missingDates(spark, p("dir"),
          p("partition.col"), spec.props.getOrElse("pattern", "yyyy-MM-dd"),
          spec.props.get("from"), spec.props.get("to"))
        val out = spec.props.get("out")
        val n = holes.count()
        out.foreach(o =>
          holes.coalesce(1).write.mode("overwrite").parquet(o))
        s"backfill-plan: holes=$n" + out.fold("")(o => s" -> $o")
      case "hive-copy" =>
        // the reference runs Hive replication as a job config owned by a
        // scheduler (HiveDatasetFinder discovers from hive.dataset.whitelist
        // / blacklist; HiveCopyEntityHelper.EXISTING_ENTITY_POLICY_KEY and
        // DELETE_FILES_ON_DEREGISTER drive conflict handling) — same here,
        // with the policy VALUES mirroring the reference's enum names
        val policy = spec.props.getOrElse("existing.policy", "ABORT") match {
          case "ABORT" => HiveCopy.ExistingTablePolicy.Abort
          case "UPDATE_TABLE" => HiveCopy.ExistingTablePolicy.Update
          case "REPLACE_TABLE" => HiveCopy.ExistingTablePolicy.Replace
          case other => throw new IllegalArgumentException(
            s"hive-copy job '${spec.name}': unknown existing.policy " +
              s"'$other' (ABORT, UPDATE_TABLE, REPLACE_TABLE)")
        }
        val delete = spec.props.getOrElse("deregister.delete", "NO_DELETE") match {
          case "NO_DELETE" => HiveCopy.DeregisterDelete.NoDelete
          case "RECURSIVE" => HiveCopy.DeregisterDelete.Recursive
          case other => throw new IllegalArgumentException(
            s"hive-copy job '${spec.name}': unknown deregister.delete " +
              s"'$other' (NO_DELETE, RECURSIVE)")
        }
        val cfg = HiveCopy.Config(
          targetDb = p("target.db"),
          targetRoot = p("target.root"),
          partitionFilter = spec.props.get("partition.filter"),
          existingPolicy = policy,
          deregisterDelete = delete,
          copyParallelism = spec.props.get("copy.parallelism")
            .map(_.toInt).getOrElse(0))
        val tables = HiveCopy.discover(spark,
          p("whitelist").split(',').map(_.trim).toSeq.filter(_.nonEmpty),
          spec.props.get("blacklist")
            .map(_.split(',').map(_.trim).toSeq.filter(_.nonEmpty))
            .getOrElse(Nil))
        val reports = tables.map(t =>
          HiveCopy.copyTable(spark, t.unquotedString, cfg))
        s"hive-copy: tables=${reports.size} " +
          s"copied=${reports.map(_.filesCopied).sum} " +
          s"bytes=${reports.map(_.bytesCopied).sum} " +
          s"deleted=${reports.map(_.filesDeleted).sum} " +
          s"registered=${reports.map(_.partitionsRegistered).sum} " +
          s"deregistered=${reports.map(_.partitionsDeregistered).sum}"
      case "value-audit" =>
        def csv(k: String): Seq[String] = spec.props.get(k)
          .map(_.split(',').map(_.trim).toSeq.filter(_.nonEmpty))
          .getOrElse(Nil)
        val meta = ValueAudit.TableMeta(p("db"), p("table"),
          keyFields = csv("key.fields"), deltaFields = csv("delta.fields"))
        val projection = spec.props.getOrElse("projection", "ALL") match {
          case "ALL" => ValueAudit.ColumnProjection.ProjectAll
          case "KEY_DELTA" => ValueAudit.ColumnProjection.KeyAndDelta
          case paths => ValueAudit.ColumnProjection.Fields(
            paths.split(',').map(_.trim).toSeq.filter(_.nonEmpty))
        }
        val selection = spec.props.getOrElse("selection", "ALL") match {
          case "ALL" => ValueAudit.RowSelection.SelectAll
          case s if s.startsWith("sample:") =>
            ValueAudit.RowSelection.KeyHashSample(
              s.stripPrefix("sample:").toDouble / 1000.0)
          case s if s.startsWith("where:") =>
            ValueAudit.RowSelection.Where(expr(s.stripPrefix("where:")))
          case bad => throw new IllegalArgumentException(
            s"value-audit job '${spec.name}': selection '$bad' " +
              "(ALL, sample:<permille>, where:<sql>)")
        }
        val rt = ValueAudit.RuntimeMeta(
          phase = ValueAudit.Phase.withName(
            spec.props.getOrElse("phase", "NA")),
          cluster = spec.props.getOrElse("cluster", "NA"),
          extractId = spec.props.getOrElse("extract", "NA"),
          snapshotId = spec.props.getOrElse("snapshot", "NA"),
          deltaId = spec.props.getOrElse("delta.id", "NA"))
        val df = spark.read
          .format(spec.props.getOrElse("format", "parquet")).load(p("path"))
        val dir = ValueAudit.auditToFs(df, p("out.root"), meta, rt,
          projection, selection)
        s"value-audit: dir=$dir"
      case "value-audit-diff" =>
        val keys = p("keys").split(',').map(_.trim).toSeq.filter(_.nonEmpty)
        val diff = ValueAudit.diff(spark, p("dir.a"), p("dir.b"), keys)
          .persist()
        try {
          spec.props.get("out").foreach(o =>
            diff.coalesce(1).write.mode("overwrite").parquet(o))
          val rows = diff.collect()
          val mism = rows.map(_.getAs[Long]("mismatches")).sum
          val onlyA = rows.headOption.fold(0L)(_.getAs[Long]("only_in_a"))
          val onlyB = rows.headOption.fold(0L)(_.getAs[Long]("only_in_b"))
          val summary = s"value-audit-diff: mismatches=$mism " +
            s"only_in_a=$onlyA only_in_b=$onlyB cols=${rows.length}"
          if (spec.props.getOrElse("fail.on.diff", "true").toBoolean &&
              (mism > 0 || onlyA > 0 || onlyB > 0))
            throw new IllegalStateException(
              s"audited phases diverged — $summary (dir.a=${p("dir.a")}, " +
                s"dir.b=${p("dir.b")})")
          summary
        } finally { diff.unpersist(); () }
      case "ann-index-maintain" =>
        // the reference schedules recompaction off late-data conditions
        // (CompactionSource re-plans when thresholds trip); here the
        // trip-wire is appendDrift's exact TV between the index's cell
        // histogram and the incoming batch's — above threshold the
        // quantizer no longer describes the data and the index is
        // retrained + swapped; below, committed batch partitions fold
        import graft.ann.Ann
        val idxPath = p("index.path")
        val vecCol = p("vec.col")
        val sq8 = spec.props.get("sq8").exists(_.toBoolean)
        val threshold = spec.props.get("drift.threshold.permille")
          .map(_.toLong).getOrElse(300L)
        val batch = spark.read
          .format(spec.props.getOrElse("batch.format", "parquet"))
          .load(p("batch.path"))
        val drift = Ann.appendDrift(spark, idxPath, batch, vecCol)
          .head().getAs[Long]("tv_permille")
        if (drift >= threshold) {
          val cells = spec.props.get("rebuild.cells").map(_.toInt)
            .getOrElse(Ann.loadModel(spark, idxPath).numCells)
          val line = spec.props.get("rebuild.source.path") match {
            case Some(src) =>
              // source-corpus rebuild: the only rebuild a PQ index
              // allows, and the fresher option for any codec
              val hasCodebooks = new org.apache.hadoop.fs.Path(idxPath,
                "_codebooks.json").getFileSystem(
                spark.sparkContext.hadoopConfiguration).exists(
                new org.apache.hadoop.fs.Path(idxPath, "_codebooks.json"))
              val codec = spec.props.getOrElse("codec",
                if (hasCodebooks) "pq" else if (sq8) "sq8" else "float")
              Ann.ivfRebuildIndexFromSource(spark, idxPath,
                spark.read.format(spec.props
                  .getOrElse("rebuild.source.format", "parquet")).load(src),
                p("id.col"), vecCol, cells, codec, runId,
                pqM = spec.props.get("pq.m").map(_.toInt).getOrElse(8),
                pqK = spec.props.get("pq.k").map(_.toInt).getOrElse(256))
            case None =>
              Ann.ivfRebuildIndex(spark, idxPath, p("id.col"),
                vecCol, cells, sq8, runId)
          }
          s"ann-index-maintain: drift=$drift >= $threshold -> rebuilt " +
            s"(cells=$cells, fold_line=$line)"
        } else if (spec.props.getOrElse("compact", "true").toBoolean) {
          val fs = new org.apache.hadoop.fs.Path(idxPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val ids = fs.listStatus(new org.apache.hadoop.fs.Path(idxPath))
            .filter(_.isDirectory).map(_.getPath.getName)
            .collect { case n if n.startsWith("batch=") =>
              n.stripPrefix("batch=").toLong }.sorted
          val upTo = spec.props.get("compact.up.to").map(_.toLong)
            .orElse(if (ids.length > 1) Some(ids(ids.length - 2)) else None)
          upTo match {
            case Some(u) =>
              val line = Ann.ivfCompactIndex(spark, idxPath, u)
              s"ann-index-maintain: drift=$drift < $threshold -> " +
                s"compacted (fold_line=$line)"
            case None =>
              s"ann-index-maintain: drift=$drift < $threshold -> no-op " +
                "(nothing to fold)"
          }
        } else s"ann-index-maintain: drift=$drift < $threshold -> no-op"
      case "media-dedup-ingest" =>
        // continuous crawl admission as a FLOW NODE: drain whatever
        // landed under input.glob through the perceptual dedup store
        // (AvailableNow terminates once the backlog is admitted, so the
        // node composes with scheduled flows exactly like the other
        // kinds); replays and checkpoint identity are the store's own
        // guarantees ([[graft.streaming.MediaDedupIngest]])
        val store = p("store.path")
        val q = graft.streaming.MediaDedupIngest.start(
          graft.streaming.Streams.fileReplay(spark, p("input.glob"),
            graft.multimodal.Multimodal.mediaSchema,
            spec.props.getOrElse("input.format", "parquet"),
            spec.props.get("max.files.per.trigger").map(_.toInt)
              .getOrElse(1)),
          store, p("checkpoint.dir"),
          modality = spec.props.getOrElse("modality", "image"),
          fpp = spec.props.get("fpp").map(_.toDouble).getOrElse(0.01),
          qualityGate = spec.props.get("quality.gate")
            .exists(_.toBoolean),
          scrubMetadata = spec.props.get("scrub.metadata")
            .exists(_.toBoolean),
          partHashes = spec.props.get("part.hashes")
            .exists(_.toBoolean),
          minSharedParts = spec.props.get("min.shared.parts")
            .map(_.toInt).getOrElse(2))
        q.awaitTermination()
        val n = graft.streaming.MediaDedupIngest.survivors(spark, store)
          .count()
        val g = graft.streaming.MediaDedupIngest.gated(spark, store).count()
        s"media-dedup-ingest: store=$store survivors=$n gated=$g"
      case other => throw new IllegalArgumentException(
        s"unknown maintenance kind '$other' for job '${spec.name}' " +
          s"(known: ${kinds.toSeq.sorted.mkString(", ")})")
    }
  }
}
