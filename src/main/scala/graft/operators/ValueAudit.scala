package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.AtomicPublisher

/** Value-based auditing: capture the VALUES of selected columns from
  * (all or a sample of) the rows of a dataset, and publish the audit
  * records to a metadata-addressed directory so a downstream comparison
  * can diff what two phases of a pipeline actually saw.
  *
  * Reference: gobblin-audit values —
  * auditor/ValueAuditGenerator.java:47 (per-record
  * rowSelection.shouldSelectRow -> columnProjection.project -> sink),
  * policy/column/ProjectAllColumnProjectionPolicy.java:31 (+ the
  * key/delta field-location contract of ColumnProjectionPolicy with
  * dotted nested paths, ValueAuditRuntimeMetadata.TableMetadata),
  * policy/row/SelectAllRowSelectionPolicy.java:30 (factory-pluggable),
  * sink/FsAuditSink.java:63 (audit files at
  * db/table/P=phase_C=cluster_E=extract_S=snapshot_D=delta/partFile),
  * auditor/ValueAuditRuntimeMetadata.java:94 (Phase enum, NA defaults).
  *
  * Spark-first: a projection policy is a list of Columns, a row policy
  * is a filter Column — both stay inside whole-stage codegen; the audit
  * "generator" is one declarative select. The sink goes through
  * [[AtomicPublisher]] so a crashed audit run never leaves a
  * half-visible audit directory (the reference writes a single stream,
  * its atomicity unit is the file; ours is the published dir).
  */
object ValueAudit {

  /** TableMetadata: key/delta field locations are dotted paths into
    * nested structs ("field1.nestedField1"), as in the reference. */
  final case class TableMeta(database: String, table: String,
                             keyFields: Seq[String] = Nil,
                             deltaFields: Seq[String] = Nil)

  /** Snapshot-generation phases (ValueAuditRuntimeMetadata.Phase). */
  object Phase extends Enumeration {
    val PULL, AVRO_CONV, SS_GEN, SS_UPD, SS_MAT, SS_PUB, NA = Value
  }

  /** Runtime coordinates of the audited snapshot; "NA" defaults mirror
    * the reference's builder. */
  final case class RuntimeMeta(phase: Phase.Value = Phase.NA,
                               cluster: String = "NA",
                               extractId: String = "NA",
                               snapshotId: String = "NA",
                               deltaId: String = "NA")

  /** Which column VALUES the audit captures. */
  sealed trait ColumnProjection {
    /** Resolved projection for `df` under `meta`; refuses unknown
      * field locations loudly (a silently-missing key column would
      * produce an audit that can never match). */
    def columns(df: DataFrame, meta: TableMeta): Seq[Column]
  }
  object ColumnProjection {
    private def resolve(df: DataFrame, paths: Seq[String]): Seq[Column] =
      paths.map { p =>
        val top = p.split('.').head
        require(df.columns.exists(_.equalsIgnoreCase(top)),
          s"audit projection references unknown field location '$p' " +
            s"(columns: ${df.columns.mkString(", ")})")
        // alias so nested paths stay distinct, flat columns keep names
        col(p).as(p.replace('.', '_'))
      }
    /** Project every field (ProjectAllColumnProjectionPolicy). */
    case object ProjectAll extends ColumnProjection {
      def columns(df: DataFrame, meta: TableMeta): Seq[Column] =
        df.columns.toSeq.map(col)
    }
    /** Project the table's key + delta field locations — the
      * getAllColumnsToProject composition of the policy contract. */
    case object KeyAndDelta extends ColumnProjection {
      def columns(df: DataFrame, meta: TableMeta): Seq[Column] = {
        require(meta.keyFields.nonEmpty || meta.deltaFields.nonEmpty,
          s"KeyAndDelta projection for ${meta.database}.${meta.table} " +
            "but TableMeta declares no key/delta field locations")
        resolve(df, meta.keyFields ++ meta.deltaFields)
      }
    }
    /** An explicit field-location list (the factory's custom-policy
      * seam, expressed as data instead of reflection). */
    final case class Fields(paths: Seq[String]) extends ColumnProjection {
      def columns(df: DataFrame, meta: TableMeta): Seq[Column] =
        resolve(df, paths)
    }
  }

  /** Which rows get audited. */
  sealed trait RowSelection { def predicate(meta: TableMeta): Column }
  object RowSelection {
    /** Every row (SelectAllRowSelectionPolicy). */
    case object SelectAll extends RowSelection {
      def predicate(meta: TableMeta): Column = lit(true)
    }
    /** Deterministic hash sample over the KEY fields — the natural
      * sampling policy the reference's factory seam exists for: the
      * same keys are selected on every run and every cluster, so two
      * phases' audits of the same data stay comparable. */
    final case class KeyHashSample(fraction: Double) extends RowSelection {
      require(fraction > 0 && fraction <= 1, s"fraction $fraction not in (0,1]")
      def predicate(meta: TableMeta): Column = {
        require(meta.keyFields.nonEmpty,
          "KeyHashSample needs TableMeta.keyFields to hash")
        val h = graft.text.TextStats.portableHash60(
          concat_ws("", meta.keyFields.map(col): _*))
        pmod(h, lit(1000000L)) < lit((fraction * 1000000L).toLong)
      }
    }
    /** An explicit predicate (custom-policy seam). */
    final case class Where(cond: Column) extends RowSelection {
      def predicate(meta: TableMeta): Column = cond
    }
  }

  /** The audit records: rows passing `selection`, projected to
    * `projection` — ValueAuditGenerator.audit as one declarative pass
    * (map-only: no shuffle, scales as a scan). */
  def audit(df: DataFrame, meta: TableMeta,
            projection: ColumnProjection = ColumnProjection.ProjectAll,
            selection: RowSelection = RowSelection.SelectAll): DataFrame =
    df.filter(selection.predicate(meta))
      .select(projection.columns(df, meta): _*)

  /** FsAuditSink's directory contract:
    * `<db>/<table>/P=<phase>_C=<cluster>_E=<extract>_S=<snap>_D=<delta>`. */
  def auditDir(outRoot: String, meta: TableMeta, rt: RuntimeMeta): String =
    s"${outRoot.stripSuffix("/")}/${meta.database}/${meta.table}/" +
      s"P=${rt.phase}_C=${rt.cluster}_E=${rt.extractId}" +
      s"_S=${rt.snapshotId}_D=${rt.deltaId}"

  /** Compare two published audits of the same table keyed on
    * `keyCols` — the module's raison d'être: the audits exist so a
    * downstream job can diff what two PHASES of a pipeline actually saw
    * (ValueAuditRuntimeMetadata.Phase — e.g. PULL vs SS_PUB). One row
    * per non-key audited column:
    * `(col_name, mismatches, only_in_a, only_in_b)` where `mismatches`
    * counts keys present in both audits whose value differs
    * (null-safe), and the `only_*` counts (identical on every row)
    * are keys seen by exactly one phase. Key-only audits (no value
    * columns) emit ONE `__key_set__` row carrying the `only_*` counts,
    * so a gate on the diff still catches lost/gained keys. Audits
    * projecting different column sets are refused loudly.
    *
    * Scale shape: ONE shuffle (the full-outer key join) + one aggregate
    * with map-side combine; the melt to per-column rows is over a
    * single collected aggregate row, bounded by the column count.
    * Audits are keyed snapshots: a duplicated key compares pairwise
    * through the join (2 dup rows vs 1 → 2 comparisons), as any
    * key-based differ must. */
  def diff(spark: SparkSession, auditDirA: String, auditDirB: String,
           keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val a = spark.read.parquet(auditDirA)
    val b = spark.read.parquet(auditDirB)
    require(a.columns.sorted.toSeq == b.columns.sorted.toSeq,
      s"audits project different column sets: " +
        s"A=${a.columns.sorted.mkString(",")} vs " +
        s"B=${b.columns.sorted.mkString(",")} — diff would be meaningless")
    keyCols.foreach(k => require(a.columns.contains(k),
      s"key column '$k' not in the audit projection " +
        s"(${a.columns.mkString(", ")})"))
    val valCols = a.columns.filterNot(keyCols.contains).toSeq
    val aT = a.select(keyCols.map(col) ++ Seq(lit(true).as("__in_a")) ++
      valCols.map(c => col(c).as(s"__a_$c")): _*)
    val bT = b.select(keyCols.map(col) ++ Seq(lit(true).as("__in_b")) ++
      valCols.map(c => col(c).as(s"__b_$c")): _*)
    val joined = aT.join(bT, keyCols, "full_outer")
    def cnt(pred: Column) =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
    val aggs =
      Seq(cnt(col("__in_a").isNotNull && col("__in_b").isNull).as("__only_a"),
        cnt(col("__in_b").isNotNull && col("__in_a").isNull).as("__only_b")) ++
      valCols.map(c => cnt(col("__in_a").isNotNull &&
        col("__in_b").isNotNull &&
        !(col(s"__a_$c") <=> col(s"__b_$c"))).as(s"__m_$c"))
    val r = joined.agg(aggs.head, aggs.tail: _*).head()
    val onlyA = r.getAs[Long]("__only_a")
    val onlyB = r.getAs[Long]("__only_b")
    val rows =
      if (valCols.isEmpty) Seq(Row("__key_set__", 0L, onlyA, onlyB))
      else valCols.map(c => Row(c, r.getAs[Long](s"__m_$c"), onlyA, onlyB))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("col_name", StringType, nullable = false),
        StructField("mismatches", LongType, nullable = false),
        StructField("only_in_a", LongType, nullable = false),
        StructField("only_in_b", LongType, nullable = false))))
  }

  /** Generate and PUBLISH the audit records through the atomic
    * publisher; returns the audit directory. A re-run of the same
    * snapshot coordinates atomically replaces its audit. */
  def auditToFs(df: DataFrame, outRoot: String, meta: TableMeta,
                rt: RuntimeMeta = RuntimeMeta(),
                projection: ColumnProjection = ColumnProjection.ProjectAll,
                selection: RowSelection = RowSelection.SelectAll,
                format: String = "parquet"): String = {
    val dir = auditDir(outRoot, meta, rt)
    val runId = s"audit-${rt.phase}-${rt.snapshotId}-${rt.deltaId}"
    AtomicPublisher.publish(audit(df, meta, projection, selection), dir,
      runId, AtomicPublisher.WriteSpec(format = format))
    dir
  }
}
