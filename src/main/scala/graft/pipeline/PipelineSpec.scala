package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}

import graft.operators.Quality
import graft.sinks.AtomicPublisher.WriteSpec

/** Declarative pipeline spec — the engine's equivalent of a Gobblin job
  * config (.pull properties; gobblin-api/.../configuration/
  * ConfigurationKeys.java). A pipeline is:
  *
  *   source -> transforms* -> rowPolicies -> fork branches (each with its
  *   own transform + sink) -> task policies -> publish + state commit
  *
  * mirroring Source -> Converter* -> RowQualityChecker -> Fork -> Writer ->
  * TaskQualityChecker -> Publisher (gobblin-docs/Gobblin-Architecture.md).
  *
  * Specs are plain case classes; `PipelineSpec.fromProperties` parses the
  * reference's flat key=value style so jobs stay declarative/configurable.
  */
final case class SourceSpec(format: String, // parquet | csv | json | text |
                                            // jdbc | table (catalog table;
                                            // `path` is the table name)
                            path: String,
                            options: Map[String, String] = Map.empty,
                            schemaDDL: Option[String] = None,
                            // the reference's JSON-intermediate schema
                            // dialect (JsonSchemaDialect) — ports a
                            // reference job's schema verbatim
                            schemaJson: Option[String] = None,
                            // incremental watermark scan
                            watermarkColumn: Option[String] = None,
                            watermarkDefault: Option[String] = None)

final case class BranchSpec(name: String,
                            filterExpr: Option[String] = None,
                            selectCols: Seq[String] = Nil,
                            outDir: String, // jdbc branches: the table name
                            format: String = "parquet",
                            partitionBy: Seq[String] = Nil,
                            options: Map[String, String] = Map.empty) {
  def predicate: Option[Column] = filterExpr.map(expr)
  def transform: DataFrame => DataFrame =
    df => if (selectCols.isEmpty) df else df.select(selectCols.map(col): _*)
  def writeSpec: WriteSpec =
    WriteSpec(format = format, partitionBy = partitionBy, options = options)
}

final case class RowPolicySpec(name: String, predicateExpr: String,
                               typ: String /* FAIL | ERR_FILE | OPTIONAL */) {
  def toPolicy: Quality.RowPolicy = Quality.RowPolicy(name, expr(predicateExpr),
    typ.toUpperCase match {
      case "FAIL" => Quality.Fail
      case "ERR_FILE" => Quality.ErrFile
      case _ => Quality.Optional
    })
}

/** Distribution-drift task policy: before ANY branch becomes visible,
  * bin the branch output with `binExpr`, compare against the reference
  * dataset at `refPath` (same schema, binned the same way) via the
  * exact total-variation gate, refuse the commit past `maxPermille`.
  * The shape-drift complement to the row-count range policy. */
final case class DriftPolicySpec(binExpr: String, refPath: String,
                                 maxPermille: Long)

final case class PipelineSpec(name: String,
                              source: SourceSpec,
                              transformExprs: Seq[String] = Nil, // SQL select-exprs, chained
                              rowPolicies: Seq[RowPolicySpec] = Nil,
                              errDir: Option[String] = None,
                              rowCountRange: Option[Double] = None, // task policy
                              driftPolicy: Option[DriftPolicySpec] = None,
                              branches: Seq[BranchSpec],
                              stateDir: Option[String] = None,
                              // "full" = COMMIT_ON_FULL_SUCCESS (default);
                              // "successful" = COMMIT_SUCCESSFUL_TASKS
                              // (JobCommitPolicy.java:35,53)
                              commitPolicy: String = "full",
                              // in-place branch RETRIES (not attempts)
                              // under "successful" — the reference's
                              // semantics: a task runs up to retries+1
                              // times (task.maxretries;
                              // ConfigurationKeys:257-258 default 5,
                              // LocalTaskStateTracker.java:94
                              // `retryCount < maxTaskRetries`)
                              taskMaxRetries: Int = 1)

object PipelineSpec {

  /** Parse the reference's flat property style, e.g.
    * {{{
    * job.name=demo
    * source.format=parquet
    * source.path=/data/orders.parquet
    * source.watermark.column=o_orderdate
    * source.watermark.default=1990-01-01 00:00:00
    * transform.1=selectExpr:o_orderkey,o_orderdate,o_totalprice
    * rowpolicy.1.name=nonNullKey
    * rowpolicy.1.predicate=o_orderkey IS NOT NULL
    * rowpolicy.1.type=FAIL
    * qualitychecker.err.dir=/out/err
    * taskpolicy.rowcount.range=0.0
    * fork.1.name=main
    * fork.1.filter=o_totalprice > 0
    * fork.1.select=o_orderkey,o_orderdate
    * fork.1.out=/out/main
    * fork.1.format=parquet
    * fork.1.partitionBy=datepartition
    * state.dir=/out/_state
    * }}}
    */
  def fromProperties(props: Map[String, String]): PipelineSpec = {
    def idx(prefix: String): Seq[Int] =
      props.keys.flatMap { k =>
        if (k.startsWith(prefix)) k.stripPrefix(prefix).split('.').headOption
          .flatMap(_.toIntOption)
        else None
      }.toSeq.distinct.sorted

    val source = SourceSpec(
      format = props.getOrElse("source.format", "parquet"),
      path = props.getOrElse("source.path", ""), // jdbc sources have no path

      options = props.collect {
        case (k, v) if k.startsWith("source.option.") =>
          k.stripPrefix("source.option.") -> v },
      schemaDDL = props.get("source.schema"),
      schemaJson = props.get("source.schema.json"),
      watermarkColumn = props.get("source.watermark.column"),
      watermarkDefault = props.get("source.watermark.default"))

    val transforms = idx("transform.").map(i => props(s"transform.$i"))

    val rowPolicies = idx("rowpolicy.").map { i =>
      RowPolicySpec(
        props.getOrElse(s"rowpolicy.$i.name", s"policy$i"),
        props(s"rowpolicy.$i.predicate"),
        props.getOrElse(s"rowpolicy.$i.type", "OPTIONAL"))
    }

    val branches = idx("fork.").map { i =>
      BranchSpec(
        name = props.getOrElse(s"fork.$i.name", s"branch$i"),
        filterExpr = props.get(s"fork.$i.filter"),
        selectCols = props.get(s"fork.$i.select")
          .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil),
        outDir = props(s"fork.$i.out"),
        format = props.getOrElse(s"fork.$i.format", "parquet"),
        partitionBy = props.get(s"fork.$i.partitionBy")
          .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil),
        options = props.collect {
          case (k, v) if k.startsWith(s"fork.$i.option.") =>
            k.stripPrefix(s"fork.$i.option.") -> v })
    }

    PipelineSpec(
      name = props.getOrElse("job.name", "graft-job"),
      source = source,
      transformExprs = transforms,
      rowPolicies = rowPolicies,
      errDir = props.get("qualitychecker.err.dir"),
      rowCountRange = props.get("taskpolicy.rowcount.range").map(_.toDouble),
      driftPolicy = props.get("taskpolicy.drift.ref").map(ref =>
        DriftPolicySpec(
          binExpr = props.getOrElse("taskpolicy.drift.bin",
            throw new IllegalArgumentException(
              "taskpolicy.drift.ref needs taskpolicy.drift.bin")),
          refPath = ref,
          maxPermille = props.getOrElse("taskpolicy.drift.max.permille", "200")
            .toLong)),
      branches = branches,
      stateDir = props.get("state.dir"),
      commitPolicy = props.getOrElse("job.commit.policy", "full"),
      taskMaxRetries = props.get("task.maxretries").map(_.toInt).getOrElse(1))
  }
}
