package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Flow → job-DAG orchestration (the GaaS control plane, engine-side):
  * a flow is a set of named pipeline jobs with dependency edges; the
  * compiler orders them topologically and the engine runs each node's
  * full job lifecycle (source → converters → policies → fork → publish →
  * state commit) in dependency order, handing data between hops through
  * each job's published output dirs.
  *
  * Mirrors the reference's FlowSpec → Dag<JobExecutionPlan> →
  * DagProcessingEngine chain (gobblin-service/.../flow/
  * MultiHopFlowCompiler.java:83,211, orchestration/DagProcessingEngine
  * .java): like the reference, a failed node fails its transitive
  * descendants (they are CANCELLED, never run) while independent
  * branches of the DAG continue.
  *
  * Scheduling is intentionally driver-side and sequential: each node IS
  * a distributed Spark job — the cluster's parallelism lives inside
  * nodes, and inter-node concurrency buys little while making
  * failure/retry semantics nondeterministic. (The reference reaches the
  * same end state through its deterministic dag-node queue.)
  */
object FlowDag {

  /** A schedulable DAG node: an ETL pipeline ([[FlowNode]]) or a
    * maintenance job ([[MaintenanceNode]] — compaction, vacuum, merge,
    * snapshot expire, backfill planning), dependency-ordered and
    * ledger-recorded identically. */
  sealed trait DagNode {
    def name: String
    def dependsOn: Seq[String]
  }

  final case class FlowNode(spec: PipelineSpec, dependsOn: Seq[String] = Nil)
      extends DagNode {
    def name: String = spec.name
  }

  final case class MaintenanceNode(spec: MaintenanceSpec,
                                   dependsOn: Seq[String] = Nil)
      extends DagNode {
    def name: String = spec.name
  }

  sealed trait Status
  case object Succeeded extends Status
  case object Failed extends Status
  /** Never ran: an ancestor failed. */
  case object Cancelled extends Status

  final case class NodeResult(name: String, status: Status,
                              result: Option[PipelineRunner.JobResult],
                              error: Option[String],
                              detail: Option[String] = None)

  /** Validate + topologically order the flow; throws on duplicate names,
    * unknown dependencies, or cycles. Deterministic: among ready nodes,
    * declaration order wins. */
  def topoOrder(nodes: Seq[DagNode]): Seq[DagNode] = {
    val byName = nodes.map(n => n.name -> n).toMap
    require(byName.size == nodes.size,
      s"duplicate job names: ${nodes.groupBy(_.name).collect {
        case (n, g) if g.size > 1 => n }.mkString(", ")}")
    nodes.foreach(n => n.dependsOn.foreach(d => require(byName.contains(d),
      s"job '${n.name}' depends on unknown job '$d'")))
    val indeg = mutable.Map(nodes.map(n => n.name -> n.dependsOn.size): _*)
    val out = mutable.ArrayBuffer.empty[DagNode]
    val done = mutable.Set.empty[String]
    while (out.size < nodes.size) {
      val ready = nodes.find(n =>
        !done.contains(n.name) && indeg(n.name) == 0)
      require(ready.isDefined, "flow graph has a cycle among: " +
        nodes.map(_.name).filterNot(done.contains).mkString(", "))
      val n = ready.get
      out += n; done += n.name
      nodes.foreach { m =>
        if (m.dependsOn.contains(n.name))
          indeg(m.name) = indeg(m.name) - 1
      }
    }
    out.toSeq
  }

  /** Run the flow; returns per-node results keyed by job name. Node
    * runIds are `<runId>_<jobName>` so every job's state/watermark commit
    * is attributable to the flow execution. With a [[graft.state
    * .RunLedger]], every node outcome — including failures and
    * cancellations — lands in the job-history store (JobExecutionInfo
    * semantics). */
  def run(spark: SparkSession, nodes: Seq[DagNode], runId: String,
          ledger: Option[graft.state.RunLedger] = None)
      : Map[String, NodeResult] = {
    val ordered = topoOrder(nodes)
    val results = mutable.Map.empty[String, NodeResult]
    ordered.foreach { n =>
      val name = n.name
      val nodeRunId = s"${runId}_$name"
      val t0 = System.currentTimeMillis()
      def finish(res: NodeResult): Unit = {
        results(name) = res
        val t1 = System.currentTimeMillis()
        ledger.foreach { l =>
          res match {
            case NodeResult(_, Succeeded, Some(r), _, _) =>
              l.recordResult(name, r, t0, t1)
            case NodeResult(_, status, _, err, detail) =>
              l.record(name, nodeRunId, status.toString.toUpperCase, t0, t1,
                detail = err.orElse(detail).getOrElse(""))
          }
        }
      }
      val upstreamBad = n.dependsOn.filter(d => results(d).status != Succeeded)
      if (upstreamBad.nonEmpty)
        finish(NodeResult(name, Cancelled, None,
          Some("upstream failed: " + upstreamBad.mkString(", "))))
      else
        finish(
          try n match {
            case f: FlowNode =>
              val r = PipelineRunner.run(spark, f.spec, nodeRunId)
              NodeResult(name, Succeeded, Some(r), None)
            case m: MaintenanceNode =>
              val summary = MaintenanceRunner.run(spark, m.spec, nodeRunId)
              NodeResult(name, Succeeded, None, None, Some(summary))
          } catch {
            case e: Exception =>
              NodeResult(name, Failed, None, Some(e.toString))
          })
    }
    results.toMap
  }

  /** Parse a multi-job flow from the reference's flat property style:
    * every `job.<i>.<key>=v` line feeds job i's [[PipelineSpec
    * .fromProperties]] as `<key>=v`, plus `job.<i>.dependsOn=nameA,nameB`.
    * A node with `job.<i>.job.type=<maintenance kind>` becomes a
    * [[MaintenanceNode]] instead (vacuum, compact-files, merge,
    * snapshot-expire, backfill-plan, hive-copy —
    * [[MaintenanceRunner.kinds]]), so
    * maintenance hops schedule exactly like ETL hops.
    * {{{
    * flow.name=demo
    * job.1.job.name=extract
    * job.1.source.path=/data/in.parquet
    * job.1.fork.1.out=/out/hop1
    * job.2.job.name=compact
    * job.2.job.type=compact-files
    * job.2.dependsOn=extract
    * job.2.dir=/out/hop1
    * job.2.partition.col=dt
    * job.2.target.bytes=134217728
    * }}} */
  def fromProperties(props: Map[String, String]): Seq[DagNode] = {
    val jobIdx = props.keys.collect {
      case k if k.startsWith("job.") =>
        k.stripPrefix("job.").split('.').head.toIntOption
    }.flatten.toSeq.distinct.sorted
    jobIdx.map { i =>
      val sub = props.collect {
        case (k, v) if k.startsWith(s"job.$i.") => k.stripPrefix(s"job.$i.") -> v
      }
      val deps = sub.get("dependsOn")
        .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
      sub.get("job.type") match {
        case Some(kind) if MaintenanceRunner.kinds.contains(kind) =>
          MaintenanceNode(MaintenanceSpec.fromProperties(sub), deps)
        case Some(other) => throw new IllegalArgumentException(
          s"job.$i.job.type='$other' is not a maintenance kind " +
            s"(known: ${MaintenanceRunner.kinds.toSeq.sorted.mkString(", ")}); " +
            "omit job.type for an ETL pipeline node")
        case None => FlowNode(PipelineSpec.fromProperties(sub), deps)
      }
    }
  }
}
