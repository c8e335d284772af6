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

  final case class FlowNode(spec: PipelineSpec, dependsOn: Seq[String] = Nil)

  sealed trait Status
  case object Succeeded extends Status
  case object Failed extends Status
  /** Never ran: an ancestor failed. */
  case object Cancelled extends Status

  final case class NodeResult(name: String, status: Status,
                              result: Option[PipelineRunner.JobResult],
                              error: Option[String])

  /** Validate + topologically order the flow; throws on duplicate names,
    * unknown dependencies, or cycles. Deterministic: among ready nodes,
    * declaration order wins. */
  def topoOrder(nodes: Seq[FlowNode]): Seq[FlowNode] = {
    val byName = nodes.map(n => n.spec.name -> n).toMap
    require(byName.size == nodes.size,
      s"duplicate job names: ${nodes.groupBy(_.spec.name).collect {
        case (n, g) if g.size > 1 => n }.mkString(", ")}")
    nodes.foreach(n => n.dependsOn.foreach(d => require(byName.contains(d),
      s"job '${n.spec.name}' depends on unknown job '$d'")))
    val indeg = mutable.Map(nodes.map(n => n.spec.name -> n.dependsOn.size): _*)
    val out = mutable.ArrayBuffer.empty[FlowNode]
    val done = mutable.Set.empty[String]
    while (out.size < nodes.size) {
      val ready = nodes.find(n =>
        !done.contains(n.spec.name) && indeg(n.spec.name) == 0)
      require(ready.isDefined, "flow graph has a cycle among: " +
        nodes.map(_.spec.name).filterNot(done.contains).mkString(", "))
      val n = ready.get
      out += n; done += n.spec.name
      nodes.foreach { m =>
        if (m.dependsOn.contains(n.spec.name))
          indeg(m.spec.name) = indeg(m.spec.name) - 1
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
  def run(spark: SparkSession, nodes: Seq[FlowNode], runId: String,
          ledger: Option[graft.state.RunLedger] = None)
      : Map[String, NodeResult] = {
    val ordered = topoOrder(nodes)
    val results = mutable.Map.empty[String, NodeResult]
    ordered.foreach { n =>
      val name = n.spec.name
      val nodeRunId = s"${runId}_$name"
      val t0 = System.currentTimeMillis()
      def finish(res: NodeResult): Unit = {
        results(name) = res
        val t1 = System.currentTimeMillis()
        ledger.foreach { l =>
          res match {
            case NodeResult(_, Succeeded, Some(r), _) =>
              l.recordResult(name, r, t0, t1)
            case NodeResult(_, status, _, err) =>
              l.record(name, nodeRunId, status.toString.toUpperCase, t0, t1,
                detail = err.getOrElse(""))
          }
        }
      }
      val upstreamBad = n.dependsOn.filter(d => results(d).status != Succeeded)
      if (upstreamBad.nonEmpty)
        finish(NodeResult(name, Cancelled, None,
          Some("upstream failed: " + upstreamBad.mkString(", "))))
      else
        finish(
          try {
            val r = PipelineRunner.run(spark, n.spec, nodeRunId)
            NodeResult(name, Succeeded, Some(r), None)
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
    * {{{
    * flow.name=demo
    * job.1.job.name=extract
    * job.1.source.path=/data/in.parquet
    * job.1.fork.1.out=/out/hop1
    * job.2.job.name=load
    * job.2.dependsOn=extract
    * job.2.source.path=/out/hop1
    * job.2.fork.1.out=/out/hop2
    * }}} */
  def fromProperties(props: Map[String, String]): Seq[FlowNode] = {
    val jobIdx = props.keys.collect {
      case k if k.startsWith("job.") =>
        k.stripPrefix("job.").split('.').head.toIntOption
    }.flatten.toSeq.distinct.sorted
    jobIdx.map { i =>
      val sub = props.collect {
        case (k, v) if k.startsWith(s"job.$i.") => k.stripPrefix(s"job.$i.") -> v
      }
      FlowNode(PipelineSpec.fromProperties(sub),
        sub.get("dependsOn").map(_.split(',').map(_.trim).toSeq).getOrElse(Nil))
    }
  }
}
