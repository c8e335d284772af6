package graft.pipeline

import scala.collection.mutable

/** Multi-hop flow compilation: given a graph of data nodes connected by
  * job-template edges, compile "move dataset D from node A to node Z,
  * delivered with properties P" into an ordered multi-hop job DAG.
  *
  * Reference: MultiHopFlowCompiler
  * (gobblin-service/.../flow/MultiHopFlowCompiler.java:83,211) with
  * BFSPathFinder (flowgraph/pathfinder/BFSPathFinder.java:76,
  * AbstractPathFinder.java:188 getNextEdges) over BaseFlowGraph. The
  * semantics preserved here:
  *
  *  - the graph is a MULTIGRAPH (several edges between one node pair,
  *    each accepting/producing different dataset shapes), so the BFS
  *    visited-set tracks (edge, input-descriptor, output-descriptor)
  *    contexts, not nodes — required for termination AND for finding
  *    paths that revisit a node with a different dataset shape;
  *  - inactive nodes/edges are skipped; an edge is traversable only when
  *    its input descriptor CONTAINS the dataset's current descriptor;
  *  - edges whose output already satisfies the requested destination
  *    descriptor are expanded first, so format/codec transformations
  *    happen as close to the source as possible (AbstractPathFinder's
  *    prioritized edge list);
  *  - an edge's output descriptor may carry wildcards; they are made
  *    SPECIFIC by inheriting the in-flight dataset's concrete values
  *    (makeOutputDescriptorSpecific), so "copy" edges forward whatever
  *    format passed through them;
  *  - multiple destinations compile into ONE dag whose shared hops run
  *    once (FlowGraphPath.asDag concatenation, deduplicated).
  *
  * Spark-first: compilation is pure planning on the driver — the emitted
  * [[JobPlan]]s name the job-template properties per hop, and
  * [[toFlowNodes]] hands the dag to [[FlowDag.run]], where each hop runs
  * as a full distributed Spark pipeline job.
  */
object FlowGraphCompiler {

  val Wildcard = "any"

  /** A dataset's shape at a point in the flow — flat properties
    * (platform, format, codec, path, ...); [[Wildcard]] matches anything
    * (DatasetDescriptor semantics, gobblin-service/.../dataset/). */
  final case class Descriptor(props: Map[String, String]) {
    def get(k: String): String = props.getOrElse(k, Wildcard)

    /** Can a dataset shaped `other` be accepted where `this` is required?
      * Every key `this` pins must match exactly (a wildcard in `other`
      * does NOT satisfy a pinned requirement). Returns the mismatches —
      * empty means acceptable. */
    def contains(other: Descriptor): Seq[String] =
      props.collect {
        case (k, v) if v != Wildcard && other.get(k) != v =>
          s"$k: required '$v', got '${other.get(k)}'"
      }.toSeq

    /** Resolve this (output) descriptor's wildcards from the in-flight
      * dataset, and forward in-flight keys this descriptor doesn't
      * mention — a pass-through edge keeps the dataset's shape, a
      * converting edge overrides exactly the keys it pins. */
    def specializedFrom(current: Descriptor): Descriptor =
      Descriptor(current.props ++ props.filter(_._2 != Wildcard))
  }

  final case class DataNode(id: String, active: Boolean = true)

  /** One hop's job template: `props` is the flat job config the hop's
    * pipeline runs with ([[PipelineSpec.fromProperties]] style). */
  final case class FlowEdge(id: String, src: String, dest: String,
                            input: Descriptor, output: Descriptor,
                            props: Map[String, String] = Map.empty,
                            active: Boolean = true)

  final case class FlowGraph(nodes: Seq[DataNode], edges: Seq[FlowEdge]) {
    require(nodes.map(_.id).distinct.size == nodes.size, "duplicate node ids")
    require(edges.map(_.id).distinct.size == edges.size, "duplicate edge ids")
    private val nodeById = nodes.map(n => n.id -> n).toMap
    private val bySrc = edges.groupBy(_.src)
    edges.foreach { e =>
      require(nodeById.contains(e.src), s"edge ${e.id}: unknown src node ${e.src}")
      require(nodeById.contains(e.dest), s"edge ${e.id}: unknown dest node ${e.dest}")
    }
    def node(id: String): DataNode = nodeById.getOrElse(id,
      throw new IllegalArgumentException(s"flow graph has no node '$id'"))
    def edgesFrom(id: String): Seq[FlowEdge] = bySrc.getOrElse(id, Nil)
  }

  /** The flow request: move `input`-shaped data at `source` to every
    * `destinations` node, delivered satisfying `output`. */
  final case class FlowRequest(source: String, destinations: Seq[String],
                               input: Descriptor, output: Descriptor)

  /** One compiled hop. `name` is unique within the dag; `dependsOn`
    * wires the hop after its upstream hop (empty = starts at source). */
  final case class JobPlan(name: String, edgeId: String,
                           srcNode: String, destNode: String,
                           input: Descriptor, output: Descriptor,
                           props: Map[String, String],
                           dependsOn: Seq[String])

  final case class CompilationError(message: String,
                                    edgeErrors: Seq[String])
      extends RuntimeException(
        s"$message${if (edgeErrors.isEmpty) ""
          else edgeErrors.mkString(" Considered edges:\n  ", "\n  ", "")}")

  // BFS state: the edge traversed plus the concrete descriptors it was
  // traversed with (the multigraph visited-key)
  private final case class Ctx(edge: FlowEdge, in: Descriptor, out: Descriptor)

  /** Find one source→dest path (BFSPathFinder.findPathUnicast). Returns
    * the traversed contexts in order; empty when source == dest and the
    * input already satisfies the requested output. Collects per-edge
    * rejection reasons for the error the compiler throws when no path
    * exists (FlowSpec.CompilationError). */
  private def findPath(graph: FlowGraph, source: String, dest: String,
                       input: Descriptor, output: Descriptor,
                       rejections: mutable.Buffer[String]): Option[Seq[Ctx]] = {
    if (!graph.node(source).active || !graph.node(dest).active) {
      rejections += s"node ${if (graph.node(source).active) dest else source} is inactive"
      return None
    }
    if (source == dest && output.contains(input).isEmpty)
      return Some(Nil)

    def nextEdges(at: String, current: Descriptor): Seq[Ctx] = {
      val (good, bad) = graph.edgesFrom(at).partition(e =>
        e.active && graph.node(e.dest).active && e.input.contains(current).isEmpty)
      bad.foreach { e =>
        val why =
          if (!e.active) "edge inactive"
          else if (!graph.node(e.dest).active) s"dest node ${e.dest} inactive"
          else e.input.contains(current).mkString("; ")
        rejections += s"${e.id} (${e.src}->${e.dest}): $why"
      }
      val ctxs = good.map(e => Ctx(e, current, e.output.specializedFrom(current)))
      // transform-near-source priority: edges already satisfying the
      // requested output descriptor expand first
      val (ready, rest) = ctxs.partition(c => output.contains(c.out).isEmpty)
      ready ++ rest
    }

    val parent = mutable.Map.empty[Ctx, Ctx]
    val queue = mutable.Queue.empty[Ctx]
    nextEdges(source, input).foreach { c => parent(c) = null; queue += c }
    while (queue.nonEmpty) {
      val ctx = queue.dequeue()
      if (ctx.edge.dest == dest && output.contains(ctx.out).isEmpty) {
        // walk the parent chain back to the source
        val path = mutable.ListBuffer.empty[Ctx]
        var cur: Ctx = ctx
        while (cur != null) { cur +=: path; cur = parent(cur) }
        return Some(path.toSeq)
      }
      nextEdges(ctx.edge.dest, ctx.out).foreach { child =>
        if (!parent.contains(child)) { parent(child) = ctx; queue += child }
      }
    }
    None
  }

  /** Compile the request into a job DAG. Shared hops across destinations
    * are emitted ONCE (same edge, same in/out shape ⇒ same job). Throws
    * [[CompilationError]] naming every rejected edge when any
    * destination is unreachable. */
  def compile(graph: FlowGraph, request: FlowRequest): Seq[JobPlan] = {
    require(request.destinations.nonEmpty, "no destinations")
    val plans = mutable.LinkedHashMap.empty[Ctx, JobPlan]
    request.destinations.foreach { dest =>
      val rejections = mutable.ListBuffer.empty[String]
      findPath(graph, request.source, dest, request.input, request.output,
        rejections) match {
        case None => throw CompilationError(
          s"no path from ${request.source} to $dest for input " +
            s"${request.input.props} delivering ${request.output.props}.",
          rejections.toSeq.distinct)
        case Some(path) =>
          path.zipWithIndex.foldLeft(Option.empty[Ctx]) {
            case (prev, (ctx, i)) =>
              if (!plans.contains(ctx)) {
                val name = s"${ctx.edge.id}_h${plans.size}"
                plans(ctx) = JobPlan(name, ctx.edge.id, ctx.edge.src,
                  ctx.edge.dest, ctx.in, ctx.out, ctx.edge.props,
                  dependsOn = prev.map(p => plans(p).name).toSeq)
              }
              Some(ctx)
          }
      }
    }
    plans.values.toSeq
  }

  /** Bridge to the DAG executor: materialize each hop's [[PipelineSpec]]
    * from its template properties via `specFor` and hand the wired
    * dependency structure to [[FlowDag.run]]. */
  def toFlowNodes(plans: Seq[JobPlan],
                  specFor: JobPlan => PipelineSpec): Seq[FlowDag.FlowNode] =
    plans.map { p =>
      val spec = specFor(p)
      require(spec.name == p.name,
        s"specFor must keep the plan name (${p.name}), got ${spec.name}")
      FlowDag.FlowNode(spec, dependsOn = p.dependsOn)
    }
}
