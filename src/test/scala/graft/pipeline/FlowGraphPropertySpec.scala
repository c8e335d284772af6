package graft.pipeline

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.FlowGraphCompiler._

/** Randomized laws for the multi-hop compiler: on arbitrary small
  * multigraphs (cycles, parallel edges, inactive nodes, shape-gated
  * edges), the compiled dag must be VALID whenever one is produced, and
  * compilation must succeed exactly when a brute-force enumeration finds
  * any feasible path. Pure driver-side planning — no Spark session. */
class FlowGraphPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A]): A =
    g.apply(Gen.Parameters.default, Seed(97L))
      .getOrElse(sys.error("gen failed"))

  private val formats = Seq("avro", "orc", "parquet", Wildcard)

  private def genGraph(nNodes: Int, nEdges: Int, seed: Long): FlowGraph = {
    val rnd = new scala.util.Random(seed)
    val nodes = (0 until nNodes).map(i =>
      DataNode(s"n$i", active = rnd.nextInt(10) > 0)) // ~10% inactive
    val edges = (0 until nEdges).map { i =>
      val src = s"n${rnd.nextInt(nNodes)}"
      val dst = s"n${rnd.nextInt(nNodes)}"
      val in = formats(rnd.nextInt(formats.length))
      val out = formats(rnd.nextInt(formats.length))
      FlowEdge(s"e$i", src, dst,
        input = if (in == Wildcard) Descriptor(Map.empty)
                else Descriptor(Map("format" -> in)),
        output = if (out == Wildcard) Descriptor(Map.empty)
                 else Descriptor(Map("format" -> out)),
        active = rnd.nextInt(10) > 0)
    }
    FlowGraph(nodes, edges)
  }

  /** Brute-force reachability: enumerate edge-context walks up to a
    * bounded depth with the same visited-context rule. */
  private def reachable(g: FlowGraph, req: FlowRequest): Boolean = {
    val dest = req.destinations.head
    if (!g.node(req.source).active || !g.node(dest).active) return false
    if (req.source == dest && req.output.contains(req.input).isEmpty)
      return true
    val seen = scala.collection.mutable.Set.empty[(String, Map[String, String])]
    def walk(at: String, shape: Descriptor): Boolean = {
      g.edgesFrom(at).exists { e =>
        val key = (e.id, shape.props)
        if (!e.active || !g.node(e.dest).active ||
          e.input.contains(shape).nonEmpty || seen.contains(key)) false
        else {
          seen += key
          val out = e.output.specializedFrom(shape)
          (e.dest == dest && req.output.contains(out).isEmpty) ||
            walk(e.dest, out)
        }
      }
    }
    walk(req.source, req.input)
  }

  test("compiled dags are valid; compilation succeeds iff a path exists") {
    val cases = sample(Gen.listOfN(60, for {
      seed <- Gen.choose(0L, Long.MaxValue)
      nNodes <- Gen.choose(2, 6)
      nEdges <- Gen.choose(1, 10)
      inFmt <- Gen.oneOf("avro", "orc", "parquet")
      outFmt <- Gen.oneOf("avro", "orc", "parquet", Wildcard)
    } yield (seed, nNodes, nEdges, inFmt, outFmt)))

    var compiled = 0
    cases.foreach { case (seed, nNodes, nEdges, inFmt, outFmt) =>
      val g = genGraph(nNodes, nEdges, seed)
      val rnd = new scala.util.Random(seed ^ 0x5f5f)
      val req = FlowRequest(s"n${rnd.nextInt(nNodes)}",
        Seq(s"n${rnd.nextInt(nNodes)}"),
        input = Descriptor(Map("format" -> inFmt)),
        output = if (outFmt == Wildcard) Descriptor(Map.empty)
                 else Descriptor(Map("format" -> outFmt)))
      val expect = reachable(g, req)
      scala.util.Try(compile(g, req)) match {
        case scala.util.Success(plans) =>
          assert(expect, s"compiled a plan where brute force finds none " +
            s"(seed=$seed req=$req plans=${plans.map(_.edgeId)})")
          compiled += 1
          // structural validity: hops connect, shapes thread, deps exist
          val byName = plans.map(p => p.name -> p).toMap
          plans.foreach { p =>
            p.dependsOn.foreach { d =>
              val up = byName(d)
              assert(up.destNode == p.srcNode,
                s"hop ${p.name} does not start where ${up.name} ended")
              assert(p.input == up.output,
                s"hop ${p.name} input shape != upstream output")
            }
          }
          // terminal hops end at the destination with a satisfying shape
          val terminals = plans.filterNot(p =>
            plans.exists(_.dependsOn.contains(p.name)))
          if (req.source != req.destinations.head || plans.nonEmpty)
            assert(terminals.exists(t =>
              t.destNode == req.destinations.head &&
                req.output.contains(t.output).isEmpty),
              s"no terminal hop satisfies the request (seed=$seed)")
        case scala.util.Failure(_: CompilationError) =>
          assert(!expect,
            s"brute force finds a path the compiler missed (seed=$seed req=$req)")
        case scala.util.Failure(other) => throw other
      }
    }
    // the generator must exercise BOTH outcomes or the law is vacuous
    assert(compiled > 5 && compiled < 60,
      s"degenerate case mix: $compiled/60 compiled")
  }
}
