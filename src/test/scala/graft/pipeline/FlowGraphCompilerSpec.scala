package graft.pipeline

import graft.{SparkSpec, Tables}
import graft.pipeline.FlowGraphCompiler._

class FlowGraphCompilerSpec extends SparkSpec {

  private def d(kv: (String, String)*) = Descriptor(kv.toMap)

  // the canonical multi-hop topology: an ingest cluster, a compute
  // cluster, and two serving clusters, with conversion available only on
  // compute
  private val graph = FlowGraph(
    nodes = Seq(DataNode("ingest"), DataNode("compute"),
      DataNode("serveA"), DataNode("serveB"), DataNode("dark", active = false)),
    edges = Seq(
      FlowEdge("cp_ing_cmp", "ingest", "compute",
        input = d("platform" -> "hdfs"), output = d(), // pass-through copy
        props = Map("template" -> "distcp")),
      FlowEdge("convert_orc", "compute", "compute",
        input = d("format" -> "avro"), output = d("format" -> "orc"),
        props = Map("template" -> "avro2orc")),
      FlowEdge("cp_cmp_a", "compute", "serveA",
        input = d(), output = d(), props = Map("template" -> "distcp")),
      FlowEdge("cp_cmp_b", "compute", "serveB",
        input = d(), output = d(), props = Map("template" -> "distcp")),
      FlowEdge("cp_cmp_dark", "compute", "dark",
        input = d(), output = d()),
      // a cycle back to ingest: BFS must still terminate
      FlowEdge("cp_cmp_ing", "compute", "ingest",
        input = d(), output = d())))

  test("descriptor contains/specialize semantics") {
    assert(d("format" -> "avro").contains(d("format" -> "avro", "x" -> "1")).isEmpty)
    assert(d("format" -> "avro").contains(d("format" -> "orc")).nonEmpty)
    // a pinned requirement is NOT satisfied by a wildcard on the dataset
    assert(d("format" -> "avro").contains(d()).nonEmpty)
    assert(d().contains(d("format" -> "orc")).isEmpty)
    // pass-through output inherits the in-flight shape; pinned keys override
    val out = d("codec" -> "gzip").specializedFrom(d("format" -> "orc", "codec" -> "none"))
    assert(out == d("format" -> "orc", "codec" -> "gzip"))
  }

  test("multi-hop compile: conversion happens en route, descriptors thread") {
    val plans = compile(graph, FlowRequest("ingest", Seq("serveA"),
      input = d("platform" -> "hdfs", "format" -> "avro"),
      output = d("format" -> "orc")))
    assert(plans.map(_.edgeId) == Seq("cp_ing_cmp", "convert_orc", "cp_cmp_a"))
    // the copy hop forwarded avro; the convert hop pinned orc
    assert(plans(0).output.get("format") == "avro")
    assert(plans(1).output.get("format") == "orc")
    assert(plans(2).output.get("format") == "orc")
    // dependency chain is linear
    assert(plans.map(_.dependsOn) ==
      Seq(Nil, Seq(plans(0).name), Seq(plans(1).name)))
    // hop props carry the edge's job template
    assert(plans(1).props("template") == "avro2orc")
  }

  test("shared prefix across destinations compiles once") {
    val plans = compile(graph, FlowRequest("ingest", Seq("serveA", "serveB"),
      input = d("platform" -> "hdfs", "format" -> "avro"),
      output = d("format" -> "orc")))
    assert(plans.map(_.edgeId) ==
      Seq("cp_ing_cmp", "convert_orc", "cp_cmp_a", "cp_cmp_b"))
    // both serving hops depend on the SAME convert hop instance
    assert(plans(2).dependsOn == Seq(plans(1).name) &&
      plans(3).dependsOn == Seq(plans(1).name))
  }

  test("already-satisfied request at the source compiles to an empty dag") {
    val plans = compile(graph, FlowRequest("compute", Seq("compute"),
      input = d("format" -> "orc"), output = d("format" -> "orc")))
    assert(plans.isEmpty)
    // same node but unsatisfied output: the self-loop convert edge serves it
    val convert = compile(graph, FlowRequest("compute", Seq("compute"),
      input = d("format" -> "avro"), output = d("format" -> "orc")))
    assert(convert.map(_.edgeId) == Seq("convert_orc"))
  }

  test("unreachable destination throws a CompilationError naming rejections") {
    val e = intercept[CompilationError] {
      compile(graph, FlowRequest("ingest", Seq("dark"),
        input = d("platform" -> "hdfs", "format" -> "avro"),
        output = d()))
    }
    assert(e.getMessage.contains("no path from ingest to dark"))
    assert(e.getMessage.contains("inactive"))
    // wrong input shape at the first hop is also explained
    val e2 = intercept[CompilationError] {
      compile(graph, FlowRequest("ingest", Seq("serveA"),
        input = d("platform" -> "s3", "format" -> "avro"), output = d()))
    }
    assert(e2.getMessage.contains("required 'hdfs', got 's3'"))
  }

  test("transform-near-source priority: converting path wins over copy-first") {
    // two routes to the dest, both 2 hops; only the route converting at
    // hop 1 satisfies the requested output — and it must also be the
    // one FOUND FIRST because satisfying edges are expanded first
    val g = FlowGraph(
      nodes = Seq(DataNode("src"), DataNode("mid"), DataNode("dst")),
      edges = Seq(
        FlowEdge("copy1", "src", "mid", d(), d()),
        FlowEdge("conv1", "src", "mid", d("format" -> "avro"), d("format" -> "orc")),
        FlowEdge("copy2", "mid", "dst", d(), d()),
        FlowEdge("conv2", "mid", "dst", d("format" -> "avro"), d("format" -> "orc"))))
    val plans = compile(g, FlowRequest("src", Seq("dst"),
      input = d("format" -> "avro"), output = d("format" -> "orc")))
    assert(plans.map(_.edgeId) == Seq("conv1", "copy2"))
  }

  test("compiled dag executes end-to-end through FlowDag") {
    val base = tmpDir("fgc")
    val events = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type")
    events.write.mode("overwrite").parquet(s"$base/ingest")
    val g = FlowGraph(
      nodes = Seq(DataNode("ingest"), DataNode("serve")),
      edges = Seq(
        FlowEdge("land", "ingest", "ingest", d("stage" -> "raw"), d("stage" -> "clean"),
          props = Map("in" -> s"$base/ingest", "out" -> s"$base/clean",
            "filter" -> "event_type = 'click'")),
        FlowEdge("publish", "ingest", "serve", d("stage" -> "clean"), d(),
          props = Map("in" -> s"$base/clean/main", "out" -> s"$base/serve"))))
    val plans = compile(g, FlowRequest("ingest", Seq("serve"),
      input = d("stage" -> "raw"), output = d()))
    assert(plans.map(_.edgeId) == Seq("land", "publish"))
    val nodes = toFlowNodes(plans, p => PipelineSpec(
      name = p.name,
      source = SourceSpec(format = "parquet", path = p.props("in")),
      branches = Seq(BranchSpec(name = "main",
        filterExpr = p.props.get("filter"), outDir = s"${p.props("out")}/main"))))
    val results = FlowDag.run(spark, nodes, runId = "fgc1")
    assert(results.values.forall(_.status == FlowDag.Succeeded),
      s"flow failed: $results")
    val expected = events.filter("event_type = 'click'").count()
    assert(spark.read.parquet(s"$base/serve/main").count() == expected)
  }
}
