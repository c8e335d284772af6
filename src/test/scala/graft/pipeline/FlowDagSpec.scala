package graft.pipeline

import graft.SparkSpec

class FlowDagSpec extends SparkSpec {

  private def leafSpec(name: String, in: String, out: String,
                       filter: Option[String] = None) =
    PipelineSpec(name = name,
      source = SourceSpec(format = "parquet", path = in),
      branches = Seq(BranchSpec(name = "main", filterExpr = filter,
        outDir = out)))

  test("topoOrder respects dependencies, keeps declaration order for ties") {
    val a = FlowDag.FlowNode(leafSpec("a", "/i", "/o"))
    val b = FlowDag.FlowNode(leafSpec("b", "/i", "/o"), dependsOn = Seq("a"))
    val c = FlowDag.FlowNode(leafSpec("c", "/i", "/o"), dependsOn = Seq("a"))
    val d = FlowDag.FlowNode(leafSpec("d", "/i", "/o"), dependsOn = Seq("b", "c"))
    // declaration order (d, c, b, a) breaks the b/c tie: c was declared
    // before b, so it runs first
    val order = FlowDag.topoOrder(Seq(d, c, b, a)).map(_.spec.name)
    assert(order == Seq("a", "c", "b", "d"))
  }

  test("cycles and unknown deps are rejected loudly") {
    val a = FlowDag.FlowNode(leafSpec("a", "/i", "/o"), dependsOn = Seq("b"))
    val b = FlowDag.FlowNode(leafSpec("b", "/i", "/o"), dependsOn = Seq("a"))
    val e1 = intercept[IllegalArgumentException](FlowDag.topoOrder(Seq(a, b)))
    assert(e1.getMessage.contains("cycle"))
    val c = FlowDag.FlowNode(leafSpec("c", "/i", "/o"), dependsOn = Seq("nope"))
    val e2 = intercept[IllegalArgumentException](FlowDag.topoOrder(Seq(c)))
    assert(e2.getMessage.contains("unknown job"))
  }

  test("two-hop flow hands published output to the downstream job") {
    val dir = tmpDir("flowdag")
    val nodes = FlowDag.fromProperties(Map(
      "flow.name" -> "two-hop",
      "job.1.job.name" -> "extract",
      "job.1.source.format" -> "parquet",
      "job.1.source.path" -> s"$sf/orders.parquet",
      "job.1.transform.1" -> "selectExpr:o_orderkey;o_orderstatus;o_totalprice",
      "job.1.fork.1.name" -> "main",
      "job.1.fork.1.out" -> s"$dir/hop1",
      "job.2.job.name" -> "load",
      "job.2.dependsOn" -> "extract",
      "job.2.source.format" -> "parquet",
      "job.2.source.path" -> s"$dir/hop1",
      "job.2.fork.1.name" -> "main",
      "job.2.fork.1.filter" -> "o_orderstatus = 'F'",
      "job.2.fork.1.out" -> s"$dir/hop2"))
    assert(nodes.map(_.spec.name) == Seq("extract", "load"))
    assert(nodes(1).dependsOn == Seq("extract"))

    val res = FlowDag.run(spark, nodes, "flowrun1")
    assert(res("extract").status == FlowDag.Succeeded)
    assert(res("load").status == FlowDag.Succeeded)
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderstatus = 'F'").count()
    assert(spark.read.parquet(s"$dir/hop2").count() == expected)
    assert(res("load").result.get.branchCounts("main") == expected)
  }

  test("a failed node cancels descendants but independent branches run") {
    val dir = tmpDir("flowdag-fail")
    val bad = FlowDag.FlowNode(
      leafSpec("bad", s"$dir/does-not-exist", s"$dir/bad-out"))
    val child = FlowDag.FlowNode(
      leafSpec("child", s"$dir/bad-out", s"$dir/child-out"),
      dependsOn = Seq("bad"))
    val grandchild = FlowDag.FlowNode(
      leafSpec("grandchild", s"$dir/child-out", s"$dir/gc-out"),
      dependsOn = Seq("child"))
    val indep = FlowDag.FlowNode(
      leafSpec("indep", s"$sf/nation.parquet", s"$dir/indep-out"))
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val res = FlowDag.run(spark, Seq(bad, child, grandchild, indep),
      "flowrun2", ledger = Some(ledger))
    assert(res("bad").status == FlowDag.Failed)
    assert(res("child").status == FlowDag.Cancelled)
    assert(res("grandchild").status == FlowDag.Cancelled)
    assert(res("indep").status == FlowDag.Succeeded)
    assert(spark.read.parquet(s"$dir/indep-out").count() > 0)
    // every node outcome is in the job-history ledger
    val hist = ledger.history.collect()
      .map(r => r.getAs[String]("job") -> r.getAs[String]("status")).toMap
    assert(hist == Map("bad" -> "FAILED", "child" -> "CANCELLED",
      "grandchild" -> "CANCELLED", "indep" -> "SUCCEEDED"))
    assert(ledger.history.filter("job = 'bad'").head()
      .getAs[String]("detail").nonEmpty)
  }
}
