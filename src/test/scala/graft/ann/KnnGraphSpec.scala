package graft.ann

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  /** q47-style separable corpus: a +10 spike at dim (vec_id % 16). */
  private def clustered = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
      (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
        lit(10.0)).otherwise(lit(0.0))).as("v"))

  test("build equals brute on separable data; probe reports full recall") {
    val g = KnnGraph.build(clustered, "vec_id", "v", k = 3,
      numCells = 16, nprobe = 2)
    val b = KnnGraph.brute(clustered, "vec_id", "v", k = 3)
    assert(g.select("src_id", "neighbor_id", "rank")
      .except(b.select("src_id", "neighbor_id", "rank")).isEmpty)
    assert(b.select("src_id", "neighbor_id", "rank")
      .except(g.select("src_id", "neighbor_id", "rank")).isEmpty)
    val (m, t) = KnnGraph.recallVsBrute(clustered, g, "vec_id", "v",
      k = 3, samplePermille = 200)
    assert(t > 0 && m == t, s"recall $m/$t")
    // every source has exactly k edges, ranks 1..k
    val perSrc = g.groupBy("src_id").count().select("count").distinct()
    assert(perSrc.as[Long].collect().toSeq == Seq(3L))
  }

  test("the recall probe CATCHES a truncated graph") {
    val g = KnnGraph.build(clustered, "vec_id", "v", k = 3,
      numCells = 16, nprobe = 2)
    val broken = g.filter($"rank" < 3) // drop every 3rd neighbor
    val (m, t) = KnnGraph.recallVsBrute(clustered, broken, "vec_id", "v",
      k = 3, samplePermille = 200)
    assert(m < t, "probe must notice missing edges")
  }

  test("oversized cells shed loudly and are reported in metrics") {
    // all-equal vectors: everything lands in ONE cell of size 500
    val degenerate = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        _ => lit(1.0)).as("v"))
    val mc = graft.metrics.MetricContext.root("knn-shed")
    val g = KnnGraph.build(degenerate, "vec_id", "v", k = 3,
      numCells = 4, nprobe = 1, maxCellSize = 100L, metrics = Some(mc))
    assert(g.isEmpty, "every cell shed: no edges may be ground through")
    assert(mc.gaugeValue("knn_graph.shed_cells").exists(_ >= 1))
    assert(mc.gaugeValue("knn_graph.shed_vectors").contains(500L))
  }

  test("a hub cell recurses into sub-cells: full graph, nothing dropped") {
    // a deliberately degenerate top-level quantizer (trained on constant
    // vectors: all centroids identical) funnels the WHOLE corpus into one
    // hub cell of 500 > maxCellSize=100 — the web-scale worst case where
    // the hottest semantic region IS the oversized cell. The recursion
    // retrains within the hub and pairs in sub-cells, so the graph still
    // comes out complete and exact on separable data.
    val constant = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        _ => lit(1.0)).as("v"))
    val hubModel = Ann.ivfTrain(constant, "vec_id", "v", numCells = 4)
    val g = KnnGraph.build(clustered, "vec_id", "v", k = 3,
      numCells = 16, nprobe = 2, maxCellSize = 100L, model = Some(hubModel))
    // every source got its full k edges — no vector vanished with the hub
    assert(g.select("src_id").distinct().count() == 500)
    val perSrc = g.groupBy("src_id").count().select("count").distinct()
    assert(perSrc.as[Long].collect().toSeq == Seq(3L))
    // and the recursed graph is EXACT (separable data)
    val b = KnnGraph.brute(clustered, "vec_id", "v", k = 3)
    assert(g.select("src_id", "neighbor_id", "rank")
      .except(b.select("src_id", "neighbor_id", "rank")).isEmpty)
    assert(b.select("src_id", "neighbor_id", "rank")
      .except(g.select("src_id", "neighbor_id", "rank")).isEmpty)
    // independent certification: full recall through the recursion
    val (m, t) = KnnGraph.recallVsBrute(clustered, g, "vec_id", "v",
      k = 3, samplePermille = 200)
    assert(t > 0 && m == t, s"recall $m/$t")
  }

  test("a source shed at depth > 0 emits NO edges — not a degraded top-k") {
    // 450 identical hub vectors (unsplittable at any depth) + 50
    // separable ones. The hub cell recurses, its sub-cell is still one
    // 450-vector hub, and at shedDepth it is TERMINALLY shed. Hub
    // sources probed a separable cell at level 0 too (nprobe = 2) —
    // without global shed propagation they would emit a top-k built from
    // only those secondary candidates, a silently incomplete answer.
    val base = Tables.load(spark, sf, "embeddings")
    val hub = base.filter(col("vec_id") < 450)
      .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
        _ => lit(1.0)).as("v"))
    val separated = base.filter(col("vec_id") >= 450)
      .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(4L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val corpus = hub.unionByName(separated)
    val g = KnnGraph.build(corpus, "vec_id", "v", k = 3,
      numCells = 8, nprobe = 2, maxCellSize = 100L, shedDepth = 1)
      .persist()
    try {
      assert(g.filter(col("src_id") < 450).count() == 0,
        "terminally-shed hub sources leaked edges from secondary probes")
      // every EMITTING source (separable vectors whose assigned cell
      // survived — a few may legitimately assign to the hub centroid and
      // shed with it) keeps its full k edges
      val perSrc = g.filter(col("src_id") >= 450)
        .groupBy("src_id").count().select("count").distinct()
      assert(perSrc.as[Long].collect().toSeq == Seq(3L))
      assert(g.select("src_id").distinct().count() > 0,
        "the shed must not swallow the separable sources wholesale")
    } finally { g.unpersist(); () }
  }

  test("a SECONDARY prober into a terminally-shed cell keeps its full top-k") {
    // the r15 defect: the terminal shed built its source set from the
    // SUB-model's `assigned`, so a separable source that merely probed
    // INTO the hub as its second cell (dominant cell elsewhere, intact)
    // was anti-joined out of the whole graph. Contract: only sources
    // whose DOMINANT lineage reaches the shed cell are erased.
    val base = Tables.load(spark, sf, "embeddings")
    val hub = base.filter(col("vec_id") < 450)
      .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
        _ => lit(1.0)).as("v"))
    val separated = base.filter(col("vec_id") >= 450)
      .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
        (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(4L)),
          lit(10.0)).otherwise(lit(0.0))).as("v"))
    val corpus = hub.unionByName(separated)
    val m = Ann.ivfTrain(corpus, "vec_id", "v", numCells = 8)
    val vec = col("v").cast("array<double>")
    val assigned = corpus.select(col("vec_id"),
      Ann.assignCell(vec, m).as("assigned")).persist()
    try {
      val hubCells = assigned.filter(col("vec_id") < 450)
        .select("assigned").distinct().as[Int].collect().toSeq
      // fixture sanity: some separable sources must probe a hub cell as
      // SECONDARY (assigned elsewhere) or the test pins nothing
      val probed = corpus.select(col("vec_id"),
        Ann.assignCell(vec, m).as("assigned"),
        explode(Ann.probeCells(vec, m, 2)).as("p"))
        .select(col("vec_id"), col("assigned"),
          col("p.cell").cast("int").as("cell"))
      val secondaries = probed.filter(col("vec_id") >= 450 &&
        col("cell").isin(hubCells: _*) &&
        !col("assigned").isin(hubCells: _*))
        .select("vec_id").distinct()
      assert(secondaries.count() > 0,
        "fixture: no separable source probes the hub as secondary")
      val survivors = assigned.filter(col("vec_id") >= 450 &&
        !col("assigned").isin(hubCells: _*))
      val g = KnnGraph.build(corpus, "vec_id", "v", k = 3,
        numCells = 8, nprobe = 2, maxCellSize = 100L,
        model = Some(m), shedDepth = 1).persist()
      try {
        // EVERY dominant-surviving separable source emits a full top-k —
        // including the secondary probers the old code erased
        val emitted = g.select(col("src_id")).distinct()
        val missing = survivors.select(col("vec_id").as("src_id"))
          .exceptAll(emitted)
        assert(missing.isEmpty,
          s"dominant-surviving sources erased: ${missing.limit(5).collect().mkString(", ")}")
        val perSrc = g.filter(col("src_id") >= 450)
          .groupBy("src_id").count().select("count").distinct()
        assert(perSrc.as[Long].collect().toSeq == Seq(3L))
        // and the hub's own (dominant-lineage) sources are still erased
        assert(g.filter(col("src_id") < 450).count() == 0)
      } finally { g.unpersist(); () }
    } finally { assigned.unpersist(); () }
  }

  test("clusters: mutual-kNN components recover the planted classes exactly") {
    // k must give the mutual graph enough edges to CONNECT each ~31-member
    // class (k=5 deterministically strands one vector on this corpus —
    // mutual filtering trades connectivity for chain-robustness)
    val out = KnnGraph.clusters(clustered, "vec_id", "v", k = 10,
      numCells = 16, nprobe = 2)
    // vec_ids are 0..499, so each class's minimum id IS the class index
    val wrong = out.filter(col("cluster_id") =!= pmod(col("vec_id"), lit(16L)))
    assert(wrong.isEmpty, wrong.limit(5).collect().mkString("; "))
    assert(out.select("cluster_id").distinct().count() == 16)
  }

  test("scale pin: build is cell-confined — never a cartesian/nested-loop pairing") {
    // the whole point of the cell join: pairing must stay an equi-join
    // on cell, whatever sizes the optimizer sees. brute IS the
    // nested-loop shape — pin both so a regression is unambiguous.
    val buildPlan = KnnGraph.build(clustered, "vec_id", "v", k = 3,
      numCells = 16, nprobe = 2).queryExecution.executedPlan.toString
    assert(!buildPlan.contains("CartesianProduct") &&
      !buildPlan.contains("BroadcastNestedLoopJoin"), buildPlan.take(500))
    val brutePlan = KnnGraph.brute(clustered, "vec_id", "v", k = 3)
      .queryExecution.executedPlan.toString
    assert(brutePlan.contains("CartesianProduct") ||
      brutePlan.contains("BroadcastNestedLoopJoin"), brutePlan.take(500))
  }

  test("brute refuses corpora past the O(n²) guard") {
    val e = intercept[IllegalArgumentException] {
      KnnGraph.brute(clustered, "vec_id", "v", k = 3, maxRows = 10L)
    }
    assert(e.getMessage.contains("IVF-confined"), e.getMessage)
  }
}
