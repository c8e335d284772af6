package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN GRAPH construction: top-k cosine neighbors for EVERY corpus
  * vector (dedup clustering, semantic-coverage analysis, graph-based
  * label propagation all start here). Different problem from ANN
  * *search* ([[Ann.ivfTopK]]): there the query set is small and
  * broadcast; here the corpus queries itself, so NOTHING may be
  * broadcast and the pairing must be confined — the all-pairs join is
  * O(n²) and fatal at corpus scale.
  *
  * Scale shape of [[build]]: one IVF assignment pass, then ONE shuffle
  * join keyed by cell (probe side explodes to nprobe rows per vector),
  * candidates per cell ≈ (n/numCells)·nprobe·(n/numCells) — quadratic
  * only WITHIN a cell, like [[SemDeDup]]'s pairing; top-k per source is
  * a rank window over the candidate set. Oversized cells (a degenerate
  * centroid attracting everything) are RECURSIVELY SPLIT with a
  * quantizer trained within the cell, never ground through; only a cell
  * still oversized after `shedDepth` splits is terminally shed — loudly,
  * and symmetrically (its sources emit no edges rather than silently
  * degraded ones). Cell sizes come from a counts-only aggregate
  * (shuffles (cell, 1) pairs, map-side combined — not vectors).
  *
  * [[brute]] is the exact baseline (guarded cartesian — refuses past
  * `maxRows`); [[recallVsBrute]] is the independent certification
  * probe: exact top-k for a hash-sample of sources vs the graph's
  * edges, the caller gates on the returned counts.
  */
object KnnGraph {

  /** Exact graph by guarded all-pairs: REFUSES corpora past `maxRows`
    * (the cartesian is O(n²); past the bound use [[build]]). Output
    * `(src_id, neighbor_id, cosine, rank)`, rank 1..k by (cosine desc,
    * neighbor asc). */
  def brute(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
            maxRows: Long = 1L << 16): DataFrame = {
    val n = corpus.count()
    require(n <= maxRows,
      s"brute kNN graph over $n rows is O(n²)=${n * n} pairs — past " +
        s"maxRows=$maxRows; use KnnGraph.build (IVF-confined) instead")
    val a = corpus.select(col(idCol).as("src_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val b = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    topK(a.crossJoin(b).filter(col("neighbor_id") =!= col("src_id")), k)
  }

  /** IVF-confined approximate graph. Each vector probes its `nprobe`
    * nearest cells and pairs only against vectors ASSIGNED to those
    * cells. Recall is 1.0 when clusters are tighter than cells (the
    * separable case) and degrades gracefully with cluster overlap —
    * measure with [[recallVsBrute]] before trusting the graph.
    *
    * Oversized cells (a degenerate centroid attracting everything —
    * at web scale the hottest semantic region) are RECURSED, not
    * dropped: a fresh quantizer is trained WITHIN each shed cell and
    * its vectors pair in sub-cells, so the work stays bounded without
    * losing the densest vectors' edges. Only when `shedDepth` levels
    * of splitting cannot get a cell under `maxCellSize` (identical-
    * vector hubs) is it terminally shed — loudly (stderr + optional
    * `knn_graph.shed_cells`/`knn_graph.shed_vectors` gauges), and
    * SYMMETRICALLY across the WHOLE graph: the ids of sources assigned
    * to a terminally shed cell are propagated back up and anti-joined
    * out before topK, so such a source emits NO edges at all — not a
    * top-k built from only its other probed cells' candidates. Every
    * emitted top-k therefore includes its source's ASSIGNED (dominant)
    * cell's candidates; a source that merely probed INTO a shed cell as
    * a secondary loses those candidates like any other recall miss. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
            numCells: Int = 64, nprobe: Int = 2,
            maxCellSize: Long = 100000L,
            model: Option[Ann.IvfModel] = None,
            metrics: Option[graft.metrics.MetricContext] = None,
            shedDepth: Int = 2): DataFrame = {
    val m = model.getOrElse(Ann.ivfTrain(corpus, idCol, vecCol, numCells))
    val vec = col(vecCol).cast("array<double>")
    val cand = corpus.select(col(idCol).as("neighbor_id"), vec.as("__cv"),
      Ann.assignCell(vec, m).as("cell"))
    // __dom: this source's DOMINANT-cell lineage passes through the
    // current (sub-)pass — true for everyone at depth 0, and thereafter
    // only while the source's assigned cell IS the recursed cell. A
    // terminal shed may only swallow sources whose dominant lineage
    // reached the shed cell; a secondary prober merely loses the shed
    // cell's candidates (a recall miss, not an erasure).
    val probes = corpus.select(col(idCol).as("src_id"), vec.as("__qv"),
      Ann.assignCell(vec, m).as("assigned"), lit(true).as("__dom"),
      explode(Ann.probeCells(vec, m, nprobe)).as("probe"))
      .select(col("src_id"), col("__qv"), col("assigned"), col("__dom"),
        col("probe.cell").cast("int").as("cell"))
    val (pairs, shedSrcSets) = confined(cand, probes, numCells, nprobe,
      maxCellSize, metrics, depth = 0, maxDepth = shedDepth)
    // global shed symmetry: a terminally-shed source's candidates from
    // OTHER probed cells (possibly at shallower levels) must go too —
    // the common no-shed case pays nothing (no join at all)
    val filtered = shedSrcSets.reduceOption(_ unionByName _) match {
      case None => pairs
      case Some(shed) => pairs.join(shed, Seq("src_id"), "left_anti")
    }
    topK(filtered, k)
  }

  /** One confinement level: pair within non-oversized cells, recurse
    * into oversized ones. `cand` is (neighbor_id, __cv, cell) — each
    * vector assigned to exactly one cell; `probes` is (src_id, __qv,
    * assigned, cell) — one row per probed cell. Candidate pairs cannot
    * repeat within a level (one assignment x distinct probes), and
    * cannot repeat ACROSS levels (a recursed cell's candidates are
    * excluded from this level's join), so no distinct is needed.
    * Recursion work: the common no-shed case adds nothing; a shed cell
    * costs a bounded-sample retrain plus map-only re-filters of the
    * assignment pass (shed cells are few and loud by construction).
    *
    * Returns (pairs, terminally-shed source-id frames): any source whose
    * DOMINANT-lineage cell (assigned at depth 0, then followed through
    * each recursed assignment — the `__dom` flag) was terminally shed is
    * reported so the caller can drop its pairs from every level before
    * topK — without that, a source shed at depth > 0 would keep its
    * shallower-level candidates and emit a silently incomplete top-k. A
    * source that probed a shed cell only as a SECONDARY keeps its other
    * candidates (sub-model assignments of secondaries say nothing about
    * their true dominant cell). */
  private def confined(cand: DataFrame, probes: DataFrame, numCells: Int,
                       nprobe: Int, maxCellSize: Long,
                       metrics: Option[graft.metrics.MetricContext],
                       depth: Int, maxDepth: Int): (DataFrame, Seq[DataFrame]) = {
    // counts-only pass: (cell, 1) pairs, map-side combined — cheap next
    // to the vector shuffle it protects against
    val oversized = cand.groupBy("cell").count()
      .filter(col("count") > maxCellSize)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val shedCells = oversized.map(_._1).toSet
    val pairLevel = { (cs: DataFrame, ps: DataFrame) =>
      ps.join(cs, "cell").filter(col("neighbor_id") =!= col("src_id"))
        .select("src_id", "__qv", "neighbor_id", "__cv")
    }
    if (shedCells.isEmpty) (pairLevel(cand, probes), Nil)
    else if (depth >= maxDepth) {
      // terminal: splitting can no longer bound the cell — shed it, and
      // shed its SOURCES with it (their dominant candidates live here;
      // emitting their top-k from other probes would be silently wrong).
      // The shed sources' ids flow back up so the caller also drops any
      // pairs they produced at shallower levels.
      System.err.println(s"[knn-graph] TERMINALLY shedding " +
        s"${shedCells.size} cells still > $maxCellSize after $depth " +
        s"splits: " +
        oversized.map { case (c0, n0) => s"$c0($n0)" }.mkString(", "))
      metrics.foreach { mc =>
        mc.gauge("knn_graph.shed_cells", shedCells.size.toLong)
        mc.gauge("knn_graph.shed_vectors", oversized.map(_._2).sum)
      }
      // only DOMINANT-lineage sources are erased with the cell: a source
      // that probed in as a secondary (its true dominant cell elsewhere,
      // intact) keeps its other candidates — losing the shed cell's is a
      // recall miss, not grounds to anti-join its whole top-k away
      val dropSrc = col("__dom") && col("assigned").isInCollection(shedCells)
      val shedSrcs = probes.filter(dropSrc).select("src_id").distinct()
      (pairLevel(
        cand.filter(!col("cell").isInCollection(shedCells)),
        probes.filter(!col("cell").isInCollection(shedCells) && !dropSrc)),
        Seq(shedSrcs))
    } else {
      System.err.println(s"[knn-graph] recursing into ${shedCells.size} " +
        s"oversized cells (> $maxCellSize) at depth $depth: " +
        oversized.map { case (c0, n0) => s"$c0($n0)" }.mkString(", "))
      val main = pairLevel(
        cand.filter(!col("cell").isInCollection(shedCells)),
        probes.filter(!col("cell").isInCollection(shedCells)))
      val subs = shedCells.toSeq.sorted.map { cellId =>
        val subCand0 = cand.filter(col("cell") === lit(cellId))
          .select("neighbor_id", "__cv")
        val subModel = Ann.ivfTrain(subCand0, "neighbor_id", "__cv", numCells)
        val subCand = subCand0.select(col("neighbor_id"), col("__cv"),
          Ann.assignCell(col("__cv"), subModel).as("cell"))
        // sub-pass sources: everyone who probed INTO the shed cell, plus
        // the cell's own vectors. The latter are usually among the
        // probers (the assigned cell ranks first), but not under exact
        // score ties — a degenerate all-equal-centroid model breaks the
        // argmax/sort tie the two ways — so they are united explicitly
        // (anti-join is cell-bounded)
        // dominant lineage follows the recursion only for sources whose
        // PARENT assignment is this cell; candidates are dominant by
        // construction (cand filters by assignment at every level)
        val probers = probes.filter(col("cell") === lit(cellId))
          .select(col("src_id"), col("__qv"),
            (col("__dom") && col("assigned") === lit(cellId)).as("__dom"))
        val ownVectors = subCand0
          .select(col("neighbor_id").as("src_id"), col("__cv").as("__qv"),
            lit(true).as("__dom"))
          .join(probers.select("src_id"), Seq("src_id"), "left_anti")
        val subProbes = probers.unionByName(ownVectors)
          .select(col("src_id"), col("__qv"), col("__dom"),
            Ann.assignCell(col("__qv"), subModel).as("assigned"),
            explode(Ann.probeCells(col("__qv"), subModel, nprobe)).as("probe"))
          .select(col("src_id"), col("__qv"), col("assigned"), col("__dom"),
            col("probe.cell").cast("int").as("cell"))
        confined(subCand, subProbes, numCells, nprobe, maxCellSize,
          metrics, depth + 1, maxDepth)
      }
      (subs.map(_._1).foldLeft(main)(_ unionByName _),
        subs.flatMap(_._2))
    }
  }

  /** Semantic clusters: connected components of the (optionally
    * MUTUAL) kNN graph — the SemDeDup-style "what topical groups does
    * the corpus contain" pass, at graph scale. Mutual filtering (keep
    * an edge only when BOTH endpoints rank each other) is the standard
    * noise guard: a hub vector ranking into everyone's top-k cannot
    * chain unrelated clusters unless they rank it back. Output
    * `(idCol, cluster_id)` for every corpus vector; singletons are
    * their own cluster ([[graft.dedup.DupClusters.resolve]] semantics,
    * including its driver/distributed hybrid execution — and its cache
    * contract: the component map stays persisted for re-derivability;
    * eager unpersist would be unsafe on the checkpointed distributed
    * path, so sessions running MANY clusterings should clear it
    * between runs). */
  def clusters(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               numCells: Int = 64, nprobe: Int = 2, mutual: Boolean = true,
               maxCellSize: Long = 100000L,
               model: Option[Ann.IvfModel] = None): DataFrame = {
    val g = build(corpus, idCol, vecCol, k, numCells, nprobe,
      maxCellSize, model)
    // persisted: the mutual semi-join references the edge set TWICE
    // (forward + swapped), and each reference would re-run the whole
    // IVF pairing + top-k window otherwise; released once resolve has
    // materialized its component labels
    val e = g.select(col("src_id"), col("neighbor_id")).persist()
    try {
      val kept = if (!mutual) e
        else e.join(e.select(col("neighbor_id").as("src_id"),
            col("src_id").as("neighbor_id")),
          Seq("src_id", "neighbor_id"), "left_semi")
      val pairs = kept.select(
          least(col("src_id"), col("neighbor_id")).as("id_a"),
          greatest(col("src_id"), col("neighbor_id")).as("id_b"))
        .distinct()
      graft.dedup.DupClusters.resolve(corpus.select(col(idCol)), idCol, pairs)
    } finally { e.unpersist(); () }
  }

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("cosine", Ann.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src_id", "neighbor_id", "cosine", "rank")
  }

  /** Certification probe: exact top-k (via [[Ann.bruteForceTopK]] —
    * the SAMPLE broadcasts, never the corpus) for a deterministic
    * hash-sample of sources, compared against the graph's edges.
    * Returns (matchedEdges, truthEdges); recall = matched/truth. The
    * caller gates: `require(matched * 1000 >= minPermille * truth)`. */
  def recallVsBrute(corpus: DataFrame, graph: DataFrame, idCol: String,
                    vecCol: String, k: Int,
                    samplePermille: Int = 50): (Long, Long) = {
    require(samplePermille > 0 && samplePermille <= 1000,
      s"samplePermille $samplePermille not in (0,1000]")
    val sample = corpus.filter(pmod(graft.text.TextStats.portableHash60(
      concat(lit("knn:"), col(idCol).cast("string"))), lit(1000L))
      < samplePermille)
    // persisted: the truth set is sample-sized, but recomputing it
    // would re-run the exact scoring pass over the WHOLE corpus
    val truth = Ann.bruteForceTopK(corpus, sample, idCol, vecCol, k)
      .select(col("query_id").as("src_id"), col("neighbor_id"))
      .persist()
    try {
      val total = truth.count()
      val matched = truth.join(graph.select("src_id", "neighbor_id"),
        Seq("src_id", "neighbor_id"), "left_semi").count()
      (matched, total)
    } finally { truth.unpersist(); () }
  }
}
