package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions — the "would this survive 100×?" checks.
  * These pin the plan shapes that matter at scale: column pruning and
  * filter pushdown reaching the parquet scan, broadcast joins for small
  * sides, and no redundant shuffles in the dedup path.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q01 projection prunes columns at the parquet scan") {
    val p = planOf(q("q01_project"))
    assert(p.contains("ReadSchema"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads more than projected: $read")
  }

  test("q02 filter is pushed to the parquet scan") {
    val p = planOf(q("q02_filter"))
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("o_orderstatus"),
      s"filter not pushed down: $pushed")
  }

  test("q08 incremental chunks push the watermark range into the scan") {
    val p = planOf(q("q08_incremental"))
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.nonEmpty && pushed.forall(_.contains("o_orderdate")),
      s"watermark predicates not pushed: $pushed")
  }

  test("q10 purge uses a broadcast anti-join (no shuffle of the big side)") {
    val p = planOf(q("q10_purge"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"purge should broadcast the delete-key side:\n$p")
    assert(p.contains("LeftAnti"))
  }

  test("q06 dedup shuffles exactly once (window over one key partition)") {
    val p = planOf(q("q06_dedup_delta"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n$p")
    // map-side top-1 pruning before the shuffle (WindowGroupLimit Partial)
    assert(p.contains("WindowGroupLimit"))
  }

  test("q09 window aggregation does partial aggregation before the shuffle") {
    val p = planOf(q("q09_audit_window"))
    assert(p.contains("HashAggregate"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <=1 shuffle, saw $exchanges")
  }

  test("q28 ANN broadcast: corpus is not shuffled for scoring") {
    val p = planOf(q("q28_ann_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side should be broadcast:\n$p")
  }

  test("whole-stage codegen covers the text-quality pipeline (no UDFs)") {
    val p = planOf(q("q25_quality_score"))
    assert(p.contains("codegen id"))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("q21 minhash: no cartesian product, documents scanned at most 3x") {
    // bands -> groupBy(bucket) -> pair explode -> verify joins; the old
    // self-join formulation re-evaluated the signature pipeline per side
    val df = q("q21_minhash_pairs")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"), s"cartesian in minhash plan:\n$p")
    val docScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(docScans <= 3, s"documents scanned $docScans times")
    // the signature never materializes: only band hashes appear
    assert(p.contains("minhash_band_hashes"))
    assert(!p.contains("minhash_signature"))
  }

  test("q41 offset ranges push the partition/offset predicate to the scan") {
    val p = planOf(q("q41_offset_ranges"))
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("event_id")),
      s"offset-range predicate not pushed: $pushed")
  }

  test("bucketed tables join with ZERO shuffles on either side") {
    import graft.operators.Bucketing
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    try {
      Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4,
        sortBy = Seq("o_orderkey"))
      Bucketing.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", Seq("o_orderkey"), 4, sortBy = Seq("o_orderkey"))
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        "o_orderkey")
      // matching bucket layouts: the join plans with no Exchange at all
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = planOf(spark.table("b_orders").join(
          spark.table("b_lineitem"), "o_orderkey"))
        val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
        assert(exchanges == 0, s"bucketed join should not shuffle:\n$p")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      assert(joined.count() == li.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q36 components: edges never join against the full documents table") {
    val p = planOf(q("q36_dup_clusters"))
    assert(!p.contains("CartesianProduct"))
    // final resolve joins docs LEFT to the tiny component table
    assert(p.contains("LeftOuter") || p.contains("BroadcastHashJoin"),
      s"resolve should left-join components:\n$p")
  }

  test("q43 embed near-dup: banded bucket join, never an all-pairs product") {
    val p = planOf(q("q43_embed_neardup"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup must stay bucket-joined, not all-pairs:\n$p")
    // candidate generation groups on (table, signature) buckets
    assert(p.contains("srp_signatures"))
  }

  test("q47 IVF: probe side is broadcast, corpus assignment is map-only") {
    val p = planOf(q("q47_ivf_ann"))
    assert(p.contains("BroadcastHashJoin"),
      s"query probes should broadcast against the assigned corpus:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q64 IVF index search prunes unprobed cells via partition filters") {
    val p = planOf(q("q64_ivf_indexed"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"),
      s"index scan must carry a partition filter on cell: $pf\n$p")
    // probes (tiny) broadcast against the pruned corpus cells
    assert(p.contains("BroadcastHashJoin"), s"probe join should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q49 salted join result plan carries the composite (key, salt) join") {
    val p = planOf(q("q49_salted_join"))
    assert(p.contains("__graft_salt"),
      s"salt must be part of the join keys:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q68 repetition signals are map-only: zero exchanges") {
    val p = planOf(q("q68_gopher_repetition"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 0, s"expected a pure map, saw $exchanges shuffles:\n$p")
  }

  test("q91 quality filter: codegen bigram aggregation, no interpreted HOFs") {
    // Round 18 traded the old zero-exchange spelling — whose
    // transform/aggregate array HOFs are CodegenFallback and evaluated
    // INTERPRETED per element, the measured bottleneck — for a
    // posexplode + lead window; that shuffled one row PER TOKEN and
    // scanned documents twice. Round 19 builds adjacent pairs per row
    // (slice/arrays_zip — codegen) so the bigram explode needs no
    // window and the base signals ride the single scan through the
    // aggregates. The pin: no lambda HOFs, ONE documents scan, no join
    // or window at all, and only the two partial-count aggregation
    // exchanges ((doc, bigram) then (doc)) — never a token-granularity
    // shuffle.
    val p = planOf(q("q91_quality_filter"))
    assert(!p.contains("lambdafunction"),
      s"interpreted array-HOF expressions crept back into the plan:\n$p")
    assert("(?m)^\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"documents must be scanned exactly once:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"bigram stats must aggregate in place, not join or window:\n$p")
    // the generate must not re-evaluate the per-doc stats per bigram row:
    // the split/stat projection sits BELOW the Generate
    assert("(?s)Generate.*\\n\\s*\\+- Project".r.findFirstIn(p).isDefined,
      s"per-doc stats must be projected below the Generate:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <= 2 shuffles, saw $exchanges:\n$p")
  }

  test("HammingBands.pairs: one banded shuffle; the self-join reads the cache") {
    // Round 19 shape: bucket sizes ride a window count over ONE
    // exchange of the banded rows, persisted; both self-join sides
    // inherit the window's (band, value) partitioning from the cache.
    // The pin: exactly one hashpartitioning(band, value) exchange in
    // the whole pairs plan (the window's — the join must NOT re-shuffle
    // either side), plus the final pair-dedup distinct's.
    import org.apache.spark.sql.functions._
    val hashes = spark.range(64).select(col("id"),
      xxhash64(col("id")).as("h"))
    val p = planOf(graft.dedup.HammingBands.pairs(
      hashes, "id", "h", maxHamming = 3, maxBucket = 100, tag = "pin"))
    assert(p.contains("InMemoryTableScan"),
      s"join sides must read the persisted counted frame:\n$p")
    // the OUTER query (everything above the cached banded frame) may
    // shuffle exactly once — the final pair-dedup distinct. The
    // candidate join itself must add no exchange: its sides inherit
    // the window's (band, value) partitioning from the cache (or one
    // side broadcasts, as AQE chooses at small sizes).
    val outer = p.substring(0, p.indexOf("InMemoryRelation"))
    val outerExchanges = "\\+- Exchange ".r.findAllIn(outer).size
    assert(outerExchanges <= 1,
      s"the candidate join must not re-shuffle the banded frame " +
        s"(saw $outerExchanges outer exchanges):\n$p")
  }

  test("q72 decontamination broadcasts the eval grams, anti-joins the verdict") {
    val p = planOf(q("q72_decontaminate"))
    assert(p.contains("BroadcastHashJoin"),
      s"eval-set grams must broadcast, never shuffle the corpus grams:\n$p")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q67 incremental dedup verifies sketch positives with an anti-join") {
    val p = planOf(q("q67_incremental_dedup"))
    assert(p.contains("LeftAnti"), s"exact verify join missing:\n$p")
    // one aggregation for the survivor min-id collapse on each union arm
    assert(p.contains("HashAggregate"))
  }

  test("q70 tfidf plan has no cartesian join and bounded shuffles") {
    val p = planOf(q("q70_tfidf_topk"))
    assert(!p.contains("CartesianProduct"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    // tf agg, df agg, tf-side re-key to term, window by doc
    assert(exchanges <= 4, s"expected <=4 shuffles, saw $exchanges:\n$p")
  }

  test("q76 config retention broadcasts the policy table; big shuffle stays on (dataset, version)") {
    val p = planOf(q("q76_config_retention"))
    // the O(datasets) policy table must broadcast, never sort-merge
    assert(p.contains("BroadcastHashJoin"), s"policy join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
    // exactly 2 row shuffles: the events aggregation distributes on
    // (event_type, d) — the well-spread key — and only the already-
    // aggregated O(datasets × days) rows re-shuffle for the window.
    // (Re-keying the RAW scan by event_type alone would save one
    // exchange but concentrate 100 TB onto O(datasets) partitions.)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 shuffles, saw $exchanges:\n$p")
  }
}
