package graft

/** Physical-plan pins for the round-9 report queries — the shuffle
  * budget each plan is ALLOWED is asserted, so a regression that adds
  * an exchange (or collapses a distributed window to a single
  * partition) fails loudly here rather than surfacing as a mystery
  * slowdown at scale. */
class PlanAuditSpec extends SparkSpec {

  private def counts(q: String): (Int, Int, Int, Int) = {
    val plan = SparkEntry.queries(q)(spark, sf)
      .queryExecution.executedPlan.toString
    ("Exchange hashpartitioning".r.findAllIn(plan).length,
      "Exchange SinglePartition".r.findAllIn(plan).length,
      "\\bSort \\[".r.findAllIn(plan).length,
      "BroadcastNestedLoop".r.findAllIn(plan).length)
  }

  test("cube report: ONE exchange carries all grouping sets") {
    val (hash, single, _, bnl) = counts("q138_cube_report")
    assert(hash == 1 && single == 0 && bnl == 0)
  }

  test("pivot: partial reduce before the wide-row shuffle, nothing more") {
    val (hash, single, sorts, bnl) = counts("q139_pivot_wide")
    assert(hash <= 2 && single == 0 && sorts == 0 && bnl == 0)
  }

  test("transition matrix: one sort, window + pair-count exchanges only") {
    val (hash, single, sorts, bnl) = counts("q147_transition_matrix")
    assert(hash <= 2 && single == 0 && sorts == 1 && bnl == 0)
  }

  test("grouped percentiles: the cumulative window is NEVER single-partition") {
    val (hash, single, sorts, bnl) = counts("q149_grouped_percentiles")
    assert(hash <= 2 && single == 0 && sorts == 1 && bnl == 0)
  }

  test("training pipeline packing stage: bucketed prefix sum, benign offset window only") {
    val (hash, single, sorts, bnl) = counts("q151_training_pipeline")
    // the one SinglePartition exchange is ShardPack's ≤buckets-row
    // offset window (documented there); the corpus itself never
    // collapses
    assert(hash <= 2 && single <= 1 && sorts <= 2 && bnl == 0)
  }
}
