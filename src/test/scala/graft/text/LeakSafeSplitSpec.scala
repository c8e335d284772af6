package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class LeakSafeSplitSpec extends SparkSpec {
  import spark.implicits._

  test("byGroup: every member of a group lands in the group's band; widths hold") {
    val rows = (1L to 2000L).map(i => (i, i % 97)) // 97 groups, ~20 docs each
      .toDF("doc_id", "grp")
    val out = LeakSafeSplit.byGroup(rows, "grp",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(LeakSafeSplit.leakage(out, "grp").isEmpty)
    // stable: a group's split never depends on which members are present
    val half = LeakSafeSplit.byGroup(rows.filter($"doc_id" <= 1000), "grp",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val full = out.filter($"doc_id" <= 1000).select("doc_id", "split")
    assert(half.select("doc_id", "split").except(full).isEmpty)
    // band proportions roughly hold over the 97 group hashes
    val frac = out.filter($"split" === "train").count().toDouble / 2000
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
  }

  test("byCluster with REAL minhash pairs: near-dups never straddle the cut") {
    val base = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").limit(200)
    // plant near-duplicates: a copy of each doc with one word appended
    val dups = base.select(($"doc_id" + 100000L).as("doc_id"),
      concat($"text", lit(" suffix")).as("text"))
    val docs = base.unionByName(dups)
    val pairs = graft.dedup.MinHashDedup.candidatePairs(
      docs, "doc_id", "text", n = 3, k = 64, numBands = 32)
    assert(pairs.count() > 100, "planted dups must produce candidate pairs")
    val out = LeakSafeSplit.byCluster(docs, "doc_id", pairs,
      Seq("train" -> 90, "test" -> 10))
    assert(LeakSafeSplit.leakage(out, "cluster_id").isEmpty)
    // the planted pair (d, d+100000) shares a split wherever it was paired
    val bySplit = out.select($"doc_id", $"split")
    val joined = bySplit.as("a").join(bySplit.as("b"),
        col("a.doc_id") + 100000L === col("b.doc_id"))
      .join(pairs, col("a.doc_id") === col("id_a") &&
        col("b.doc_id") === col("id_b"), "left_semi")
    assert(joined.filter(col("a.split") =!= col("b.split")).isEmpty,
      "a candidate near-dup pair straddled train/test")
  }

  test("leakage surfaces a planted per-doc (leaky) assignment") {
    val docs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 40L))
      .toDF("doc_id", "cluster_id")
    // leaky: split hashed from the DOC id, not the cluster
    val leaky = graft.operators.Converters.hashSplit("doc_id",
      Seq("train" -> 50, "test" -> 50))(docs)
    // cluster 10's three docs cannot all share a band here (1,2,3 hash
    // apart for this salt-free 2-band cut) — assert the audit fires on
    // whatever straddle exists, and is empty on the safe assignment
    val audit = LeakSafeSplit.leakage(leaky, "cluster_id").collect()
    val safe = LeakSafeSplit.byGroup(docs, "cluster_id",
      Seq("train" -> 50, "test" -> 50))
    assert(LeakSafeSplit.leakage(safe, "cluster_id").isEmpty)
    // the leaky one fires iff the docs of cluster 10 actually disagree
    val splits = leaky.filter($"cluster_id" === 10L)
      .select("split").distinct().count()
    if (splits > 1) {
      assert(audit.nonEmpty && audit.head.getAs[Long]("n_splits") == splits)
      assert(audit.head.getAs[scala.collection.Seq[String]]("splits")
        .sorted == audit.head.getAs[scala.collection.Seq[String]]("splits"))
    } else assert(audit.isEmpty)
  }

  test("carveEval: per-stratum quota, cluster mates quarantined out of train") {
    val docs = (1L to 300L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", i / 10)) // clusters of ~10
      .toDF("doc_id", "lang", "cluster_id")
    val out = LeakSafeSplit.carveEval(docs, "doc_id", "cluster_id",
      "lang", perStratum = 4)
    val roles = out.groupBy("lang", "role").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(roles(("en", "eval")) == 4 && roles(("de", "eval")) == 4, roles)
    // no train doc shares a cluster with any eval doc (the guarantee)
    val evalClusters = out.filter($"role" === "eval")
      .select("cluster_id").distinct()
    assert(out.filter($"role" === "train")
      .join(evalClusters, Seq("cluster_id"), "left_semi").isEmpty)
    // quarantine = exactly the unselected members of eval clusters
    assert(out.filter($"role" === "quarantine")
      .join(evalClusters, Seq("cluster_id"), "left_anti").isEmpty)
    // deterministic: same carve on a re-run
    val again = LeakSafeSplit.carveEval(docs, "doc_id", "cluster_id",
      "lang", perStratum = 4)
    assert(out.select("doc_id", "role").except(
      again.select("doc_id", "role")).isEmpty)
    val e = intercept[IllegalArgumentException] {
      LeakSafeSplit.carveEval(docs, "doc_id", "cluster_id", "lang", 0)
    }
    assert(e.getMessage.contains("positive"))
  }

  test("scale pin: byGroup over a parquet table is map-only — zero exchanges") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", ($"doc_id" % 97).as("grp"))
    val plan = LeakSafeSplit.byGroup(docs, "grp",
      Seq("train" -> 90, "test" -> 10)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("band widths must sum to mod (hashSplit contract)") {
    val docs = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    val e = intercept[IllegalArgumentException] {
      LeakSafeSplit.byGroup(docs, "cluster_id", Seq("train" -> 80))
    }
    assert(e.getMessage.contains("sum"), e.getMessage)
  }
}
