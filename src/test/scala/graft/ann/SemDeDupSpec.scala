package graft.ann

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  // fixed orthonormal quantizer: assignment is just "largest coordinate"
  private val model = Ann.IvfModel(Array(
    Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0)))

  private def df(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("id", "vec")

  test("within-cell duplicate groups keep the lowest id") {
    val d = df(
      1L -> Seq(1.0, 0.01, 0.0),   // cell 0, group head
      2L -> Seq(1.0, 0.012, 0.0),  // ~identical to 1 -> dropped
      3L -> Seq(0.9, 0.43, 0.0),   // cell 0 but ~cos 0.92 to 1 -> kept
      10L -> Seq(0.0, 1.0, 0.0),   // cell 1, head
      11L -> Seq(0.0, 1.0, 1e-4),  // dup of 10 -> dropped
      20L -> Seq(0.0, 0.0, 1.0))   // cell 2, alone
    val dups = SemDeDup.duplicates(d, "id", "vec", model, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dups == Map(2L -> 1L, 11L -> 10L))
    val kept = SemDeDup.survivors(d, "id", "vec", model, threshold = 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 10L, 20L))
  }

  test("chained group: every non-head member drops against the earliest match") {
    // 1~2, 2~3, and 1~3 also above threshold: 2 and 3 both drop, dup_of=1
    val d = df(
      1L -> Seq(1.0, 0.000, 0.0),
      2L -> Seq(1.0, 0.005, 0.0),
      3L -> Seq(1.0, 0.010, 0.0))
    val dups = SemDeDup.duplicates(d, "id", "vec", model, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dups == Map(2L -> 1L, 3L -> 1L))
  }

  test("near-duplicates split across cells do NOT pair (the method's documented recall edge)") {
    val d = df(
      1L -> Seq(0.8, 0.6, 0.0),  // cell 0
      2L -> Seq(0.6, 0.8, 0.0))  // cell 1; cos(1,2)=0.96
    val dups = SemDeDup.duplicates(d, "id", "vec", model, threshold = 0.95)
    assert(dups.count() == 0)
  }

  test("cell cap sheds loudly: beyond-cap members pass through and are reported") {
    val d = df(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(1.0, 1e-5, 0.0),
      3L -> Seq(1.0, 2e-5, 0.0)) // rank 3 in cell 0
    val dups = SemDeDup.duplicates(d, "id", "vec", model,
      threshold = 0.999, maxCellSize = 2).collect()
    assert(dups.map(_.getLong(0)).toSet == Set(2L), "capped member must not drop")
    val shed = SemDeDup.shedded(d, "id", "vec", model, maxCellSize = 2)
      .collect().map(_.getLong(0)).toSet
    assert(shed == Set(3L))
  }

  test("parity with a brute-force triangular pass on the real embeddings table") {
    // plant near-dups (the synthetic table has none naturally): a
    // perturbed copy of every vector, like q43/q103
    val base = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val emb = base.unionByName(base.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x * (lit(1.0) + lit(0.01) *
          (pmod(i.cast("bigint"), lit(7L)) - lit(3L)).cast("double")))
        .as("embedding")))
    val trained = Ann.ivfTrain(emb, "vec_id", "embedding", numCells = 8)
    val thr = 0.9
    val got = SemDeDup.duplicates(emb, "vec_id", "embedding", trained, thr)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force: same assignment, ascending-id triangular max-cos test
    val rows = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", Ann.assignCell(col("v"), trained))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = scala.collection.mutable.Map[Long, Long]()
    rows.groupBy(_._3).values.foreach { cell =>
      for (i <- cell.indices; j <- 0 until i
           if cos(cell(i)._2, cell(j)._2) >= thr)
        if (!expect.contains(cell(i)._1) || cell(j)._1 < expect(cell(i)._1))
          expect(cell(i)._1) = cell(j)._1
    }
    assert(expect.nonEmpty, "planted near-dups must produce duplicates")
    assert(got == expect.toMap,
      s"operator vs brute force diverge: extra=${got.keySet -- expect.keySet} " +
        s"missing=${expect.keySet -- got.keySet}")
  }

  test("survivors + duplicates partition the corpus (no cap in play)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val trained = Ann.ivfTrain(emb, "vec_id", "embedding", numCells = 8)
    val nDup = SemDeDup.duplicates(emb, "vec_id", "embedding", trained, 0.9).count()
    val nSurv = SemDeDup.survivors(emb, "vec_id", "embedding", trained, 0.9).count()
    assert(nDup + nSurv == emb.count())
  }

  test("certifiedSurvivors matches survivors and carries a true ok column") {
    val d = df(
      1L -> Seq(1.0, 0.01, 0.0),
      2L -> Seq(1.0, 0.012, 0.0),  // dup of 1
      3L -> Seq(0.9, 0.43, 0.0),
      10L -> Seq(0.0, 1.0, 0.0),
      11L -> Seq(0.0, 1.0, 1e-4),  // dup of 10
      20L -> Seq(0.0, 0.0, 1.0))
    val got = SemDeDup.certifiedSurvivors(d, "id", "vec", model,
      threshold = 0.99).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L, 3L, 10L, 20L))
    assert(got.forall(_.getBoolean(2)), "sem_ok must be true on every row")
    assert(got.head.schema.fieldNames.toSeq == Seq("id", "vec", "sem_ok"))
  }

  test("certifiedSurvivors raises on broken bookkeeping (non-unique ids)") {
    // a duplicated id makes the drop anti-join remove BOTH rows bearing
    // it — survivors + dropped no longer partition the members, which
    // the partition-count certification must refuse (the old
    // re-pairing-only certification passed this silently)
    val d = df(
      1L -> Seq(1.0, 1e-5, 0.0),
      2L -> Seq(1.0, 2e-5, 0.0), // dup of 1 -> id 2 dropped
      20L -> Seq(0.0, 0.0, 1.0))
      .union(df(2L -> Seq(0.0, 1.0, 0.0))) // second row with id 2
    val e = intercept[Exception] {
      SemDeDup.certifiedSurvivors(d, "id", "vec", model,
        threshold = 0.999).collect()
    }
    assert(e.getMessage.contains("partition imbalance"), e.getMessage)
  }

  test("probe (cert d) fires on a planted surviving near-pair, silent on a clean set") {
    // mSurv-shaped frame: (id, vec, __cell, __norm). Plant a broken
    // "survivor" set where ids 1 and 2 are near-identical cellmates —
    // exactly what a wrong first pass would hand the probe.
    def msurv(rows: (Long, Seq[Double], Int)*) =
      rows.toSeq.toDF("id", "vec", "__cell")
        .withColumn("__norm", Ann.norm(col("vec")))
    val broken = msurv(
      (1L, Seq(1.0, 0.001, 0.0), 0),
      (2L, Seq(1.0, 0.002, 0.0), 0),  // cos(1,2) ≈ 1 — must be caught
      (10L, Seq(0.0, 1.0, 0.0), 1))
    assert(SemDeDup.probeSurvivorPairs(broken, "id", "vec",
      threshold = 0.99, probeCells = 1) == 1L)
    val clean = msurv(
      (1L, Seq(1.0, 0.001, 0.0), 0),
      (3L, Seq(0.9, 0.43, 0.0), 0),   // cos ≈ 0.92 < 0.99
      (10L, Seq(0.0, 1.0, 0.0), 1))
    assert(SemDeDup.probeSurvivorPairs(clean, "id", "vec",
      threshold = 0.99, probeCells = 1) == 0L)
    // cell sampling is deterministic: a near pair in an UNsampled cell
    // is invisible to that probe slice (the 1/probeCells contract)
    val sliced = SemDeDup.probeSurvivorPairs(broken, "id", "vec",
      threshold = 0.99, probeCells = 1000000)
    assert(sliced == 0L || sliced == 1L)
    // …but the slice is NEVER empty (hash-rank, not modulo): with a
    // near pair planted in EVERY cell, any probe setting must fire
    val everywhere = msurv(
      (1L, Seq(1.0, 0.001, 0.0), 0), (2L, Seq(1.0, 0.002, 0.0), 0),
      (10L, Seq(0.0, 1.0, 0.0), 1), (11L, Seq(0.0, 1.0, 0.001), 1))
    assert(SemDeDup.probeSurvivorPairs(everywhere, "id", "vec",
      threshold = 0.99, probeCells = 1000000) >= 1L,
      "a zero-cell probe would certify output it never examined")
    // end-to-end: a full-coverage probe (probeCells = 1) still certifies
    // a correct run — the probe agrees with the main pass everywhere
    val d = df(
      1L -> Seq(1.0, 0.01, 0.0),
      2L -> Seq(1.0, 0.012, 0.0),
      10L -> Seq(0.0, 1.0, 0.0),
      11L -> Seq(0.0, 1.0, 1e-4),
      20L -> Seq(0.0, 0.0, 1.0))
    val got = SemDeDup.certifiedSurvivors(d, "id", "vec", model,
      threshold = 0.99, probeCells = 1).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L, 10L, 20L))
    assert(got.forall(_.getBoolean(2)))
  }

  test("certifiedSurvivors raises loudly when a cell sheds members") {
    val d = df(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(1.0, 1e-5, 0.0),
      3L -> Seq(1.0, 2e-5, 0.0)) // rank 3 in cell 0 -> shed at cap 2
    val e = intercept[Exception] {
      SemDeDup.certifiedSurvivors(d, "id", "vec", model,
        threshold = 0.999, maxCellSize = 2).collect()
    }
    assert(e.getMessage.contains("shed members=1"), e.getMessage)
  }
}
