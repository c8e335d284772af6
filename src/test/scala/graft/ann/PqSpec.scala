package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  // 8 well-separated cluster anchors in 16-dim; members = anchor + small
  // deterministic jitter. PQ must keep same-cluster points closest.
  private def clustered(nPerCluster: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new java.util.Random(7)
    val anchors = Array.tabulate(8, 16)((c, j) =>
      if (j % 8 == c) 10.0f else 0.0f)
    (0 until 8).flatMap { c =>
      (0 until nPerCluster).map { i =>
        val v = anchors(c).map(_ + (rnd.nextFloat() - 0.5f) * 0.5f).toSeq
        (c * 1000L + i, v)
      }
    }
  }

  test("train is deterministic and shaped (m x k x subDim)") {
    import spark.implicits._
    val df = clustered(30).toDF("id", "emb")
    val cb1 = Pq.train(df, "id", "emb", m = 4, k = 8, sampleN = 200, iters = 5)
    val cb2 = Pq.train(df, "id", "emb", m = 4, k = 8, sampleN = 200, iters = 5)
    assert(cb1.m == 4 && cb1.k == 8 && cb1.dim == 16 && cb1.subDim == 4)
    assert(cb1.centers.flatten.flatten.toSeq == cb2.centers.flatten.flatten.toSeq,
      "same data + seed must yield identical codebooks")
  }

  test("encode emits m bytes; decode reconstructs within cluster noise") {
    import spark.implicits._
    val df = clustered(30).toDF("id", "emb")
    val cb = Pq.train(df, "id", "emb", m = 4, k = 8, sampleN = 200, iters = 10)
    val enc = Pq.encode(df, "id", "emb", cb)
    assert(enc.select(length(col("pq_code"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    // reconstruction error per dim is bounded by the jitter scale: the
    // codebooks must have found the planted cluster structure
    val err = enc.join(df, "id")
      .select(avg(aggregate(
        zip_with(Pq.decodeCol(col("pq_code"), cb),
          col("emb").cast("array<float>"), (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, x) => acc + x)))
      .collect()(0).getDouble(0)
    assert(err < 1.0, s"mean squared reconstruction error too high: $err")
  }

  test("adcTopK retrieves same-cluster neighbors (top-1 accuracy)") {
    import spark.implicits._
    val data = clustered(30)
    val df = data.toDF("id", "emb")
    val cb = Pq.train(df, "id", "emb", m = 4, k = 16, sampleN = 300, iters = 10)
    val enc = Pq.encode(df, "id", "emb", cb)
    // one query per cluster (the first member)
    val queries = data.filter(_._1 % 1000L == 0L).toDF("id", "emb")
    val top = Pq.adcTopK(enc, queries, "id", "emb", cb, topK = 5)
    assert(top.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
    val top1SameCluster = top.filter(col("rank") === 1)
      .filter(col("neighbor_id").divide(1000).cast("long") ===
        col("query_id").divide(1000).cast("long")).count()
    assert(top1SameCluster == 8,
      "every query's nearest ADC neighbor must come from its own cluster")
  }

  test("ADC distance is exact when vectors sit on centroids") {
    import spark.implicits._
    // train where every point is duplicated -> centroids converge onto
    // the points; a query AT a centroid has ADC distance ~0 to its twin
    val pts = (0 until 8).map(i => (i.toLong,
      Seq.tabulate(8)(j => if (j == i) 5.0f else 0.0f)))
    val df = (pts ++ pts.map { case (id, v) => (id + 100L, v) }).toDF("id", "emb")
    val cb = Pq.train(df, "id", "emb", m = 2, k = 8, sampleN = 100, iters = 20)
    val enc = Pq.encode(df, "id", "emb", cb)
    val q = pts.take(1).toDF("id", "emb") // query id 0 == corpus twin id 100
    val top = Pq.adcTopK(enc, q, "id", "emb", cb, topK = 1)
    val r = top.collect()(0)
    assert(r.getAs[Long]("neighbor_id") == 100L)
    assert(math.abs(r.getAs[Float]("adc_dist")) < 1e-3)
  }

  test("guards: ragged dim, oversized query set, k bounds") {
    import spark.implicits._
    val df = clustered(5).toDF("id", "emb")
    val cb = Pq.train(df, "id", "emb", m = 4, k = 4, sampleN = 50, iters = 2)
    intercept[Exception] {
      Pq.encode(Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "emb"),
        "id", "emb", cb).collect()
    }
    intercept[IllegalArgumentException] {
      Pq.adcTopK(Pq.encode(df, "id", "emb", cb), df, "id", "emb", cb,
        topK = 1, maxQueries = 3)
    }
    intercept[IllegalArgumentException] {
      Pq.Codebooks(2, 300, 8, Array.ofDim(2, 300, 4))
    }
  }

  test("IVF-ADC: residual-coded search stays in probed cells, finds its cluster") {
    import spark.implicits._
    val data = clustered(30)
    val df = data.toDF("id", "emb")
    val ivf = Ann.ivfTrain(df, "id", "emb", numCells = 8, iters = 4,
      sampleN = 240)
    val cb = IvfPq.trainResiduals(df, "id", "emb", ivf, m = 4, k = 16,
      sampleN = 300, iters = 8)
    val enc = IvfPq.encode(df, "id", "emb", ivf, cb)
    assert(enc.columns.toSet == Set("id", "cell", "pq_code"))
    val queries = data.filter(_._1 % 1000L == 0L).toDF("id", "emb")
    val top = IvfPq.adcTopK(enc, queries, "id", "emb", ivf, cb,
      topK = 5, nprobe = 2)
    assert(top.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
    // planted clusters are well separated: the top-1 neighbor of every
    // query comes from its own cluster even through coarse cells +
    // 4-byte residual codes
    val top1Same = top.filter(col("rank") === 1)
      .filter(col("neighbor_id").divide(1000).cast("long") ===
        col("query_id").divide(1000).cast("long")).count()
    assert(top1Same == 8, s"IVF-ADC lost planted clusters: $top1Same/8")
    // pruning really limits the scan: with nprobe=1 every neighbor shares
    // the query's own cell
    val one = IvfPq.adcTopK(enc, queries, "id", "emb", ivf, cb,
      topK = 5, nprobe = 1)
    val cellOf = enc.select(col("id"), col("cell"))
    val crossCell = one
      .join(cellOf.withColumnRenamed("id", "neighbor_id")
        .withColumnRenamed("cell", "ncell"), "neighbor_id")
      .join(cellOf.withColumnRenamed("id", "query_id")
        .withColumnRenamed("cell", "qcell"), "query_id")
      .filter(col("ncell") =!= col("qcell")).count()
    assert(crossCell == 0, "nprobe=1 must never leave the query's cell")
  }

  test("IVF-ADC over a cell-partitioned index equals the in-memory path") {
    import spark.implicits._
    val data = clustered(20)
    val df = data.toDF("id", "emb")
    val ivf = Ann.ivfTrain(df, "id", "emb", numCells = 4, iters = 3,
      sampleN = 160)
    val cb = IvfPq.trainResiduals(df, "id", "emb", ivf, m = 4, k = 8,
      sampleN = 200, iters = 5)
    val enc = IvfPq.encode(df, "id", "emb", ivf, cb)
    val dir = tmpDir("ivfpq-index")
    enc.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val queries = data.filter(_._1 % 1000L == 0L).take(4).toDF("id", "emb")
    val a = IvfPq.adcTopK(enc, queries, "id", "emb", ivf, cb,
      topK = 3, nprobe = 2).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = IvfPq.adcTopK(fromDisk, queries, "id", "emb", ivf, cb,
      topK = 3, nprobe = 2).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b, "partitioned-index search must equal the in-memory path")
    // the probe filter reaches the scan as a partition filter
    val plan = IvfPq.adcTopK(fromDisk, queries, "id", "emb", ivf, cb,
      topK = 3, nprobe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"probe cells must prune partitions:\n${plan.take(2000)}")
  }

  test("encode + ADC plans are map-only over the corpus (no shuffle)") {
    import spark.implicits._
    val df = clustered(10).toDF("id", "emb")
    val cb = Pq.train(df, "id", "emb", m = 4, k = 8, sampleN = 100, iters = 2)
    val encPlan = Pq.encode(df, "id", "emb", cb)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"),
      s"encode must be map-only:\n$encPlan")
    // scoring before the top-k window: corpus side has no exchange (the
    // window itself shuffles by query — bounded rows, unavoidable)
    val enc = Pq.encode(df, "id", "emb", cb)
    val scored = Pq.adcTopK(enc, df.limit(2), "id", "emb", cb, topK = 2)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"ADC must not sort-merge join the corpus:\n$plan")
  }
}
