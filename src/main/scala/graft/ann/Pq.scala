package graft.ann

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011) — the compression step that makes
  * billion-vector ANN fit in memory: split each D-dim vector into `m`
  * subspaces, k-means each subspace to `k` centroids, store one byte per
  * subspace. A 256-float embedding becomes m=16 bytes (64× smaller), and
  * query-time asymmetric distance computation (ADC) scores a candidate
  * with m table lookups instead of D multiplies.
  *
  * Complements the existing stack: IVF ([[Ann.ivfTrain]]) prunes WHICH
  * partitions to scan; SQ8 ([[Quantize.quantizeInt8]]) is the 4×
  * bounded-error code for re-ranking; PQ is the high-compression code
  * for the in-memory candidate scan — together they are the standard
  * IVF-PQ + re-rank layout at 100 TB.
  *
  * Scale shape: training runs on a BOUNDED deterministic sample on the
  * driver (O(sampleN · k · D) per Lloyd round — the FAISS shape);
  * codebooks broadcast inside expressions; encode and ADC scoring are
  * map-only native evals with primitive loops (no shuffle, no join on
  * the corpus side); per-query top-k is the same bounded window as every
  * other search path here.
  */
object Pq {

  /** Trained codebooks: `centers(s)(c)` is centroid c of subspace s
    * (length dim/m). k ≤ 256 so codes are bytes. */
  final case class Codebooks(m: Int, k: Int, dim: Int,
                             centers: Array[Array[Array[Float]]]) {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(k >= 2 && k <= 256, s"k=$k must be in [2,256] (codes are bytes)")
    val subDim: Int = dim / m
  }

  private def asFloats(row: org.apache.spark.sql.Row): Array[Float] = {
    val s = row.getSeq[Any](0)
    val out = new Array[Float](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = s(i) match {
        case f: Float => f
        case d: Double => d.toFloat
        case n: Number => n.floatValue()
      }
      i += 1
    }
    out
  }

  /** Train per-subspace codebooks on a bounded deterministic sample
    * (salted-hash order, so re-runs see the same rows). Seeded k-means++
    * -style init (distinct points in shuffled order) + `iters` Lloyd
    * rounds; an emptied cluster keeps its previous centroid, and ties
    * break on the lower centroid index — bit-deterministic end to end. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, k: Int = 256, sampleN: Int = 10000,
            iters: Int = 10, seed: Long = 42L): Codebooks = {
    val rows = df.select(col(vecCol), col(idCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(sampleN).select(col(vecCol)).collect()
    require(rows.nonEmpty, "pq train: empty input")
    val sample = rows.map(asFloats)
    val dim = sample(0).length
    require(sample.forall(_.length == dim), "pq train: ragged vectors")
    val subDim = dim / m
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")

    val rnd = new java.util.Random(seed)
    val centers = Array.ofDim[Array[Array[Float]]](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      // init: first k DISTINCT sub-vectors in seeded shuffled order
      val order = rnd.ints(0, sample.length).distinct()
        .limit(sample.length).toArray
      val init = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
      var oi = 0
      while (init.size < k && oi < order.length) {
        val v = java.util.Arrays.copyOfRange(sample(order(oi)), off, off + subDim)
        if (seen.add(v.toSeq)) init += v
        oi += 1
      }
      // fewer distinct points than k: pad by cycling the distinct ones
      // (harmless — duplicates never win an argmin tie; lower index wins)
      val distinctCount = init.size
      while (init.size < k) init += init(init.size % distinctCount).clone()
      var cents = init.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.ofDim[Double](k, subDim)
        val counts = new Array[Long](k)
        sample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var j = 0
            while (j < subDim) {
              val diff = v(off + j) - cents(c)(j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var j = 0
          while (j < subDim) { sums(best)(j) += v(off + j); j += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c) // emptied: keep previous centroid
          else Array.tabulate(subDim)(j => (sums(c)(j) / counts(c)).toFloat)
        }
        it += 1
      }
      centers(s) = cents
      s += 1
    }
    Codebooks(m, k, dim, centers)
  }

  /** Map-only encode: vector → m-byte code (argmin centroid per
    * subspace, lower index wins ties). Accepts float or double arrays
    * (cast to float — PQ is a lossy code; the cast is not the lossy
    * part). */
  def encodeCol(vec: Column, cb: Codebooks): Column =
    GraftColumnShim.column(PqEncode(
      GraftColumnShim.expression(vec.cast("array<float>")), cb))

  def encode(df: DataFrame, idCol: String, vecCol: String,
             cb: Codebooks, codeCol: String = "pq_code"): DataFrame =
    df.select(col(idCol), encodeCol(col(vecCol), cb).as(codeCol))

  /** Reconstruct the centroid approximation of a code (the decode half
    * of the reconstruction-error contract). */
  def decodeCol(code: Column, cb: Codebooks): Column =
    GraftColumnShim.column(PqDecode(GraftColumnShim.expression(code), cb))

  /** ADC top-k: exact queries against the PQ-compressed corpus. Each
    * query precomputes an m×k lookup table of partial squared distances
    * on the driver (O(k·D) per query), the bounded LUT block rides inside
    * ONE map-only expression over the corpus (scoring = m byte-indexed
    * adds per query), and per-query top-k is the standard bounded
    * window. `maxQueries` guards the broadcast the same way
    * [[Ann.semanticContamination]] bounds its eval set. */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, cb: Codebooks, topK: Int,
              codeCol: String = "pq_code",
              maxQueries: Int = 4096): DataFrame = {
    val qRows = queries.select(col(vecCol), col(idCol))
      .orderBy(col(idCol)).limit(maxQueries + 1).collect()
    require(qRows.nonEmpty, "adcTopK: no queries")
    require(qRows.length <= maxQueries,
      s"adcTopK: query set exceeds maxQueries=$maxQueries — the query side " +
        "must be bounded; for corpus-vs-corpus use nearDupPairs")
    val qIds = qRows.map(_.get(1))
    val luts = qRows.map { r =>
      val qv = asFloats(r)
      require(qv.length == cb.dim, s"query dim ${qv.length} != ${cb.dim}")
      val lut = Array.ofDim[Float](cb.m * cb.k)
      var s = 0
      while (s < cb.m) {
        val off = s * cb.subDim
        var c = 0
        while (c < cb.k) {
          var d = 0.0; var j = 0
          while (j < cb.subDim) {
            val diff = qv(off + j) - cb.centers(s)(c)(j); d += diff * diff; j += 1
          }
          lut(s * cb.k + c) = d.toFloat
          c += 1
        }
        s += 1
      }
      lut
    }
    val scored = encoded.select(col(idCol).as("neighbor_id"),
      posexplode(GraftColumnShim.column(
        PqAdcScores(GraftColumnShim.expression(col(codeCol)), cb.m, cb.k, luts)))
        .as(Seq("__qi", "adc_dist")))
    // tiny (qi -> query id) dimension joins broadcast-style
    val spark = encoded.sparkSession
    import scala.jdk.CollectionConverters._
    val qDim = broadcast(spark.createDataFrame(
      qIds.zipWithIndex.map { case (id, i) =>
        org.apache.spark.sql.Row(i, id) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__qi",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        queries.schema(idCol).copy(name = "query_id")))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.join(qDim, Seq("__qi"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
  }
}

/** IVF-ADC composition (FAISS IVF-PQ with a spherical coarse quantizer):
  * the coarse quantizer ([[Ann.ivfTrain]], cosine) prunes WHICH cells a
  * query scans; PQ codes the RESIDUAL (normalized vector − cell
  * centroid) so one byte budget spends its precision inside a cell, not
  * across the whole space. On unit vectors L2 and cosine rank
  * identically (‖a−b‖² = 2 − 2·cos), so the spherical cells and the L2
  * ADC agree. At 100 TB the encoded corpus is a parquet table
  * partitioned by cell (same layout as [[Ann.ivfWriteIndex]]): the
  * probe filter becomes partition pruning and the scan touches
  * nprobe/numCells of the data, each candidate costing m byte-indexed
  * adds. */
object IvfPq {
  import Pq.Codebooks

  private def normalized(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val n = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
    transform(v, x => when(n === 0.0d, x).otherwise(x / n))
  }

  private def centroidAt(model: Ann.IvfModel, cell: Column): Column =
    element_at(typedlit(model.centroids.map(_.toSeq).toSeq), cell + 1)

  /** (id, cell, residual) — the frame residual codebooks train on and
    * encode from; map-only. */
  def residuals(corpus: DataFrame, idCol: String, vecCol: String,
                model: Ann.IvfModel,
                residCol: String = "__resid"): DataFrame = {
    val nv = normalized(col(vecCol))
    corpus
      .withColumn("cell", Ann.assignCell(col(vecCol), model))
      .select(col(idCol), col("cell"),
        zip_with(nv, centroidAt(model, col("cell")),
          (a, b) => a - b).as(residCol))
  }

  /** Train residual codebooks (bounded driver sample, deterministic —
    * see [[Pq.train]]). */
  def trainResiduals(corpus: DataFrame, idCol: String, vecCol: String,
                     model: Ann.IvfModel, m: Int = 8, k: Int = 256,
                     sampleN: Int = 10000, iters: Int = 10,
                     seed: Long = 42L): Codebooks =
    Pq.train(residuals(corpus, idCol, vecCol, model), idCol, "__resid",
      m, k, sampleN, iters, seed)

  /** Build the searchable frame: (id, cell, pq_code). Persist with
    * `.write.partitionBy("cell")` for the pruned-scan layout. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: Ann.IvfModel, cb: Codebooks): DataFrame =
    residuals(corpus, idCol, vecCol, model)
      .select(col(idCol), col("cell"),
        Pq.encodeCol(col("__resid"), cb).as("pq_code"))

  /** ADC top-k with cell pruning: each query resolves its `nprobe` probe
    * cells driver-side, builds ONE LUT per (query, probed cell) — the
    * residual of the query against that cell's centroid — and only
    * corpus rows in probed cells are scanned (`cell.isin(...)` becomes
    * partition pruning over a partitioned index). Scoring is one
    * primitive eval per (candidate, virtual-query-in-its-cell). */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, model: Ann.IvfModel, cb: Codebooks,
              topK: Int, nprobe: Int,
              maxQueries: Int = 1024): DataFrame = {
    val qRows = queries.select(col(vecCol).cast("array<double>"), col(idCol))
      .orderBy(col(idCol)).limit(maxQueries + 1).collect()
    require(qRows.nonEmpty, "ivfpq adcTopK: no queries")
    require(qRows.length <= maxQueries,
      s"ivfpq adcTopK: query set exceeds maxQueries=$maxQueries")
    // driver-side probe planning: normalize, rank cells by cosine
    val probes = qRows.flatMap { r =>
      val raw = r.getSeq[Double](0).toArray
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      val qv = if (nrm == 0) raw else raw.map(_ / nrm)
      val scored = model.centroids.zipWithIndex.map { case (c, i) =>
        (c.zip(qv).map { case (a, b) => a * b }.sum, i)
      }
      scored.sortBy { case (s, i) => (-s, i) }.take(nprobe).map {
        case (_, cell) =>
          val cent = model.centroids(cell)
          val resid = qv.indices.map(j => (qv(j) - cent(j)).toFloat).toArray
          (r.get(1), cell, resid)
      }
    }
    // one LUT per (query, cell) "virtual query"
    val luts = probes.map { case (_, _, resid) =>
      require(resid.length == cb.dim, s"query dim ${resid.length} != ${cb.dim}")
      val lut = Array.ofDim[Float](cb.m * cb.k)
      var s = 0
      while (s < cb.m) {
        val off = s * cb.subDim
        var c = 0
        while (c < cb.k) {
          var d = 0.0; var j = 0
          while (j < cb.subDim) {
            val diff = resid(off + j) - cb.centers(s)(c)(j); d += diff * diff
            j += 1
          }
          lut(s * cb.k + c) = d.toFloat
          c += 1
        }
        s += 1
      }
      lut
    }
    val spark = encoded.sparkSession
    import scala.jdk.CollectionConverters._
    val vq = broadcast(spark.createDataFrame(
      probes.zipWithIndex.map { case ((qid, cell, _), i) =>
        org.apache.spark.sql.Row(i, cell, qid) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__vqi",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        queries.schema(idCol).copy(name = "query_id")))))
    val probedCells = probes.map(_._2).distinct.toSeq
    val scored = encoded
      .filter(col("cell").isin(probedCells: _*)) // partition pruning
      .join(vq, Seq("cell"))
      .select(col(idCol).as("neighbor_id"), col("query_id"),
        GraftColumnShim.column(PqAdcScoreAt(
          GraftColumnShim.expression(col("pq_code")),
          GraftColumnShim.expression(col("__vqi")),
          cb.m, cb.k, luts)).as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
  }
}

/** vector → m-byte PQ code; primitive argmin loops, one eval per row. */
case class PqEncode(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n == cb.dim, s"pq_encode: vector dim $n != trained dim ${cb.dim}")
    val out = new Array[Byte](cb.m)
    var s = 0
    while (s < cb.m) {
      val off = s * cb.subDim
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.k) {
        var d = 0.0; var j = 0
        while (j < cb.subDim) {
          val diff = arr.getFloat(off + j) - cb.centers(s)(c)(j)
          d += diff * diff; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** m-byte code → centroid reconstruction (array<float> of dim). */
case class PqDecode(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_decode"
  override protected def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[Array[Byte]]
    require(code.length == cb.m, s"pq_decode: code length ${code.length} != m=${cb.m}")
    val out = new Array[Any](cb.dim)
    var s = 0
    while (s < cb.m) {
      val cent = cb.centers(s)(code(s) & 0xFF)
      var j = 0
      while (j < cb.subDim) { out(s * cb.subDim + j) = cent(j); j += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}

/** (code, virtual-query index) → ADC distance against that query's LUT —
  * the per-cell scoring kernel of [[IvfPq.adcTopK]]. */
case class PqAdcScoreAt(left: Expression, right: Expression,
                        m: Int, k: Int, luts: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = FloatType
  override def prettyName: String = "pq_adc_score_at"
  override protected def nullSafeEval(code0: Any, vqi0: Any): Any = {
    val code = code0.asInstanceOf[Array[Byte]]
    val lut = luts(vqi0.asInstanceOf[Int])
    var d = 0.0f
    var s = 0
    while (s < m) { d += lut(s * k + (code(s) & 0xFF)); s += 1 }
    d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScoreAt =
    copy(left = newLeft, right = newRight)
}

/** m-byte code → array of ADC distances, one per query LUT — all queries
  * scored in ONE eval (m byte-indexed adds each). */
case class PqAdcScores(child: Expression, m: Int, k: Int,
                       luts: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_adc_scores"
  override protected def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[Array[Byte]]
    val out = new Array[Any](luts.length)
    var q = 0
    while (q < luts.length) {
      val lut = luts(q)
      var d = 0.0f
      var s = 0
      while (s < m) { d += lut(s * k + (code(s) & 0xFF)); s += 1 }
      out(q) = d
      q += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcScores =
    copy(child = newChild)
}
