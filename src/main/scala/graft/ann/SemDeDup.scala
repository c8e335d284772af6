package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
  * embeddings with k-means and pruning near-duplicate pairs WITHIN each
  * cluster — the scale trick that makes embedding-level dedup tractable
  * where global all-pairs (even LSH-banded, cf. [[Ann.nearDupPairs]])
  * pays for the whole corpus: candidate generation is free (the cluster
  * assignment), and the quadratic pairing is confined to one cell.
  *
  * Dedup rule (the paper's released implementation): within a cluster,
  * order members and drop every member whose cosine to ANY
  * earlier-ordered cellmate reaches `threshold` — the upper-triangular
  * max-similarity test. Ordering here is ascending id, so the survivor
  * of every duplicate group is its lowest id and the result is
  * deterministic (the reference engine's keep-one-survivor compaction
  * contract, RecordKeyDedupReducerBase.java:74).
  *
  * Scale shape: assignment is one map pass over the corpus
  * ([[Ann.assignCell]] broadcast-literal centroids); pairing shuffles
  * once on cell id, and each cell's join fan-out is capped by
  * `maxCellSize` (beyond-cap members pass through undeduped and
  * CAN be flagged via [[shedded]] — the same loud-shed contract as the
  * LSH index's bucket cap): worst-case work is cells x maxCellSize^2,
  * never corpus^2. At 100 TB: train the quantizer on a sample
  * ([[Ann.ivfTrain]]), raise numCells so cells stay ~10^3-10^4 members,
  * and the pairing remains embarrassingly parallel per cell.
  */
object SemDeDup {

  /** Cell assignment + ascending-id rank inside each cell — the ONE
    * frame [[duplicates]] (rank ≤ cap) and [[shedded]] (rank > cap)
    * filter opposite halves of, so they can never disagree about what
    * was capped. */
  private def ranked(corpus: DataFrame, idCol: String, vecCol: String,
                     model: Ann.IvfModel): DataFrame =
    corpus.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("__cell", Ann.assignCell(col(vecCol), model))
      .withColumn("__rank",
        row_number().over(Window.partitionBy(col("__cell"))
          .orderBy(col(idCol))))

  /** Cell-capped membership: rows ranked past `maxCellSize` are EXCLUDED
    * (they neither drop others nor get dropped). */
  private def members(corpus: DataFrame, idCol: String, vecCol: String,
                      model: Ann.IvfModel, maxCellSize: Int): DataFrame =
    ranked(corpus, idCol, vecCol, model).filter(col("__rank") <= maxCellSize)

  /** The duplicate set: one row per DROPPED member — (idCol, dup_of,
    * cell, cos_sim) where `dup_of` is the lowest-id cellmate whose
    * cosine reached `threshold`. */
  def duplicates(corpus: DataFrame, idCol: String, vecCol: String,
                 model: Ann.IvfModel, threshold: Double,
                 maxCellSize: Int = 4096): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]: $threshold")
    // norms are per-MEMBER, so hoist them out of the quadratic pairing:
    // each pair then pays one dot product, not a dot and two norms
    val m = members(corpus, idCol, vecCol, model, maxCellSize)
      .withColumn("__norm", Ann.norm(col(vecCol).cast("array<double>")))
    val a = m.select(col(idCol).as("__id_a"), col(vecCol).as("__vec_a"),
      col("__cell"), col("__rank").as("__rank_a"), col("__norm").as("__norm_a"))
    val b = m.select(col(idCol).as("__id_b"), col(vecCol).as("__vec_b"),
      col("__cell"), col("__rank").as("__rank_b"), col("__norm").as("__norm_b"))
    a.join(b, Seq("__cell"))
      .filter(col("__rank_b") < col("__rank_a"))
      .withColumn("__cos", Ann.dot(col("__vec_a"), col("__vec_b")) /
        (col("__norm_a") * col("__norm_b")))
      .filter(col("__cos") >= threshold)
      .groupBy(col("__id_a").as(idCol))
      .agg(min(col("__id_b")).as("dup_of"),
        first(col("__cell")).as("cell"),
        max(col("__cos")).as("cos_sim"))
  }

  /** Members that exceeded a cell's `maxCellSize` and passed through
    * undeduped — surface them rather than letting a mega-cell silently
    * skip dedup (a giant cell means numCells is too small; retrain). */
  def shedded(corpus: DataFrame, idCol: String, vecCol: String,
              model: Ann.IvfModel, maxCellSize: Int = 4096): DataFrame =
    ranked(corpus, idCol, vecCol, model)
      .filter(col("__rank") > maxCellSize)
      .select(col(idCol), col("__cell").as("cell"))

  /** Survivors: the corpus minus [[duplicates]], original columns
    * untouched. */
  def survivors(corpus: DataFrame, idCol: String, vecCol: String,
                model: Ann.IvfModel, threshold: Double,
                maxCellSize: Int = 4096): DataFrame =
    corpus.join(
      duplicates(corpus, idCol, vecCol, model, threshold, maxCellSize)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** [[survivors]] plus an IN-QUERY certification (the engine's
    * raise_error self-check pattern, cf. the HLL rollup's 2%-of-exact
    * gate): the returned frame carries `okCol`, true on every row iff
    * (a) no near pair from the cell pairing has BOTH endpoints in the
    * survivor id set — the "no surviving near-duplicates" output
    * contract, derived from the pairing's persisted pair set (a pair
    * survives iff neither endpoint was dropped, so no second quadratic
    * pass is needed); (b) the bookkeeping partitions exactly —
    * survivors + dropped == members (catching a broken anti-join or
    * distinct, the failure modes (a) alone cannot see); and (c) no
    * cell shed members past `maxCellSize` (a shed member passes
    * through undeduped, so a certified run refuses it loudly; retrain
    * with more cells). Any violation raises instead of returning
    * quietly.
    *
    * Cost discipline: the quadratic cell pairing runs exactly ONCE —
    * the certification re-reads its persisted pair set (two semi joins
    * + counts) and independently re-pairs survivors only inside a
    * 1-in-`probeCells` hash sample of CELLS (cell-sampled, so both the
    * probe's shuffle and its pairing are ~1/probeCells of the main
    * pass), keeping the certified face within noise of plain
    * [[survivors]] instead of 2x. The checks evaluate eagerly here, so
    * the ranked/pair caches are released before returning; only the
    * duplicate-id list (ids of dropped rows, the smallest frame in
    * play) stays persisted for the returned anti-join — long-lived
    * sessions doing many certified runs can reclaim it with
    * `spark.catalog.clearCache()` once the output is materialized. */
  def certifiedSurvivors(corpus: DataFrame, idCol: String, vecCol: String,
                         model: Ann.IvfModel, threshold: Double,
                         maxCellSize: Int = 4096,
                         okCol: String = "sem_ok",
                         probeCells: Int = 20): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]: $threshold")
    require(probeCells >= 1, s"probeCells must be >= 1: $probeCells")
    val spark = corpus.sparkSession
    val r = ranked(corpus, idCol, vecCol, model).persist()
    val m = r.filter(col("__rank") <= maxCellSize)
      .withColumn("__norm", Ann.norm(col(vecCol).cast("array<double>")))
    // ascending-id rank order == ascending id, so "any earlier-ranked
    // cellmate at threshold" == "any lower-id member pair"
    val a = m.select(col(idCol).as("__id_a"), col(vecCol).as("__vec_a"),
      col("__cell"), col("__norm").as("__norm_a"))
    val b = m.select(col(idCol).as("__id_b"), col(vecCol).as("__vec_b"),
      col("__cell"), col("__norm").as("__norm_b"))
    val pairs = a.join(b, Seq("__cell")).filter(col("__id_b") < col("__id_a"))
      .withColumn("__cos", Ann.dot(col("__vec_a"), col("__vec_b")) /
        (col("__norm_a") * col("__norm_b")))
      .filter(col("__cos") >= threshold)
      .select("__id_a", "__id_b").persist()
    val dupIds = pairs.select(col("__id_a").as(idCol)).distinct().persist()
    // survivor members, persisted: the residual semi-joins, the
    // partition count AND the probe all read it (round-12 shape
    // recomputed the anti-join per use)
    val mSurv = m.join(dupIds, Seq(idCol), "left_anti").persist()
    // (a) residual over the persisted pair set. NOTE: because dupIds is
    // by construction the distinct __id_a of `pairs`, every pair always
    // has one endpoint in the drop set — this check can only fire if the
    // anti-join/distinct machinery itself is broken, which is exactly
    // what it guards; it is NOT an independent proof of the output
    // contract (check (d) below is).
    val survMemberIds = mSurv.select(col(idCol))
    val resid = pairs
      .join(survMemberIds.select(col(idCol).as("__id_a")), Seq("__id_a"), "left_semi")
      .join(survMemberIds.select(col(idCol).as("__id_b")), Seq("__id_b"), "left_semi")
      .count()
    // (b) partition bookkeeping over the cached frames; (c) shed members
    // passed through undeduped — both sides of the rank cap in ONE
    // aggregate job over the persisted ranked frame instead of two
    val mShed = r.agg(
      coalesce(sum(when(col("__rank") <= maxCellSize, 1L).otherwise(0L)),
        lit(0L)),
      coalesce(sum(when(col("__rank") > maxCellSize, 1L).otherwise(0L)),
        lit(0L)))
      .collect()(0)
    val nMembers = mShed.getLong(0)
    val shed = mShed.getLong(1)
    val nDropped = dupIds.count()
    val nSurvMembers = survMemberIds.count()
    // (d) INDEPENDENT probe of the output contract: re-pair ALL
    // survivors inside a deterministic ~1/probeCells hash sample of
    // CELLS, recomputing cosines from the vectors — zero near pairs may
    // survive. Cells, not rows: a row sample's cell set covers nearly
    // every cell once cells hold ~20+ members (1-(19/20)^k), which
    // would re-shuffle the whole survivor set for a "5%" probe; a cell
    // sample bounds the probe's shuffle AND pairing to 1/probeCells of
    // the main pass, and is a complete triangular check within every
    // probed cell. Derived from the corpus, not from `pairs`, so a
    // wrong first pass cannot vouch for itself.
    val probed = probeSurvivorPairs(mSurv, idCol, vecCol, threshold, probeCells)
    r.unpersist()
    pairs.unpersist()
    mSurv.unpersist()
    val cert = broadcast(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        resid, nSurvMembers + nDropped - nMembers, shed, probed)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__resid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__part",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__shed",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__probe",
          org.apache.spark.sql.types.LongType)))))
    corpus.join(dupIds, Seq(idCol), "left_anti")
      .crossJoin(cert)
      .withColumn(okCol,
        when(col("__resid") === 0 && col("__part") === 0 &&
            col("__shed") === 0 && col("__probe") === 0, lit(true))
          .otherwise(raise_error(concat(
            lit("SemDeDup certification failed: surviving near-pairs="),
            col("__resid"), lit(", partition imbalance="), col("__part"),
            lit(", shed members="), col("__shed"),
            lit(", probed survivor near-pairs="), col("__probe")))))
      .drop("__resid", "__part", "__shed", "__probe")
  }

  /** Certification check (d)'s engine, separated so a planted violation
    * can be driven directly: count near pairs (cosine ≥ threshold)
    * among `mSurv` rows — schema (id, vec, __cell, __norm, ...) — whose
    * cell falls in a deterministic 1-in-`probeCells` sample of cells
    * chosen by HASH RANK over the survivors' distinct cells (never
    * modulo: with few cells a modulo sample can deterministically
    * select ZERO of them, and a zero-cell probe would certify output
    * it never examined — same model, every run). At least one cell is
    * always probed. `probeCells = 1` probes every cell (full
    * triangular re-pair of the survivor set). A correct dedup
    * yields 0. */
  private[ann] def probeSurvivorPairs(mSurv: DataFrame, idCol: String,
                                      vecCol: String, threshold: Double,
                                      probeCells: Int): Long = {
    val s =
      if (probeCells == 1) mSurv
      else {
        // distinct survivor cells are bounded by the model's cell count
        val ranked = mSurv.select(col("__cell")).distinct()
          .select(col("__cell"), xxhash64(col("__cell")).as("__h"))
          .collect()
          .sortBy(r => (r.getLong(1), r.get(0).toString))
        val chosen = ranked
          .take(math.max(1, ranked.length / probeCells))
          .map(_.get(0)).toSeq
        mSurv.filter(col("__cell").isInCollection(chosen))
      }
    val pa = s.select(col(idCol).as("__id_a"), col(vecCol).as("__vec_a"),
      col("__cell"), col("__norm").as("__norm_a"))
    val pb = s.select(col(idCol).as("__id_b"), col(vecCol).as("__vec_b"),
      col("__cell"), col("__norm").as("__norm_b"))
    pa.join(pb, Seq("__cell"))
      .filter(col("__id_b") < col("__id_a"))
      .filter(Ann.dot(col("__vec_a"), col("__vec_b")) /
        (col("__norm_a") * col("__norm_b")) >= threshold)
      .count()
  }
}
