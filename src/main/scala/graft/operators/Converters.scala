package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Record-transform operators with the semantics of the reference's
  * `Converter` chain (gobblin-api/.../converter/Converter.java:61,92,111 —
  * chainable 1:{0,1,N} record transforms), re-expressed as declarative
  * DataFrame transforms so Catalyst can fuse/push them down instead of
  * running a row-at-a-time converter chain.
  *
  * Each is a `DataFrame => DataFrame`; compose with `df.transform(...)`.
  */
object Converters {

  /** Keep listed (possibly nested, dot-separated) fields.
    * Ref semantics: gobblin-core/.../filter/AvroFieldsPickConverter.java:50.
    * Nested picks are aliased with '_' joining path segments. */
  def pickFields(fields: Seq[String])(df: DataFrame): DataFrame =
    df.select(fields.map { f =>
      if (f.contains(".")) col(f).as(f.replace('.', '_')) else col(f)
    }: _*)

  /** Remove fields. Ref: AvroProjectionConverter.java:42. */
  def dropFields(fields: Seq[String])(df: DataFrame): DataFrame =
    df.drop(fields: _*)

  /** Keep records where field == value.
    * Ref: gobblin-core/.../filter/AvroFilterConverter.java:42. */
  def filterEq(field: String, value: Any)(df: DataFrame): DataFrame =
    df.filter(col(field) === lit(value))

  /** Regex-match filter on a string column.
    * Ref: string/StringFilterConverter.java:40. */
  def filterRegex(field: String, pattern: String)(df: DataFrame): DataFrame =
    df.filter(col(field).rlike(pattern))

  /** Project a single (possibly nested) field out as the record.
    * Ref: avro/AvroFieldRetrieverConverter.java:43. */
  def retrieveField(field: String, as: String = "value")(df: DataFrame): DataFrame =
    df.select(col(field).as(as))

  /** Copy nested keys to the top level (a.b -> a_b).
    * Ref: avro/FlattenNestedKeyConverter.java:58. */
  def flattenNestedKeys(paths: Seq[String])(df: DataFrame): DataFrame =
    paths.foldLeft(df)((d, p) => d.withColumn(p.replace('.', '_'), col(p)))

  /** Derive a time-partition column from a timestamp column — the writer-side
    * TimeBasedWriterPartitioner (gobblin-core/.../partitioner/
    * TimeBasedWriterPartitioner.java:59) expressed as a derived column that
    * `write.partitionBy` can use. */
  def derivePartition(tsCol: String, fmt: String, as: String = "datepartition")(
      df: DataFrame): DataFrame =
    df.withColumn(as, date_format(col(tsCol), fmt))

  /** Split a string column on a delimiter into N records (1:N flatMap).
    * Ref: string/StringSplitterConverter.java:34. */
  def splitToRows(field: String, delim: String, as: String = "token")(
      df: DataFrame): DataFrame =
    df.withColumn(as, explode(split(col(field), java.util.regex.Pattern.quote(delim))))
      .drop(field)

  /** Split into one array-typed column (StringSplitterToListConverter). */
  def splitToList(field: String, delim: String, as: String = "tokens")(
      df: DataFrame): DataFrame =
    df.withColumn(as, split(col(field), java.util.regex.Pattern.quote(delim)))

  /** Bernoulli sample. Ref: gobblin-core-base/.../SamplingConverter.java:36.
    * `sample` is seeded but not partition-stable across layouts; for
    * oracle-reproducible sampling use [[sampleByKeyMod]]. */
  def sampleBernoulli(ratio: Double, seed: Long = 42L)(df: DataFrame): DataFrame =
    df.sample(withReplacement = false, ratio, seed)

  /** Deterministic sample: keep rows where key % denom < num.
    * Layout-independent, so it is reproducible in any engine. */
  def sampleByKeyMod(keyCol: String, num: Int, denom: Int)(df: DataFrame): DataFrame =
    df.filter(pmod(col(keyCol), lit(denom)) < lit(num))

  /** Deterministic STRATIFIED sample: per-stratum keep rates (out of
    * `mod`) applied through a portable hash of the key — the `sampleBy`
    * shape, but layout-independent (Spark's `sampleBy` seeds per
    * partition, so its row set changes with file splits) and reproducible
    * in any engine that has md5 (see TextStats.portableHash60). Map-only,
    * no shuffle; the hash spreads uniformly so the kept fraction
    * concentrates tightly around rate/mod per stratum at any scale. */
  def stratifiedSampleByHash(keyCol: String, strataCol: String,
                             rates: Map[String, Int], defaultRate: Int,
                             mod: Int = 100)(df: DataFrame): DataFrame = {
    require(mod > 0 && (rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= mod))
    val rate = rates.toSeq.sortBy(_._1).foldLeft[Column](lit(defaultRate)) {
      case (els, (k, r)) => when(col(strataCol) === lit(k), lit(r)).otherwise(els)
    }
    df.filter(pmod(graft.text.TextStats.portableHash60(
      col(keyCol).cast("string")), lit(mod.toLong)) < rate)
  }

  /** Deterministic train/val/test assignment: label each row by the
    * band of a portable keyed hash it falls in. Layout-independent and
    * engine-reproducible (same md5 trick as [[stratifiedSampleByHash]]),
    * and STABLE under corpus growth — a row's split never changes when
    * other rows arrive or the corpus is re-cut, which is what keeps a
    * held-out eval set from leaking into training across re-runs.
    * `bands` = (label, width out of `mod`) in order, widths summing to
    * `mod`. Map-only, zero shuffles. */
  def hashSplit(keyCol: String, bands: Seq[(String, Int)],
                outCol: String = "split", mod: Int = 100)
               (df: DataFrame): DataFrame = {
    require(bands.nonEmpty && bands.forall(_._2 > 0) && bands.map(_._2).sum == mod,
      s"band widths must be positive and sum to $mod: $bands")
    val h = pmod(graft.text.TextStats.portableHash60(
      col(keyCol).cast("string")), lit(mod.toLong))
    val cuts = bands.scanLeft(0)(_ + _._2).tail
    val first = when(h < lit(cuts.head.toLong), lit(bands.head._1))
    val label = bands.tail.zip(cuts.tail).foldLeft(first) {
      case (acc, ((name, _), cut)) => acc.when(h < lit(cut.toLong), lit(name))
    }
    df.withColumn(outCol, label)
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis & Spirakis 2006 A-ES): give every row the priority
    * u^(1/w) for a uniform u derived from a portable keyed hash, and
    * keep the global top-n — inclusion probability is proportional to
    * weight, the sample is reproducible run-to-run (no RNG state), and
    * selection is a TakeOrderedAndProject (per-partition top-n heaps +
    * one n-row merge), never a global sort. Weights must be positive;
    * zero/negative/null-weight rows are excluded (they cannot win a
    * weighted draw). Ties in priority are broken by the key for full
    * determinism. */
  def weightedSample(keyCol: String, weightCol: String, n: Int,
                     salt: String = "wsample")(df: DataFrame): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    // u in (0, 1]: (h + 1) / 2^60 over the 60-bit portable hash —
    // strictly positive so ln(u)/w is finite
    val u = (graft.text.TextStats.portableHash60(
      concat(lit(salt), col(keyCol).cast("string"))).cast("double") + 1.0d) /
      lit(math.pow(2.0, 60))
    // log-domain priority: ln(u)/w is monotone in u^(1/w) and avoids
    // pow underflow for large weights
    val priority = log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__graft_pri", priority)
      .orderBy(col("__graft_pri").desc, col(keyCol))
      .limit(n)
      .drop("__graft_pri")
  }

  /** Parse a JSON string column into typed columns.
    * Ref: JsonStringToJsonIntermediateConverter.java:48 +
    * JsonIntermediateToAvroConverter.java:50 — the two-step JSON pipeline is
    * one `from_json` here (schema declared, types cast by Catalyst). */
  def parseJson(field: String, schema: DataType, as: String = "json")(
      df: DataFrame): DataFrame =
    df.withColumn(as, from_json(col(field), schema.asInstanceOf[StructType]))

  /** Record -> JSON string. Ref: json/JsonToStringConverter.java /
    * AnyToJsonConverter. */
  def toJsonString(as: String = "json")(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as(as))

  /** Rename columns per mapping (AvroToJdbcEntryConverter field mapping,
    * gobblin-modules/gobblin-sql/.../AvroToJdbcEntryConverter.java:72). */
  def renameFields(mapping: Map[String, String])(df: DataFrame): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Apply a chain of converters in declared order (MultiConverter,
    * gobblin-runtime/.../MultiConverter.java:50). */
  def chain(converters: Seq[DataFrame => DataFrame])(df: DataFrame): DataFrame =
    converters.foldLeft(df)((d, c) => c(d))

  /** Cast columns per mapping — serde converters (AvroToBytesConverter etc.)
    * reduce to casts in a typed engine. */
  def castFields(mapping: Map[String, DataType])(df: DataFrame): DataFrame =
    mapping.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }
}
