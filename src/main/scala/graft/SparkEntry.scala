package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.{IncrementalDedup, MinHashDedup, SimHash}
import graft.multimodal.Multimodal
import graft.operators.{Converters, CopyDiff, Dedup, Fork, Purge, Retention}
import graft.planning.WatermarkPartitioner
import graft.sinks.AtomicPublisher.WriteSpec
import graft.streaming.Streams
import graft.text.{Redact, TextStats, Tfidf}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] exercises one operator family from
  * SURVEY.md §2 end-to-end on the driver testdata; [[oracleSql]] holds the
  * DuckDB-equivalent SQL with IDENTICAL output column names.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** [[t]] for queries whose FIRST stage does heavy per-row work
    * (tokenize/shingle/hash/k-means): the sf tables arrive as one
    * unsplittable parquet split (single row group), which would run
    * that stage on one core of the session. Repartitions to session
    * default parallelism ONLY when the scan is narrower — at production
    * split counts this is a no-op (no exchange). Queries whose fixtures
    * are sensitive to input file/partition counts keep the raw [[t]]. */
  private def tp(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(s, dir, name)
    val par = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
  }

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-entry/$name"

  /** The integer Gopher quality signals shared by the q91 gate and the
    * q124 funnel. The bigram distinct/top-count signals used to ride
    * higher-order array functions (`transform`/`aggregate`) — those are
    * CodegenFallback in Spark, evaluated INTERPRETED per element; the
    * round-18 respelling (posexplode + lead window) fixed that but
    * shuffled one row PER TOKEN of the corpus (the lead's
    * hashpartitioning(doc_id) exchange) and scanned documents twice
    * (base leg + bigram leg). Now: adjacent pairs are built PER ROW
    * with codegen-capable slice/arrays_zip (a bigram is tokens[i] ++
    * " " ++ tokens[i+1] — no window, no token shuffle), the base
    * signals ride the same single scan through the aggregation
    * (first()), and the only exchanges move partial (doc, bigram)
    * counts. `explode_outer` keeps <2-token docs (empty pair array →
    * one null row), matching shingles()' whole-text fallback of
    * 1 bigram / 1 distinct / top count 1 — value-identical to both
    * earlier spellings. */
  private def gopherSignals(docs: DataFrame): DataFrame = {
    val toks = graft.text.TextStats.tokens(col("text"))
    val n = size(toks)
    // two selects so the per-DOC stats and the pair array are computed
    // BELOW the Generate (one split per doc); a single select would plan
    // Project(stats) ABOVE Generate and re-split the text per bigram row
    val pre = docs.select(col("doc_id"),
      n.cast("long").as("n_tokens"),
      (length(col("text")) - (n - 1)).cast("long").as("sum_tok_len"),
      size(array_intersect(toks,
        lit(graft.text.TextStats.defaultStopwords.toArray)))
        .cast("long").as("stop_hits"),
      arrays_zip(slice(toks, lit(1), n - 1).as("a"),
        slice(toks, lit(2), n - 1).as("b")).as("__bg"))
    val exploded = pre.select(col("doc_id"), col("n_tokens"),
      col("sum_tok_len"), col("stop_hits"),
      explode_outer(col("__bg")).as("__s"))
    val perBigram = exploded.groupBy(col("doc_id"),
        concat(col("__s.a"), lit(" "), col("__s.b")).as("__g"))
      .agg(count(lit(1)).as("__cnt"),
        first(col("n_tokens")).as("n_tokens"),
        first(col("sum_tok_len")).as("sum_tok_len"),
        first(col("stop_hits")).as("stop_hits"))
    perBigram.groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("sum_tok_len")).as("sum_tok_len"),
        first(col("stop_hits")).as("stop_hits"),
        sum(when(col("__g").isNotNull, col("__cnt"))).as("__nb"),
        count(col("__g")).as("__nd"),
        max(when(col("__g").isNotNull, col("__cnt"))).as("__mx"))
      .select(col("doc_id"), col("n_tokens"), col("sum_tok_len"),
        // < 2 tokens: shingles() fell back to ONE whole-text shingle
        coalesce(col("__nb"), lit(1L)).as("n_bigrams"),
        when(col("__nd") === 0, lit(1L)).otherwise(col("__nd"))
          .as("n_distinct_bigrams"),
        coalesce(col("__mx"), lit(1L)).as("max_bigram_cnt"),
        col("stop_hits"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A compaction-style pipeline: dedup lineitem on its key with delta
    * ordering, then the classic pricing-summary aggregation. */
  def entry(spark: SparkSession): DataFrame = {
    val li = t(spark, "/root/testdata/sf0.001", "lineitem")
      .transform(Dedup.keyDeltaTop1(Seq("l_orderkey", "l_linenumber"),
        Seq(col("l_shipdate").desc, col("l_extendedprice").desc)))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Total-order delta comparator for lineitem dedup (deterministic
    * survivor; the reference requires delta fields to induce an order —
    * RecordKeyDedupReducerBase.java:74-94). */
  private val lineitemDelta = Seq(
    col("l_shipdate").desc, col("l_extendedprice").desc, col("l_quantity").desc,
    col("l_partkey").asc, col("l_suppkey").asc, col("l_discount").asc,
    col("l_tax").asc, col("l_returnflag").asc, col("l_linestatus").asc)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- converter-chain operators (SURVEY §2.3) ---
    "q01_project" -> ((s, dir) =>
      t(s, dir, "lineitem").transform(
        Converters.pickFields(Seq("l_orderkey", "l_partkey", "l_quantity")))),

    "q02_filter" -> ((s, dir) =>
      t(s, dir, "orders").transform(Converters.filterEq("o_orderstatus", "F"))),

    "q03_derive_partition" -> ((s, dir) =>
      t(s, dir, "orders")
        .transform(Converters.derivePartition("o_orderdate", "yyyy/MM/dd"))
        .select("o_orderkey", "datepartition")),

    "q04_flatmap_split" -> ((s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .transform(Converters.splitToRows("o_orderpriority", "-"))),

    "q05_sample" -> ((s, dir) =>
      t(s, dir, "lineitem").transform(Converters.sampleByKeyMod("l_orderkey", 2, 10))),

    // --- compaction / dedup (SURVEY §2.6) ---
    "q06_dedup_delta" -> ((s, dir) =>
      t(s, dir, "lineitem").transform(
        Dedup.keyDeltaTop1(Seq("l_orderkey", "l_linenumber"), lineitemDelta))),

    "q07_dedup_exact" -> ((s, dir) =>
      t(s, dir, "lineitem").transform(Dedup.exact())),

    // --- incremental watermark scan (SURVEY §2.1 QueryBasedSource) ---
    "q08_incremental" -> ((s, dir) =>
      WatermarkPartitioner.incrementalScan(
        t(s, dir, "orders"), "o_orderdate",
        Timestamp.valueOf("1995-06-01 00:00:00"),
        Timestamp.valueOf("1996-06-01 00:00:00"),
        WatermarkPartitioner.DateWm, maxPartitions = 4)),

    // --- completeness / audit counts (SURVEY §2.6) ---
    "q09_audit_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("w"))
        .agg(count(lit(1)).as("cnt"))),

    "q19_completeness_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ingested = ev.groupBy(date_trunc("hour", col("ts")).as("w"))
        .agg(count(lit(1)).as("ingested_cnt"))
      val audit = ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .groupBy(date_trunc("hour", col("ts")).as("w"))
        .agg(count(lit(1)).as("audit_cnt"))
      ingested.join(broadcast(audit), Seq("w"))
        .withColumn("passed", col("ingested_cnt") >= col("audit_cnt"))
    }),

    // --- compliance purge (SURVEY §2.6) ---
    "q10_purge" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val deletes = cust.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .select("c_custkey")
      Purge.purge(cust, deletes, Seq("c_custkey"))
    }),

    // --- distcp diff (SURVEY §2.6) ---
    "q11_copy_diff" -> ((s, dir) => {
      val manifest = t(s, dir, "part").select(
        concat(lit("/data/part_"), col("p_partkey"), lit(".parquet")).as("path"),
        col("p_size").cast("bigint").as("length"))
      val target = manifest.filter(
        pmod(regexp_extract(col("path"), "part_(\\d+)", 1).cast("bigint"), lit(3)) =!= 0)
      CopyDiff.diff(manifest, target)
    }),

    // --- retention (SURVEY §2.6) ---
    "q12_retention_newestk" -> ((s, dir) =>
      versions(t(s, dir, "orders")).transform(
        Retention.newestK(Seq("dataset"),
          Seq(col("version_ts").desc, col("path").desc), k = 5))),

    "q17_retention_time" -> ((s, dir) =>
      versions(t(s, dir, "orders")).transform(
        Retention.newerThan("version_ts", Timestamp.valueOf("1996-01-01 00:00:00")))),

    // --- task-level policy (SURVEY §2.5) ---
    "q13_rowcount_policy" -> ((s, dir) => {
      val in = t(s, dir, "lineitem")
      val out = in.transform(Converters.pickFields(Seq("l_orderkey", "l_quantity")))
      val (inCnt, outCnt) = (in.count(), out.count())
      require(operators.Quality.rowCountExact(inCnt, outCnt), "row count policy failed")
      s.createDataFrame(java.util.List.of(org.apache.spark.sql.Row(inCnt, outCnt)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("in_cnt", org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("out_cnt", org.apache.spark.sql.types.LongType, false))))
    }),

    // --- fork multi-sink (SURVEY §2.4) ---
    "q14_fork_a" -> ((s, dir) => runFork(s, dir, "a")),
    "q14_fork_b" -> ((s, dir) => runFork(s, dir, "b")),

    // --- streaming window counts == batch (SURVEY §2.8) ---
    "q15_stream_window" -> ((s, dir) => {
      val stream = Tables.loadStream(s, dir, "events")
      Streams.runToCompletion(
        Streams.tumblingCounts(stream, "ts", "1 minute"), "q15_stream_window_tbl")
    }),

    // --- stream-static enrichment join (lookup-converter shape): each
    // events micro-batch joins a broadcast dimension; result must equal
    // the batch join ---
    "q58_stream_enrich" -> ((s, dir) => {
      val dim = t(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("bucket", pmod(col("user_id"), lit(10)))
      val stream = Tables.loadStream(s, dir, "events")
        .select("event_id", "user_id")
      Streams.runToCompletionAppend(
        Streams.enrich(stream, dim, Seq("user_id")), "q58_enrich_tbl")
    }),

    // --- partitioned write + read-back (SURVEY §2.7) ---
    // Month granularity + repartition on the partition key: one file per
    // partition dir (day granularity on tiny rows-per-day testdata would
    // mean thousands of dirs x shuffle-partition files — the classic
    // small-files anti-pattern; at scale pick the grain so dirs hold GBs).
    "q16_partitioned_write" -> ((s, dir) => {
      val out = tmp("q16")
      t(s, dir, "orders")
        .transform(Converters.derivePartition("o_orderdate", "yyyy-MM"))
        .repartition(col("datepartition"))
        .write.mode("overwrite").partitionBy("datepartition").parquet(out)
      // partition values must read back as the written strings; scope the
      // inference toggle to this read (partition discovery happens inside
      // the .parquet() call) instead of leaking it into the session
      val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "false")
      try s.read.parquet(out)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }),

    // --- json converter (SURVEY §2.3, from_json pipeline) ---
    "q18_json_props" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))),

    // --- grok log parsing (GrokToJsonConverter.java:86): a real %{...}
    // pattern compiled to regex groups, not a hand-written regex ---
    "q31_grok_parse" -> ((s, dir) =>
      graft.functions.Grok.parse(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderpriority", "%{INT:prio_num}-%{WORD:prio_name}")
        .select("o_orderkey", "prio_num", "prio_name")),

    // wide grok: a 7-field log pattern over synthesized log lines; the
    // whole row parses with ONE GrokStruct match (bench headline — k
    // regexp_extracts would cost k regex runs per row)
    "q62_grok_wide" -> ((s, dir) => {
      val lines = t(s, dir, "orders").select(col("o_orderkey"),
        concat_ws(" ",
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          lit("INFO"),
          concat(lit("host"), pmod(col("o_orderkey"), lit(50))),
          concat(lit("10.0."), pmod(col("o_orderkey"), lit(256)), lit(".1")),
          concat(lit("user"), col("o_custkey")),
          col("o_orderstatus"),
          pmod(col("o_orderkey"), lit(10)),
          col("o_totalprice")).as("line"))
      graft.functions.Grok.parse(lines, "line",
        "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{WORD:host} %{IPV4:ip} " +
          "%{USERNAME:user} %{WORD:status} %{INT:prio:int} %{NUMBER:price:double}")
        .select("o_orderkey", "ts", "lvl", "host", "ip", "user", "status",
          "prio", "price")
    }),

    // --- regex row filter (StringFilterConverter) ---
    "q32_regex_filter" -> ((s, dir) =>
      t(s, dir, "documents").transform(Converters.filterRegex("text", "spark"))
        .select("doc_id", "lang", "source")),

    // --- csv sink/source round-trip (SURVEY §2.1/§2.7 file formats) ---
    "q33_csv_roundtrip" -> ((s, dir) => {
      val out = tmp("q33")
      val proj = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      proj.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(proj.schema).option("header", "true").csv(out)
    }),

    // --- orc sink/source round-trip ---
    "q34_orc_roundtrip" -> ((s, dir) => {
      val out = tmp("q34")
      val proj = t(s, dir, "supplier")
      proj.write.mode("overwrite").orc(out)
      s.read.orc(out)
    }),

    // --- avro sink/source round-trip (AvroHdfsDataWriter.java:51; no
    // spark-avro jar here, so the engine's own GenericRecord<->Row bridge
    // over avro-mapred does the IO, logical timestamp types included) ---
    "q38_avro_roundtrip" -> ((s, dir) => {
      val out = tmp("q38")
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      graft.sources.AvroIO.write(t(s, dir, "orders"), out, "orders")
      graft.sources.AvroIO.read(s, out)
    }),

    // --- late data + recompaction (MRCompactor late dirs): records after
    // the watermark publish normally, earlier ones spill into _late
    // (hidden from reads); recompaction merges + dedups + republishes, so
    // the final dir holds exactly the full event set.
    "q42_late_recompact" -> ((s, dir) => {
      import graft.operators.LateData
      val base = tmp("q42")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val out = s"$base/ds"
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
      val wm = Timestamp.valueOf("2024-01-15 00:00:00")
      val (onTime, late) = LateData.splitLate(ev, "ts", wm)
      onTime.write.parquet(out)
      LateData.appendLate(late, out, "spill1")
      LateData.recompact(s, out, Seq("event_id"),
        Seq(col("ts").desc), "recompact1")
      s.read.parquet(out).select("event_id", "user_id", "event_type")
    }),

    // --- kafka-shaped offset-range planning (KafkaSource.java:198,213):
    // events replayed as 4 "partitions"; partitions 0/1 resume from their
    // committed offsets, partition 2's commit (10) fell below the retained
    // earliest (25) -> reset-to-earliest, partition 3 has no commit ->
    // start at earliest. Extraction is one OR-of-ranges pushed predicate.
    "q41_offset_ranges" -> ((s, dir) => {
      import graft.planning.OffsetRangePlanner._
      val ev = t(s, dir, "events").select(col("event_id"),
        pmod(col("event_id"), lit(4)).cast("int").as("part"),
        expr("event_id div 4").as("off"))
      val stats = ev.groupBy("part")
        .agg(min(col("off")).as("lo"), max(col("off")).as("hi"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val partitions = (0 until 4).map { p =>
        val (lo, hi) = stats(p)
        PartitionState("events", p,
          earliest = if (p == 2) 25L else lo, latest = hi + 1)
      }
      val committed = Map(("events", 0) -> 100L, ("events", 1) -> 50L,
        ("events", 2) -> 10L)
      val ranges = plan(partitions, committed, ResetEarliest)
      extract(ev, ranges, "part", "off").select("event_id", "part", "off")
    }),

    // Kafka ingestion lifecycle across runs: run 1 consumes the retained
    // log to offset 50 per partition and commits its frontier to the
    // state store; run 2 replans from the COMMITTED offsets and must
    // extract exactly the delta — the query's output is run 2 alone
    // (KafkaSource.java:198,213 resume semantics, q37's manifest pattern).
    "q61_offset_resume" -> ((s, dir) => {
      import graft.planning.{OffsetLifecycle, OffsetRangePlanner}
      import OffsetRangePlanner.PartitionState
      val stateDir = tmp("q61")
      val fs = new org.apache.hadoop.fs.Path(stateDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(stateDir), true)
      val store = new graft.state.StateStore(s, stateDir)
      val ev = t(s, dir, "events").select(col("event_id"),
        pmod(col("event_id"), lit(4)).cast("int").as("part"),
        expr("event_id div 4").as("off"))
      val maxOff = ev.agg(max("off")).collect()(0).getLong(0)
      val parts1 = (0 until 4).map(p => PartitionState("events", p, 0L, 50L))
      val run1 = OffsetLifecycle.planRun(store, parts1, ev, "part", "off")
      require(run1.data.count() > 0, "run 1 must consume the initial log")
      run1.commitOffsets(store, "run1")
      val parts2 = (0 until 4).map(p =>
        PartitionState("events", p, 0L, maxOff + 1))
      val run2 = OffsetLifecycle.planRun(store, parts2, ev, "part", "off")
      run2.data.select("event_id", "part", "off")
    }),

    // --- envelope decode (EnvelopeSchemaConverter.java:57): payload bytes
    // deserialized with the writer schema looked up by id in a registry ---
    "q39_envelope" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val schemaJson = graft.sources.AvroIO
        .avroSchemaFor(orders.schema, "orders").toString
      val env = graft.sources.Envelope.encodeAvro(orders, schemaJson, schemaId = 7L)
      graft.sources.Envelope.decodeAvro(env, "schema_id", "payload",
        Map(7L -> schemaJson), schemaJson)
    }),

    // --- codec converters (StreamCodec gzip + aes): encrypt/compress then
    // invert, which must restore the original text exactly ---
    "q40_codec_roundtrip" -> ((s, dir) => {
      val key = "0123456789abcdef"
      t(s, dir, "documents").select(col("doc_id"),
        decode(graft.functions.Codecs.gunzip(
          graft.functions.Codecs.gzip(encode(col("text"), "UTF-8"))), "UTF-8")
          .as("text_gz"),
        decode(graft.functions.Codecs.aesDecrypt(
          graft.functions.Codecs.aesEncrypt(encode(col("text"), "UTF-8"), key), key),
          "UTF-8").as("text_aes"))
    }),

    // --- incremental file-manifest source (FileBasedSource.java:58) ---
    // run 1 extracts the initial files and commits the snapshot; new files
    // then land in the directory; run 2 must read ONLY the delta.
    "q37_manifest_incremental" -> ((s, dir) => {
      val base = tmp("q37")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true) // fresh scenario
      val data = s"$base/data"
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .write.mode("overwrite").parquet(data)
      val run1 = graft.sources.ManifestSource.plan(s, s"$base/state", "orders_inc", data)
      run1.df.count(): Unit
      run1.commit()
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .write.mode("append").parquet(data)
      graft.sources.ManifestSource.plan(s, s"$base/state", "orders_inc", data).df
    }),

    // --- gap-based sessionization (batch face; parity with the
    // flatMapGroupsWithState streaming face is unit-tested) ---
    "q44_sessionize" -> ((s, dir) =>
      graft.operators.Sessionize.gapSessions(
        t(s, dir, "events"), "user_id", "ts", "2 hours")),

    // --- bucketed co-located join: both sides persisted bucketed by the
    // join key, so the recurring fact-fact join runs shuffle-free (the
    // zero-exchange plan is asserted in DataOrgSpec; here the result is
    // hash-checked against a plain join) ---
    "q45_bucketed_join" -> ((s, dir) => {
      import graft.operators.Bucketing
      Bucketing.writeBucketed(t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
        "q45_orders", Seq("o_orderkey"), numBuckets = 8)
      Bucketing.writeBucketed(t(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
        "q45_lineitem", Seq("l_orderkey"), numBuckets = 8)
      s.table("q45_orders")
        .join(s.table("q45_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("sum_qty"),
          max(col("o_totalprice")).as("max_total"),
          count(lit(1)).as("n"))
    }),

    // --- raw date-tree source with plan-time pruning (yyyy/MM/dd dirs
    // carry no column mapping, so Catalyst can't prune them; the source
    // prunes at planning and only in-range leaves reach the scan) ---
    "q46_date_prune" -> ((s, dir) => {
      val base = tmp("q46")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("y", date_format(col("ts"), "yyyy"))
        .withColumn("m", date_format(col("ts"), "MM"))
        .withColumn("d", date_format(col("ts"), "dd"))
      ev.repartition(col("y"), col("m"), col("d"))
        .write.partitionBy("y", "m", "d").parquet(base)
      graft.sources.DatePartitionedSource.read(s, base,
        pattern = "'y='yyyy/'m='MM/'d='dd",
        lowWatermark = Some(java.time.LocalDate.parse("2024-01-10")))
        .select("event_id", "user_id")
    }),

    // --- deterministic stratified sampling (the sampleBy shape, made
    // layout-independent and engine-reproducible via portable hash) ---
    "q48_stratified_sample" -> ((s, dir) =>
      t(s, dir, "documents").transform(Converters.stratifiedSampleByHash(
        "doc_id", "lang", Map("en" -> 50, "de" -> 20), defaultRate = 10))
        .select("doc_id", "lang", "source")),

    // --- salted join (skew mitigation): result must be IDENTICAL to the
    // plain join — the salt only re-partitions the work. The oracle runs
    // the unsalted join, so any salt-induced dup/loss is a hash mismatch.
    "q49_salted_join" -> ((s, dir) => {
      import graft.operators.Skew
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ords = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Skew.saltedJoin(li, ords, "l_orderkey", "o_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    // --- multimodal frame sampling: every-nth-frame plan rows over the
    // decoded video features (deterministic via the documented stub) ---
    "q50_frame_sample" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, t(s, dir, "documents"))
      Multimodal.sampleFrames(Multimodal.extractFeatures(media).toDF(), every = 7)
        .select(col("media_id"), col("frame_idx").cast("bigint").as("frame_idx"))
    }),

    // --- REST pagination source (RestApiExtractor.java:61): the fetcher
    // seam pages a driver-side JSON "endpoint" (no network here) through
    // the cursor loop; the decoded frame must equal the source table ---
    "q51_rest_pages" -> ((s, dir) => {
      val proj = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val rows = proj.toJSON.collect()
      val pageSize = 1000
      def fetch(cursor: Long): graft.sources.RestSource.Page = {
        val from = cursor.toInt
        val until = math.min(from + pageSize, rows.length)
        graft.sources.RestSource.Page(rows.slice(from, until).toSeq,
          if (until < rows.length) Some(until.toLong) else None)
      }
      graft.sources.RestSource.read(s, fetch, schema = Some(proj.schema))
    }),

    // --- catalog-registration publisher (HiveRegister.java:62): publish a
    // partitioned dir, register it as an external table + RECOVER
    // PARTITIONS, then read THROUGH the catalog ---
    "q52_catalog_register" -> ((s, dir) => {
      val base = tmp("q52")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val out = s"$base/events_tbl"
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
        .drop("ts")
        .repartition(col("dt"))
        .write.partitionBy("dt").parquet(out)
      graft.sinks.CatalogRegister.deregister(s, "q52_events")
      graft.sinks.CatalogRegister.register(s, "q52_events", out,
        partitionCols = Seq("dt"))
      // partition inference types dt as DATE; emit it as the written
      // string (DATE canonicalizes differently per engine in the compare)
      s.table("q52_events").select(col("event_id"), col("user_id"),
        col("event_type"), col("dt").cast("string").as("dt"))
    }),

    // --- Salesforce-style histogram chunk planning (SalesforceSource
    // .java:272-303: probe a per-day row-count histogram, pack days into
    // equal-row chunks, extract each chunk as its own range query; the
    // union must cover the table exactly once) ---
    "q53_histogram_chunks" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val hist = orders.groupBy(col("o_orderdate")).count()
        .orderBy("o_orderdate").collect()
        .map(r => r.get(0) -> r.getLong(1)).toSeq
      val target = math.max(1L, hist.map(_._2).sum / 8)
      val chunks = WatermarkPartitioner.packHistogram(hist, target)
      chunks.map { case (first, last) =>
        orders.filter(col("o_orderdate") >= lit(first) &&
          col("o_orderdate") <= lit(last))
      }.reduce(_ unionAll _)
    }),

    // PK-chunk fallback (SalesforceExtractor.java:97): when no histogram
    // column exists, range-chunk the primary key from one min/max/count
    // probe; the chunk union must cover the table EXACTLY once (multiset
    // hash equality catches both gaps and overlaps).
    "q63_pk_chunks" -> ((s, dir) =>
      WatermarkPartitioner.pkChunkedScan(t(s, dir, "orders"), "o_orderkey",
        targetRowsPerChunk = 1000)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // --- distcp byte-copy executor (FileAwareInputStreamDataWriter):
    // plan from a manifest listing, stream-copy with staging+rename,
    // re-read the COPIES — byte-identical files parse to equal rows ---
    "q54_copy_exec" -> ((s, dir) => {
      import s.implicits._
      val base = tmp("q54")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val srcDir = s"$base/src"
      val dstDir = s"$base/dst"
      t(s, dir, "supplier").write.mode("overwrite").parquet(srcDir)
      // manifest paths are root-relative ("/part-..."); the task build is
      // a distributed map over the manifest — no driver collect
      val tasks = operators.CopyExec.planFromManifest(
        operators.CopyDiff.listManifest(s, srcDir), srcDir, dstDir)
      val n = tasks.count()
      val stats = operators.CopyExec.execute(tasks, parallelism = 4)
      require(stats.filesCopied + stats.filesSkipped == n)
      s.read.parquet(dstDir)
    }),

    // --- archive-aware distcp (round 18): UnGzipConverter +
    // DecryptConverter + TarArchiveInputStreamDataWriter semantics —
    // an encrypted compressed archive drop (`suppliers.tar.gz.aes`)
    // decrypts (keystore rotating AES-GCM), gunzips and unpacks IN
    // FLIGHT inside the copy task; the destination holds the plain
    // member files (extensions stripped), which re-parse to the source
    // table's rows ---
    "q252_copy_unpack" -> ((s, dir) => {
      val base = tmp("q252")
      val hfs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      hfs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ring = graft.functions.KeyCrypto.KeyRing(Map(
        1 -> Array.tabulate(16)(i => (i * 11 + 5).toByte),
        2 -> Array.tabulate(16)(i => (i * 3 + 2).toByte)))
      // fixture: the supplier table as 4 csv members of one archive
      // (drop-shaped: a vendor ships a tarball, not a table)
      val rows = t(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .collect() // fixture setup: supplier is the smallest table
      val members = rows.groupBy(r => (r.getLong(0) % 4).toInt).toSeq
        .sortBy(_._1)
        .map { case (m, rs) =>
          val text = rs.sortBy(_.getLong(0))
            .map(r => s"${r.getLong(0)},${r.getString(1)},${r.getInt(2)}")
            .mkString("", "\n", "\n")
          (s"part-$m.csv", text.getBytes("UTF-8"))
        }
      operators.CopyStream.writeTarGzAes(hfs,
        new org.apache.hadoop.fs.Path(s"$base/src/suppliers.tar.gz.aes"),
        "suppliers", members, ring)
      val tasks = operators.CopyExec.planFromManifest(
        operators.CopyDiff.listManifest(s, s"$base/src"),
        s"$base/src", s"$base/dst")
      val stats = operators.CopyStream.execute(tasks,
        Seq(operators.CopyStream.DecryptAes(ring), operators.CopyStream.Ungzip),
        untar = true)
      require(stats.filesCopied == 1 && stats.entriesWritten == 4,
        s"archive copy wrote ${stats.entriesWritten} members")
      s.read.schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
        .csv(s"$base/dst/suppliers")
    }),

    // --- partition-scoped purge rewrite (HivePurgerSource.java:66): only
    // partitions holding a deleted key are rewritten (dynamic partition
    // overwrite); the re-read of the WHOLE tree equals the anti-join ---
    "q55_purge_partitions" -> ((s, dir) => {
      val base = tmp("q55")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val cust = t(s, dir, "customer")
      cust.write.partitionBy("c_mktsegment").parquet(base)
      val deletes = cust.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .select("c_custkey")
      Purge.purgePartitioned(s, base, "c_mktsegment", deletes, Seq("c_custkey"))
      s.read.parquet(base).select("c_custkey", "c_name", "c_mktsegment")
    }),

    // --- BULK jdbc sink: the reference's only published throughput figure
    // is its JDBC writer (80k records, batch=1000, parallelism=1 -> 40 s,
    // ~2000 rec/s — BASELINE.md). This stages the full orders table into
    // embedded Derby with the same batch size, publishes transactionally,
    // and reads it back through JDBC; the bench entry times it so rec/s is
    // directly comparable (modern hardware, noted honestly in BASELINE.md).
    "q56_jdbc_bulk" -> ((s, dir) => {
      val url = "jdbc:derby:memory:graft_q56;create=true"
      val orders = t(s, dir, "orders")
      graft.sinks.JdbcWriter.writeStaged(orders, graft.sinks.JdbcWriter.JdbcSpec(
        url, "orders_bulk", org.apache.spark.sql.SaveMode.Overwrite,
        batchSize = 1000))
      // Derby TIMESTAMP comes back zoned; restore the source's NTZ face
      s.read.jdbc(url, "orders_bulk", new java.util.Properties())
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    }),

    // --- jdbc sink + incremental source round-trip (embedded Derby) ---
    // staged write (staging table + one publish txn, JdbcWriter.java:67
    // semantics), then read back through watermark chunk predicates, each
    // a separate partition's WHERE clause (QueryBasedSource semantics).
    "q35_jdbc_roundtrip" -> ((s, dir) => {
      val url = "jdbc:derby:memory:graft_q35;create=true"
      val nation = t(s, dir, "nation")
      graft.sinks.JdbcWriter.writeStaged(nation, graft.sinks.JdbcWriter.JdbcSpec(
        url, "nation", org.apache.spark.sql.SaveMode.Overwrite))
      val preds = graft.sources.JdbcIncremental.numericPredicates(
        "n_nationkey", -1L, 1000L, maxPartitions = 4)
      graft.sources.JdbcIncremental.read(s, url, "nation", preds)
    }),

    // ==== training-data pipeline operators (documents/embeddings) ====

    // exact content dedup: one survivor per md5(text)
    "q20_docs_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(TextStats.contentFingerprint(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("doc_id"))),

    // minhash LSH near-dup pairs, exact-verified: LSH proposes candidates,
    // exact shingle-Jaccard filters them, so the output equals the
    // above-threshold pair set up to LSH recall — r=2,b=32 banding keeps
    // the miss probability ~1e-4 even at the 0.5 threshold boundary
    // (DuckDB recomputes the set all-pairs at oracle scale, while the
    // engine path stays O(docs x bands)).
    "q21_minhash_pairs" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val cands = MinHashDedup.candidatePairs(docs, "doc_id", "text",
        n = 3, k = 64, numBands = 32)
      MinHashDedup.verifyShingleJaccard(cands, docs, "doc_id", "text",
        n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard_r"))
    }),

    // duplicate-cluster resolution: verified near-dup pairs -> connected
    // components -> cluster id per doc (survivor = min id per cluster);
    // DuckDB recomputes components with a recursive CTE over the same
    // exact-Jaccard pair set.
    "q36_dup_clusters" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val cands = MinHashDedup.candidatePairs(docs, "doc_id", "text",
        n = 3, k = 64, numBands = 32)
      val pairs = MinHashDedup.verifyShingleJaccard(cands, docs, "doc_id", "text",
        n = 3, threshold = 0.5).select("id_a", "id_b")
      graft.dedup.DupClusters.resolve(docs, "doc_id", pairs)
        .select("doc_id", "cluster_id")
    }),

    // simhash fingerprints (rows-only)
    "q22_simhash" -> ((s, dir) =>
      SimHash.withSimhash(t(s, dir, "documents"), "text")
        .select("doc_id", "simhash")),

    // exact token-set jaccard between consecutive doc pairs
    "q23_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      val a = docs.select(col("doc_id").as("id_a"), col("toks").as("tok_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("toks").as("tok_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
            size(array_union(col("tok_a"), col("tok_b"))).cast("double"))
            .as("jaccard"))
    }),

    // language id by stopword profiles
    "q24_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.langId(col("text")).as("lang_pred"))),

    // quality scoring components
    "q25_quality_score" -> ((s, dir) =>
      TextStats.withQuality(t(s, dir, "documents"), "text")
        .select("doc_id", "n_chars_calc", "n_tokens", "avg_token_len",
          "punct_ratio", "stopword_hits")),

    // token counting (whitespace + BPE-ish estimate)
    "q26_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("bigint").as("n_tokens"),
        TextStats.tokenEstimateBpe(col("text")).cast("bigint").as("n_tokens_bpe"))),

    // text canonicalization + repetition signal (pre-dedup cleanup pass)
    "q57_text_normalize" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.normalizeText(col("text")).as("norm_text"),
        round(TextStats.repetitionRatio(col("text")), 6).as("rep_ratio"))),

    // corpus-level top-k frequent n-grams (boilerplate/vocabulary mining):
    // explode shingles -> partial-agg count -> deterministic top-k. At
    // scale this is the map-side-combined shuffle of the n-gram key space,
    // with the top-k a TakeOrdered over partial maxima — never a sort of
    // the full key space.
    "q59_top_ngrams" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(MinHashDedup.shingles(col("text"), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("ngram").asc)
        .limit(50)),

    // atomic multi-branch snapshot commit: two branches publish through
    // one manifest-pointer flip; a second commit updates one branch and
    // carries the other forward; the result reads the live snapshot of
    // both branches PLUS a time-travel read of the first — every row
    // resolved through manifests, never raw dirs.
    "q60_snapshot_commit" -> ((s, dir) => {
      val root = tmp("q60")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val log = new graft.sinks.SnapshotLog(s, root)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val (id1, _) = Fork.runSnapshot(orders,
        Seq(
          Fork.Branch("low", Some(col("o_totalprice") < 100000),
            _.select("o_orderkey", "o_totalprice"), outDir = ""),
          Fork.Branch("high", Some(col("o_totalprice") >= 100000),
            _.select("o_orderkey", "o_totalprice"), outDir = "")),
        log, "q60r1")
      val id2 = log.commit(Map("low" ->
        orders.filter(col("o_totalprice") < 100000 &&
          col("o_orderstatus") === "F")
          .select("o_orderkey", "o_totalprice")))
      log.read("low", Some(id2)).withColumn("src", lit("low@2"))
        .unionByName(log.read("high").withColumn("src", lit("high")))
        .unionByName(log.read("low", Some(id1)).withColumn("src", lit("low@1")))
        .select("src", "o_orderkey", "o_totalprice")
    }),

    // rolling fingerprint (rows-only: xxhash64 not in DuckDB)
    "q27_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.rollingFingerprint(col("text")).as("fingerprint"))),

    // brute-force cosine top-k (exact ANN baseline)
    "q28_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"))
    }),

    // LSH-bucketed ANN. Oracle contract: the LSH result must EQUAL the
    // exact brute-force top-k (q28's oracle) — recall 1.0, any missed
    // neighbor is a hash mismatch. The testdata embeddings are random
    // (max cosine ~0.37, no planted neighbors), the hardest regime for
    // SRP-LSH, so bits is sized small for the 500-vector corpus
    // (bits ~ log2(corpus/bucket); buckets of ~30) and tables high; at
    // real scale bits grows with log(corpus) and real embedding clusters
    // make recall far cheaper.
    "q29_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, bits = 4, tables = 16)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"))
    }),

    // embedding-cosine near-duplicate PAIRS (the dedup face of ANN):
    // banded SRP-LSH proposes, exact cosine verifies. The corpus is the
    // embeddings table plus a deterministically perturbed copy of every
    // vector (per-dim scale 0.97..1.03 — recomputable in SQL), planting
    // one cosine~0.9995 near-dup per vector: the regime LSH dedup exists
    // for (tight threshold, selective buckets — 8-bit bands keep bucket
    // sizes ~corpus/256 per table while P(miss) stays ~1e-8/pair; random
    // pairs top out near cosine 0.5, far under the 0.9 threshold, so the
    // verified set is exactly the planted pairs). DuckDB recomputes the
    // set all-pairs; the engine never does.
    "q43_embed_neardup" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val near = base.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.01) *
            (pmod(i.cast("bigint"), lit(7L)) - lit(3L)).cast("double")))
          .as("embedding"))
      Ann.nearDupPairs(base.unionByName(near), "vec_id", "embedding",
        threshold = 0.9, bits = 8, tables = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine_r"))
    }),

    // IVF ANN: coarse quantizer (spherical k-means on a bounded sample) +
    // nprobe cell probing. Run on a DERIVED clustered corpus (a +10.0
    // spike on dimension vec_id%16 — recomputable in SQL) because IVF's
    // contract only holds when data has cluster structure; there the
    // probed cells contain every true neighbor, so the output must EQUAL
    // the exact top-k (the oracle recomputes exact top-k over the same
    // derived corpus — recall 1.0, any probe miss is a hash mismatch).
    "q47_ivf_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val derived = emb.select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      Ann.ivfTopK(derived, derived.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10, numCells = 16, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"))
    }),

    // Product quantization ADC search (Jégou 2011; the FAISS IVF-PQ
    // compression half): codebooks trained on a bounded deterministic
    // sample, corpus encoded to m bytes/vector (map-only expression),
    // queries scored via broadcast lookup tables — m byte-indexed adds
    // per candidate instead of D multiplies. K-means itself is not
    // SQL-expressible, so the query SELF-CERTIFIES the lossy half
    // in-query (the q158 raise_error pattern): (a) the mean squared
    // reconstruction error of the codes stays under 15% of the mean
    // squared vector norm (measured ≤ 7% at every test SF — a 2×
    // margin), and (b) the exact nearest neighbor of every query is IN
    // the ADC candidate set and survives the exact re-rank at rank 1 —
    // planted-cluster top-1 recovery. The certified output is the exact
    // top-1, which a DuckDB oracle recomputes (q64's cosine SQL);
    // PqSpec still pins determinism and the map-only encode plan.
    "q100_pq_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val derived = emb.select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      val cb = graft.ann.Pq.train(derived, "vec_id", "embedding",
        m = 8, k = 16, sampleN = 2000, iters = 8)
      val enc = graft.ann.Pq.encode(derived, "vec_id", "embedding", cb)
      val queries = derived.filter(col("vec_id") < 5)
      // ADC candidates (64-deep over-fetch), then exact re-rank — the
      // standard IVF-PQ + re-rank serving layout
      val cand = graft.ann.Pq.adcTopK(enc, queries, "vec_id", "embedding",
        cb, topK = 64)
      val qv = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      val cv = derived.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv"))
      val wExact = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      val reranked = cand.select("query_id", "neighbor_id")
        .join(broadcast(qv), "query_id").join(cv, "neighbor_id")
        .withColumn("cosine", Ann.dot(col("__qv"), col("__cv")) /
          (Ann.norm(col("__qv")) * Ann.norm(col("__cv"))))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id", "cosine", "rank")
      // brute-force exact top-1 (5 queries × corpus, one broadcast map
      // pass) — the certification target
      val brute = cv.crossJoin(broadcast(qv))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine", Ann.dot(col("__qv"), col("__cv")) /
          (Ann.norm(col("__qv")) * Ann.norm(col("__cv"))))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
      val missed = brute.join(reranked.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
        .agg(count(lit(1)).as("__missed"))
      // (a) reconstruction-error bound over the whole encoded corpus
      val recon = derived.select(col("embedding"),
        graft.ann.Pq.decodeCol(graft.ann.Pq.encodeCol(col("embedding"), cb), cb)
          .cast("array<double>").as("__dv"))
        .agg(
          avg(aggregate(zip_with(col("embedding"), col("__dv"),
            (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
            .as("__mse"),
          avg(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x * x)).as("__msq"))
      val cert = broadcast(missed.crossJoin(recon))
      reranked.crossJoin(cert)
        .withColumn("ok", when(col("__missed") === 0 &&
          col("__mse") * 100 <= col("__msq") * 15, lit(true)).otherwise(
          raise_error(concat(lit("PQ certification failed: missed top-1 for "),
            col("__missed"), lit(" queries; recon MSE "), col("__mse"),
            lit(" vs mean sq norm "), col("__msq")))))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"), col("ok"))
    }),

    // IVF over a PERSISTED index: same derived clustered corpus and
    // recall-1.0 contract as q47 (identical deterministic training, so the
    // output must EQUAL the exact top-k), but the corpus is written
    // partitioned by coarse cell and the probes become partition-pruned
    // reads — the scan touches only the probed cells (PlanSpec pins the
    // PartitionFilters), which is the 100 TB search shape.
    "q64_ivf_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val derived = emb.select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      val model = Ann.ivfTrain(derived, "vec_id", "embedding", numCells = 16)
      val idx = tmp("q64_ivf_index")
      Ann.ivfWriteIndex(derived, "vec_id", "embedding", model, idx)
      Ann.ivfTopKIndexed(idx, derived.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10, nprobe = 2, model = model)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"))
    }),

    // distributed components path, oracle-checked: a deterministic graph
    // over the documents ids (chains of 10 merged by long-range overlay
    // edges — multi-hop AND cross-chain) resolved with driverMaxEdges = 0,
    // so the large-star/small-star loop itself — the path a 100 TB pair
    // set must take — is DuckDB-verified, not just the driver union-find
    // shortcut q36 exercises.
    "q65_components_distributed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val ids = docs.select(col("doc_id").as("d"))
      val chain = ids
        .filter(pmod(col("d"), lit(10)) =!= 9 && col("d") < lit(n - 1))
        .select(col("d").as("id_a"), (col("d") + 1).as("id_b"))
      val overlay = ids.filter(pmod(col("d"), lit(97)) === 0)
        .select(col("d").as("id_a"), pmod(col("d") * 31, lit(n)).as("id_b"))
      graft.dedup.DupClusters.resolve(docs, "doc_id", chain.union(overlay),
        driverMaxEdges = 0L)
        .select("doc_id", "cluster_id")
    }),

    // HLL approximate completeness (SURVEY §4): per-day audit where the
    // distinct-id comparison is an HLL++ sketch (map-side, O(windows)
    // shuffle) instead of an exact distinct (O(rows) shuffle). The drop
    // pattern (even ids on every 5th day) puts healthy days at ratio 1.0
    // and broken days at ~0.5 — both >15 sigma from the 0.75 threshold at
    // rsd 0.005, so the approximate decision equals the oracle's exact one.
    "q66_hll_completeness" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ingested = ev.filter(!(pmod(col("event_id"), lit(2)) === 0 &&
        pmod(dayofmonth(col("ts")), lit(5)) === 0))
      operators.Quality.approxCompleteness(ev, ingested,
        date_trunc("day", _), "ts", "event_id", threshold = 0.75)
    }),

    // incremental corpus dedup (the continuous-ingestion shape): the
    // committed corpus collapses to a Bloom sketch, the new batch is
    // prefiltered map-side, and only sketch-positives pay the exact
    // anti-join shuffle. Batch construction covers all three paths:
    // %4==0 docs are genuinely new (survive), %8==1 re-arrivals duplicate
    // committed content (dropped by the store), %8==4 re-submissions
    // duplicate in-batch content (collapsed to min id).
    "q67_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val committed = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
        .select(TextStats.contentFingerprint(col("text")).as("h"))
      val batch = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .unionByName(docs.filter(pmod(col("doc_id"), lit(8)) === 1)
          .withColumn("doc_id", col("doc_id") + 100000))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(8)) === 4)
          .withColumn("doc_id", col("doc_id") + 200000))
      IncrementalDedup.survivors(batch, committed, "doc_id",
        TextStats.contentFingerprint(col("text")))
    }),

    // Gopher-style repetition quality signals: top-bigram fraction and
    // duplicate-bigram fraction per doc, computed with in-row array
    // expressions (map-only, no shuffle at any scale).
    "q68_gopher_repetition" -> ((s, dir) => {
      val g = MinHashDedup.shingles(col("text"), 2)
      t(s, dir, "documents").select(col("doc_id"),
        round(TextStats.topNgramFraction(g), 6).as("top_bigram_frac"),
        round(TextStats.dupNgramFraction(g), 6).as("dup_bigram_frac"))
    }),

    // PII scrubbing: deterministic synthetic email + IPv4 are appended to
    // each doc (the generator corpus carries no real PII), then redacted
    // and counted — one codegen'd regexp pass, RE2-compatible patterns so
    // the oracle runs the identical regexes.
    "q69_pii_redact" -> ((s, dir) => {
      val injected = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com via 10."),
        pmod(col("doc_id"), lit(200)).cast("string"), lit(".0.1"))
      t(s, dir, "documents").select(col("doc_id"),
        Redact.redactPii(injected).as("redacted"),
        Redact.emailCount(injected).cast("bigint").as("n_email"),
        Redact.ipv4Count(injected).cast("bigint").as("n_ip"))
    }),

    // per-doc top-3 TF-IDF terms (rational idf: every op IEEE-exact, so
    // the oracle's recomputed score matches bit-for-bit — see Tfidf)
    "q70_tfidf_topk" -> ((s, dir) =>
      Tfidf.topTerms(t(s, dir, "documents"), "doc_id", "text", k = 3,
        logIdf = false)),

    // persisted-LSH-index near-dup (the continuous-ingestion shape, near-
    // dup edition): corpus signatures live in a bucketed index table, the
    // batch probes it (index side never shuffles — plan-pinned), and only
    // candidates touch text for the exact-Jaccard verify. Same %4 split
    // as q67; DuckDB recomputes the cross pair set all-pairs.
    "q73_lsh_index_neardup" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      graft.dedup.LshIndex.build(s, corpus, "doc_id", "text",
        "q73_lsh_idx", tmp("q73_lsh_index"))
      val cands = graft.dedup.LshIndex.probe(s, "q73_lsh_idx", batch,
        "doc_id", "text")
      MinHashDedup.verifyShingleJaccard(cands, docs, "doc_id", "text",
        n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard_r"))
    }),

    // schema evolution end-to-end: a narrow-typed batch (int line number,
    // float quantity) lands on a widened target (long/double), gains a
    // nullable column, and comes out in the target's column order — the
    // oracle recomputes the same casts, so evolve()'s value preservation
    // and by-name alignment are hash-checked, not just unit-tested.
    "q74_schema_evolve" -> ((s, dir) => {
      val src = t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"), // int32 in the testdata
        col("l_quantity").cast("float").as("l_quantity"))
      val target = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("l_quantity",
          org.apache.spark.sql.types.DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("l_orderkey",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("l_linenumber",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("note",
          org.apache.spark.sql.types.StringType, nullable = true)))
      operators.SchemaEvolution.evolve(src, target)
    }),

    // stage-metric emission end-to-end (gobblin-metrics MetricContext +
    // the job-history store's TaskExecutionInfo rows): an instrumented
    // pipeline run lands per-stage record counters — source read/passed/
    // rejected, per-branch routed/written, each rolled up to the job root
    // context — in a queryable FS metric store; the oracle recomputes
    // every counter from the raw table, so the observe() plumbing and the
    // context-tree rollup are hash-checked. Timings/bytes are emitted too
    // but excluded here (non-deterministic by nature).
    "q75_stage_metrics" -> ((s, dir) => {
      val base = tmp("q75")
      val runId = s"q75-${java.util.UUID.randomUUID()}"
      val spec = pipeline.PipelineSpec.fromProperties(Map(
        "job.name" -> "q75job",
        "source.format" -> "parquet",
        "source.path" -> s"$dir/lineitem.parquet",
        "transform.1" -> "selectExpr:l_orderkey;l_linenumber;l_quantity",
        "rowpolicy.1.name" -> "qty_cap",
        "rowpolicy.1.predicate" -> "l_quantity <= 45",
        "rowpolicy.1.type" -> "ERR_FILE",
        "qualitychecker.err.dir" -> s"$base/err",
        "fork.1.name" -> "evens",
        "fork.1.filter" -> "l_orderkey % 2 = 0",
        "fork.1.out" -> s"$base/out/evens",
        "fork.2.name" -> "odds",
        "fork.2.filter" -> "l_orderkey % 2 = 1",
        "fork.2.out" -> s"$base/out/odds",
        "state.dir" -> s"$base/state"))
      pipeline.PipelineRunner.run(s, spec, runId)
      new metrics.MetricStore(s, s"$base/state/metrics").table
        .filter(col("run_id") === runId &&
          col("metric").startsWith("records."))
        .select("context", "metric", "value")
    }),

    // dataset-scoped config resolution driving retention (the reference's
    // config-store: one tag subtree governs many datasets): a ConfigStore
    // resolves per-dataset newest-K — click imports the /tags/hot tag
    // (K=6), error overrides locally (K=2), everything else inherits the
    // root default (K=3) — and the resolved policies apply to ALL
    // datasets in ONE broadcast-join + window pass, never a per-dataset
    // job loop. The oracle replays the resolved K values as a CASE, so
    // resolution + application are hash-checked end-to-end.
    "q76_config_retention" -> ((s, dir) => {
      val store = config.ConfigStore(
        "/" -> config.ConfigNode(Map("retention.k" -> "3")),
        "/tags/hot" -> config.ConfigNode(Map("retention.k" -> "6")),
        "/datasets/click" -> config.ConfigNode(imports = Seq("/tags/hot")),
        "/datasets/error" -> config.ConfigNode(Map("retention.k" -> "2")))
      val policy = config.ConfigPolicies.newestKTable(s,
        store.resolveAll("/datasets"), "retention.k", default = 3)
      val versions = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n"))
      config.ConfigPolicies.newestKPerDataset(
        policy, "event_type", Seq(col("d").desc), default = 3)(versions)
    }),

    // retention against a REAL filesystem layout: events land in
    // hive-style daily dirs, DateTimeDatasetVersionFinder derives the
    // glob from the datetime pattern and parses each dir into its
    // version timestamp, newest-5 survive, the delete set is executed as
    // recursive directory removals, and the SURVIVING DATA is read back —
    // policy to disk and back, not a synthesized versions table. The
    // version scan is O(dirs) driver metadata; only survivors' data is
    // ever read distributed.
    "q77_fs_retention" -> ((s, dir) => {
      val root = tmp("q77/events_by_day")
      t(s, dir, "events")
        .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
        .repartition(col("d"))
        .write.mode("overwrite").partitionBy("d").parquet(root)
      val versions = operators.VersionFinder
        .dateTimeVersions(s, root, "'d='yyyy-MM-dd")
        .withColumn("dataset", lit("events"))
      val survivors = Retention.newestK(
        Seq("dataset"), Seq(col("version_ts").desc), 5)(versions)
      operators.VersionFinder.deleteVersions(s,
        Retention.deleteSet(versions, survivors, Seq("path")))
      val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "false")
      try s.read.parquet(root).groupBy(col("d"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 3).as("sum_value_r"))
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }),

    // COMMIT_SUCCESSFUL_TASKS end-to-end: a two-branch fork where one
    // branch poisons itself at execution time (assert_true) runs under
    // the partial-commit policy — the healthy branch's output publishes
    // anyway and is read back as the result, while the failed branch
    // publishes nothing and the run ledger records COMMITTED_PARTIAL.
    // The oracle recomputes the healthy branch directly, proving the
    // poison branch neither blocked nor contaminated the publish.
    "q78_partial_commit" -> ((s, dir) => {
      val base = tmp("q78")
      val runId = s"q78-${java.util.UUID.randomUUID()}"
      val spec = pipeline.PipelineSpec.fromProperties(Map(
        "job.name" -> "q78job",
        "job.commit.policy" -> "successful",
        "source.format" -> "parquet",
        "source.path" -> s"$dir/orders.parquet",
        "fork.1.name" -> "good",
        "fork.1.filter" -> "o_orderstatus = 'F'",
        "fork.1.select" -> "o_orderkey,o_totalprice",
        "fork.1.out" -> s"$base/out/good",
        "fork.2.name" -> "bad",
        "fork.2.filter" -> "assert_true(o_orderkey < 0) IS NULL",
        "fork.2.out" -> s"$base/out/bad",
        "state.dir" -> s"$base/state"))
      val r = pipeline.PipelineRunner.run(s, spec, runId)
      require(r.failedBranches.keySet == Set("bad"),
        s"expected exactly the poison branch to fail: ${r.failedBranches}")
      s.read.parquet(s"$base/out/good")
    }),

    // weighted corpus mixing (pretraining "data mixing"): src0 appears
    // 2.5× (two full epochs + a hash-sampled half), src1 is thinned to
    // 0.4×, everything else passes once. Map-only — copies is a
    // row-local expression, the epoch expansion a generator — and the
    // salted md5 hash makes the fractional sampling bit-reproducible in
    // DuckDB, so the oracle checks the exact mixed multiset.
    "q79_corpus_mix" -> ((s, dir) =>
      t(s, dir, "documents")
        .transform(graft.text.CorpusMix.mixByWeights(
          "source", "doc_id", Map("src0" -> 2.5, "src1" -> 0.4)))
        .select("doc_id", "source", "lang", "epoch")),

    // per-language corpus profile: the dataset-card numbers (doc counts,
    // char volumes, exact median) in one map-side-combined aggregation.
    // Stats are integer-exact or IEEE-exact (sum/count/min/max, division,
    // 0.5-quantile of integers) so the oracle matches bit-for-bit; means
    // come from round(sum/count), never a float running average.
    "q71_corpus_profile" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          expr("percentile(n_chars, 0.5)").as("median_chars"))
        .withColumn("mean_chars_r",
          round(col("sum_chars").cast("double") / col("n_docs"), 6))),

    // benchmark decontamination (the train/test-overlap filter): drop
    // every corpus doc sharing an exact token 4-gram with the held-out
    // eval set (docs %50==0 stand in for it). The eval side is tiny at
    // any corpus scale, so its distinct grams BROADCAST and the corpus
    // pays one map-side semi-join probe — no shuffle of corpus grams.
    "q72_decontaminate" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val grams = MinHashDedup.shingles(col("text"), 4)
      val benchGrams = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(explode(grams).as("g")).distinct()
      val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      val contaminated = corpus
        .select(col("doc_id"), explode(grams).as("g"))
        .join(broadcast(benchGrams), "g")
        .select("doc_id").distinct()
      corpus.join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source")
    }),

    // C4-style span-level exact dedup: cut every doc into 8-word spans,
    // keep each distinct span's FIRST corpus occurrence (min doc, pos),
    // rebuild docs from survivors. Winner selection is one map-side-
    // combined min(struct) aggregation — never a per-span window sort.
    "q81_span_dedup" -> ((s, dir) =>
      graft.text.SpanDedup.dedupSpans(
        t(s, dir, "documents"), "doc_id", "text", spanWords = 8)),

    // streaming exact dedup: an at-least-once feed (every event delivered
    // TWICE, copies split across micro-batches by maxFilesPerTrigger)
    // collapses to exactly-once rows through the REAL streaming path —
    // keyed dedup state, the reference's streaming-mode record dedup.
    // Full state is O(distinct keys); production uses
    // dropDuplicatesWithinWatermark once the source bounds disorder.
    "q86_stream_dedup" -> ((s, dir) => {
      val base = tmp("q86")
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type")
      ev.union(ev).repartition(8)
        .write.mode("overwrite").parquet(s"$base/in")
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2).parquet(s"$base/in")
      Streams.runToCompletionAppend(
        stream.dropDuplicates("event_id"), "q86_stream_dedup_tbl")
    }),

    // q86's production shape: watermark-BOUNDED streaming dedup
    // (dropDuplicatesWithinWatermark) — state evicts once the watermark
    // passes, O(in-flight keys) instead of q86's grow-forever state. The
    // delay here exceeds the table's full time span, so every redelivery
    // lands inside the horizon and the output deterministically equals
    // exact dedup whatever order the file source feeds batches in (the
    // eviction behavior itself is pinned by the StreamsSpec unit).
    "q98_stream_dedup_wm" -> ((s, dir) => {
      val base = tmp("q98")
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "ts")
      ev.union(ev).repartition(8)
        .write.mode("overwrite").parquet(s"$base/in")
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2).parquet(s"$base/in")
      Streams.runToCompletionAppend(
        Streams.dedupWithinWatermark(
          stream, Seq("event_id"), "ts", delay = "3650 days")
          .select("event_id", "user_id"),
        // dedup state is one key row per event: 8 state partitions,
        // not one per core (see Streams.withStatePartitions); first-seen
        // rows emit in their own batch, so the trailing no-data batch
        // (a full extra trigger) can only evict state — skip it
        "q98_stream_dedup_wm_tbl", statePartitions = Some(8),
        skipNoDataBatch = true)
    }),

    // keystore-backed rotating AES field encryption, end-to-end: generate
    // two keys in a JCEKS store on disk, encrypt every comment under the
    // newest key, decrypt through header-resolved key lookup — the
    // reference's JCEKSKeystoreCredentialStore + RotatingAESCodec +
    // string-field converter chain. The random per-row IV makes the
    // ciphertext non-deterministic, so the oracle checks the only thing
    // that IS deterministic: decrypt∘encrypt = identity on real data.
    "q99_crypto_roundtrip" -> ((s, dir) => {
      import graft.functions.{JceksCredentialStore, KeyCrypto}
      // fresh store every run: the jceks file persists in tmp, and
      // re-running would otherwise accumulate 2 keys per invocation
      // forever (a 500-key ring made this query 6x slower by round 9)
      val fs = new org.apache.hadoop.fs.Path(tmp("q99"))
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp("q99")), true)
      val ksPath = s"${tmp("q99")}/creds.jceks"
      JceksCredentialStore.generateKey(ksPath, "q99-pw")
      JceksCredentialStore.generateKey(ksPath, "q99-pw")
      val ring = JceksCredentialStore.loadRing(ksPath, "q99-pw")
      t(s, dir, "documents").select(
        col("doc_id"),
        KeyCrypto.decryptStringField(
          KeyCrypto.encryptStringField(col("text"), ring), ring)
          .as("text"))
    }),

    // deterministic token-budget shard packing (the "write the training
    // shards" step): corpus laid out in salted-portable-hash order, cut
    // into 25k-char shards via a DISTRIBUTED prefix sum — bucketed by
    // the hash's top bits, per-bucket windows, broadcast offsets; never
    // a global single-partition window. Integer arithmetic end-to-end,
    // so DuckDB's plain global window reproduces the exact assignment.
    "q87_shard_pack" -> ((s, dir) =>
      graft.text.ShardPack.packByBudget(
        t(s, dir, "documents"), "doc_id", "n_chars", budget = 25000L)
        .select("doc_id", "source", "cum_before", "shard_id")),

    // fixed-size token-window chunking with stride (the "make training
    // sequences" step): sequence/transform/slice HOFs + one posexplode —
    // a single map-only codegen stage, zero shuffles at any corpus size.
    "q88_token_chunks" -> ((s, dir) =>
      graft.text.Chunker.chunkByTokens(
        t(s, dir, "documents").select("doc_id", "text"), "text",
        seqLen = 32, stride = 24)
        .select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")),

    // per-source quota capping (domain balancing): keep the 10 docs per
    // source with the smallest salted hash, via a two-level salted top-n
    // so a mega-source never sorts in one task. Deterministic hash order
    // makes the exact kept set oracle-checkable.
    "q89_quota_cap" -> ((s, dir) =>
      graft.operators.QuotaCap.capPerKey(
        t(s, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", n = 10)
        .select("doc_id", "source", "quota_rank")),

    // the composed Gopher-style quality FILTER (Rae et al. 2021 §A1.1
    // thresholds over the already-oracled signals): token count in
    // [20, 1000], mean token length in [3, 10], duplicate-bigram
    // fraction <= 0.18, top-bigram fraction <= 0.20, >= 2 distinct stop
    // words. Every gate is INTEGER-cross-multiplied (3n <= sum <= 10n,
    // 100·dups <= 18·total, 5·max <= total) so the survivor set is exact
    // in both engines — no float threshold edge. Map-only, no shuffle.
    "q91_quality_filter" -> ((s, dir) => {
      val signals = gopherSignals(t(s, dir, "documents"))
      signals.filter(
        col("n_tokens").between(20, 1000) &&
        col("sum_tok_len") >= col("n_tokens") * 3 &&
        col("sum_tok_len") <= col("n_tokens") * 10 &&
        (col("n_bigrams") - col("n_distinct_bigrams")) * 100 <=
          col("n_bigrams") * 18 &&
        col("max_bigram_cnt") * 5 <= col("n_bigrams") &&
        col("stop_hits") >= 2)
    }),

    // temperature-scaled mixing end-to-end: corpus mass per source ->
    // (n_s/N)^alpha sampling targets (the mT5 multilingual-balance rule)
    // -> integer percent weights -> the broadcast-join mix gate. The one
    // float region (pow/round) collapses to an integer w_pct inside
    // temperatureTargets, so the expanded mix is hash-exact in DuckDB.
    "q92_mix_temperature" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = graft.text.CorpusMix.temperatureTargets(
        docs, "source", "n_chars", alpha = 0.5, budgetFraction = 0.5)
      docs.transform(graft.text.CorpusMix.mixByWeightTable(w, "source", "doc_id"))
        .select("doc_id", "source", "epoch")
    }),

    // CCNet-style LM familiarity: train char-trigram counts on the
    // corpus, score every doc by mean floor-log2 gram frequency. The
    // log2 quantization is length(bin(cnt))-1 — integer/string ops only,
    // so train AND score are bit-identical in DuckDB (no float log).
    "q93_lm_familiarity" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val model = graft.text.NgramLm.train(docs, "text", n = 3, minCount = 2)
      graft.text.NgramLm.familiarity(docs, model, "doc_id", "text", n = 3)
        .select("doc_id", "n_grams", "fam_q")
    }),

    // semantic decontamination: the embedding face of q72 — flag corpus
    // vectors whose max cosine vs any eval vector clears the threshold.
    // Eval set rides inside the expression as a literal; the corpus pays
    // one codegen map pass (no join, no shuffle). Flag compares rounded
    // cosine so both engines agree at the threshold edge.
    "q94_semantic_decontam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ann.Ann.semanticContamination(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        threshold = 0.9)
    }),

    // as-of join: every event picks up its user's latest purchase
    // at-or-before the event time. Spark has no ASOF operator — written
    // as a join it's a theta-join + argmax; TemporalJoin.asOf is the
    // union + forward-fill shape: ONE shuffle, no join node (plan pinned
    // in TemporalJoinSpec). The oracle is DuckDB's NATIVE ASOF JOIN.
    // Right side pre-deduped on (user, ts) so the survivor is total.
    "q95_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("last_purchase_ts"))
        .agg(max(col("value")).as("last_purchase_value"))
      graft.operators.TemporalJoin.asOf(
        ev.select("event_id", "user_id", "ts"), purchases,
        Seq("user_id"), "ts", "last_purchase_ts")
        .select("event_id", "user_id", "last_purchase_ts", "last_purchase_value")
    }),

    // the STREAMING face of q95, same oracle: events replayed as a
    // stream, enriched point-in-time via the SCD-2 validity-interval
    // rewrite (streams can't window, so the dim side precomputes
    // [ts, next_ts) and the stream broadcast-joins exactly one interval).
    // Green here proves batch asOf == streaming asOfEnrich end-to-end.
    "q97_stream_asof" -> ((s, dir) => {
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("last_purchase_ts"))
        .agg(max(col("value")).as("last_purchase_value"))
      val stream = Tables.loadStream(s, dir, "events")
        .select("event_id", "user_id", "ts")
      Streams.runToCompletionAppend(
        Streams.asOfEnrich(stream, purchases, Seq("user_id"),
          "ts", "last_purchase_ts")
          .select("event_id", "user_id", "last_purchase_ts",
            "last_purchase_value"),
        "q97_asof_tbl")
    }),

    // point-in-interval range join: audit the mid-hour core (minutes
    // 10-50) of the 24 busiest hours — intervals deliberately misaligned
    // with the 30-min bins so the exact containment post-filter does real
    // work. Plain Spark plans this as BroadcastNestedLoopJoin (O(points ×
    // intervals)); TemporalJoin.pointInRange hash-joins on bin instead.
    "q96_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val wins = ev.groupBy(date_trunc("hour", col("ts")).as("ws"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ws")).limit(24)
        .select((col("ws") + expr("INTERVAL 10 MINUTES")).as("win_start"),
          (col("ws") + expr("INTERVAL 50 MINUTES")).as("win_end"))
      graft.operators.TemporalJoin.pointInRange(
        ev.select("event_id", "ts"), "ts", wins, "win_start", "win_end",
        binSeconds = 1800)
        .select("event_id", "win_start")
    }),

    // the composed "export training shards" pipeline in ONE oracle row:
    // quota-cap per source -> shard-pack by char budget -> strided token
    // chunks. Every stage is deterministic integer/hash arithmetic, so
    // DuckDB reproduces the exact (doc, shard, chunk) assignment — the
    // composition (column threading, hash-order stability across stages)
    // is what this row checks beyond q87/q88/q89.
    "q90_training_export" -> ((s, dir) => {
      val kept = graft.operators.QuotaCap.capPerKey(
        t(s, dir, "documents").select("doc_id", "source", "n_chars", "text"),
        "source", "doc_id", n = 10)
        .drop("quota_rank", "source")
      val packed = graft.text.ShardPack.packByBudget(
        kept, "doc_id", "n_chars", budget = 5000L)
        .select("doc_id", "text", "shard_id")
      graft.text.Chunker.chunkByTokens(packed, "text", seqLen = 64, stride = 48)
        .select("doc_id", "shard_id", "chunk_idx", "chunk_text")
    }),

    // the COMPLETE near-dup dedup pipeline in one oracle row: minhash
    // candidates -> exact-Jaccard verify -> connected components ->
    // keep-best-copy survivor (longest doc, min-id tiebreak). DuckDB
    // recomputes it from first principles (brute-force true-Jaccard
    // pairs + recursive components + the same window), so the row proves
    // the banded LSH path loses NO pair the exact definition requires.
    "q85_neardup_keepbest" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val cands = MinHashDedup.candidatePairs(docs, "doc_id", "text",
        n = 3, k = 64, numBands = 32)
      val pairs = MinHashDedup.verifyShingleJaccard(cands, docs, "doc_id",
        "text", n = 3, threshold = 0.5).select("id_a", "id_b")
      graft.dedup.DupClusters.survivorsBy(docs, "doc_id", pairs,
          col("n_chars"))
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // quality-aware near-dup survivor selection: same deterministic pair
    // graph as q65, but the cluster's KEEP decision is the longest doc
    // (keep-best-copy), not the minimum id — the policy real pipelines
    // want when a boilerplate mirror beats the original into the corpus.
    "q83_cluster_survivors" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val ids = docs.select(col("doc_id").as("d"))
      val chain = ids
        .filter(pmod(col("d"), lit(10)) =!= 9 && col("d") < lit(n - 1))
        .select(col("d").as("id_a"), (col("d") + 1).as("id_b"))
      val overlay = ids.filter(pmod(col("d"), lit(97)) === 0)
        .select(col("d").as("id_a"), pmod(col("d") * 31, lit(n)).as("id_b"))
      graft.dedup.DupClusters.survivorsBy(docs, "doc_id",
          chain.union(overlay), col("n_chars"))
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // WITHIN-document repeated-span removal (C4's per-page cleanup before
    // the corpus pass): row-local indexed filter, zero shuffles.
    "q84_span_dedup_withindoc" -> ((s, dir) =>
      graft.text.SpanDedup.dedupSpansWithinDoc(
        t(s, dir, "documents"), "doc_id", "text", spanWords = 3)),

    // int8 scalar quantization of the embedding corpus (FAISS-SQ8 shape;
    // the storage-compression step before ANN indexing at scale).
    // Map-only codegen'd HOFs; double arithmetic end-to-end makes the
    // coding bit-reproducible, so the oracle checks every code exactly.
    "q82_embed_quantize" -> ((s, dir) =>
      graft.ann.Quantize.quantizeInt8(
          t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("mn"), col("mx"),
          posexplode(col("codes")).as(Seq("i", "q8")))
        .select(col("vec_id"), col("i").cast("bigint").as("i"), col("q8"),
          col("mn"), col("mx"))),

    // HTTP/ES sink round-trip (AsyncHttpWriter.java:49 +
    // ElasticsearchDataWriter _bulk): index supplier into an in-process
    // `_bulk` endpoint that PERSISTS every request body; the result is
    // the documents parsed back OFF THE WIRE, so the oracle row proves
    // byte-level sink serialization, not just delivery counts.
    "q80_es_bulk_roundtrip" -> ((s, dir) => {
      val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val srv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
        received.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        val resp = "{\"errors\":false}".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      })
      srv.start()
      try {
        val src = t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_acctbal")
        graft.sinks.HttpSink.esBulk(src, graft.sinks.HttpSink.EsConfig(
          s"http://127.0.0.1:${srv.getAddress.getPort}", "suppliers",
          idCol = Some("s_suppkey")))
        // _bulk bodies alternate action/doc lines; docs are the payload
        val docLines = scala.jdk.CollectionConverters
          .CollectionHasAsScala(received).asScala.toSeq
          .flatMap(_.split('\n')).filterNot(_.startsWith("{\"index\":"))
        s.read.json(s.createDataset(docLines)(
            org.apache.spark.sql.Encoders.STRING))
          .select(col("s_suppkey").cast("bigint").as("s_suppkey"),
            col("s_name").cast("string").as("s_name"),
            col("s_acctbal").cast("double").as("s_acctbal"))
      } finally srv.stop(0)
    }),

    // Event Hubs publish round-trip (EventhubDataWriter.java:75): SAS-
    // signed, byte-capped JSON batches into an in-process endpoint that
    // VERIFIES the HMAC signature off the wire (a bad key 401s) and
    // unwraps the {"Body": ...} envelopes; the result is the records
    // parsed back off the wire — protocol + serialization proven, not
    // just delivery counts.
    "q161_eventhub_publish" -> ((s, dir) => {
      import graft.sinks.EventHubSink
      val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val key = "graft-test-shared-key"
      val srv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      srv.createContext("/hub/messages",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val auth = String.valueOf(
            ex.getRequestHeaders.getFirst("Authorization"))
          val parts = auth.stripPrefix("SharedAccessSignature ")
            .split('&').map(_.split("=", 2))
            .collect { case Array(k, v) => k -> v }.toMap
          val mac = javax.crypto.Mac.getInstance("HmacSHA256")
          mac.init(new javax.crypto.spec.SecretKeySpec(
            key.getBytes("UTF-8"), "HmacSHA256"))
          val want = java.util.Base64.getEncoder.encodeToString(mac.doFinal(
            (parts("sr") + "\n" + parts("se")).getBytes("UTF-8")))
          val ok = java.net.URLDecoder
            .decode(parts("sig"), "UTF-8") == want
          if (ok) received.add(body)
          ex.sendResponseHeaders(if (ok) 201 else 401, -1)
          ex.close()
        })
      srv.start()
      try {
        val src = t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_acctbal")
        EventHubSink.postRows(src, EventHubSink.EventHubConfig(
          "graftns", "hub", "graft-key", key,
          endpointOverride = Some(
            s"http://127.0.0.1:${srv.getAddress.getPort}/hub/messages")))
        val bodies = scala.jdk.CollectionConverters
          .CollectionHasAsScala(received).asScala.toSeq
          .flatMap { batch =>
            org.json4s.jackson.JsonMethods.parse(batch) match {
              case org.json4s.JArray(items) => items.map(o =>
                (o \ "Body").asInstanceOf[org.json4s.JString].s)
              case other => sys.error(s"bad eventhub batch: $other")
            }
          }
        s.read.json(s.createDataset(bodies)(
            org.apache.spark.sql.Encoders.STRING))
          .select(col("s_suppkey").cast("bigint").as("s_suppkey"),
            col("s_name").cast("string").as("s_name"),
            col("s_acctbal").cast("double").as("s_acctbal"))
      } finally srv.stop(0)
    }),

    // Couchbase KV upsert round-trip (CouchbaseWriter.java:72 +
    // AnyToCouchbaseJsonConverter): json docs keyed by nation key into
    // an in-process bulk-upsert store — written TWICE so the oracle row
    // also proves upsert-replace semantics (duplicated publishes land
    // one doc per key).
    "q162_couchbase_upsert" -> ((s, dir) => {
      import graft.sinks.CouchbaseSink
      val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
      val srv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      srv.createContext("/pools/default/buckets/graft/docs",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          org.json4s.jackson.JsonMethods.parse(body) match {
            case org.json4s.JArray(items) => items.foreach { doc =>
              store.put((doc \ "id").asInstanceOf[org.json4s.JString].s,
                (doc \ "content").asInstanceOf[org.json4s.JString].s)
            }
            case other => sys.error(s"bad couchbase bulk: $other")
          }
          ex.sendResponseHeaders(200, -1)
          ex.close()
        })
      srv.start()
      try {
        val cfg = CouchbaseSink.CouchbaseConfig(
          s"http://127.0.0.1:${srv.getAddress.getPort}", "graft")
        val src = t(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
        CouchbaseSink.upsert(CouchbaseSink.jsonDocs(src, "n_nationkey", cfg), cfg)
        CouchbaseSink.upsert(CouchbaseSink.jsonDocs(src, "n_nationkey", cfg), cfg)
        val docs = scala.jdk.CollectionConverters
          .CollectionHasAsScala(store.values()).asScala.toSeq
        s.read.json(s.createDataset(docs)(
            org.apache.spark.sql.Encoders.STRING))
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name").cast("string").as("n_name"),
            col("n_regionkey").cast("bigint").as("n_regionkey"))
      } finally srv.stop(0)
    }),

    // Search-Console-shaped ingestion (GoogleWebmasterDataFetcherImpl
    // .java:87): the full page inventory discovered by RECURSIVE
    // REQUEST-SPACE PARTITIONING against a row-capped, clicks-ranked
    // in-process endpoint (rowLimit 40 forces several expansion
    // rounds), then analytics extracted DISTRIBUTED in page batches.
    // The site derives every page + metric from the documents table,
    // so the oracle recomputes the whole result — any page the
    // partitioner misses or double-fetches breaks the multiset hash.
    "q163_webmaster_pages" -> ((s, dir) => {
      import graft.sources.{GoogleWebmaster, HttpWebmasterClient}
      val docs = t(s, dir, "documents").select("doc_id", "lang").collect()
        .map(r => s"g/${r.getString(1)}/${r.getLong(0)}" -> r.getLong(0))
      val byPage = docs.toMap
      def clicks(id: Long) = id % 97
      val srv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      srv.createContext("/pages",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val q = ex.getRequestURI.getRawQuery.split('&')
            .map(_.split("=", 2)).collect { case Array(k, v) =>
              k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
          val hits =
            if (q("op") == "equals") docs.filter(_._1 == q("prefix"))
            else docs.filter(_._1.startsWith(q("prefix")))
          val out = hits.sortBy { case (p, id) => (-clicks(id), p) }
            .take(q("limit").toInt)
            .map(p => "\"" + p._1 + "\"").mkString("[", ",", "]")
          val b = out.getBytes("UTF-8")
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b); ex.close()
        })
      srv.createContext("/analytics",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          import org.json4s._
          val ps = org.json4s.jackson.JsonMethods.parse(body) match {
            case JArray(items) => items.map(_.asInstanceOf[JString].s)
            case other => sys.error(s"bad analytics request: $other")
          }
          val out = ps.map { p =>
            val id = byPage(p)
            s"""{"page":"$p","clicks":${clicks(id)},""" +
              s""""impressions":${id % 1009 + 1},"position":${(id % 500) / 10.0}}"""
          }.mkString("[", ",", "]")
          val b = out.getBytes("UTF-8")
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b); ex.close()
        })
      srv.start()
      try {
        val client = HttpWebmasterClient(
          s"http://127.0.0.1:${srv.getAddress.getPort}")
        val found = GoogleWebmaster.allPages(client, rootPrefix = "g/",
          rowLimit = 40)
        val res = GoogleWebmaster.extract(s, client, found.pages,
          batchSize = 64)
        // the distributed fetch must run while the endpoint lives; the
        // (small: one row per page) result re-wraps like q80 does
        val rows = res.collect()
        s.createDataFrame(
          s.sparkContext.parallelize(rows.toIndexedSeq, 1), res.schema)
      } finally srv.stop(0)
    }),

    // SFTP file-drop ingestion e2e (SftpSource.java:29 /
    // SftpFsHelper.java:63): an in-process server speaks the SFTPv3
    // packet dialect over a 3-file CSV drop of the part table (the
    // collect SIMULATES the remote server's disk, as in q101/q163);
    // the planner lists the drop, snapshot-diffs against the committed
    // manifest, fetches the delta with per-task connections, and the
    // query CERTIFIES incrementality in-line: a second plan after
    // commit must extract nothing. The oracle is the table itself —
    // any drop/dup/corruption across the wire breaks the hash.
    "q164_sftp_drop" -> ((s, dir) => {
      import java.nio.file.Files
      val src = t(s, dir, "part").select("p_partkey", "p_name", "p_retailprice")
      val rows = src.collect()
      val root = Files.createTempDirectory("graft-sftp-drop")
      val header = "\"p_partkey\",\"p_name\",\"p_retailprice\""
      rows.zipWithIndex.groupBy(_._2 % 3).toSeq.foreach { case (i, g) =>
        val body = (header +: g.map(_._1).map(r =>
          s""""${r.getLong(0)}","${r.getString(1)}","${r.getDouble(2)}""""))
          .mkString("\n")
        val f = root.resolve(s"daily/drop-$i.csv")
        Files.createDirectories(f.getParent)
        Files.write(f, body.getBytes("UTF-8"))
      }
      val srv = graft.sources.SftpServer.serve(root, "loader", "verify-pw")
      try {
        val cfg = graft.sources.SftpConfig(
          "127.0.0.1", srv.port, "loader", "verify-pw")
        val state = Files.createTempDirectory("graft-sftp-state").toString
        val staging = Files.createTempDirectory("graft-sftp-staging").toString
        def planOnce() = graft.sources.SftpFileSource.plan(s, cfg, state,
          "daily", "/daily", staging, format = "csv",
          options = Map("header" -> "true"))
        val p = planOnce()
        require(p.newFiles.length == 3,
          s"expected the 3-file drop, planned ${p.newFiles.length}")
        val out = p.df.select(
          col("p_partkey").cast("bigint").as("p_partkey"),
          col("p_name").cast("string").as("p_name"),
          col("p_retailprice").cast("double").as("p_retailprice"))
        // materialize while the endpoint lives; re-wrap like q101/q163
        val got = out.collect()
        p.commit()
        val second = planOnce()
        require(second.newFiles.isEmpty && second.df.count() == 0,
          s"second run must be an empty delta, got ${second.newFiles}")
        s.createDataFrame(
          s.sparkContext.parallelize(got.toIndexedSeq, 1), out.schema)
      } finally srv.close()
    }),

    // Google Drive FileBasedSource e2e (GoogleDriveSource.java:45 /
    // GoogleDriveFsHelper.java:45): an in-process Drive v3 endpoint
    // serves a two-folder CSV drop of the orders slice (paged
    // listings, alt=media downloads, Bearer auth — the collect
    // SIMULATES the remote drive, as in q101/q163/q164); the planner
    // lists recursively (folders excluded), snapshot-diffs, fetches
    // the delta distributed, and certifies in-query that the
    // post-commit re-plan is empty.
    "q165_gdrive_drop" -> ((s, dir) => {
      import graft.sources.{GoogleApiSim, GoogleIngestion}
      val src = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val rows = src.collect()
      val sim = new GoogleApiSim("verify-tok", _ => "")
      try {
        sim.addFolder("d-drop", "drop")
        sim.addFolder("d-inner", "inner", parent = "d-drop")
        val header = "\"o_orderkey\",\"o_custkey\",\"o_totalprice\""
        rows.zipWithIndex.groupBy(_._2 % 4).toSeq.foreach { case (i, g) =>
          val body = (header +: g.map(_._1).map(r =>
            s""""${r.getLong(0)}","${r.getLong(1)}","${r.getDouble(2)}""""))
            .mkString("\n")
          // half the files nest one folder down — the recursive ls path
          sim.addFile(s"f$i", s"drop-$i.csv", body,
            if (i % 2 == 0) "d-drop" else "d-inner", 1000L * (i + 1))
        }
        val cfg = GoogleIngestion.DriveConfig(sim.baseUrl, "verify-tok",
          pageSize = 3) // forces paged listings
        val state = java.nio.file.Files
          .createTempDirectory("graft-gdrive-state").toString
        val staging = java.nio.file.Files
          .createTempDirectory("graft-gdrive-staging").toString
        def planOnce() = GoogleIngestion.GoogleDriveSource.plan(s, cfg,
          "d-drop", state, "drop", staging, format = "csv",
          options = Map("header" -> "true"))
        val p = planOnce()
        require(p.newFiles.length == 4,
          s"expected the 4-file drop, planned ${p.newFiles.length}")
        val out = p.df.select(
          col("o_orderkey").cast("bigint").as("o_orderkey"),
          col("o_custkey").cast("bigint").as("o_custkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        val got = out.collect()
        p.commit()
        val second = planOnce()
        require(second.newFiles.isEmpty,
          s"second run must be an empty delta, got ${second.newFiles}")
        s.createDataFrame(
          s.sparkContext.parallelize(got.toIndexedSeq, 1), out.schema)
      } finally sim.stop()
    }),

    // Google Analytics unsampled-report e2e
    // (GoogleAnalyticsUnsampledExtractor.java:94): insert the async
    // report request, poll through PENDING to COMPLETED, download the
    // finished CSV from the Drive side of the same endpoint, parse it
    // distributed, and certify the lifecycle in-query — the temp Drive
    // report must be deleted after staging and the next watermark must
    // be endDate + 1 day in yyyyMMddHHmmss.
    "q166_ga_unsampled" -> ((s, dir) => {
      import graft.sources.{GoogleApiSim, GoogleIngestion}
      val src = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
      val header = "\"c_custkey\",\"c_name\",\"c_nationkey\""
      val csv = (header +: src.collect().map(r =>
        s""""${r.get(0)}","${r.getString(1)}","${r.get(2)}""""))
        .mkString("\n")
      val sim = new GoogleApiSim("verify-tok", _ => csv, pollsUntilDone = 3)
      try {
        val res = GoogleIngestion.GoogleAnalyticsUnsampled.extract(s,
          GoogleIngestion.GaConfig(sim.baseUrl, "verify-tok",
            pollIntervalMs = 5),
          GoogleIngestion.DriveConfig(sim.baseUrl, "verify-tok"),
          GoogleIngestion.GaRequest("a1", "w1", "v1", "customers",
            "2024-01-01", "2024-01-31", metrics = "ga:sessions"),
          stagingDir = java.nio.file.Files
            .createTempDirectory("graft-ga-staging").toString)
        val out = res.df.select(
          col("c_custkey").cast("bigint").as("c_custkey"),
          col("c_name").cast("string").as("c_name"),
          col("c_nationkey").cast("bigint").as("c_nationkey"))
        val got = out.collect()
        require(res.nextWatermark == 20240201000000L,
          s"wrong next watermark: ${res.nextWatermark}")
        require(!sim.hasFile(res.driveFileId),
          "temp unsampled report must be deleted from Drive after staging")
        s.createDataFrame(
          s.sparkContext.parallelize(got.toIndexedSeq, 1), out.schema)
      } finally sim.stop()
    }),

    // Zuora AQuA export e2e (ZuoraClientImpl.java:72): an in-process
    // endpoint speaks the batch-query dialect over the part slice
    // (Basic auth, poll countdown through 'executing', per-query
    // batches, file/<id> downloads — the collect SIMULATES the remote
    // billing system, as in q101); lossless round-trip is the oracle.
    "q167_zuora_aqua" -> ((s, dir) => {
      import graft.sources.{ZuoraAqua, ZuoraSim}
      val src = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val header = "\"p_partkey\",\"p_brand\",\"p_size\""
      val csv = (header +: src.collect().map(r =>
        s""""${r.get(0)}","${r.getString(1)}","${r.get(2)}""""))
        .mkString("\n")
      val sim = new ZuoraSim("verify-user", "verify-pw", _ => csv,
        pollsUntilDone = 3)
      try {
        val out = ZuoraAqua.export(s,
          ZuoraAqua.ZuoraConfig(sim.baseUrl, "verify-user", "verify-pw",
            partner = "graft", project = "verify", pollIntervalMs = 5),
          Seq(ZuoraAqua.ZuoraQuerySpec("parts",
            ZuoraAqua.withPredicate("SELECT PartKey, Brand, Size FROM Part",
              "UpdatedDate > '2024-01-01'"))),
          stagingDir = java.nio.file.Files
            .createTempDirectory("graft-zuora-staging").toString)
        val res = out("parts").select(
          col("p_partkey").cast("bigint").as("p_partkey"),
          col("p_brand").cast("string").as("p_brand"),
          col("p_size").cast("bigint").as("p_size"))
        val got = res.collect()
        s.createDataFrame(
          s.sparkContext.parallelize(got.toIndexedSeq, 1), res.schema)
      } finally sim.stop()
    }),

    // cross-document EXACT substring dedup (Lee et al. 2022): every
    // 20-token window shared with a lower doc id is a duplicated
    // passage — the boilerplate remover MinHash (doc-level) and C4
    // span dedup (within-doc) both miss. Copies of the first 30 tokens
    // of every 5th doc are planted at doc_id+1000000 (the q43/q103
    // pattern); the corpus's own natural sentence reuse is reported
    // identically by both engines since the fingerprint (md5-based
    // portable hash of the window text) is DuckDB-exact.
    "q168_substring_dedup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(size(split(col("text"), " ")) >= 40)
      val planted = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 30)).as("text"))
      graft.text.SubstringDedup.stats(base.unionByName(planted),
        "doc_id", "text", w = 20)
    }),

    // GlobalMetadata envelope round-trip (gobblin-metadata:
    // RecordWithMetadataToEnvelopedRecordWithMetadata.java:47): each
    // doc rides an {"mId","rMd","r"} envelope stamped with the
    // content-addressed metadata id (md5 of the canonical metadata
    // JSON — DuckDB recomputes the SAME id from the same canonical
    // string), then decodes back byte-exactly. Column-native
    // to_json/from_json both ways, map-only.
    "q169_meta_envelope" -> ((s, dir) => {
      import graft.metadata.{GlobalMeta, MetaEnvelope}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val meta = MetaEnvelope.envelopeMeta(GlobalMeta(
        dataset = Map(GlobalMeta.DatasetUrnKey -> "urn:graft:documents",
          GlobalMeta.ContentTypeKey -> "text/plain"),
        transferEncodings = Seq("identity")))
      val env = docs.select(col("doc_id"), MetaEnvelope.envelope(
        col("text"), map(lit("docId"), col("doc_id").cast("string")),
        meta.id).as("env"))
      env.select(col("doc_id"), MetaEnvelope.decode(col("env")).as("d"))
        .select(col("doc_id"), col("d.r").as("text"),
          col("d.mId").as("m_id"))
    }),

    // HTTP join-enrichment e2e (HttpJoinConverter.java:57): every
    // customer row issues a GET built from its own fields against an
    // in-process lookup endpoint (lowercasing the segment — a pure
    // function DuckDB recomputes), and the response joins onto the
    // record with its status. Bounded async pipelining per task.
    "q170_http_enrich" -> ((s, dir) => {
      val srv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      // the pool must be shut down with the server: HttpServer.stop
      // does NOT stop a user-provided executor, and its non-daemon
      // threads would pin the JVM open after the query finishes
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      srv.setExecutor(pool)
      srv.createContext("/seg", (ex: com.sun.net.httpserver.HttpExchange) => {
        val name = java.net.URLDecoder.decode(
          Option(ex.getRequestURI.getRawQuery).getOrElse("")
            .stripPrefix("name="), "UTF-8")
        val b = name.toLowerCase.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      })
      srv.start()
      try {
        val src = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        val out = graft.operators.HttpEnrich.enrich(src.coalesce(4),
          graft.operators.HttpEnrich.EnrichConfig(
            s"http://127.0.0.1:${srv.getAddress.getPort}/seg?name=$${c_mktsegment}",
            maxInFlight = 16))
          .select(col("c_custkey"),
            col("http_status").cast("bigint").as("http_status"),
            col("http_response"))
        // materialize while the endpoint lives; re-wrap like q101/q163
        val got = out.collect()
        s.createDataFrame(
          s.sparkContext.parallelize(got.toIndexedSeq, 1), out.schema)
      } finally { srv.stop(0); pool.shutdownNow(); () }
    }),

    // Hive-table-aware copy (HiveCopyEntityHelper.java:98): replicate a
    // partitioned catalog table with a metastore partition filter, then
    // certify the full lifecycle in-query — run 1 full filtered copy,
    // run 2 incremental (a new source partition appears and ONLY it is
    // copied+registered), run 3 deregister (the partition dropped at the
    // source is dropped from the target catalog and its files removed).
    // The output is the replica read THROUGH the target catalog.
    "q171_hive_copy" -> ((s, dir) => {
      import graft.operators.HiveCopy
      val base = tmp("q171")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      s.sql("CREATE DATABASE IF NOT EXISTS q171_src")
      s.sql("CREATE DATABASE IF NOT EXISTS q171_tgt")
      s.sql("DROP TABLE IF EXISTS q171_src.events_rep")
      s.sql("DROP TABLE IF EXISTS q171_tgt.events_rep")
      val srcLoc = s"$base/src/events_rep"
      val df = t(s, dir, "events").select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      df.repartition(col("dt")).write.partitionBy("dt").parquet(srcLoc)
      HiveCopy.registerExternal(s, "q171_src", "events_rep", df.schema,
        Seq("dt"), srcLoc, recoverPartitions = true)
      val minDt = df.agg(min("dt")).head().getString(0)
      val cfg = HiveCopy.Config("q171_tgt", s"$base/replica",
        partitionFilter = Some(s"dt > '$minDt'"),
        existingPolicy = HiveCopy.ExistingTablePolicy.Update,
        deregisterDelete = HiveCopy.DeregisterDelete.Recursive)
      val r1 = HiveCopy.copyTable(s, "q171_src.events_rep", cfg)
      require(r1.partitions.nonEmpty && r1.partitions.forall(p =>
        p.action == "copied" && p.filesCopied > 0), s"run1 not a full copy: $r1")
      require(r1.partitions.forall(_.spec("dt") > minDt),
        s"partition filter leaked dt <= $minDt: ${r1.partitions}")
      val newDt = "2099-12-31"
      df.where(col("event_id") % 101 === 0).drop("dt")
        .write.parquet(s"$srcLoc/dt=$newDt")
      s.sql("ALTER TABLE q171_src.events_rep RECOVER PARTITIONS")
      val r2 = HiveCopy.copyTable(s, "q171_src.events_rep", cfg)
      val touched = r2.partitions.filter(_.action == "copied")
      require(touched.map(_.spec("dt")) == Seq(newDt) &&
        r2.partitionsRegistered == 1,
        s"run2 was not incremental: ${r2.partitions}")
      s.sql(s"ALTER TABLE q171_src.events_rep DROP IF EXISTS PARTITION (dt='$newDt')")
      fs.delete(new org.apache.hadoop.fs.Path(s"$srcLoc/dt=$newDt"), true)
      val r3 = HiveCopy.copyTable(s, "q171_src.events_rep", cfg)
      require(r3.partitionsDeregistered == 1 && r3.filesCopied == 0,
        s"run3 did not deregister exactly the dropped partition: $r3")
      s.table("q171_tgt.events_rep").groupBy("dt")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("user_id")).cast("bigint").as("sum_uid"))
    }),

    // value-based audit (ValueAuditGenerator.java:47): key+delta column
    // projection over a deterministic key-hash row sample, published
    // through the atomic publisher under the FsAuditSink path contract,
    // read back from the published audit dir. DuckDB recomputes the
    // portable key hash, so a drop/dup/misprojection breaks the hash.
    "q172_value_audit" -> ((s, dir) => {
      import graft.operators.ValueAudit
      val base = tmp("q172")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val meta = ValueAudit.TableMeta("tpch", "orders",
        keyFields = Seq("o_orderkey"),
        deltaFields = Seq("o_orderstatus", "o_totalprice"))
      val auditDir = ValueAudit.auditToFs(t(s, dir, "orders"), base, meta,
        ValueAudit.RuntimeMeta(phase = ValueAudit.Phase.SS_PUB,
          snapshotId = "s1"),
        projection = ValueAudit.ColumnProjection.KeyAndDelta,
        selection = ValueAudit.RowSelection.KeyHashSample(0.25))
      require(auditDir.endsWith("tpch/orders/P=SS_PUB_C=NA_E=NA_S=s1_D=NA"),
        s"audit dir violates the FsAuditSink path contract: $auditDir")
      s.read.parquet(auditDir)
    }),

    // value-audit DIFF (the module's purpose: compare what two pipeline
    // PHASES saw — ValueAuditRuntimeMetadata.Phase): a PULL-phase audit
    // of orders vs an SS_PUB-phase audit where keys %101==0 were lost
    // and o_totalprice was corrupted (+1) for keys %97==0. The diff is
    // keyed on o_orderkey; DuckDB recomputes the per-column mismatch
    // and only-in-one-phase counts from the same planted functions.
    "q173_value_audit_diff" -> ((s, dir) => {
      import graft.operators.ValueAudit
      val base = tmp("q173")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val meta = ValueAudit.TableMeta("tpch", "orders",
        keyFields = Seq("o_orderkey"),
        deltaFields = Seq("o_orderstatus", "o_totalprice"))
      val orders = t(s, dir, "orders")
      val dirA = ValueAudit.auditToFs(orders, base, meta,
        ValueAudit.RuntimeMeta(phase = ValueAudit.Phase.PULL,
          snapshotId = "s1"),
        projection = ValueAudit.ColumnProjection.KeyAndDelta)
      val corrupted = orders
        .filter(col("o_orderkey") % 101 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val dirB = ValueAudit.auditToFs(corrupted, base, meta,
        ValueAudit.RuntimeMeta(phase = ValueAudit.Phase.SS_PUB,
          snapshotId = "s1"),
        projection = ValueAudit.ColumnProjection.KeyAndDelta)
      ValueAudit.diff(s, dirA, dirB, Seq("o_orderkey"))
    }),

    // leakage-safe train/val/test split: splits assigned by DUP-CLUSTER
    // so near-duplicates never straddle the train/eval cut. Clusters
    // come from deterministic star pairs (doc -> its decade head), so
    // DuckDB recomputes cluster ids + the banded portable hash exactly;
    // the in-query gate runs the leakage audit (must be empty).
    "q174_leaksafe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val pairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") - pmod(col("doc_id"), lit(10L))).as("id_b"))
      val assigned = graft.text.LeakSafeSplit.byCluster(docs, "doc_id",
        pairs, Seq("train" -> 80, "val" -> 10, "test" -> 10))
      require(graft.text.LeakSafeSplit.leakage(assigned, "cluster_id")
        .isEmpty, "leak-safe split straddled a cluster")
      assigned.select(col("doc_id"), col("cluster_id"), col("split"))
    }),

    // classifier calibration: confusion counts over a threshold grid in
    // ONE aggregate pass (how a quality cut is chosen before filtering
    // the corpus). Score/label are planted pure functions so DuckDB
    // recomputes every cell; the in-query gate checks the four cells of
    // every grid point sum to the corpus size (a dropped/double-counted
    // row breaks it).
    "q175_calibration_curve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("n_chars").cast("double").as("score"),
          (col("doc_id") % 3 === 0).as("label"))
      val ths = Seq(0.0, 100.0, 500.0, 1000.0, 5000.0)
      val curve = graft.text.Calibration.confusionAt(
        docs, "score", "label", ths)
      val n = docs.count()
      val cells = curve.collect()
      require(cells.length == ths.size && cells.forall(r =>
        r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == n),
        s"confusion cells do not partition the corpus (n=$n)")
      curve
    }),

    // k-NN GRAPH (corpus vs itself — nothing broadcast): IVF-confined
    // cell-bucketed pairing over the q47-style derived clustered corpus,
    // where confinement recovers the EXACT graph (DuckDB recomputes
    // brute-force top-5). In-query gate: the independent brute probe on
    // a hash-sample must report full recall.
    "q176_knn_graph" -> ((s, dir) => {
      import graft.ann.KnnGraph
      // persisted: the class-offset transform is an interpreted HOF and
      // this lineage is otherwise re-evaluated by every consumer — the
      // k-means training sample, both sides of the cell pairing, and the
      // brute-force recall probe's corpus and sample legs (measured: the
      // query was DRIVER/job-bound, faster on 8 cores than 32)
      val derived = tp(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
        .persist()
      // persisted too: recallVsBrute's match join evaluates the whole
      // pairing+top-k pipeline once, and the returned output would
      // otherwise re-run it from scratch
      val graph = KnnGraph.build(derived, "vec_id", "embedding", k = 5,
        numCells = 16, nprobe = 2).persist()
      val (matched, total) = KnnGraph.recallVsBrute(derived, graph,
        "vec_id", "embedding", k = 5, samplePermille = 100)
      require(total > 0 && matched == total,
        s"knn graph probe recall $matched/$total < 1.0 on separable data")
      derived.unpersist()
      graph.select(col("src_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"),
        col("rank").cast("bigint").as("rank"))
    }),

    // semantic clustering: connected components of the MUTUAL kNN graph
    // recover the 16 planted classes exactly on the separable corpus —
    // cluster id = the component's min vec_id = the class index (DuckDB
    // recomputes it as vec_id % 16).
    "q177_semantic_clusters" -> ((s, dir) => {
      val derived = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      graft.ann.KnnGraph.clusters(derived, "vec_id", "embedding", k = 10,
        numCells = 16, nprobe = 2)
        .select(col("vec_id"), col("cluster_id"))
    }),

    // embedding-distribution drift: TV distance between the reference
    // corpus's cell histogram and a snapshot missing 4 of the 16
    // classes. Cell ids are arbitrary (centroid order) but TV is
    // permutation-invariant, and the model assigns each planted class
    // its own cell, so DuckDB recomputes the exact permille from the
    // class counts.
    "q178_embedding_drift" -> ((s, dir) => {
      import graft.ann.Ann
      val derived = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      val m = Ann.ivfTrain(derived, "vec_id", "embedding", numCells = 16)
      // the model must separate the classes for the histogram to be the
      // class histogram — certify bijectivity before comparing
      val assign = derived
        .select(pmod(col("vec_id"), lit(16L)).as("cls"),
          Ann.assignCell(col("embedding"), m).as("cell"))
        .groupBy("cls").agg(countDistinct("cell").as("nc"),
          min(col("cell")).as("cell"))
      val straddled = assign.filter(col("nc") =!= 1).count()
      val distinctCells = assign.select("cell").distinct().count()
      require(straddled == 0 && distinctCells == 16,
        s"class↔cell not bijective (straddled=$straddled, " +
          s"cells=$distinctCells) — the TV would not be the class TV")
      val cur = derived.filter(pmod(col("vec_id"), lit(16L)) >= 4)
      Ann.cellDrift(derived, cur, "embedding", m)
        .select(col("n_a"), col("n_b"), col("tv_permille"))
    }),

    // incremental IVF lifecycle: init with half the corpus, append the
    // rest (separate atomic batch partition), REPLAY the append (must
    // not duplicate — certified in-query), then search through the
    // persisted per-batch index. Exact top-k on the separable corpus,
    // so DuckDB recomputes the q64 contract through the incremental
    // path.
    "q179_ivf_incremental" -> ((s, dir) => {
      import graft.ann.Ann
      val derived = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      val m = Ann.ivfTrain(derived, "vec_id", "embedding", numCells = 16)
      val path = tmp("q179") + "/index"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      Ann.ivfInitIndex(derived.filter(col("vec_id") < 250),
        "vec_id", "embedding", m, path)
      Ann.ivfAppendIndex(derived.filter(col("vec_id") >= 250),
        "vec_id", "embedding", path, batchId = 1L)
      // replayed append: the batch partition republishes, no duplicates
      Ann.ivfAppendIndex(derived.filter(col("vec_id") >= 250),
        "vec_id", "embedding", path, batchId = 1L)
      require(s.read.parquet(path).count() == derived.count(),
        "replayed append duplicated index rows")
      Ann.ivfTopKIndexed(path, derived.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, nprobe = 2,
        Ann.loadModel(s, path))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"))
    }),

    // epoch fold (round 14): init + two appends accumulate three batch
    // partitions; ivfCompactIndex folds them under the highest id, a
    // replay of a FOLDED batch must no-op, and the search contract over
    // the folded layout is byte-identical to q179's (same oracle).
    "q187_ivf_compact" -> ((s, dir) => {
      import graft.ann.Ann
      val derived = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      val m = Ann.ivfTrain(derived, "vec_id", "embedding", numCells = 16)
      val path = tmp("q187") + "/index"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      Ann.ivfInitIndex(derived.filter(col("vec_id") < 200),
        "vec_id", "embedding", m, path)
      Ann.ivfAppendIndex(derived.filter(col("vec_id") >= 200 && col("vec_id") < 350),
        "vec_id", "embedding", path, batchId = 0L)
      Ann.ivfAppendIndex(derived.filter(col("vec_id") >= 350),
        "vec_id", "embedding", path, batchId = 1L)
      require(Ann.ivfCompactIndex(s, path, upTo = 1L) == 1L,
        "fold target must be the highest folded id")
      // a replay of a folded batch is refused (no-op), never an overwrite
      Ann.ivfAppendIndex(derived.filter(col("vec_id") >= 350),
        "vec_id", "embedding", path, batchId = 1L)
      require(s.read.parquet(path).count() == derived.count(),
        "folded index lost or duplicated rows")
      Ann.ivfTopKIndexed(path, derived.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, nprobe = 2,
        Ann.loadModel(s, path))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"))
    }),

    // image dedup (round 14): REAL pixels through the perceptual-hash
    // path — byte-identical planted copies (content keyed by doc_id%25)
    // must group under their base id via the decoded dHash
    "q188_image_exact_dedup" -> ((s, dir) => {
      val variants = Multimodal.syntheticImageVariants(
        s, t(s, dir, "documents"), groups = 25)
        .filter(expr("(media_id div 25) % 2 = 0"))
      graft.multimodal.ImageDedup.exactGroups(variants)
        .select(col("media_id"), col("group_rep"))
    }),

    // image NEAR-dup (round 14): perturbed variants (sparse brightness
    // mask, a couple of dHash bits) must cluster with their base via
    // banded Hamming pairing + connected components — ground truth is
    // the planted group id
    "q189_image_neardup" -> ((s, dir) => {
      val variants = Multimodal.syntheticImageVariants(
        s, t(s, dir, "documents"), groups = 25)
      graft.multimodal.ImageDedup.clusters(variants, maxHamming = 3)
        .select(col("media_id"), col("cluster_id"))
    }),

    // REAL audio decode (round 14): executor-side WAV generation (16-bit
    // mono PCM sine, frames derived from doc_id) parsed back through the
    // JDK's actual javax.sound codec — frame counts and durations come
    // from the decoded stream; a nontrivial-energy gate proves the
    // samples were actually read (silence would fail it)
    "q190_audio_decode" -> ((s, dir) => {
      val audio = Multimodal.syntheticAudio(s, t(s, dir, "documents"))
      Multimodal.extractFeatures(audio, new Multimodal.WavDecoder()).toDF()
        .select(col("media_id"),
          col("n_frames").cast("bigint").as("n_frames"),
          col("duration_ms").cast("bigint").as("duration_ms"),
          (element_at(col("feature"), 1) > lit(0.25) &&
            element_at(col("feature"), 1) < lit(0.45))
            .as("energy_sane"))
    }),

    // incremental PQ index (round 14): the highest-compression tier of
    // the index family through the full lifecycle — persisted quantizer
    // + residual codebooks, init/append/REPLAYED append/fold, then
    // partition-pruned ADC search. In-query certification pins the
    // indexed search byte-identical to the inline IvfPq ADC (same
    // codebooks, so any lifecycle corruption diverges); the exact
    // re-rank top-1 is what DuckDB recomputes (q100's oracle).
    "q191_ivf_pq_incremental" -> ((s, dir) => {
      import graft.ann.{Ann, IvfPq, Pq}
      val derived = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      val m = Ann.ivfTrain(derived, "vec_id", "embedding", numCells = 16)
      val cb = IvfPq.trainResiduals(derived, "vec_id", "embedding", m,
        m = 8, k = 16, sampleN = 2000, iters = 8)
      val path = tmp("q191") + "/index"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      Ann.ivfInitIndexPq(derived.filter(col("vec_id") < 250),
        "vec_id", "embedding", m, cb, path)
      Ann.ivfAppendIndexPq(derived.filter(col("vec_id") >= 250),
        "vec_id", "embedding", path, batchId = 0L)
      Ann.ivfAppendIndexPq(derived.filter(col("vec_id") >= 250),
        "vec_id", "embedding", path, batchId = 0L) // replay: no dup
      require(s.read.parquet(path).count() == derived.count(),
        "replayed PQ append duplicated index rows")
      require(Ann.ivfCompactIndex(s, path, upTo = 0L) == 0L,
        "PQ fold target must be the highest folded id")
      val queries = derived.filter(col("vec_id") < 5)
      val viaIndex = Ann.ivfTopKIndexedPq(path, queries,
        "vec_id", "embedding", k = 64, nprobe = 4)
      val inline = IvfPq.adcTopK(
        IvfPq.encode(derived, "vec_id", "embedding", m, cb), queries,
        "vec_id", "embedding", m, cb, topK = 64, nprobe = 4)
      val missed = viaIndex.select("query_id", "neighbor_id")
        .exceptAll(inline.select("query_id", "neighbor_id"))
        .union(inline.select("query_id", "neighbor_id")
          .exceptAll(viaIndex.select("query_id", "neighbor_id")))
        .agg(count(lit(1)).as("__missed"))
      val qv = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      val cv = derived.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv"))
      val wExact = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      viaIndex.select("query_id", "neighbor_id")
        .join(broadcast(qv), "query_id").join(cv, "neighbor_id")
        .withColumn("cosine", Ann.dot(col("__qv"), col("__cv")) /
          (Ann.norm(col("__qv")) * Ann.norm(col("__cv"))))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") === 1)
        .crossJoin(broadcast(missed))
        .withColumn("ok", when(col("__missed") === 0, lit(true)).otherwise(
          raise_error(concat(
            lit("indexed PQ search diverged from inline ADC on "),
            col("__missed"), lit(" rows")))))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"), col("ok"))
    }),

    // image decontamination (round 14): the image face of q72/q94 —
    // eval images (bases of groups 0..4) broadcast as perceptual-hash
    // bands against the corpus; every variant of those groups (incl.
    // perturbed near-copies a re-encode would produce) must flag, and
    // nothing else. Ground truth is the planted group arithmetic.
    "q192_image_decontaminate" -> ((s, dir) => {
      val variants = Multimodal.syntheticImageVariants(
        s, t(s, dir, "documents"), groups = 25)
      graft.multimodal.ImageDedup.decontaminate(
        variants, variants.filter(col("media_id") < 5), maxHamming = 3)
        .select(col("media_id"), col("contaminated"))
    }),

    // incremental image dedup (round 14): commit groups 0..24's
    // unperturbed renders, then a batch whose bases 0..24 are
    // byte-identical re-renders (dropped by the committed store) and
    // bases 25..49 are new textures (admitted, collapsed to min id per
    // base). Bloom-prefiltered O(batch) path — the same survivors the
    // exact anti-join computes, certified by the text-path contract.
    "q193_image_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val committed = graft.multimodal.ImageDedup.hashImages(
        Multimodal.syntheticImageVariants(s,
          docs.filter(col("doc_id") < 250), groups = 25)
          .filter(expr("(media_id div 25) % 2 = 0")))
        .select(col("dhash").cast("string").as("h"))
      val batch = Multimodal.syntheticImageVariants(s,
        docs.filter(col("doc_id") >= 250), groups = 50)
        .filter(expr("(media_id div 50) % 2 = 0"))
      graft.multimodal.ImageDedup.incrementalSurvivors(batch, committed)
        .select(col("media_id"))
    }),

    // audio dedup (round 14): planted pitch groups rendered as REAL WAVs
    // where every other copy is a HALF-VOLUME variant — the perceptual
    // fingerprint (normalized envelope + zero-crossing rate over decoded
    // samples) must group volume variants with their base; ground truth
    // is doc_id arithmetic
    "q194_audio_dedup" -> ((s, dir) => {
      val variants = Multimodal.syntheticAudioVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.AudioDedup.exactGroups(variants)
        .select(col("media_id"), col("group_rep"))
    }),

    // audio NEAR-dup (round 15): pitch groups rendered three ways — base,
    // half volume (fingerprint-identical) and slightly DETUNED (+0.5 Hz:
    // a few Gray-coded zero-crossing bits) — must all cluster with their
    // base via the shared banded Hamming pairing + connected components;
    // ground truth is doc_id arithmetic
    "q195_audio_neardup" -> ((s, dir) => {
      val variants = Multimodal.syntheticAudioNearVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.AudioDedup.clusters(variants, maxHamming = 8)
        .select(col("media_id"), col("cluster_id"))
    }),

    // video frame-OVERLAP dedup (round 15): extended copies (the base's
    // 4 frames + 2 new) drift the whole-video fold but share every base
    // frame — frame-level banded pairing + components must pull base,
    // re-render and extended copies into one cluster
    "q206_video_overlap" -> ((s, dir) => {
      val ov = Multimodal.syntheticGifOverlapVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.VideoDedup.overlapClusters(
        ov, maxHamming = 2, minShared = 2)
        .select(col("media_id"), col("cluster_id"))
    }),

    // SHIFT-TOLERANT audio dedup (round 16): a trimmed (first 400
    // frames cut) or silence-padded copy re-buckets all 8 clip-spanning
    // fingerprint segments, so whole-clip clustering cannot see it —
    // hop-aligned WINDOW hashes re-align exactly, and window-overlap
    // pairing + components pull base, trimmed and padded copies into
    // one cluster (the audio face of q206's frame overlap)
    "q207_audio_shift" -> ((s, dir) => {
      val shifted = Multimodal.syntheticAudioShiftVariants(
        s, t(s, dir, "documents"), groups = 10)
      graft.multimodal.AudioDedup.shiftClusters(
        shifted, windowFrames = 400, hopFrames = 400,
        maxHamming = 2, minShared = 2)
        .select(col("media_id"), col("cluster_id"))
    }),

    // SHIFT-TOLERANT audio decontamination (round 16): the eval set is
    // TRIMMED renders of groups 0..4 — the whole-clip probe (q198's
    // shape) re-buckets all 8 segments under the shift and sees nothing;
    // window-level broadcast probing must flag every base AND padded
    // corpus render of those groups, nothing else
    "q210_audio_window_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Multimodal.syntheticAudioShiftVariants(
        s, docs.filter(expr("(doc_id div 10) % 3 != 1")), groups = 10)
      val eval = Multimodal.syntheticAudioShiftVariants(
        s, docs.filter(expr("(doc_id div 10) % 3 = 1 AND doc_id % 10 < 5")),
        groups = 10)
      graft.multimodal.AudioDedup.decontaminateWindows(
        corpus, eval, windowFrames = 400, hopFrames = 400,
        maxHamming = 2, minShared = 2)
        .select(col("media_id"), col("contaminated"))
    }),

    // quality-GATED streaming media admission (round 16): the streaming
    // face of q209's composed pipeline — each micro-batch profiles ONCE
    // (gates + fingerprint from the same decode), rejects defective
    // records BEFORE dedup (they never commit a fingerprint) and admits
    // only first-seen clean content; thumbnails land in the gated audit,
    // duplicate clean renders in neither
    "q211_stream_gated_admission" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val clean = Multimodal.syntheticImageVariants(
        s, docs.filter(col("doc_id") % 5 =!= 0), groups = 20)
        .filter(expr("(media_id div 20) % 2 = 0"))
      val defects = Multimodal.syntheticImageQualityMix(
        s, docs.filter(col("doc_id") % 5 === 0))
      val mixed = clean.unionByName(defects)
      val root = tmp("q211")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val in = s"$root/in"
      Seq(mixed.filter(col("media_id") < 200),
          mixed.filter(col("media_id") >= 200)).zipWithIndex.foreach {
        case (sl, i) =>
          val part = s"$in/f$i"
          sl.coalesce(1).write.parquet(part)
          new java.io.File(part).listFiles()
            .foreach(_.setLastModified(1000000L * (i + 1)))
      }
      val q = graft.streaming.MediaDedupIngest.start(
        Streams.fileReplay(s, s"$in/*", Multimodal.mediaSchema),
        s"$root/store", s"$root/ckpt", modality = "image",
        qualityGate = true)
      q.awaitTermination()
      graft.streaming.MediaDedupIngest.survivors(s, s"$root/store")
        .select(col("media_id"), lit("admitted").as("outcome"))
        .unionByName(graft.streaming.MediaDedupIngest
          .gated(s, s"$root/store")
          .select(col("media_id"), lit("gated").as("outcome")))
    }),

    // audio KEEP-LONGEST dedup (round 16): shift clusters (base /
    // trimmed / padded renders) keep the member with the most content
    // (non-silent) windows — the trimmed re-upload loses its cluster;
    // base and padded tie at 4 windows and the minimum id (the base
    // render itself) wins, window counts from the same decode pass
    "q213_audio_keeplongest" -> ((s, dir) => {
      val shifted = Multimodal.syntheticAudioShiftVariants(
        s, t(s, dir, "documents"), groups = 10)
      graft.multimodal.AudioDedup.survivorsByWindows(
        shifted, windowFrames = 400, hopFrames = 400,
        maxHamming = 2, minShared = 2)
        .select(col("media_id"), col("n_windows"))
    }),

    // DEEP composed media pipeline (round 16): eval = CROPPED images /
    // TRIMMED audio / CLIPPED videos of groups 1..2 — whole-hash
    // decontamination sees only the identically-edited corpus copies;
    // the part-level probe (tiles / windows / frames riding the SAME
    // profile decode) must flag every kind of those groups' survivors.
    // Dedup here is per (group, kind): each edit shifts the whole hash,
    // so min id per (g, kind) survives = g + 20*kind
    "q217_media_pipeline_deep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mixed = Multimodal.syntheticMediaPipelineDeepMix(s, docs)
      val eval = Multimodal.syntheticMediaPipelineDeepMix(
        s, docs.filter(col("doc_id").isin(21L, 22L)))
      graft.multimodal.MediaPipeline.curateDeep(mixed, eval,
        maxHamming = 3, minShared = 2)
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // ROTATION-aware DEEP curation (round 17): eval = rot90 renders of
    // groups 0..4 — tiles TURN with a rotation, so the tile-level probe
    // of the deep pipeline sees nothing; the 8 dihedral orientation
    // hashes riding the SAME profile decode re-align the eval edit with
    // every base-render survivor of those groups. Corpus = kind-0
    // renders only; dedup keeps min id per texture group (= the group
    // index), groups 0..4 survivors flag
    "q236_deep_rotation_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Multimodal.syntheticImageRotationVariants(
        s, docs.filter(expr("(doc_id div 20) % 4 = 0")), groups = 20)
      val eval = Multimodal.syntheticImageRotationVariants(
        s, docs.filter(expr("doc_id >= 20 AND doc_id < 25")), groups = 20)
      graft.multimodal.MediaPipeline.curateDeep(corpus, eval,
        maxHamming = 3, minShared = 2)
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // ROTATION-TOLERANT image dedup (round 16): 90/180-degree turns and
    // mirrors move the whole-image dHash's gradient field under every
    // downscale cell and land far away — the 8 dihedral orientation
    // hashes from ONE decode re-align exactly (D4 closure: a rotated
    // copy's hash set is a permutation of its base's), so banded pairing
    // over orientation rows + components pulls base, rot90, rot180 and
    // mirrored renders (clean and re-encode-noised) into one cluster
    "q218_image_rotation" -> ((s, dir) => {
      val rv = Multimodal.syntheticImageRotationVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.ImageDedup.rotationClusters(rv, maxHamming = 3)
        .select(col("media_id"), col("cluster_id"))
    }),

    // ROTATION-TOLERANT image decontamination (round 16): eval = ROTATED
    // (90-degree) renders of groups 0..4 — the plain whole-image probe
    // (q192's shape) sees nothing; probing the corpus's single dHash
    // against the broadcast 8-orientation eval fanout must flag every
    // base, rot180 and mirrored corpus render of those groups, no more
    "q219_image_rotation_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Multimodal.syntheticImageRotationVariants(
        s, docs.filter(expr("(doc_id div 20) % 4 != 1")), groups = 20)
      val eval = Multimodal.syntheticImageRotationVariants(
        s, docs.filter(expr("(doc_id div 20) % 4 = 1 AND doc_id % 20 < 5")),
        groups = 20)
      graft.multimodal.ImageDedup.decontaminateRotations(
        corpus, eval, maxHamming = 3)
        .select(col("media_id"), col("contaminated"))
    }),

    // LETTERBOX bar detection (round 16): consecutive uniform rows/
    // columns from each edge of the real decoded frame — black bars
    // around re-posted content shift every perceptual hash and waste
    // vision tokens; planted widths are pure doc_id arithmetic
    "q227_image_bars" -> ((s, dir) => {
      val mix = Multimodal.syntheticImageBarMix(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.borderBars(mix)
        .select(col("media_id"), col("bar_top"), col("bar_bottom"),
          col("bar_left"), col("bar_right"))
    }),

    // PNG metadata scrub audit (round 16): the compliance face for
    // binary payloads — a tEXt camera/GPS chunk planted on doc_id % 4
    // = 0 must be found by the byte-level chunk walk (ZERO decodes);
    // the scrub itself is unit-pinned to leave pixels byte-identical
    "q228_media_scrub_report" -> ((s, dir) => {
      val mix = Multimodal.syntheticImagesWithMetadata(
        s, t(s, dir, "documents"))
      graft.multimodal.MediaScrub.scrubReport(mix)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // PCM RATE NORMALIZATION (round 16): 8 kHz tone renders resampled to
    // 16 kHz by exact-rational linear interpolation — the decoded result
    // must report doubled frames at the same wall duration, through a
    // REAL decode of the re-encoded WAV
    "q235_audio_resample" -> ((s, dir) => {
      val clips = Multimodal.syntheticAudioVariants(
        s, t(s, dir, "documents"), groups = 20)
      val res = graft.multimodal.AudioScenes.resample(clips, 16000)
      graft.multimodal.MediaQuality.audioSignals(res)
        .select(col("media_id"), col("n_frames"), col("duration_ms"))
    }),

    // ASPECT-RATIO bucketing (round 16): the vision batch-packing pass —
    // nearest ratio bucket by cross-multiplied integer distance, dims
    // from CONTAINER HEADER bytes (PNG IHDR) with zero pixel decodes;
    // planted dims are pure doc_id arithmetic
    "q233_aspect_buckets" -> ((s, dir) => {
      val imgs = Multimodal.syntheticImages(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.aspectBuckets(imgs)
        .select(col("media_id"), col("width"), col("height"), col("bucket"))
    }),

    // TIME-uniform video frame sampling (round 16): each 200 ms tick
    // (fps=5) emits the frame on screen at that instant, from the real
    // GraphicControlExtension delay chain — 100 ms/frame renders put
    // frame 2k at tick k; ticks per clip = 1 + id % 4
    "q234_video_fps_sample" -> ((s, dir) => {
      val sv = Multimodal.syntheticGifSceneVariants(s, t(s, dir, "documents"))
      graft.multimodal.VideoScenes.sampleAtFps(sv, fps = 5)
        .select(col("media_id"), col("tick"), col("frame_idx"), col("t_ms"))
    }),

    // PAIRED curation with CAPTION-key dedup (round 16): the spammed-
    // caption class — one boilerplate caption across many images; after
    // keep-best media dedup, survivors sharing a caption key (planted:
    // doc_id % 12) collapse to the minimum pair id, losers staged
    // caption_dup
    "q232_paired_caption_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val imgs = Multimodal.syntheticMediaPipelineMix(s, docs)
        .filter(col("media_type") === "image")
      val caps = docs.withColumn("cap_key", col("doc_id") % 12)
      graft.multimodal.PairedCuration.curate(
        imgs, caps, minCaptionChars = 200L, maxHamming = 3,
        capKeyCol = Some("cap_key"))
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // MEDIA hygiene card (round 16): the ops view of a crawl-cleaning
    // run — per modality, items / quality-gate failures / metadata
    // carriers, from one decode pass per record plus the zero-decode
    // chunk walk; both planted chains are pure arithmetic
    "q231_media_hygiene_card" -> ((s, dir) => {
      val mix = Multimodal.syntheticHygieneMix(s, t(s, dir, "documents"))
      graft.multimodal.MediaReport.hygieneCard(mix)
        .select(col("media_type"), col("n"), col("n_quality_fail"),
          col("n_with_metadata"))
    }),

    // GIF metadata scrub audit (round 16): the block-walk face of
    // q228/q229 over the video container — a comment extension planted
    // before the trailer on doc_id % 4 = 0, zero decodes
    "q230_video_scrub_report" -> ((s, dir) => {
      val mix = Multimodal.syntheticGifsWithMetadata(
        s, t(s, dir, "documents"))
      graft.multimodal.MediaScrub.scrubReport(mix)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // AVI metadata scrub audit (round 17): the AVI face of q229/q230 —
    // a LIST/INFO ISFT encoder block planted after the header list on
    // doc_id % 4 = 0, found by the top-level RIFF walk, zero decodes;
    // scrubbed survivors still decode (frames untouched)
    "q239_avi_scrub_report" -> ((s, dir) => {
      val mix = Multimodal.syntheticAvisWithMetadata(
        s, t(s, dir, "documents"))
      graft.multimodal.MediaScrub.scrubReport(mix)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // JPEG metadata scrub audit (round 18): the marker-segment face of
    // q228 over the MOST crawled image format — an APP1 Exif segment
    // (GPS/device strings) planted after SOI on doc_id % 4 = 0 and
    // smuggled post-EOI bytes on doc_id % 4 = 2; the entropy-coded
    // scans stay byte-identical, JFIF/ICC/Adobe color segments stay,
    // zero decodes
    "q251_jpeg_scrub_report" -> ((s, dir) => {
      val jpgs = Multimodal.syntheticJpegsWithMetadata(
        s, t(s, dir, "documents"))
      graft.multimodal.MediaScrub.scrubReport(jpgs)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // REAL WebP (VP8L) PIXEL DECODE (round 18): the #2 web image
    // format decodes in-JVM — LSB-first bit stream, canonical Huffman
    // through the code-length code, transform chain (plain /
    // subtract-green / predictor residuals rotate by doc_id % 3) —
    // and the decoded pixels run the standard image feature pass;
    // dims arithmetic is recovered from REAL decodes, not headers
    "q262_webp_decode" -> ((s, dir) => {
      val webps = Multimodal.syntheticWebpPixelImages(
        s, t(s, dir, "documents"))
      Multimodal.extractFeatures(webps, new Multimodal.ImageIoDecoder())
        .toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // MP3 TAG scrub audit (round 18): the audio coding itself stays
    // the honest refusal, but the ID3v2 artist/geotag block, the
    // ID3v1 trailer and APEv2 trailers are pure structure — planted
    // ID3v2+ID3v1 on doc_id % 4 = 0, ID3v1 alone on % 4 = 2; the
    // audio frames survive byte-identically
    "q267_mp3_scrub_report" -> ((s, dir) => {
      val mp3s = Multimodal.syntheticMp3Audio(
        s, t(s, dir, "documents"), plantMetadata = true)
      graft.multimodal.MediaScrub.scrubReport(mp3s)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // CAPTION-TRACK parsing (round 18): SRT on even doc_ids, WebVTT
    // (NOTE blocks, cue settings) on odd — `1 + id % 4` cues with
    // planted millisecond arithmetic, exploded map-only into timed
    // rows the text stack (and PairedCuration) consumes per cue
    "q268_caption_cues" -> ((s, dir) => {
      val tracks = Multimodal.syntheticCaptionTracks(s, t(s, dir, "documents"))
      graft.multimodal.Captions.cues(tracks)
        .select(col("media_id"), col("seq"), col("t_start_ms"),
          col("t_end_ms"))
    }),

    // TIFF metadata scrub audit (round 18): the IFD face of the image
    // compliance pass over the scanned-document format — an Artist
    // string + a GPS sub-IFD (rational coordinates) planted on
    // doc_id % 4 = 0, Artist alone on % 4 = 2; the wipe is IN PLACE
    // (strip offsets and sub-IFD pointers are absolute file
    // positions) and out-of-line values ZERO, not just unreference
    "q264_tiff_scrub_report" -> ((s, dir) => {
      val tiffs = Multimodal.syntheticTiffImages(
        s, t(s, dir, "documents"), plantMetadata = true)
      graft.multimodal.MediaScrub.scrubReport(tiffs)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // TIFF aspect bucketing (round 18): q233's nearest-ratio
    // arithmetic with dims from the IFD — zero pixel decodes
    "q265_tiff_aspect_buckets" -> ((s, dir) => {
      val tiffs = Multimodal.syntheticTiffImages(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.aspectBuckets(tiffs)
        .select(col("media_id"), col("width"), col("height"), col("bucket"))
    }),

    // TIFF pixel decode (round 18): the fixture files are REAL TIFFs
    // the JDK's ImageIO plugin decodes — q185's contract over the
    // scanned-document format
    "q266_tiff_decode" -> ((s, dir) => {
      val tiffs = Multimodal.syntheticTiffImages(s, t(s, dir, "documents"))
      Multimodal.extractFeatures(tiffs, new Multimodal.ImageIoDecoder())
        .toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // IMAGE TRANSCODE to WebP (round 18): the crawl-normalization pass
    // — PNG corpus decodes through the shared seam and re-encodes as
    // in-JVM VP8L (lossless, so pixels survive exactly); the output
    // payloads are then REALLY re-decoded for their dims. One corpus,
    // one container, zero native codecs
    "q263_webp_transcode" -> ((s, dir) => {
      val pngs = Multimodal.syntheticImages(s, t(s, dir, "documents"))
      val webps = Multimodal.transcodeImages(pngs, "webp")
      Multimodal.extractFeatures(webps, new Multimodal.ImageIoDecoder())
        .toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // WebP metadata scrub audit (round 18): the RIFF face of the image
    // compliance pass over the #2 web format — EXIF+XMP chunks planted
    // on doc_id % 4 = 0 (with VP8X presence flags where the form has
    // one), smuggled trailing bytes on % 4 = 2; image data and ICCP
    // color profiles stay, zero pixel decodes
    "q254_webp_scrub_report" -> ((s, dir) => {
      val webps = Multimodal.syntheticWebpImages(
        s, t(s, dir, "documents"), plantMetadata = true)
      graft.multimodal.MediaScrub.scrubReport(webps)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // WebP aspect bucketing (round 18): q233's nearest-ratio arithmetic
    // with dims read from all THREE WebP header forms (VP8L stream
    // bits, VP8X canvas, lossy VP8 key-frame header) — zero decodes
    "q255_webp_aspect_buckets" -> ((s, dir) => {
      val webps = Multimodal.syntheticWebpImages(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.aspectBuckets(webps)
        .select(col("media_id"), col("width"), col("height"), col("bucket"))
    }),

    // mp4 (ISO-BMFF) metadata scrub audit (round 18): the box-walk face
    // of q228/q239 over the dominant crawl container — an Apple-style
    // udta (comment + GPS) planted inside moov on doc_id % 4 = 0 and
    // smuggled trailing bytes on doc_id % 4 = 2; metadata boxes are
    // WIPED IN PLACE (stco sample offsets are file-absolute, so removal
    // would corrupt every pointer), trailing bytes strip. Zero decodes
    "q246_mp4_scrub_report" -> ((s, dir) => {
      val m4as = Multimodal.syntheticM4aAudio(
        s, t(s, dir, "documents"), plantMetadata = true)
      graft.multimodal.MediaScrub.scrubReport(m4as)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // mp4 PCM AUDIO DEMUX (round 18): the sample-table walk
    // (stsd/stsc/stsz/stco) concatenates the soun track's PCM out of
    // mdat — zero video decode — and the demuxed track runs the ENTIRE
    // audio stack; sowt and twos byte orders alternate by doc_id parity
    // and normalize identically. Planted counts stay doc_id arithmetic
    // through a REAL WAV re-decode
    "q247_mp4_audio_demux" -> ((s, dir) => {
      val m4as = Multimodal.syntheticM4aAudio(s, t(s, dir, "documents"))
      val tracks = Multimodal.demuxMp4Audio(m4as)
      graft.multimodal.MediaQuality.audioSignals(tracks)
        .select(col("media_id"), col("n_frames"), col("duration_ms"))
    }),

    // G.711 TELEPHONY AUDIO DEMUX (round 18): A-law/µ-law companded
    // soundtracks (the 8-bit log-PCM of telephony and old capture rigs)
    // expand to linear 16-bit by pure ITU segment/mantissa arithmetic —
    // no codec — inside the mp4 sample-table demux; the expanded track
    // runs the ENTIRE audio stack and planted counts survive a real
    // compand->expand round-trip
    "q250_g711_audio_demux" -> ((s, dir) => {
      val m4as = Multimodal.syntheticG711Audio(s, t(s, dir, "documents"))
      val tracks = Multimodal.demuxMp4Audio(m4as)
      graft.multimodal.MediaQuality.audioSignals(tracks)
        .select(col("media_id"), col("n_frames"), col("duration_ms"))
    }),

    // ADPCM AUDIO (round 18): the 4-bit differential wire codings of
    // dictation rigs and games — IMA/DVI (0x0011) on even doc_ids,
    // Microsoft (0x0002) on odd — block-decode through the normalized
    // seam (the JDK WAV reader refuses these tags; graft.multimodal
    // .Adpcm owns the RIFF sniff + table arithmetic); planted counts
    // stay doc_id arithmetic through a REAL lossy encode→decode
    // round-trip with exact fact-chunk frame counts
    "q253_adpcm_audio" -> ((s, dir) => {
      val wavs = Multimodal.syntheticAdpcmAudio(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.audioSignals(wavs)
        .select(col("media_id"), col("n_frames"), col("duration_ms"))
    }),

    // WARC → HTML → TEXT end-to-end (round 18): the wire format web
    // crawls actually arrive in — documents render as HTML pages
    // inside HTTP response records packed into member-per-record
    // .warc.gz files (one per partition, distributed build), then the
    // reader streams ONE FILE PER TASK, splits the HTTP payload and
    // the extraction rules (drop script/style/title with contents,
    // tags→breaks, entities decode, whitespace collapse) recover the
    // EXACT source text
    "q269_warc_html_text" -> ((s, dir) => {
      val base = tmp("q269")
      val hfs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      hfs.delete(new org.apache.hadoop.fs.Path(base), true)
      hfs.mkdirs(new org.apache.hadoop.fs.Path(base))
      val hconf = new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration)
      import s.implicits._
      t(s, dir, "documents").select("doc_id", "text")
        .as[(Long, String)].repartition(8)
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val records = it.map { case (id, text) =>
            val esc = text.replace("&", "&amp;").replace("<", "&lt;")
              .replace(">", "&gt;")
            val html = s"<html><head><title>Doc $id</title>" +
              "<script>var tracker = 1;</script></head>" +
              s"<body><h1>Doc $id</h1><p>$esc</p>" +
              "<!-- crawler comment --></body></html>"
            graft.sources.Warc.Record("", "response",
              s"https://example.org/doc/$id", "2026-08-17T00:00:00Z",
              "application/http; msgtype=response",
              graft.sources.Warc.httpResponse(html.getBytes("UTF-8")))
          }.toSeq
          val p = new org.apache.hadoop.fs.Path(base, f"crawl-$pid%02d.warc.gz")
          graft.sources.Warc.writeWarc(p.getFileSystem(hconf.value), p,
            records, gzipPerRecord = true)
        }
      val recs = graft.sources.Warc.readRecords(s, base)
        .filter(col("record_type") === "response")
      val httpPayloadText = udf((b: Array[Byte]) =>
        new String(graft.sources.Warc.httpPayload(b), "UTF-8"))
      recs.select(
        regexp_extract(col("target_uri"), "(\\d+)$", 1)
          .cast("bigint").as("doc_id"),
        graft.text.HtmlText.htmlToText(
          httpPayloadText(col("content"))).as("text"))
    }),

    // TAR-SHARD (WebDataset-convention) source/sink round-trip (round
    // 18): documents pack into rolling .tar shards (key = zero-padded
    // doc_id, members <key>.txt + <key>.json, sealed at a byte budget
    // ONLY at key boundaries so samples never straddle shards), then
    // the shard reader streams them back one-task-per-shard; member
    // byte counts re-derive the source table
    "q261_tar_shards" -> ((s, dir) => {
      val base = tmp("q261")
      val hfs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      hfs.delete(new org.apache.hadoop.fs.Path(base), true)
      val members = t(s, dir, "documents")
        .select(format_string("%09d", col("doc_id")).as("key"),
          col("text"))
        .select(col("key"), explode(array(
          struct(lit("txt").as("ext"),
            encode(col("text"), "UTF-8").as("content")),
          struct(lit("json").as("ext"),
            encode(concat(lit("{\"key\":\""), col("key"), lit("\"}")),
              "UTF-8").as("content")))).as("m"))
        .select(col("key"), col("m.ext"), col("m.content"))
      val stats = graft.sources.TarShards.writeShards(
        members, base, maxShardBytes = 1L << 20, numPartitions = 8)
      require(stats.shards >= 8, s"expected >= 8 shards, got ${stats.shards}")
      graft.sources.TarShards.readMembers(s, base)
        .filter(col("ext") === "txt")
        .select(col("key").cast("bigint").as("doc_id"),
          length(col("content")).cast("bigint").as("n_bytes"))
    }),

    // FLAC AUDIO (round 18): the first COMPRESSED audio coding served
    // in-JVM — integer fixed/LPC prediction + Rice residuals, pure
    // table-free arithmetic, frame CRCs verified. 16-bit on even
    // doc_ids, 8-bit on odd; the lossless decode feeds the normalized
    // seam, so planted counts are EXACT (unlike ADPCM's lossy bound)
    "q259_flac_audio" -> ((s, dir) => {
      val flacs = Multimodal.syntheticFlacAudio(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.audioSignals(flacs)
        .select(col("media_id"), col("n_frames"), col("duration_ms"))
    }),

    // FLAC metadata scrub audit (round 18): VORBIS_COMMENT (recorder
    // location strings) planted on doc_id % 4 = 0, an embedded PICTURE
    // block (a smuggling channel) on % 4 = 2; STREAMINFO and the audio
    // frames stay byte-identical — FLAC seek points are offsets from
    // the FIRST FRAME byte, so block removal shifts nothing. Zero
    // decodes
    "q260_flac_scrub_report" -> ((s, dir) => {
      val flacs = Multimodal.syntheticFlacAudio(
        s, t(s, dir, "documents"), plantMetadata = true)
      graft.multimodal.MediaScrub.scrubReport(flacs)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // WAV metadata scrub audit (round 16): the RIFF face of q228 — a
    // LIST/INFO recorder-comment chunk planted on doc_id % 4 = 0 found
    // by the little-endian chunk walk, zero decodes
    "q229_audio_scrub_report" -> ((s, dir) => {
      val mix = Multimodal.syntheticAudioWithMetadata(
        s, t(s, dir, "documents"))
      graft.multimodal.MediaScrub.scrubReport(mix)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    // BYTE-exact media dedup (round 16): the first crawl dedup pass —
    // identical files collapse on a payload SHA-256 with ZERO decodes
    // (decode is the pipeline's dominant cost; the perceptual faces then
    // pay it only for byte-distinct survivors). Planted: payload bytes
    // are determined by (texture group, perturbation parity) = id % 50
    "q225_media_byte_dedup" -> ((s, dir) => {
      val variants = Multimodal.syntheticImageVariants(
        s, t(s, dir, "documents"), groups = 25)
      graft.multimodal.MediaBytes.exactGroups(variants)
        .select(col("media_id"), col("group_rep"))
    }),

    // Image SHARPNESS gate (round 16): integer variance-of-Laplacian
    // blur detection from real decoded pixels — a 4x4 texture bilinear-
    // upscaled to 32x32 (the defocused/upscaled re-encode class)
    // collapses toward zero while per-pixel textures score thousands;
    // the planted chain is blurry = doc_id % 3 = 0
    "q226_image_sharpness" -> ((s, dir) => {
      val mix = Multimodal.syntheticImageBlurMix(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.imageSharpness(mix)
        .select(col("media_id"), col("blurry"))
    }),

    // PAIRED curation with EVAL decontamination (round 16): the complete
    // LAION shape — q222's stages plus a bounded broadcast eval probe
    // against the dedup SURVIVORS (a benchmark image leaking into the
    // pair corpus flags as 'contaminated' instead of shipping as 'kept');
    // eval = the clean base renders of texture groups {1, 2}
    "q224_paired_decontaminated" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val imgs = Multimodal.syntheticMediaPipelineMix(s, docs)
        .filter(col("media_type") === "image")
      val eval = Multimodal.syntheticMediaPipelineMix(
        s, docs.filter(col("doc_id").isin(1L, 2L)))
        .filter(col("media_type") === "image")
      graft.multimodal.PairedCuration.curate(
        imgs, docs, minCaptionChars = 200L, maxHamming = 3,
        evalMedia = Some(eval))
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // AUDIO silence-split segmentation (round 16): the audio face of
    // q220's scene cuts — utterance boundaries at silent energy windows
    // from ONE real PCM decode per clip. Planted structure: 1 + id % 4
    // two-window utterances separated by one silent window
    "q223_audio_segments" -> ((s, dir) => {
      val sv = Multimodal.syntheticAudioSegmentVariants(
        s, t(s, dir, "documents"))
      graft.multimodal.AudioScenes.segments(sv, windowFrames = 400)
        .select(col("media_id"), col("segment_idx"), col("start_window"),
          col("n_windows"))
    }),

    // PAIRED image-caption curation (round 16): the LAION/DataComp crawl
    // shape — caption gate (NO decode paid for failing pairs) -> decoded
    // image quality gates -> keep-best-resolution perceptual dedup among
    // gate survivors; every pair labeled with the stage that decided it.
    // All arithmetic: captions gate at n_chars < 200, image defects at
    // doc_id % 5 = 0, survivors = best-resolution min-id member of each
    // planted texture group among pairs passing BOTH gates
    "q222_paired_curation" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val imgs = Multimodal.syntheticMediaPipelineMix(s, docs)
        .filter(col("media_type") === "image")
      graft.multimodal.PairedCuration.curate(
        imgs, docs, minCaptionChars = 200L, maxHamming = 3)
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // MEDIA leakage-safe split (round 16): the multimodal face of q174 —
    // split by PERCEPTUAL duplicate cluster (banded dHash near-dup
    // components), so a benchmark image and its re-encoded near-copy can
    // never straddle the train/eval cut; the split is the banded
    // portable hash OF THE CLUSTER id, which DuckDB recomputes exactly.
    // In-query gate: the leakage audit must come back empty
    "q221_media_leaksafe_split" -> ((s, dir) => {
      val imgs = Multimodal.syntheticImageVariants(
        s, t(s, dir, "documents"), groups = 25)
      val assigned = graft.multimodal.MediaSplit.byPerceptualCluster(
        imgs, "image", maxHamming = 3,
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      require(graft.text.LeakSafeSplit.leakage(assigned, "cluster_id")
        .isEmpty, "media leak-safe split straddled a perceptual cluster")
      assigned.select(col("media_id"), col("cluster_id"), col("split"))
    }),

    // VIDEO scene-cut detection (round 16): shot boundaries = consecutive
    // sampled-frame dHashes more than maxHamming bits apart, from ONE
    // real container decode per video — the content-balanced frame
    // sampler's segmentation pass. Planted structure: 1 + id % 4 scenes
    // of 2 frames each (within-scene frames identical up to re-encode
    // noise, consecutive scenes random-far)
    "q220_video_scenes" -> ((s, dir) => {
      val sv = Multimodal.syntheticGifSceneVariants(s, t(s, dir, "documents"))
      graft.multimodal.VideoScenes.scenes(sv, maxHamming = 8)
        .select(col("media_id"), col("scene_idx"), col("start_frame"),
          col("scene_frames"))
    }),

    // CROP-TOLERANT image dedup (round 16): cropped (first tile column
    // removed) and border-extended copies shift the whole-image dHash's
    // downscale grid and land far away — tile-level banded pairing with
    // >= minShared shared tiles + components must pull base, cropped and
    // extended renders into one cluster (the image face of q206/q207)
    "q214_image_crop" -> ((s, dir) => {
      val cv = Multimodal.syntheticImageCropVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.ImageDedup.cropClusters(
        cv, tileW = 16, tileH = 16, maxHamming = 2, minShared = 4)
        .select(col("media_id"), col("cluster_id"))
    }),

    // CROP-TOLERANT image decontamination (round 16): eval = CROPPED
    // renders of groups 0..4 — the whole-image probe (q192's shape)
    // sees nothing; tile-level broadcast probing must flag every base
    // AND extended corpus render of those groups, nothing else
    "q215_image_tile_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Multimodal.syntheticImageCropVariants(
        s, docs.filter(expr("(doc_id div 20) % 3 != 1")), groups = 20)
      val eval = Multimodal.syntheticImageCropVariants(
        s, docs.filter(expr("(doc_id div 20) % 3 = 1 AND doc_id % 20 < 5")),
        groups = 20)
      graft.multimodal.ImageDedup.decontaminateTiles(
        corpus, eval, tileW = 16, tileH = 16, maxHamming = 2, minShared = 4)
        .select(col("media_id"), col("contaminated"))
    }),

    // streaming ADMISSION CARD (round 16): the ops view of the gated
    // dedup store — per batch, how many records were admitted and how
    // many gated; batch 0 admits the 16 clean group minima and gates
    // its thumbnails, batch 1 admits nothing (all duplicates) and gates
    // the rest — all doc_id arithmetic
    "q216_admission_card" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val clean = Multimodal.syntheticImageVariants(
        s, docs.filter(col("doc_id") % 5 =!= 0), groups = 20)
        .filter(expr("(media_id div 20) % 2 = 0"))
      val defects = Multimodal.syntheticImageQualityMix(
        s, docs.filter(col("doc_id") % 5 === 0))
      val mixed = clean.unionByName(defects)
      val root = tmp("q216")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val in = s"$root/in"
      Seq(mixed.filter(col("media_id") < 200),
          mixed.filter(col("media_id") >= 200)).zipWithIndex.foreach {
        case (sl, i) =>
          val part = s"$in/f$i"
          sl.coalesce(1).write.parquet(part)
          new java.io.File(part).listFiles()
            .foreach(_.setLastModified(1000000L * (i + 1)))
      }
      val q = graft.streaming.MediaDedupIngest.start(
        Streams.fileReplay(s, s"$in/*", Multimodal.mediaSchema),
        s"$root/store", s"$root/ckpt", modality = "image",
        qualityGate = true)
      q.awaitTermination()
      graft.streaming.MediaDedupIngest.admissionCard(s, s"$root/store")
        .select(col("batch"), col("n_admitted"), col("n_gated"))
    }),

    // video KEEP-LONGEST dedup (round 16): the video face of q200's
    // keep-best policy — frame-overlap clusters (base, re-render,
    // EXTENDED 6-frame copy) keep the copy with the most frames, ties
    // to the minimum id: the earliest extended cut survives, frame
    // counts from the same single container-decode pass as the edges
    "q212_video_keeplongest" -> ((s, dir) => {
      val ov = Multimodal.syntheticGifOverlapVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.VideoDedup.survivorsByFrames(
        ov, maxHamming = 2, minShared = 2)
        .select(col("media_id"), col("n_frames"))
    }),

    // COMPOSED media curation pipeline (round 16) — the media q151:
    // quality gates -> per-modality perceptual dedup (keep-best-res for
    // images, keep-first for audio/video) -> eval decontamination, ONE
    // decode per record per modality end-to-end; every input labeled
    // with the stage that decided its fate, all doc_id arithmetic
    "q209_media_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mixed = Multimodal.syntheticMediaPipelineMix(s, docs)
      val eval = Multimodal.syntheticMediaPipelineMix(
        s, docs.filter(col("doc_id").isin(1L, 2L)))
      graft.multimodal.MediaPipeline.curate(mixed, eval, maxHamming = 3)
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // video quality gates (round 16, completes the modality set):
    // planted single-frame GIFs / static banner loops / 40 ms clips /
    // clean 400 ms renders — gates from one REAL container decode per
    // video (frame count, GraphicControlExtension durations, distinct
    // frame dHashes)
    "q208_video_quality" -> ((s, dir) => {
      val mix = Multimodal.syntheticVideoQualityMix(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.videoSignals(mix)
        .select(col("media_id"), col("too_few_frames"), col("static_video"),
          col("too_short"), col("passes"))
    }),

    // image quality gates (round 15): planted thumbnails / banner strips
    // / solid placeholders / clean textures — every gate must fire from
    // REAL decoded pixels exactly where the generator's disjoint if-else
    // chain planted the defect
    "q204_image_quality" -> ((s, dir) => {
      val mix = Multimodal.syntheticImageQualityMix(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.imageSignals(mix)
        .select(col("media_id"), col("too_small"), col("extreme_aspect"),
          col("low_contrast"), col("passes"))
    }),

    // audio quality gates (round 15): planted 25 ms snippets / silence /
    // full-scale square waves / clean sines — gates from REAL decoded
    // samples (duration, mean |amplitude|, full-scale sample rate)
    "q205_audio_quality" -> ((s, dir) => {
      val mix = Multimodal.syntheticAudioQualityMix(s, t(s, dir, "documents"))
      graft.multimodal.MediaQuality.audioSignals(mix)
        .select(col("media_id"), col("too_short"), col("silent"),
          col("clipped"), col("passes"))
    }),

    // media data card (round 15): one mixed table of planted-duplicate
    // images (50 contents), volume-variant audio (20 fingerprints) and
    // unperturbed video renders (20 fingerprints) — the per-modality
    // item/distinct/dup-rate card must recover exactly the planted
    // arithmetic through the real decode passes
    "q203_media_card" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mixed = Multimodal.syntheticImageVariants(s, docs, groups = 25)
        .filter(expr("(media_id div 25) % 2 = 0"))
        .unionByName(Multimodal.syntheticAudioVariants(s, docs, groups = 20))
        .unionByName(Multimodal.syntheticGifVariants(s, docs, groups = 20)
          .filter(expr("(media_id div 20) % 2 = 0")))
      graft.multimodal.MediaReport.card(mixed)
        .select(col("media_type"), col("n_items"), col("n_distinct"),
          col("n_exact_dup"), col("dup_rate"))
    }),

    // CROSS-MODAL frame decontamination (round 15): eval IMAGES that are
    // literally frame 1 of groups 0..4's videos — every video of those
    // groups (incl. frame-perturbed copies) must flag through the
    // frame-level probe, which whole-video fingerprints cannot see
    "q202_video_frame_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Multimodal.syntheticGifVariants(s, docs, groups = 20)
      val eval = Multimodal.syntheticGifFrameImages(
        s, docs.filter(col("doc_id") < 5), groups = 20, frame = 1)
      graft.multimodal.VideoDedup.decontaminateFrames(
        corpus, eval, maxHamming = 3)
        .select(col("media_id"), col("contaminated"))
    }),

    // streaming media admission (round 15): a 3-arrival replayed stream
    // of planted image renders through the Bloom O(batch) dedup store —
    // unperturbed copies only (each base renders byte-identically, so
    // content is EXACTLY 25 distinct hashes); batch 0 (ids < 200) holds
    // every base, so the admitted set is the 25 first-seen renders and
    // later batches admit nothing. Exactly-once by batch=<id> overwrite.
    // PART-hash streaming admission (round 17): whole-content admission
    // cannot see a TRIMMED re-upload of committed audio (trimming
    // re-buckets all 8 clip-spanning fingerprint segments), so batch 1's
    // trimmed and batch 2's silence-padded renders of batch 0's clips
    // would admit as new; with partHashes the profile pass emits
    // hop-aligned window values from the SAME decode and >= 2 committed
    // part matches refuse the record. Survivors = the 10 base clips
    "q238_stream_part_admission" -> ((s, dir) => {
      val clips = Multimodal.syntheticAudioShiftVariants(
        s, t(s, dir, "documents"), groups = 10)
        .filter(col("media_id") < 30)
      val root = tmp("q238")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val in = s"$root/in"
      Seq(clips.filter(col("media_id") < 10),          // bases
          clips.filter(col("media_id").between(10, 19)), // trimmed
          clips.filter(col("media_id") >= 20)).zipWithIndex.foreach { // padded
        case (sl, i) =>
          val part = s"$in/f$i"
          sl.coalesce(1).write.parquet(part)
          new java.io.File(part).listFiles()
            .foreach(_.setLastModified(1000000L * (i + 1)))
      }
      val q = graft.streaming.MediaDedupIngest.start(
        Streams.fileReplay(s, s"$in/*", Multimodal.mediaSchema),
        s"$root/store", s"$root/ckpt", modality = "audio",
        partHashes = true, minSharedParts = 2)
      q.awaitTermination()
      graft.streaming.MediaDedupIngest.survivors(s, s"$root/store")
        .select(col("media_id"))
    }),

    // part-refusal ADMISSION CARD (round 18): q238's part-hash store
    // through the ops view — the card's part leg makes the trimmed/
    // padded refusal class visible per batch (batch 0 admits the 10
    // bases; batches 1 and 2 part-refuse their 10 re-uploads each —
    // an n_part_refused spike means aligned cuts of committed content
    // are arriving). Pure batch arithmetic, payloads prune out
    "q245_part_admission_card" -> ((s, dir) => {
      val clips = Multimodal.syntheticAudioShiftVariants(
        s, t(s, dir, "documents"), groups = 10)
        .filter(col("media_id") < 30)
      val root = tmp("q245")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val in = s"$root/in"
      Seq(clips.filter(col("media_id") < 10),          // bases
          clips.filter(col("media_id").between(10, 19)), // trimmed
          clips.filter(col("media_id") >= 20)).zipWithIndex.foreach { // padded
        case (sl, i) =>
          val part = s"$in/f$i"
          sl.coalesce(1).write.parquet(part)
          new java.io.File(part).listFiles()
            .foreach(_.setLastModified(1000000L * (i + 1)))
      }
      val q = graft.streaming.MediaDedupIngest.start(
        Streams.fileReplay(s, s"$in/*", Multimodal.mediaSchema),
        s"$root/store", s"$root/ckpt", modality = "audio",
        partHashes = true, minSharedParts = 2)
      q.awaitTermination()
      graft.streaming.MediaDedupIngest.admissionCard(s, s"$root/store")
        .select(col("batch"), col("n_admitted"), col("n_gated"),
          col("n_part_refused"))
    }),

    "q201_stream_media_dedup" -> ((s, dir) => {
      val variants = Multimodal.syntheticImageVariants(
        s, t(s, dir, "documents"), groups = 25)
        .filter(expr("(media_id div 25) % 2 = 0"))
      val root = tmp("q201")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val in = s"$root/in"
      Seq(variants.filter(col("media_id") < 200),
          variants.filter(col("media_id") >= 200 && col("media_id") < 350),
          variants.filter(col("media_id") >= 350)).zipWithIndex.foreach {
        case (sl, i) =>
          val part = s"$in/f$i"
          sl.coalesce(1).write.parquet(part)
          new java.io.File(part).listFiles()
            .foreach(_.setLastModified(1000000L * (i + 1)))
      }
      val q = graft.streaming.MediaDedupIngest.start(
        Streams.fileReplay(s, s"$in/*", Multimodal.mediaSchema),
        s"$root/store", s"$root/ckpt", modality = "image")
      q.awaitTermination()
      graft.streaming.MediaDedupIngest.survivors(s, s"$root/store")
        .select(col("media_id"))
    }),

    // image keep-best dedup (round 15): every group rendered at full
    // size AND as a bilinear thumbnail — near-dup clustering over the
    // decoded dHash must keep exactly the highest-resolution copy
    // (real decoded dims, one decode for hash + dims together)
    "q200_image_keepbest" -> ((s, dir) => {
      val rv = Multimodal.syntheticImageResVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.ImageDedup.survivorsByResolution(rv, maxHamming = 3)
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"))
    }),

    // audio decontamination (round 15): the audio face of q192 — eval
    // clips (bases 0..4's base renders) broadcast as fingerprint bands;
    // every half-volume AND detuned variant of those groups must flag,
    // nothing else
    "q198_audio_decontaminate" -> ((s, dir) => {
      val variants = Multimodal.syntheticAudioNearVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.AudioDedup.decontaminate(
        variants, variants.filter(col("media_id") < 5), maxHamming = 8)
        .select(col("media_id"), col("contaminated"))
    }),

    // video decontamination (round 15): frame-perturbed re-renders of
    // eval videos must flag through the majority-fold fingerprint
    "q199_video_decontaminate" -> ((s, dir) => {
      val variants = Multimodal.syntheticGifVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.VideoDedup.decontaminate(
        variants, variants.filter(col("media_id") < 5), maxHamming = 4)
        .select(col("media_id"), col("contaminated"))
    }),

    // video NEAR-dup (round 15): planted texture groups rendered as REAL
    // 4-frame animated GIFs where every other copy carries single-frame
    // brightness noise — the majority-fold frame-dHash fingerprint must
    // cluster perturbed copies with their base via the shared banding +
    // connected components; ground truth is doc_id arithmetic
    "q197_video_neardup" -> ((s, dir) => {
      val variants = Multimodal.syntheticGifVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.VideoDedup.clusters(variants, maxHamming = 4)
        .select(col("media_id"), col("cluster_id"))
    }),

    // REAL multi-frame video-path decode (round 15): executor-generated
    // animated GIFs (frame count, dims, 10cs delays from doc_id) parsed
    // back through javax.imageio's frame-indexed reader — n_frames,
    // width, duration come from the CONTAINER, and n_sampled counts the
    // frames sampleGifFrames actually decoded (every 2nd frame's pixels)
    // PAIRED curation with CAPTION-TEXT decontamination (round 17):
    // benchmark prompts/answers leak through the TEXT side of an
    // image-caption crawl — any caption sharing a 4-gram with an eval
    // caption stages caption_contaminated BEFORE the decode (the q72
    // n-gram probe folded into the pair pipeline's cost order), so
    // leaked pairs never pay the media decode either
    "q243_paired_caption_decontaminated" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = Multimodal.syntheticMediaPipelineMix(s, docs)
        .filter(col("media_type") === "image")
      graft.multimodal.PairedCuration.curate(media, docs,
        minCaptionChars = 200L, maxHamming = 3,
        evalCaptions = Some(docs.filter(pmod(col("doc_id"), lit(50)) === 0)))
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // PAIRED curation with the DEEP leak guard (round 17): eval =
    // CROPPED renders of groups 0..4 — the whole-hash probe of q224's
    // shape sees nothing (a crop shifts the 9x8 downscale grid under
    // every cell), but the per-tile part hashes riding the SAME profile
    // decode re-align, so both the base AND border-extended survivors
    // of those groups flag contaminated; caption gate first (no decode),
    // dedup = min caption-passing id per (group, kind)
    "q242_paired_deep_decontaminated" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = Multimodal.syntheticImageCropVariants(
        s, docs.filter(expr("(doc_id div 20) % 3 != 1")), groups = 20)
      val eval = Multimodal.syntheticImageCropVariants(
        s, docs.filter(expr("doc_id >= 20 AND doc_id < 25")), groups = 20)
      graft.multimodal.PairedCuration.curateDeep(media, docs,
        minCaptionChars = 200L, maxHamming = 3, minShared = 2,
        evalMedia = Some(eval))
        .select(col("media_id"), col("media_type"), col("stage"))
    }),

    // FPS-INVARIANT video decontamination (round 17): eval = constant-
    // rate re-renders of groups 0..4's VFR timelines — the index-based
    // whole-fold probe sees nothing (vote multiplicities differ), the
    // time-sampled probe re-aligns them exactly
    "q244_video_fps_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Multimodal.syntheticVfrVariants(
        s, docs.filter(expr("(doc_id div 20) % 2 = 0")), groups = 20)
      val eval = Multimodal.syntheticVfrVariants(
        s, docs.filter(expr("doc_id >= 20 AND doc_id < 25")), groups = 20)
      graft.multimodal.VideoDedup.decontaminateAtFps(
        corpus, eval, fps = 10, maxHamming = 3)
        .select(col("media_id"), col("contaminated"))
    }),

    // CROSS-CONTAINER fps-invariant video decontamination (round 18):
    // eval = MJPEG-mp4 re-renders of groups 0..4's timelines — the
    // shape a leaked benchmark video actually arrives in (different
    // container, different codec, different frame rate). The GIF corpus
    // renders of those groups land within JPEG re-encode tolerance of
    // the mp4 eval folds because time sampling sees only decoded pixels
    // on a shared wall clock
    "q249_video_cross_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Multimodal.syntheticVfrVariants(
        s, docs.filter(expr("(doc_id div 20) % 2 = 0")), groups = 20)
      val eval = Multimodal.syntheticVfrMp4Variants(
        s, docs.filter(expr("doc_id >= 20 AND doc_id < 25")), groups = 20)
      graft.multimodal.VideoDedup.decontaminateAtFps(
        corpus, eval, fps = 10, maxHamming = 3)
        .select(col("media_id"), col("contaminated"))
    }),

    // AVI AUDIO DEMUX (round 17): the container walk pulls the auds
    // stream's PCM bytes out of the 01wb chunks (NO video decode — the
    // JPEG frames are never touched), re-wraps them as WAV, and the
    // demuxed track runs the ENTIRE audio stack; planted sample counts
    // stay doc_id arithmetic through a REAL WAV re-decode
    "q241_avi_audio_demux" -> ((s, dir) => {
      val avs = Multimodal.syntheticAviWithAudio(s, t(s, dir, "documents"))
      val tracks = Multimodal.demuxAviAudio(avs)
      graft.multimodal.MediaQuality.audioSignals(tracks)
        .select(col("media_id"), col("n_frames"), col("duration_ms"))
    }),

    // FPS-INVARIANT video dedup (round 17): a VFR clip and its
    // constant-rate re-render show the SAME frame at every wall-clock
    // instant but fold differently by frame index (vote multiplicities
    // 4/1/1/2 vs 1/1/1/1 skew the per-bit majority); time-sampled
    // fingerprints (the frame on screen at each 100 ms tick) are
    // identical, so exact grouping collapses both renders to min id
    "q240_video_fps_dedup" -> ((s, dir) => {
      val vv = Multimodal.syntheticVfrVariants(
        s, t(s, dir, "documents"), groups = 20)
      graft.multimodal.VideoDedup.exactGroupsAtFps(vv, fps = 10)
        .select(col("media_id"), col("group_rep"))
    }),

    // REAL AVI/MJPEG container decode (round 17; composed round 18): the
    // q196 contract over the second in-JVM video container — a RIFF walk
    // (LIST hdrl/movi, 00dc chunks) + per-frame javax.imageio JPEG
    // decode. Frame counts, dims and µs-per-frame durations come from
    // real parsing, and the card composes features + frame sampling
    // through ONE VideoCodec pass (the earlier two-pass join paid the
    // container decode twice — at 100 TB of video, decode IS the job)
    "q237_avi_frames" -> ((s, dir) => {
      val avis = Multimodal.syntheticAviVideos(s, t(s, dir, "documents"))
      Multimodal.videoFrameCard(avis, every = 2)
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("n_frames"), col("duration_ms"), col("n_sampled"))
    }),

    // REAL MJPEG-in-mp4 container decode (round 18): the q196/q237
    // contract over the THIRD in-JVM video container — the ISO-BMFF
    // sample-table walk (stsd 'jpeg' entries, stsc/stsz/stco spans,
    // stts per-frame timing) + per-frame javax.imageio JPEG decode.
    // mp4 is natively VFR: frame f displays (f+1)*50 ms, so
    // duration_ms = 25*n*(n+1) exercises the per-frame µs chain;
    // compressed codecs (avc1/hev1) stay the loud-refusal seam
    "q248_mp4_frames" -> ((s, dir) => {
      val mp4s = Multimodal.syntheticMp4Videos(s, t(s, dir, "documents"))
      Multimodal.videoFrameCard(mp4s, every = 2)
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("n_frames"), col("duration_ms"), col("n_sampled"))
    }),

    // REAL MJPEG-in-Matroska container decode (round 18): the q248
    // contract over the FOURTH in-JVM video container — the EBML
    // element walk (Tracks/TrackEntry codec gate, Cluster/SimpleBlock
    // frames, per-block timestamps through TimestampScale) + per-frame
    // javax.imageio JPEG decode. Timing is native-VFR start stamps:
    // frame f displays (f+1)*50 ms (last span from DefaultDuration),
    // so duration_ms = 25*n*(n+1); VP8/VP9 webm stays the loud refusal
    "q256_mkv_frames" -> ((s, dir) => {
      val mkvs = Multimodal.syntheticMkvVideos(s, t(s, dir, "documents"))
      Multimodal.videoFrameCard(mkvs, every = 2)
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("n_frames"), col("duration_ms"), col("n_sampled"))
    }),

    // Matroska PCM AUDIO DEMUX (round 18): A_PCM/INT/LIT tracks out of
    // Cluster/SimpleBlock payloads — 16-bit LE on even doc_ids, 8-bit
    // unsigned on odd (both bit-depth paths) — re-wrapped as WAV and
    // run through the ENTIRE audio stack; compressed webm soundtracks
    // (Vorbis/Opus) refuse loudly
    "q257_mkv_audio_demux" -> ((s, dir) => {
      val mkvs = Multimodal.syntheticMkvAudio(s, t(s, dir, "documents"))
      val tracks = Multimodal.demuxMkvAudio(mkvs)
      graft.multimodal.MediaQuality.audioSignals(tracks)
        .select(col("media_id"), col("n_frames"), col("duration_ms"))
    }),

    // Matroska metadata scrub audit (round 18): the EBML face of q246
    // — a Tags element (author/GPS comment) planted on doc_id % 4 = 0
    // is WIPED IN PLACE with a same-size Void (SeekHead/Cues hold
    // segment-relative offsets; removal would corrupt them — Void is
    // the format's own mechanism), smuggled bytes past the Segment end
    // strip on % 4 = 2. Zero decodes
    "q258_mkv_scrub_report" -> ((s, dir) => {
      val mkvs = Multimodal.syntheticMkvVideos(
        s, t(s, dir, "documents"), plantMetadata = true)
      graft.multimodal.MediaScrub.scrubReport(mkvs)
        .select(col("media_id"), col("n_stripped"), col("had_metadata"))
    }),

    "q196_gif_frames" -> ((s, dir) => {
      val gifs = Multimodal.syntheticAnimatedGifs(s, t(s, dir, "documents"))
      val feats = Multimodal.extractFeatures(
        gifs, new Multimodal.GifVideoDecoder()).toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("n_frames").cast("bigint").as("n_frames"),
          col("duration_ms").cast("bigint").as("duration_ms"))
      val sampled = Multimodal.sampleGifFrames(gifs, every = 2)
        .groupBy("media_id").agg(count(lit(1)).as("n_sampled"))
      feats.join(sampled, "media_id")
        .select(col("media_id"), col("width"), col("n_frames"),
          col("duration_ms"), col("n_sampled"))
    }),

    // C4 line-level cleaning (Raffel et al. 2020 §2.2) over synthetic
    // multi-line pages with planted boilerplate: javascript/short lines
    // drop in the line pass, lorem-ipsum/brace/bad-word pages drop in
    // the page pass. Every rule is a string pure function DuckDB
    // replays on the same constructed pages.
    "q180_c4_line_clean" -> ((s, dir) => {
      val multi = t(s, dir, "documents").select(col("doc_id"),
        concat(
          lit("A first proper sentence line.\n"),
          col("text"), lit("\n"),
          lit("enable javascript to continue.\n"),
          lit("Too short.\n"),
          lit("Another perfectly fine line!\n"),
          when(col("doc_id") % 7 === 0, lit("sprinkled lorem ipsum here."))
            .otherwise(lit("A clean closing line?")),
          when(col("doc_id") % 11 === 0, lit("\ncode { brace."))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit("\nThis mentions contraband openly."))
            .otherwise(lit(""))).as("text"))
      graft.text.LineClean.clean(multi, "text", minLineWords = 3,
        minSentences = 3, badWords = Seq("contraband"))
        .select("doc_id", "text")
    }),

    // Gopher duplicate-LINE signals (§A1.1's document-structure half):
    // planted boilerplate repeats on every third page; all four signals
    // are integers and the keep gate cross-multiplies the paper's
    // 0.30/0.20 fractions, so DuckDB recomputes the exact survivor set.
    "q181_dup_segments" -> ((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"),
        concat(
          lit("A recurring boilerplate footer line\n"),
          col("text"), lit("\n"),
          when(col("doc_id") % 3 === 0,
            lit("A recurring boilerplate footer line\n" +
              "A recurring boilerplate footer line"))
            .otherwise(concat(lit("unique tail "),
              col("doc_id").cast("string")))).as("text"))
      val withStats = graft.text.TextStats.segmentStats(col("text"), "\n")
        .foldLeft(pages) { case (d, (n, c)) => d.withColumn(n, c) }
      withStats.select(col("doc_id"), col("n_segments"),
        col("n_distinct_segments"), col("seg_chars"),
        col("distinct_seg_chars"),
        (((col("n_segments") - col("n_distinct_segments")) * 100 <=
            col("n_segments") * 30) &&
          ((col("seg_chars") - col("distinct_seg_chars")) * 100 <=
            col("seg_chars") * 20)).as("kept"))
    }),

    // fixed-size eval carving with cluster QUARANTINE: per language, the
    // 5 lowest-hash docs become eval and their unselected dup-cluster
    // mates leave train entirely. Decade-star clusters + the portable
    // hash make every role DuckDB-recomputable.
    "q182_eval_carve" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "lang", "text")
      val pairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") - pmod(col("doc_id"), lit(10L))).as("id_b"))
      val clustered = graft.dedup.DupClusters.resolve(docs, "doc_id", pairs)
      graft.text.LeakSafeSplit.carveEval(clustered, "doc_id",
        "cluster_id", "lang", perStratum = 5)
        .select("doc_id", "lang", "cluster_id", "role")
    }),

    // the corpus data card: per-source masses + exact permille shares,
    // one scan — every number an integer DuckDB recomputes directly.
    "q183_corpus_report" -> ((s, dir) =>
      graft.text.CorpusReport.byStratum(
        t(s, dir, "documents"), "source", "text", "lang")),

    // SQ8-compressed incremental index: init/append/replay through the
    // same atomic batch layout, search dequantizes at scan time. The
    // affine coding is double-exact, so DuckDB replays quantize ->
    // dequantize -> cosine -> rank and the search must match it.
    "q184_ivf_sq8" -> ((s, dir) => {
      import graft.ann.Ann
      val derived = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("embedding"))
      val m = Ann.ivfTrain(derived, "vec_id", "embedding", numCells = 16)
      val path = tmp("q184") + "/index"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      Ann.ivfInitIndexSq8(derived.filter(col("vec_id") < 250),
        "vec_id", "embedding", m, path)
      Ann.ivfAppendIndexSq8(derived.filter(col("vec_id") >= 250),
        "vec_id", "embedding", path, batchId = 1L)
      Ann.ivfAppendIndexSq8(derived.filter(col("vec_id") >= 250),
        "vec_id", "embedding", path, batchId = 1L) // replay: no dup
      require(s.read.parquet(path).count() == derived.count(),
        "replayed SQ8 append duplicated index rows")
      Ann.ivfTopKIndexedSq8(path, derived.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, nprobe = 2,
        Ann.loadModel(s, path))
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"),
          col("rank").cast("bigint").as("rank"))
    }),

    // REAL image decode (round 14): executor-side PNG generation with
    // dims derived from doc_id, decoded back through the JDK's actual
    // ImageIO codec — width/height come from the decoded pixels, so a
    // broken codec path (wrong dims, corrupt encode, headless failure)
    // breaks the oracle, which recomputes the dims formula from doc_id.
    "q185_image_decode" -> ((s, dir) => {
      val images = Multimodal.syntheticImages(s, t(s, dir, "documents"))
      Multimodal.extractFeatures(images, new Multimodal.ImageIoDecoder())
        .toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // REAL image resize (round 14): bilinear Graphics2D rescale + PNG
    // re-encode on the executors, then a REAL decode of the resized
    // payloads — every row must report the target dims from its actual
    // pixels. A luminance band of the resized content is thresholded to
    // an integer so content survival is oracle-checkable too: the
    // generator's red channel rises with x for every doc, so the mean
    // luminance of any resized image stays strictly inside (0, 255).
    "q186_image_resize" -> ((s, dir) => {
      val images = Multimodal.syntheticImages(s, t(s, dir, "documents"))
      val resized = Multimodal.resizeImages(images, 24, 18,
        new Multimodal.ImageIoResizer())
      Multimodal.extractFeatures(resized.toDF(),
          new Multimodal.ImageIoDecoder(featureDim = 1)).toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          (element_at(col("feature"), 1) > lit(0.0) &&
            element_at(col("feature"), 1) < lit(1.0))
            .as("content_nontrivial"))
    }),

    // multimodal decode plumbing; the stub decoder's features are a
    // documented pure function of payload length, so DuckDB can recompute
    // them from the same documents table (real decoders plug in via
    // MediaDecoder without touching this contract).
    "q30_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("media_type"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // Salesforce Bulk API extraction e2e (SalesforceExtractor.java:97):
    // an in-process server speaks the Bulk v1 dialect over the customer
    // table's rows (the collect SIMULATES the remote CRM's data, as in
    // q51/q80) — create job with PK chunking, poll the growing batch
    // list, stitch 2 batches x 2 CSV result chunks, distributed parse,
    // cast to the source types. The oracle is the table itself: any
    // drop/dup/corruption across the wire breaks the multiset hash.
    "q101_sfdc_bulk" -> ((s, dir) => {
      val src = t(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val lines = src.collect().map(r =>
        s""""${r.getLong(0)}","${r.getString(1)}","${r.getDouble(2)}"""")
      val header = "\"c_custkey\",\"c_mktsegment\",\"c_acctbal\""
      def chunk(rows: Array[String]): Seq[String] = {
        val half = (rows.length + 1) / 2
        Seq(rows.take(half), rows.drop(half))
          .filter(_.nonEmpty).map(c => (header +: c).mkString("\n"))
      }
      val half = (lines.length + 1) / 2
      val byBatch = Map("b1" -> chunk(lines.take(half)),
        "b2" -> chunk(lines.drop(half)))
      val srv = sfdcBulkSim(byBatch)
      try {
        val cfg = graft.sources.SalesforceBulk.BulkConfig(
          baseUrl = s"http://127.0.0.1:${srv.getAddress.getPort}/services/async/52.0",
          sessionToken = "verify-tok", pollIntervalMs = 5)
        graft.sources.SalesforceBulk.read(s, cfg, "Customer",
          "SELECT c_custkey, c_mktsegment, c_acctbal FROM Customer",
          pkChunkSize = Some(half))
          .select(col("c_custkey").cast("bigint").as("c_custkey"),
            col("c_mktsegment").cast("string").as("c_mktsegment"),
            col("c_acctbal").cast("double").as("c_acctbal"))
      } finally srv.stop(0)
    }),

    // DSIR importance resampling (Xie et al. 2023): select the 100 raw
    // documents most like the English target slice under the hashed-
    // n-gram likelihood-ratio score — the principled target-matching
    // selector for pretraining data. Float-free (md5 buckets +
    // floor-log2 counts), so DuckDB re-derives the exact selection.
    "q102_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.Dsir.selectLikeTarget(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text",
        k = 100, buckets = 1 << 14)
        .select("doc_id", "n_grams", "dsir_q")
    }),

    // SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings, drop
    // within-cell near-duplicates (triangular max-cos, lowest id
    // survives). k-means isn't SQL-expressible, so the query
    // SELF-CERTIFIES (the q158 raise_error pattern): (a) re-running the
    // duplicate finder over the survivor set with the same cells finds
    // NOTHING — no surviving within-cell pair reaches the threshold;
    // (b) no cell shed members (the loud mega-cell contract — numCells
    // is sized so cells stay under maxCellSize at every test SF); and
    // (c) every planted near-copy was caught and every base vector
    // survived, which makes the certified survivor set exactly the base
    // ids — the DuckDB-checkable output. SemDeDupSpec's brute-force
    // parity unit still pins the pairing semantics.
    "q103_semdedup" -> ((s, dir) => {
      // the synthetic embeddings have no natural near-dups (max pair
      // cosine ~0.51), so plant them exactly as q43 does: a perturbed
      // copy of every vector at vec_id+1000000
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      // 1e-6-scale perturbation: cosine to the base stays ≈ 1 (well
      // over the 0.95 threshold) while the k-means cell assignment
      // cannot flip unless a base vector sits within a ~1e-6 relative
      // margin of a cell boundary — none does at any test SF, which
      // certification (c) checks loudly
      val near = base.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(1e-6) *
            (pmod(i.cast("bigint"), lit(7L)) - lit(3L)).cast("double")))
          .as("embedding"))
      // persisted: the union's planted leg is an interpreted transform
      // HOF and this lineage is otherwise re-run by the k-means sample,
      // the ranked pass, and every evaluation of the survivor anti-join
      val corpus = base.unionByName(near).persist()
      val model = graft.ann.Ann.ivfTrain(corpus, "vec_id", "embedding",
        numCells = 64)
      // certs (a)+(b) live in certifiedSurvivors (one ranked pass, two
      // cell-confined pairings, shared via persist)
      val surv = graft.ann.SemDeDup.certifiedSurvivors(corpus, "vec_id",
        "embedding", model, threshold = 0.95)
      // (c) planted recovery: survivors == base ids (both directions).
      // sIds is referenced THREE times by the output action (the row
      // leg and both certification counts) — persist so the survivor
      // anti-join runs once per action, not three times
      val sIds = surv.select("vec_id", "sem_ok").persist()
      val bIds = base.select("vec_id")
      val uncaught = sIds.join(bIds, Seq("vec_id"), "left_anti")
        .agg(count(lit(1)).as("__uncaught"))
      val overdrop = bIds.join(sIds.select("vec_id"), Seq("vec_id"), "left_anti")
        .agg(count(lit(1)).as("__overdropped"))
      val cert = broadcast(uncaught.crossJoin(overdrop))
      sIds.crossJoin(cert)
        .withColumn("ok", when(col("__uncaught") === 0 &&
          col("__overdropped") === 0, col("sem_ok"))
          .otherwise(raise_error(concat(
            lit("SemDeDup planted-recovery failed: surviving planted dups="),
            col("__uncaught"), lit(", dropped base vectors="),
            col("__overdropped")))))
        .select(col("vec_id"), col("ok"))
    }),

    // Trained BPE tokenization (Sennrich et al. 2016): learn 200 merges
    // from the corpus word frequencies, count subword tokens per doc.
    // The merge loop isn't SQL-expressible, so the query SELF-CERTIFIES
    // losslessness in-query (the q158 raise_error pattern): for EVERY
    // row, the subword tokens concatenated back together must equal the
    // normalized word sequence — decode∘encode identity — and the token
    // count must be bounded by [n_words, n_chars + n_words] (each word
    // yields ≥1 token, each token ≥1 symbol). The certified word count
    // is the DuckDB-checkable output; BpeSpec still pins golden merges
    // and driver/expression parity.
    "q104_bpe_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.text.Bpe.train(docs, "text", numMerges = 200)
      val eow = graft.text.Bpe.EndOfWord
      docs.select(col("doc_id"), col("text"),
        graft.text.Bpe.encode(col("text"), model).as("__toks"),
        graft.text.Dsir.wordTokens(col("text")).as("__words"))
        .withColumn("__n_tokens", size(col("__toks")).cast("bigint"))
        .withColumn("n_words", size(col("__words")).cast("bigint"))
        .withColumn("__decoded", array_join(col("__toks"), ""))
        .withColumn("__expected", when(col("n_words") === 0, lit(""))
          .otherwise(concat(array_join(col("__words"), eow), lit(eow))))
        .withColumn("ok", when(col("__decoded") === col("__expected") &&
          col("__n_tokens") >= col("n_words") &&
          col("__n_tokens") <= col("n_words") +
            length(array_join(col("__words"), "")), lit(true))
          .otherwise(raise_error(concat(
            lit("BPE decode∘encode identity failed for doc_id="),
            col("doc_id")))))
        .select(col("doc_id"), col("n_words"), col("ok"))
    }),

    // incremental snapshot replication e2e (IcebergDataset.java:72
    // semantics over our own SnapshotLog): commit a partial snapshot,
    // replicate, commit the full table, replicate the delta — then read
    // THROUGH THE REPLICA. Any dropped/duplicated/corrupted file breaks
    // the multiset hash against the source table.
    "q105_snapshot_replicate" -> ((s, dir) => {
      val base = tmp("q105")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val proj = t(s, dir, "events")
        .select("event_id", "user_id", "event_type")
      val src = new graft.sinks.SnapshotLog(s, s"$base/src")
      src.commit(Map("events" -> proj.filter(col("event_id") % 2 === 0)))
      graft.sinks.SnapshotReplicate.replicate(s, s"$base/src", s"$base/dst")
      src.commit(Map("events" -> proj))
      graft.sinks.SnapshotReplicate.replicate(s, s"$base/src", s"$base/dst")
      new graft.sinks.SnapshotLog(s, s"$base/dst").read("events")
    }),

    // run-volume drift monitoring (the audit-count percentage gate
    // applied run-over-run): daily ingest counts per event type vs the
    // trailing-7 median, float-free via the doubled-median gate.
    "q106_volume_drift" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n"))
      graft.state.RunLedger.countDrift(daily, Seq("event_type"), "d", "n",
        trailing = 7, tolerancePct = 20)
        .select("event_type", "d", "n", "baseline_med2", "drifted")
    }),

    // stream-stream interval join (attribution: purchases within the
    // hour before each click, both sides live feeds) through the REAL
    // streaming path — file-replayed micro-batches, watermarked state,
    // append emission. Oracle = the equivalent batch theta-join.
    "q107_stream_interval_join" -> ((s, dir) => {
      val base = tmp("q107")
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
      ev.repartition(8).write.mode("overwrite").parquet(s"$base/in")
      val schema = s.read.parquet(s"$base/in").schema
      def side(typ: String, idAs: String, tsAs: String) =
        Streams.fileReplay(s, s"$base/in", schema, maxFilesPerTrigger = 2)
          .filter(col("event_type") === typ)
          .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
      Streams.runToCompletionAppend(
        Streams.intervalJoin(
          side("click", "click_id", "click_ts"),
          side("purchase", "purchase_id", "purchase_ts"),
          Seq("user_id"), "click_ts", "purchase_ts",
          "-1 hour", "0 seconds", delay = "3650 days"),
        // watermark-bounded join state is a few thousand rows: 8 state
        // partitions, not one per core (see Streams.withStatePartitions);
        // an INNER join emits only when a data batch brings a match, so
        // the trailing no-data batch can only evict state — skip it
        "q107_ssij_tbl", statePartitions = Some(8),
        skipNoDataBatch = true)
        .select("user_id", "click_id", "purchase_id")
    }),

    // SCD-2 history from a CDC changelog: every version with its
    // [valid_from, valid_to) window, open current version NULL-ended,
    // same-(key, ts) duplicates collapsed by event_id-desc delta.
    "q108_scd2_history" -> ((s, dir) => {
      val ch = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"),
          col("value"), col("event_id"))
      graft.operators.Scd.scd2(ch, Seq("user_id"), "ts",
        delta = Seq(col("event_id").desc))
        .select("user_id", "event_type", "value", "valid_from", "valid_to")
    }),

    // skew-split join: users with > 75 events take the broadcast hot
    // path, the rest the plain shuffle; the union must equal the plain
    // join bit-for-bit (the q49 contract for the split strategy).
    "q109_split_skew_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("du")).agg(count(lit(1)).as("purchase_cnt"))
      graft.operators.Skew.splitSkewJoin(
        ev.select("event_id", "user_id"), dim, "user_id", "du",
        hotKeyMaxRows = 75, joinType = "left")
        .select("event_id", "user_id", "purchase_cnt")
    }),

    // CCNet head/middle/tail bucketing: q93's LM familiarity cut into
    // value-based equal-count thirds — pure integer arithmetic, ties
    // never straddle a boundary, corpus never globally sorted.
    "q110_ccnet_tiers" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      // the CCNet shape at scale: the LM trains on a bounded
      // deterministic hash-sample (CCNet trains on a Wikipedia-sized
      // slice, not the crawl) and the model is COLLECTED once — a lazy
      // model would re-run the corpus trigram aggregate inside the
      // tier cache's materialization (the round-10 2x finding)
      val trainDocs = docs.filter(pmod(graft.text.TextStats.portableHash60(
        concat(lit("ngram:"), col("doc_id").cast("string"))), lit(5L)) === 0L)
      val fam = graft.text.NgramLm.familiarity(docs,
        graft.text.NgramLm.trainCollected(trainDocs, "text",
          n = 3, minCount = 2,
          maxGrams = graft.text.NgramLm.RecommendedMaxGrams),
        "doc_id", "text", n = 3)
      graft.text.QualityTiers.tiers(fam, "fam_q", k = 3)
        .select("doc_id", "fam_q", "tier")
        .withColumn("tier", col("tier").cast("bigint"))
    }),

    // file-level zone-map pruning: publish events range-clustered on ts
    // with a per-file (min,max) manifest, answer a 5-day probe by
    // opening only intersecting files — the residual filter makes the
    // answer layout-independent, so the oracle is the plain range scan.
    "q111_stats_pruned" -> ((s, dir) => {
      val base = tmp("q111")
      graft.sources.StatsPrunedSource.writeWithStats(
        t(s, dir, "events"), s"$base/events", "ts", numFiles = 16)
      val (frame, kept, total) = graft.sources.StatsPrunedSource.readRange(
        s, s"$base/events", "ts",
        to_timestamp(lit("2024-01-10 00:00:00")),
        to_timestamp(lit("2024-01-15 00:00:00")))
      require(kept < total, s"zone maps must prune: kept $kept of $total")
      frame.select("event_id", "user_id", "event_type")
    }),

    // copy-on-write MERGE: updates (x2 value), deletes, and inserts into
    // a brand-new partition applied in place; only affected date
    // partitions rewrite. Oracle = the same merge in plain SQL over the
    // read-back table — any half-applied change breaks the hash.
    "q112_merge_cow" -> ((s, dir) => {
      val base = tmp("q112")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      ev.write.mode("overwrite").partitionBy("dt").parquet(s"$base/tbl")
      val updates = ev
        .filter(col("event_id") % 7 === 0 && col("event_id") % 13 =!= 0)
        .withColumn("value", col("value") * 2).withColumn("op", lit("U"))
      val deletes = ev.filter(col("event_id") % 13 === 0)
        .withColumn("op", lit("D"))
      val inserts = ev.filter(col("event_id") % 17 === 0)
        .withColumn("event_id", col("event_id") + 1000000L)
        .withColumn("event_type", lit("insert"))
        .withColumn("dt", lit("2024-02-01"))
        .withColumn("op", lit("U"))
      graft.operators.Merge.mergePartitioned(s, s"$base/tbl", "dt",
        updates.unionByName(deletes).unionByName(inserts),
        Seq("event_id"), col("op") === "D")
      s.read.parquet(s"$base/tbl").select(col("event_id"), col("user_id"),
        col("event_type"), col("value"), col("dt").cast("string").as("dt"))
    }),

    // multi-dimensional data skipping: publish events Z-ORDER clustered
    // on (ts, user_id), probe a (time range AND user range) box; the
    // runtime guard REQUIRES file pruning, the residual filter makes
    // the rows layout-independent. q111's 1-dim zone maps cannot prune
    // the user predicate at all — this is the 2-dim completion.
    "q113_zorder_box" -> ((s, dir) => {
      val base = tmp("q113")
      graft.sources.ZOrderSource.writeZOrdered(
        t(s, dir, "events"), s"$base/events", Seq("ts", "user_id"),
        numFiles = 16)
      val (frame, kept, total) = graft.sources.ZOrderSource.readBox(
        s, s"$base/events",
        Seq(("ts", to_timestamp(lit("2024-01-10 00:00:00")),
          to_timestamp(lit("2024-01-15 00:00:00"))),
          ("user_id", lit(0L), lit(3L))))
      require(kept < total,
        s"z-order box pruning must bite: kept $kept of $total files")
      frame.select("event_id", "user_id", "event_type")
    }),

    // small-file compaction: a streaming-style scattered table (8 files
    // per date partition) rewrites to target-size files, atomically per
    // partition; the rows are bit-identical — the guard pins that the
    // layout actually shrank.
    "q114_compact_files" -> ((s, dir) => {
      val base = tmp("q114")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      ev.repartition(8).write.partitionBy("dt").parquet(s"$base/tbl")
      val st = graft.operators.FileCompaction.compact(
        s, s"$base/tbl", "dt", targetBytes = 512L * 1024 * 1024)
      require(st.filesAfter < st.filesBefore,
        s"compaction must shrink the layout: ${st.filesBefore} -> ${st.filesAfter}")
      s.read.parquet(s"$base/tbl").select(col("event_id"), col("user_id"),
        col("event_type"), col("dt").cast("string").as("dt"))
    }),

    // fixed-interval resample with gap fill: per-user hourly grid from
    // first to last observation, empty hours forward-filled — the dense
    // series raw event tables never are.
    "q115_gap_fill" -> ((s, dir) =>
      graft.operators.Resample.gridFill(
        t(s, dir, "events"), Seq("user_id"), "ts", "1 hour",
        max(col("value")), "hour")
        .select(col("user_id"), col("bucket").as("hour"), col("value"))),

    // incremental materialized-aggregate maintenance: history before the
    // cutoff is reduced once and STORED; the delta batch folds in as a
    // partial aggregate — merge(state(A), state(B)) == state(A ∪ B).
    // The oracle recomputes from all of history, so any merge drift
    // (double-count, lost key, wrong combine fn) breaks the hash.
    "q116_incremental_agg" -> ((s, dir) => {
      import graft.operators.IncrementalAgg._
      val keys = Seq("user_id", "event_type")
      val specs = Seq(AggSpec.count("n"), AggSpec.sum("total", col("value")),
        AggSpec.min("vmin", col("value")), AggSpec.max("vmax", col("value")))
      val ev = t(s, dir, "events")
      val cutoff = to_timestamp(lit("2024-01-20 00:00:00"))
      val base = tmp("q116")
      state(ev.filter(col("ts") < cutoff), keys, specs)
        .write.mode("overwrite").parquet(s"$base/state")
      val stored = s.read.parquet(s"$base/state")
      val delta = state(ev.filter(col("ts") >= cutoff), keys, specs)
      merge(Seq(stored, delta), keys, specs)
        .withColumn("avg_value", col("total") / col("n"))
    }),

    // stream-stream LEFT OUTER interval join through the real
    // micro-batch path: every click pairs with its purchases in the
    // preceding hour, and clicks with NO purchase emit null-padded —
    // but only after the watermark passes their window. Two staggered
    // sentinel batches (user_id -1, filtered from the result) push the
    // watermark past all real rows so the outer tail actually flushes;
    // oracle = the batch LEFT theta-join.
    "q117_stream_outer_join" -> ((s, dir) => {
      val base = tmp("q117")
      val fsp = new org.apache.hadoop.fs.Path(base)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
      ev.repartition(8).write.parquet(s"$base/in")
      val maxTs = ev.agg(max("ts")).collect()(0).getTimestamp(0)
      def sentinel(idOff: Long, hoursAhead: Int): Unit = {
        import s.implicits._
        val ts = new java.sql.Timestamp(
          maxTs.getTime + hoursAhead * 3600L * 1000L)
        Seq((-idOff, -1L, "click", ts), (-idOff - 1L, -1L, "purchase", ts))
          .toDF("event_id", "user_id", "event_type", "ts")
          .repartition(2) // fills one whole maxFilesPerTrigger=2 batch
          .write.mode("append").parquet(s"$base/in")
      }
      // The file replay is NOT time-ordered (repartition scatters rows
      // across files), so the delay must exceed the table's whole time
      // span or "late" rows get dropped mid-replay. Outer emission then
      // needs the watermark (= max seen ts - delay) past every real
      // row: sentinels sit at delay + 2h/4h beyond the real max.
      sentinel(1L, 60 * 24 + 2) // advances the watermark past every real row
      sentinel(3L, 60 * 24 + 4) // the batch in which held outer rows emit
      val schema = s.read.parquet(s"$base/in").schema
      def side(typ: String, idAs: String, tsAs: String) =
        Streams.fileReplay(s, s"$base/in", schema, maxFilesPerTrigger = 2)
          .filter(col("event_type") === typ)
          .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
      Streams.runToCompletionAppend(
        Streams.intervalJoin(
          side("click", "click_id", "click_ts"),
          side("purchase", "purchase_id", "purchase_ts"),
          Seq("user_id"), "click_ts", "purchase_ts",
          "-1 hour", "0 seconds", delay = "60 days",
          joinType = "left_outer"),
        // outer-join state is watermark-bounded and small: 8 state
        // partitions, not one per core (see Streams.withStatePartitions).
        // Outer emission is driven by the two sentinel DATA batches:
        // sentinel 1 advances the watermark past every real row and
        // sentinel 2's batch emits the held outer rows, so by the
        // trailing no-data batch only the sentinels' own rows remain in
        // state — and those are filtered (user_id >= 0) — skip it
        "q117_ssoj_tbl", statePartitions = Some(8),
        skipNoDataBatch = true)
        .filter(col("user_id") >= 0)
        .select("user_id", "click_id", "purchase_id")
    }),

    // row-level CDC extraction: diff two snapshots of a keyed table and
    // emit exactly the changelog (I/U/D) that turns old into new —
    // the inverse of q112's MERGE. One full-outer join on the key,
    // payload compared as a single struct.
    "q118_snapshot_diff" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      val oldSnap = ev
      val newSnap = ev.filter(col("event_id") % 13 =!= 0)
        .withColumn("value",
          when(col("event_id") % 7 === 0, col("value") * 2)
            .otherwise(col("value")))
        .unionByName(ev.filter(col("event_id") % 17 === 0)
          .withColumn("event_id", col("event_id") + 1000000L)
          .withColumn("event_type", lit("insert")))
      graft.operators.SnapshotDiff.rowDiff(oldSnap, newSnap, Seq("event_id"))
    }),

    // engine-exact column profiling: (value, count) reduction + integer
    // cumulative-count percentile cuts — two engines agree bit-for-bit,
    // so the profile is a cross-system gate, not an estimate. The
    // continuous price column is quantized first (the operator REFUSES
    // unbounded domains rather than globally sorting one).
    "q119_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("l_price_fl", floor(col("l_extendedprice")))
      graft.operators.Profile.numericProfile(
        li, Seq("l_quantity", "l_discount", "l_price_fl"),
        percentiles = Seq(50, 90, 99))
    }),

    // point-probe file skipping on a NON-clustered column: the table is
    // time-clustered, the probe is by event_id — zone maps are useless
    // here (every file spans every id), the per-file Bloom sidecar
    // opens only files that might hold a probed key. Residual filter
    // keeps the answer exact through false positives; the guard
    // REQUIRES pruning.
    "q120_bloom_point" -> ((s, dir) => {
      val base = tmp("q120")
      graft.sources.BloomIndexedSource.writeWithBloom(
        t(s, dir, "events"), s"$base/events", keyCol = "event_id",
        clusterCol = "ts", numFiles = 16)
      val probes = Seq(7L, 42L, 555L, 900L)
      val (frame, kept, total) = graft.sources.BloomIndexedSource.readPoints(
        s, s"$base/events", "event_id", probes)
      require(kept < total,
        s"bloom index must prune point probes: kept $kept of $total files")
      frame.select("event_id", "user_id", "event_type", "value")
    }),

    // OLAP reporting face: ROLLUP grouping sets (per-flag/status totals,
    // per-flag subtotals, grand total) — free from Catalyst, parity
    // pinned against the oracle's native ROLLUP.
    "q121_rollup_report" -> ((s, dir) =>
      t(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))),

    // streaming ingest INTO the snapshot log: one atomic snapshot
    // commit per micro-batch (epoch branch named by batch id, so a
    // replayed batch is a manifest-level no-op); the read face unions
    // every visible epoch — reading THROUGH the log must reproduce the
    // source table exactly.
    "q122_stream_snapshot_ingest" -> ((s, dir) => {
      val base = tmp("q122")
      val fsp = new org.apache.hadoop.fs.Path(base)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      ev.repartition(6).write.parquet(s"$base/in")
      val schema = s.read.parquet(s"$base/in").schema
      val q = graft.streaming.SnapshotStream.sink(
        Streams.fileReplay(s, s"$base/in", schema, maxFilesPerTrigger = 2),
        s"$base/log", "events", s"$base/ckpt")
      q.awaitTermination()
      val log = new graft.sinks.SnapshotLog(s, s"$base/log")
      graft.streaming.SnapshotStream.readTable(log, "events")
    }),

    // incremental consumption of the snapshot log: a consumer that
    // remembers its high-water batch id reads ONLY the later epochs —
    // here epoch 0 holds pre-cutoff history, epoch 1 the delta, and
    // reading "since batch 0" must return exactly the delta.
    "q123_snapshot_incremental_read" -> ((s, dir) => {
      val base = tmp("q123")
      val fsp = new org.apache.hadoop.fs.Path(base)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
      val cutoff = to_timestamp(lit("2024-01-20 00:00:00"))
      val log = new graft.sinks.SnapshotLog(s, s"$base/log")
      graft.streaming.SnapshotStream.appendEpoch(log, "events", 0L,
        ev.filter(col("ts") < cutoff))
      graft.streaming.SnapshotStream.appendEpoch(log, "events", 1L,
        ev.filter(col("ts") >= cutoff))
      graft.streaming.SnapshotStream.readAppendsSince(log, "events", 0L)
        .select("event_id", "user_id", "event_type", "value")
    }),

    // quality-filter FUNNEL: per-rule independent failure counts plus
    // the survivor count of the full q91 Gopher gate — the audit view a
    // filtering run ships alongside its output (which rule is doing the
    // cutting, is one rule silently dropping half the corpus). One agg
    // over the same map-only signal pass as q91.
    "q124_filter_funnel" -> ((s, dir) => {
      val sig = gopherSignals(t(s, dir, "documents"))
      val okLen = col("n_tokens").between(20, 1000)
      val okTokLen = col("sum_tok_len") >= col("n_tokens") * 3 &&
        col("sum_tok_len") <= col("n_tokens") * 10
      val okRep = (col("n_bigrams") - col("n_distinct_bigrams")) * 100 <=
        col("n_bigrams") * 18
      val okTop = col("max_bigram_cnt") * 5 <= col("n_bigrams")
      val okStop = col("stop_hits") >= 2
      def fails(ok: org.apache.spark.sql.Column, as: String) =
        sum(when(!ok, 1L).otherwise(0L)).as(as)
      sig.agg(count(lit(1)).as("n_docs"),
        fails(okLen, "fail_len"), fails(okTokLen, "fail_tok_len"),
        fails(okRep, "fail_rep"), fails(okTop, "fail_top_bigram"),
        fails(okStop, "fail_stopword"),
        sum(when(okLen && okTokLen && okRep && okTop && okStop, 1L)
          .otherwise(0L)).as("survivors"))
    }),

    // epoch compaction for the snapshot-log stream table: four epoch
    // branches fold into one (kept under the highest folded id, so
    // replays stay refused); the read face is unchanged — oracle is the
    // full table — and the guard pins that the manifest actually shrank.
    "q125_epoch_compaction" -> ((s, dir) => {
      val base = tmp("q125")
      val fsp = new org.apache.hadoop.fs.Path(base)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      val log = new graft.sinks.SnapshotLog(s, s"$base/log")
      (0 until 4).foreach(i =>
        graft.streaming.SnapshotStream.appendEpoch(log, "events", i.toLong,
          ev.filter(pmod(col("event_id"), lit(4)) === i)))
      graft.streaming.SnapshotStream.compactEpochs(log, "events", 2L)
      val after = graft.streaming.SnapshotStream.epochs(log, "events")
      require(after == Seq(2L, 3L),
        s"compaction must fold epochs 0-2 into 2: $after")
      graft.streaming.SnapshotStream.readTable(log, "events")
    }),

    // SLIDING (hopping) event-time windows — every event lands in
    // length/slide = 4 overlapping hourly windows; tumbling (q09) is
    // the degenerate slide==length case. Native window() bucketing,
    // one map-side-combined aggregation.
    "q126_sliding_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))),

    // referential-integrity audit: orphaned child rows per relationship
    // (here orders -> a customer dimension with every 10th key removed,
    // so the orphan set is non-trivial); one broadcast left-anti join.
    "q127_fk_violations" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customers = t(s, dir, "customer")
        .filter(col("c_custkey") % 10 =!= 0)
      graft.operators.Quality.fkViolations(
        orders, customers, Map("o_custkey" -> "c_custkey"))
        .select("o_orderkey", "o_custkey")
    }),

    // FORWARD as-of: each click pairs with the next purchase at or
    // after it — q95's mirror, same single-shuffle no-join-node shape
    // with a backward fill over the following frame. Oracle = DuckDB's
    // native ASOF with the inequality flipped.
    "q128_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("next_purchase_ts"))
        .agg(max("value").as("next_purchase_value"))
      graft.operators.TemporalJoin.asOfForward(clicks, purchases,
        Seq("user_id"), "ts", "next_purchase_ts")
        .select("event_id", "user_id", "next_purchase_ts",
          "next_purchase_value")
    }),

    // NEAREST as-of: whichever purchase is closer in time, before or
    // after, ties to the backward side — sensor-alignment semantics.
    // Still one sort: both directional fills are frames over the same
    // (ts, side) order. Oracle = a correlated min-distance subquery.
    "q129_asof_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("near_ts"))
        .agg(max("value").as("near_value"))
      graft.operators.TemporalJoin.asOfNearest(clicks, purchases,
        Seq("user_id"), "ts", "near_ts")
        .select("event_id", "user_id", "near_ts", "near_value")
    }),

    // backfill planning: a date-partitioned table with three day-holes
    // punched out — the planner diffs the expected daily range against
    // the partitions on disk and emits one work-unit row per hole.
    // Driver metadata only; no data read.
    "q130_backfill_plan" -> ((s, dir) => {
      val base = tmp("q130")
      val fsp = new org.apache.hadoop.fs.Path(base)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val holes = Seq("2024-01-05", "2024-01-12", "2024-01-20")
      t(s, dir, "events")
        .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
        .filter(!col("dt").isin(holes: _*))
        .write.partitionBy("dt").parquet(s"$base/tbl")
      graft.planning.BackfillPlanner.missingDates(s, s"$base/tbl", "dt")
    }),

    // repetition-LOOP detection: longest run of consecutive identical
    // tokens per document (generation loops / copy-paste stutter repeat
    // IN PLACE; the frequency signals of q68 can't see adjacency).
    // Map-only aggregate-HOF fold in original token order.
    "q131_repetition_runs" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.text.TextStats.maxTokenRun(col("text")).as("max_run"))),

    // contamination REPORT — the audit face of q72's decontamination
    // filter: for every eval item, how many corpus docs share a 4-gram
    // with it and how many distinct (doc, gram) hits — "which eval
    // items leak, and how badly", per-item evidence instead of a
    // silently smaller corpus. Broadcast eval grams, one agg.
    "q132_contamination_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val grams = MinHashDedup.shingles(col("text"), 4)
      val evalGrams = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id").as("eval_doc_id"), explode(grams).as("g"))
        .distinct()
      val corpusGrams = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
        .select(col("doc_id"), explode(grams).as("g")).distinct()
      val hits = corpusGrams.join(broadcast(evalGrams), "g")
        .groupBy("eval_doc_id")
        .agg(countDistinct("doc_id").as("n_contaminated_docs"),
          count(lit(1)).as("n_gram_hits"))
      docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id").as("eval_doc_id"))
        .join(hits, Seq("eval_doc_id"), "left")
        .na.fill(0L, Seq("n_contaminated_docs", "n_gram_hits"))
    }),

    // mixture planning: per-source token inventory + integer share and
    // the per-mille epoch multiplier needed to fill an equal-share
    // 1M-token budget — the numbers that feed q79/q92's mixing weights.
    "q133_mixture_plan" -> ((s, dir) => {
      val perSource = t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.text.TextStats.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
      val totals = perSource.agg(sum("n_tokens").as("t"),
        count(lit(1)).as("ns"))
      perSource.crossJoin(broadcast(totals))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("(n_tokens * 1000) div t").as("share_permille"),
          expr("((1000000 div ns) * 1000) div n_tokens").as("epochs_milli"))
    }),

    // materialized-view REFRESH over three arrival waves: bootstrap,
    // then two watermark-driven delta folds (each O(delta + state));
    // the final stored aggregate must equal a full recompute (q116's
    // oracle) — double-counted or dropped deltas break the hash.
    "q134_mv_refresh" -> ((s, dir) => {
      val base = tmp("q134")
      val fsp = new org.apache.hadoop.fs.Path(base)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      import graft.operators.IncrementalAgg.AggSpec
      val keys = Seq("user_id", "event_type")
      val specs = Seq(AggSpec.count("n"), AggSpec.sum("total", col("value")),
        AggSpec.min("vmin", col("value")), AggSpec.max("vmax", col("value")))
      val ev = t(s, dir, "events")
      def asOfDay(d: String) = ev.filter(col("ts") < to_timestamp(lit(d)))
      graft.operators.MaterializedView.refresh(
        s, base, asOfDay("2024-01-10"), "ts", keys, specs, "r1")
      graft.operators.MaterializedView.refresh(
        s, base, asOfDay("2024-01-20"), "ts", keys, specs, "r2")
      graft.operators.MaterializedView.refresh(
        s, base, ev, "ts", keys, specs, "r3")
      graft.operators.MaterializedView.read(s, base)
        .withColumn("avg_value", col("total") / col("n"))
    }),

    // CHANGE DATA FEED between table versions: commit v1, commit v2
    // (updates + deletes), then diff the two TIME-TRAVEL reads into the
    // exact I/U/D changelog — "what changed between version 1 and 2"
    // without any change tracking at write time (Delta-CDF semantics
    // from immutable snapshots + the row diff).
    "q135_change_feed" -> ((s, dir) => {
      val base = tmp("q135")
      val fsp = new org.apache.hadoop.fs.Path(base)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val log = new graft.sinks.SnapshotLog(s, s"$base/log")
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      val v1 = log.commit(Map("events" -> ev))
      val v2snap = ev.filter(col("event_id") % 11 =!= 0)
        .withColumn("value", when(col("event_id") % 5 === 0,
          col("value") + 100).otherwise(col("value")))
      val v2 = log.commit(Map("events" -> v2snap))
      graft.operators.SnapshotDiff.rowDiff(
        log.read("events", asOf = Some(v1)),
        log.read("events", asOf = Some(v2)), Seq("event_id"))
    }),

    // rollup TREE: the raw table is read ONCE (hourly grain); daily
    // derives from hourly and monthly from daily by re-keying the
    // already-reduced state and re-combining — associativity of the
    // algebraic merges, O(finer grain) per coarser level.
    "q137_rollup_tree" -> ((s, dir) => {
      import graft.operators.IncrementalAgg._
      val specs = Seq(AggSpec.count("n"), AggSpec.sum("sum_value", col("value")))
      val hourly = state(
        t(s, dir, "events").withColumn("bucket", date_trunc("hour", col("ts"))),
        Seq("event_type", "bucket"), specs)
      val daily = rollup(hourly,
        Seq("bucket" -> date_trunc("day", col("bucket"))),
        Seq("event_type"), specs)
      val monthly = rollup(daily,
        Seq("bucket" -> date_trunc("month", col("bucket"))),
        Seq("event_type"), specs)
      hourly.withColumn("grain", lit("hour"))
        .unionByName(daily.withColumn("grain", lit("day")))
        .unionByName(monthly.withColumn("grain", lit("month")))
        .select("grain", "event_type", "bucket", "n", "sum_value")
    }),

    // native session windows (aggregate face of q44's row-level
    // sessionize): per-user sessions closed by a 2-hour gap, window end
    // = last event + gap per Spark's session_window contract.
    "q136_session_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
        .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))),

    // CUBE grouping sets (q121's ROLLUP widened to every subset):
    // per-(type, day) cells, per-type and per-day subtotals, grand
    // total in ONE pass — Catalyst expands the grouping sets before the
    // shuffle, so it's still a single exchange with map-side combine.
    // grouping_id() disambiguates a NULL key from a subtotal row.
    "q138_cube_report" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .cube("event_type", "day")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum("value").as("sum_value"))),

    // PIVOT long→wide with an EXPLICIT value list: Spark skips the
    // extra distinct-values job and compiles to a two-stage aggregate —
    // a partial reduce on (user_id, type) cuts the fact table to
    // ≤ users×|values| rows BEFORE the wide-row shuffle, so the second
    // exchange moves only the reduced frame. (Open-ended pivot on a
    // high-cardinality column is the anti-pattern: a driver-side
    // distinct + one output column per value; the fixed list is the
    // 100 TB shape.)
    "q139_pivot_wide" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(sum("value"))),

    // UNPIVOT wide→long (melt): the inverse face over the SAME pivoted
    // frame — ids=user_id, the five per-type columns fold back into
    // (event_type, sum_value) rows; absent cells (NULL) are dropped so
    // the long shape equals the direct groupBy aggregate. Map-only on
    // top of the pivot's single shuffle.
    "q140_unpivot_long" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val wide = t(s, dir, "events")
        .groupBy("user_id").pivot("event_type", types).agg(sum("value"))
      wide.unpivot(Array(col("user_id")), types.map(col).toArray,
          "event_type", "sum_value")
        .filter(col("sum_value").isNotNull)
    }),

    // EXACT top-25 corpus words through bounded-state Misra-Gries
    // summaries: the map side never holds more than k=64 counters no
    // matter how many words stream through, the shuffle carries only
    // candidate rows, and one recount pass confined to the candidates
    // yields true counts — the runtime certificate (inside topExact)
    // refuses any answer the sketch cannot prove complete.
    "q141_heavy_hitters" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
      graft.operators.HeavyHitters.topExact(words, "word", m = 25, k = 64)
    }),

    // deterministic train/val/test split: band assignment over the
    // portable keyed hash — map-only, layout-independent, and stable
    // under corpus growth (a doc's split never flips when other docs
    // arrive), which is what keeps eval data out of training across
    // re-cuts.
    "q142_hash_split" -> ((s, dir) =>
      t(s, dir, "documents")
        .transform(Converters.hashSplit("doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .select("doc_id", "lang", "source", "split")),

    // ordered funnel: view → click → purchase per user, stage k counts
    // only at-or-after the earliest certified stage k-1. One exchange +
    // ONE sort carry all three running-min window passes; no self-joins,
    // no per-user collect_list.
    "q143_funnel_depth" -> ((s, dir) =>
      graft.operators.Funnel.depth(t(s, dir, "events"),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), tieCol = "event_id")),

    // cohort retention: users bucketed by first-seen day, activity
    // counted per (cohort, days-since) cell. The per-user min-day agg
    // and the join back are co-partitioned on user_id (exchange reuse),
    // then one cell-level agg — the standard retention matrix at any
    // scale.
    "q144_cohort_retention" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = e.groupBy("user_id").agg(min("day").as("cohort"))
      e.join(cohort, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("cohort")).cast("bigint").as("days_since"))
        .agg(countDistinct("user_id").as("n_users"))
    }),

    // fastText/CCNet-shaped corpus quality classifier: logistic
    // regression over hashed bag-of-words, trained full-batch with
    // momentum on a bounded sample, scored corpus-wide via one
    // broadcast weight join. The planted label (more 'slow' than
    // 'fast' mentions) is linearly separable, so the learned filter
    // must recover it — the query SELF-CERTIFIES that in-query (the
    // q158 raise_error pattern): corpus-wide accuracy of the learned
    // predictions against the planted rule must reach 95% (an
    // integer-exact 100·correct ≥ 95·n gate) or the row errors loudly.
    // The float scores stay out of the certified output; the planted
    // label itself is the DuckDB-checkable column.
    "q145_quality_classifier" -> ((s, dir) => {
      import graft.text.QualityClassifier
      val docs = t(s, dir, "documents").withColumn("label",
        (size(split(col("text"), "slow")) >
          size(split(col("text"), "fast"))).cast("int"))
      val m = QualityClassifier.train(docs, "doc_id", "text", "label",
        buckets = 4096, epochs = 100)
      val scored = QualityClassifier.score(docs, m, "doc_id", "text")
      val acc = broadcast(scored.agg(
        sum((col("quality_pred").cast("int") === col("label")).cast("long"))
          .as("__correct"),
        count(lit(1)).as("__n")))
      scored.crossJoin(acc)
        .withColumn("ok", when(
          col("__correct") * 100 >= col("__n") * 95, lit(true))
          .otherwise(raise_error(concat(
            lit("quality classifier failed the planted-rule gate: "),
            col("__correct"), lit("/"), col("__n"),
            lit(" correct (< 95%)")))))
        .select(col("doc_id"), col("label"), col("ok"))
    }),

    // cross-document training-sequence packing (the GPT dataloader
    // layout): the deterministic token stream cut into 512-token
    // sequences crossing doc boundaries — every token in exactly one
    // slot, assignment emitted as integer (doc, seq, offsets, length)
    // slices over ShardPack's DISTRIBUTED prefix sum, so the whole
    // layout is oracle-exact and no window ever sees the full corpus.
    "q146_seq_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
      graft.text.SeqPack.packSequences(docs, "doc_id", "n_toks", seqLen = 512L)
        .select("doc_id", "cum_before", "seq_id", "seq_pos", "doc_off",
          "n_tokens")
    }),

    // event-transition matrix (first-order Markov counts): next event
    // per user via ONE lead window (single shuffle + sort), then a
    // map-side-combined pair count — the "what do users do next"
    // report behind session analysis and anomaly baselines.
    "q147_transition_matrix" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
    }),

    // winsorize: clamp into the exact [p5, p95] percentile band using
    // the profile's integer-cut percentile math — the clip bounds are
    // engine-reproducible (no sketch drift), computed once over the
    // reduced (value, count) frame; the clip itself is map-only.
    // Quantized (floor) per the profile's bounded-domain contract.
    "q148_winsorize" -> ((s, dir) =>
      graft.operators.Profile.winsorize(
        t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_id"),
            floor(col("value")).cast("double").as("v")),
        "v", pLo = 5, pHi = 95, outCol = "v_clipped")),

    // grouped engine-exact percentiles: the cumulative window runs
    // PARTITIONED BY GROUP (as parallel as there are groups), over the
    // already-reduced (group, value, count) frame — per-type value
    // distribution report with integer-cut reproducible percentiles.
    "q149_grouped_percentiles" -> ((s, dir) =>
      graft.operators.Profile.groupedPercentiles(
        t(s, dir, "events")
          .select(col("event_type"), floor(col("value")).as("v")),
        "event_type", "v", ps = Seq(25, 50, 75, 95))),

    // label-centroid cosine (embedding outlier / label-noise detector):
    // integer-quantized vectors make the per-label sum vector exact,
    // and the 1/n of the mean cancels in the cosine — so the score is
    // bit-reproducible in any IEEE engine. One (label,pos) shuffle;
    // scoring is map-only HOFs behind a broadcast sum-vector join.
    "q150_centroid_cosine" -> ((s, dir) =>
      graft.ann.Centroids.centroidCosine(
        t(s, dir, "embeddings"), "label", "embedding")
        .select(col("vec_id"), col("label").cast("bigint").as("label"),
          col("cos_c"))),

    // the FULL corpus-to-training-data pipeline in one deterministic
    // composition: quality gate (token floor + repetition-loop cut) →
    // exact content dedup (min-id survivor) → train split (hash bands)
    // → per-source quota cap → cross-document sequence packing. Every
    // stage is the already-oracle-checked operator; this row proves
    // they COMPOSE — column threading, hash-order stability, and the
    // end-to-end (doc, sequence, offsets) assignment are all pinned
    // against one SQL derivation of the same pipeline.
    "q151_training_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val gated = docs
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("max_run", graft.text.TextStats.maxTokenRun(col("text")))
        .filter(col("n_toks") >= 30 && col("max_run") < 3)
      val deduped = gated
        .withColumn("__h", md5(col("text")))
        .transform(graft.operators.Dedup.keyDeltaTop1(
          Seq("__h"), Seq(col("doc_id").asc)))
        .drop("__h")
      val train = deduped
        .transform(Converters.hashSplit("doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .filter(col("split") === "train")
      val capped = graft.operators.QuotaCap
        .capPerKey(train, "source", "doc_id", n = 15)
      // stage boundary MATERIALIZED before packing: SeqPack's prefix
      // sum evaluates its input twice (documented in ShardPack — cheap
      // against a raw table's pruned columns, 2x the work against a
      // five-stage pipeline), so the selected corpus is written once
      // and packed from disk — the checkpointed-stage shape a 100 TB
      // pipeline uses between selection and layout anyway.
      val staged = tmp("q151")
      capped.select("doc_id", "source", "n_toks")
        .write.mode("overwrite").parquet(staged)
      graft.text.SeqPack.packSequences(
          s.read.parquet(staged), "doc_id", "n_toks", seqLen = 256L)
        .select("doc_id", "source", "seq_id", "seq_pos", "doc_off",
          "n_tokens")
    }),

    // per-source dataset card: the one-row-per-source summary a corpus
    // release ships (doc/token counts, language spread, size envelope,
    // repetition-clean rate) — one map-side-combined aggregate over
    // map-only signals, integer-exact end to end.
    "q152_dataset_card" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("max_run", graft.text.TextStats.maxTokenRun(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("total_tokens"),
          countDistinct("lang").as("n_langs"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"),
          sum(when(col("max_run") < 3, 1L).otherwise(0L)).as("clean_docs"))),

    // edit-distance fuzzy join (entity resolution): part names matched
    // against a corrupted copy (last char dropped) — blocked equi-join
    // on the 4-char prefix + levenshtein verify inside blocks, never
    // all-pairs; the block-degeneracy guard refuses a non-selective key.
    "q153_fuzzy_join" -> ((s, dir) => {
      val names = t(s, dir, "part").select("p_name")
      val mutated = names.distinct()
        .select(expr("substring(p_name, 1, length(p_name) - 1)").as("mut"))
      graft.operators.FuzzyJoin.join(names, mutated, "p_name", "mut",
        maxDist = 2, blockLen = 4)
    }),

    // EXACT set-similarity self-join (PPJoin prefix filtering): every
    // document pair with token-set Jaccard >= 0.95 — no false
    // negatives (the deterministic complement of MinHash-LSH), verify
    // integer-exact via cross-multiplication, candidates only from
    // rarest-first prefix tokens so hot tokens never explode the join.
    "q154_setsim_join" -> ((s, dir) =>
      graft.text.SetSimJoin.selfJoin(
        t(s, dir, "documents"), "doc_id", "text", thresholdPermille = 950)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("inter"), col("uni"))),

    // WITHIN-SESSION funnel (conversion inside one visit): 30-min gap
    // sessions assigned row-level by the sessionize lag/cumsum, then
    // the funnel recursion runs per (user, session) through the
    // composite-key window — both passes share one hash partitioning
    // on user_id.
    "q155_session_funnel" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val prev = lag(col("ts"), 1).over(byUser)
      val withSess = t(s, dir, "events")
        .withColumn("__opens", when(prev.isNull ||
          col("ts") > prev + expr("INTERVAL 30 MINUTE"), 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("__opens")).over(
          byUser.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
      graft.operators.Funnel.depth(withSess, Seq("user_id", "session_seq"),
        "ts", "event_type", Seq("view", "click", "purchase"), "event_id")
    }),

    // distribution drift between two time windows as EXACT
    // total-variation distance: integer/decimal-only cross-multiplied
    // permille — a drift gate that cannot flicker across engines or
    // partition orders (the shape complement to q106's volume drift).
    "q156_distribution_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"), col("ts"), floor(col("value")).as("bin"))
      val cut = to_timestamp(lit("2024-01-15 00:00:00"))
      graft.operators.DriftCheck.tvDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "bin", Seq("event_type"))
    }),

    // day-over-day drift TIME SERIES: each day's value distribution
    // TV-gated against the previous day's, all days in ONE tvDrift
    // call — side A keyed by its own day, side B re-keyed to day+1, so
    // the per-group machinery compares consecutive days; first/last
    // one-sided groups filter out. The monitoring feed a drift alert
    // subscribes to.
    "q157_drift_series" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(to_date(col("ts")).as("day"), floor(col("value")).as("bin"))
      val a = ev.withColumn("pair", col("day")).drop("day")
      val b = ev.withColumn("pair", date_add(col("day"), 1)).drop("day")
      graft.operators.DriftCheck.tvDrift(a, b, "bin", Seq("pair"))
        .filter(col("n_a") > 0 && col("n_b") > 0)
        .select(date_format(col("pair"), "yyyy-MM-dd").as("day"),
          col("n_a"), col("n_b"), col("tv_permille"))
    }),

    // COUNT DISTINCT through the rollup tree: plain counts re-merge
    // (q137), distinct counts can't — unless the stored partial state
    // is a SKETCH. Daily HLL sketches union into weekly estimates
    // without re-touching raw data (Datasketches hll_union_agg), and
    // the row SELF-CERTIFIES: the query recomputes the exact weekly
    // distinct and requires the estimate within 2%, so the oracle row
    // witnesses the sketch's accuracy, not just its existence.
    "q158_hll_rollup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .withColumn("week", date_trunc("week", col("ts")))
      val daily = ev.groupBy("week", "day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val weekly = daily.groupBy("week")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
      val exact = ev.groupBy("week")
        .agg(countDistinct("user_id").as("exact_users"))
      exact.join(weekly, "week")
        .withColumn("ok",
          abs(col("approx") - col("exact_users")) * 50 <= col("exact_users"))
        .withColumn("ok", when(col("ok"), col("ok")).otherwise(
          raise_error(concat(lit("HLL rollup off by >2%: "),
            col("approx"), lit(" vs "), col("exact_users")))))
        .select(date_format(col("week"), "yyyy-MM-dd").as("week"),
          col("exact_users"), col("ok"))
    }),

    // SCD-2 point-in-time read: the dimension AS OF a date via the
    // validity intervals alone — map-only filter, no snapshot store;
    // must equal the latest-per-key compaction of the changelog
    // truncated at that date (the oracle recomputes it that way).
    "q159_scd2_asof" -> ((s, dir) => {
      val ch = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"),
          col("value"), col("event_id"))
      val hist = graft.operators.Scd.scd2(ch, Seq("user_id"), "ts",
        delta = Seq(col("event_id").desc))
      graft.operators.Scd.asOf(hist,
          to_timestamp(lit("2024-01-15 00:00:00")))
        .select("user_id", "event_type", "value", "valid_from")
    }),

    // corpus concentration: Gini coefficient of token contribution
    // across sources, permille-exact by cross-multiplied integers —
    // G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending totals. The
    // ranking window runs over the ≤|sources| REDUCED totals (one
    // map-side-combined agg reduces the corpus first), so "how
    // dominated is the corpus by few sources" costs one aggregate.
    "q160_corpus_gini" -> ((s, dir) => {
      val perSource = t(s, dir, "documents")
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .groupBy("source").agg(sum("n_toks").as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("x"), col("source"))
      perSource
        .withColumn("i", row_number().over(w).cast("long"))
        .agg(count(lit(1)).as("n"), sum("x").as("total"),
          sum(col("i") * col("x")).as("iw"))
        .select(col("n"), col("total"),
          expr("(1000 * (2 * iw - (n + 1) * total)) div (n * total)")
            .cast("bigint").as("gini_permille"))
    }),
  )

  /** In-process Bulk API v1 simulator for q101 (zero-egress stand-in for
    * the Salesforce endpoint, like q51's REST endpoint and q80's ES):
    * PK-chunked job — the submitted batch parks NotProcessed, the given
    * chunk batches carry the CSV result payloads. */
  private def sfdcBulkSim(chunks: Map[String, Seq[String]])
      : com.sun.net.httpserver.HttpServer = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(status: Int, body: String): Unit = {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
      val seg = ex.getRequestURI.getPath.split('/')
        .filter(_.nonEmpty).dropWhile(_ != "job").toList
      (ex.getRequestMethod, seg) match {
        case ("POST", "job" :: Nil) => respond(200, """{"id":"j1"}""")
        case ("POST", "job" :: "j1" :: "batch" :: Nil) =>
          respond(200, """{"id":"b0","state":"Queued"}""")
        case ("GET", "job" :: "j1" :: "batch" :: Nil) =>
          val infos = """{"id":"b0","state":"NotProcessed"}""" +:
            chunks.keys.toSeq.sorted.map(b =>
              s"""{"id":"$b","state":"Completed"}""")
          respond(200, s"""{"batchInfo":[${infos.mkString(",")}]}""")
        case ("GET", "job" :: "j1" :: "batch" :: bid :: "result" :: Nil) =>
          respond(200, chunks(bid).indices
            .map(i => s""""r$i"""").mkString("[", ",", "]"))
        case ("GET", "job" :: "j1" :: "batch" :: bid :: "result" :: rid :: Nil) =>
          respond(200, chunks(bid)(rid.stripPrefix("r").toInt))
        case ("POST", "job" :: "j1" :: Nil) =>
          respond(200, """{"state":"Closed"}""")
        case other => respond(404, s"""{"err":"no route: $other"}""")
      }
    })
    srv.start()
    srv
  }

  /** Synthesized dataset-versions table for retention queries
    * (FIXTURES.md B: versions derived from orders). */
  private def versions(orders: DataFrame): DataFrame =
    orders.select(col("o_orderpriority").as("dataset"),
      col("o_orderdate").as("version_ts"),
      concat(lit("/v/"), col("o_orderkey")).as("path"))

  private def runFork(s: SparkSession, dir: String, branch: String): DataFrame = {
    val base = tmp(s"q14_$branch")
    val counts = Fork.run(
      t(s, dir, "orders"),
      Seq(
        Fork.Branch("a", Some(col("o_orderstatus") === "F"),
          _.select("o_orderkey", "o_totalprice"), s"$base/a", WriteSpec()),
        Fork.Branch("b", None,
          _.select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("datepartition")),
          s"$base/b", WriteSpec())),
      runId = s"verify_$branch")
    require(counts.values.forall(_.written >= 0))
    s.read.parquet(s"$base/$branch")
  }

  def oracleSql: Map[String, String] = Map(
    "q01_project" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
    "q02_filter" ->
      "SELECT * FROM orders WHERE o_orderstatus = 'F'",
    "q03_derive_partition" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%Y/%m/%d') AS datepartition FROM orders",
    "q04_flatmap_split" ->
      "SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS token FROM orders",
    "q05_sample" ->
      "SELECT * FROM lineitem WHERE l_orderkey % 10 < 2",
    "q06_dedup_delta" ->
      ("SELECT * EXCLUDE (rn) FROM (SELECT *, row_number() OVER (" +
        "PARTITION BY l_orderkey, l_linenumber ORDER BY l_shipdate DESC, " +
        "l_extendedprice DESC, l_quantity DESC, l_partkey, l_suppkey, " +
        "l_discount, l_tax, l_returnflag, l_linestatus) AS rn FROM lineitem) t " +
        "WHERE rn = 1"),
    "q07_dedup_exact" ->
      "SELECT DISTINCT * FROM lineitem",
    "q08_incremental" ->
      ("SELECT * FROM orders WHERE o_orderdate > TIMESTAMP '1995-06-01 00:00:00' " +
        "AND o_orderdate <= TIMESTAMP '1996-06-01 00:00:00'"),
    "q09_audit_window" ->
      ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, count(*) AS cnt " +
        "FROM events GROUP BY 1"),
    "q19_completeness_join" ->
      ("SELECT i.w AS w, i.ingested_cnt, a.audit_cnt, " +
        "i.ingested_cnt >= a.audit_cnt AS passed FROM " +
        "(SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) w, count(*) ingested_cnt " +
        "FROM events GROUP BY 1) i JOIN " +
        "(SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) w, count(*) audit_cnt " +
        "FROM events WHERE event_id % 2 = 0 GROUP BY 1) a USING (w)"),
    "q10_purge" ->
      "SELECT * FROM customer WHERE c_custkey % 7 <> 0",
    "q11_copy_diff" ->
      ("SELECT concat('/data/part_', p_partkey, '.parquet') AS path, " +
        "CAST(p_size AS BIGINT) AS length FROM part WHERE p_partkey % 3 = 0"),
    "q12_retention_newestk" ->
      ("SELECT * EXCLUDE (rn) FROM (SELECT o_orderpriority AS dataset, " +
        "o_orderdate AS version_ts, concat('/v/', o_orderkey) AS path, " +
        "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate DESC, " +
        "concat('/v/', o_orderkey) DESC) AS rn FROM orders) t WHERE rn <= 5"),
    "q17_retention_time" ->
      ("SELECT o_orderpriority AS dataset, o_orderdate AS version_ts, " +
        "concat('/v/', o_orderkey) AS path FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"),
    "q13_rowcount_policy" ->
      "SELECT count(*) AS in_cnt, count(*) AS out_cnt FROM lineitem",
    "q14_fork_a" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    "q14_fork_b" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS datepartition FROM orders",
    "q15_stream_window" ->
      ("SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS w_start, count(*) AS cnt " +
        "FROM events GROUP BY 1"),
    "q58_stream_enrich" ->
      ("SELECT user_id, event_id, user_id % 10 AS bucket FROM events"),
    "q16_partitioned_write" ->
      "SELECT *, strftime(o_orderdate, '%Y-%m') AS datepartition FROM orders",
    "q18_json_props" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events"),
    "q31_grok_parse" ->
      ("SELECT o_orderkey, regexp_extract(o_orderpriority, '(\\d+)-(\\w+)', 1) " +
        "AS prio_num, regexp_extract(o_orderpriority, '(\\d+)-(\\w+)', 2) " +
        "AS prio_name FROM orders"),
    "q32_regex_filter" ->
      "SELECT doc_id, lang, source FROM documents WHERE regexp_matches(text, 'spark')",
    "q33_csv_roundtrip" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem",
    "q34_orc_roundtrip" ->
      "SELECT * FROM supplier",
    "q35_jdbc_roundtrip" ->
      "SELECT * FROM nation",
    "q37_manifest_incremental" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 1",
    "q38_avro_roundtrip" ->
      "SELECT * FROM orders",
    "q39_envelope" ->
      "SELECT * FROM orders",
    "q42_late_recompact" ->
      "SELECT event_id, user_id, event_type FROM events",
    "q41_offset_ranges" ->
      ("SELECT event_id, (event_id % 4)::INT AS part, event_id // 4 AS off " +
        "FROM events WHERE (event_id % 4 = 0 AND event_id // 4 >= 100) " +
        "OR (event_id % 4 = 1 AND event_id // 4 >= 50) " +
        "OR (event_id % 4 = 2 AND event_id // 4 >= 25) " +
        "OR (event_id % 4 = 3)"),
    "q61_offset_resume" ->
      ("SELECT event_id, (event_id % 4)::INT AS part, event_id // 4 AS off " +
        "FROM events WHERE event_id // 4 >= 50"),
    "q63_pk_chunks" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    "q62_grok_wide" ->
      ("SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts, " +
        "'INFO' AS lvl, 'host' || (o_orderkey % 50) AS host, " +
        "'10.0.' || (o_orderkey % 256) || '.1' AS ip, " +
        "'user' || o_custkey AS \"user\", o_orderstatus AS status, " +
        "(o_orderkey % 10)::INT AS prio, o_totalprice AS price FROM orders"),
    "q40_codec_roundtrip" ->
      "SELECT doc_id, text AS text_gz, text AS text_aes FROM documents",
    "q20_docs_dedup_exact" ->
      "SELECT md5(text) AS content_hash, min(doc_id) AS doc_id FROM documents GROUP BY 1",
    "q21_minhash_pairs" ->
      ("WITH t AS (SELECT doc_id, list_distinct(" +
        "CASE WHEN len(string_split(text,' ')) < 3 THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+2],' ') " +
        "FOR i IN range(1, len(string_split(text,' '))-1)] END) AS sh " +
        "FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.sh,b.sh))::DOUBLE / " +
        "len(list_distinct(list_concat(a.sh,b.sh))) AS j " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id) " +
        "SELECT id_a, id_b, round(j, 6) AS jaccard_r FROM p WHERE j >= 0.5"),
    "q23_ngram_jaccard" ->
      ("SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(list_distinct(string_split(a.text, ' ')), " +
        "list_distinct(string_split(b.text, ' ')))) / " +
        "len(list_distinct(list_concat(string_split(a.text, ' '), " +
        "string_split(b.text, ' ')))) AS jaccard " +
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1"),
    "q24_langid" -> {
      val profiles = TextStats.langIdProfiles
      val scoreExprs = profiles.map { case (lang, words) =>
        lang -> ("len(list_intersect(string_split(text, ' '), [" +
          words.map(w => s"'$w'").mkString(",") + "]))")
      }
      val best = "greatest(" + scoreExprs.map(_._2).mkString(", ") + ")"
      val cases = scoreExprs.map { case (lang, e) =>
        s"WHEN $best > 0 AND $e = $best THEN '$lang'"
      }.mkString(" ")
      s"SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred FROM documents"
    },
    "q25_quality_score" -> {
      val stop = TextStats.defaultStopwords.map(w => s"'$w'").mkString(",")
      "SELECT doc_id, length(text) AS n_chars_calc, " +
        "len(string_split(text, ' ')) AS n_tokens, " +
        "CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) / " +
        "len(string_split(text, ' ')) AS avg_token_len, " +
        "CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) " +
        "AS DOUBLE) / length(text) AS punct_ratio, " +
        s"len(list_intersect(string_split(text, ' '), [$stop])) AS stopword_hits " +
        "FROM documents"
    },
    "q26_token_count" ->
      ("SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, " +
        "CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe FROM documents"),
    "q59_top_ngrams" ->
      ("WITH t AS (SELECT CASE WHEN len(string_split(text,' ')) < 2 " +
        "THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+1],' ') " +
        "FOR i IN range(1, len(string_split(text,' ')))] END AS sh " +
        "FROM documents) " +
        "SELECT ngram, count(*) AS cnt FROM " +
        "(SELECT unnest(sh) AS ngram FROM t) " +
        "GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 50"),
    "q60_snapshot_commit" ->
      ("SELECT 'low@2' AS src, o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice < 100000 AND o_orderstatus = 'F' " +
        "UNION ALL SELECT 'high' AS src, o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice >= 100000 " +
        "UNION ALL SELECT 'low@1' AS src, o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice < 100000"),
    "q57_text_normalize" ->
      ("SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), " +
        "'[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')) AS norm_text, " +
        "round(1.0 - len(list_distinct(string_split(text, ' ')))::DOUBLE / " +
        "len(string_split(text, ' ')), 6) AS rep_ratio FROM documents"),
    "q36_dup_clusters" ->
      ("WITH RECURSIVE t AS (SELECT doc_id, list_distinct(" +
        "CASE WHEN len(string_split(text,' ')) < 3 THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+2],' ') " +
        "FOR i IN range(1, len(string_split(text,' '))-1)] END) AS sh " +
        "FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.sh,b.sh))::DOUBLE / " +
        "len(list_distinct(list_concat(a.sh,b.sh))) >= 0.5), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM p " +
        "UNION SELECT id_b, id_a FROM p), " +
        "reach(a, b) AS (SELECT src, dst FROM edges " +
        "UNION SELECT r.a, e.dst FROM reach r JOIN edges e " +
        "ON e.src = r.b WHERE e.dst <> r.a), " +
        "cl AS (SELECT a, least(a, min(b)) AS cluster_id FROM reach GROUP BY a) " +
        "SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id " +
        "FROM documents d LEFT JOIN cl ON cl.a = d.doc_id"),
    "q22_simhash" ->
      ("WITH h AS (SELECT doc_id, " +
        "[('0x' || substr(md5(t),1,15))::BIGINT FOR t IN string_split(text,' ')] AS hs " +
        "FROM documents) " +
        "SELECT doc_id, list_sum([CASE WHEN " +
        "list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END FOR h IN hs]) > 0 " +
        "THEN 1::BIGINT << j ELSE 0 END FOR j IN range(60)])::BIGINT AS simhash " +
        "FROM h"),
    "q27_fingerprint" ->
      ("SELECT doc_id, list_reduce(list_prepend(1000003::BIGINT, " +
        "[('0x' || substr(md5(t),1,15))::BIGINT % 2147483647 " +
        "FOR t IN string_split(text,' ')]), " +
        "(acc, h) -> (acc*1000003 + h) % 2147483647) AS fingerprint " +
        "FROM documents"),
    "q29_ann_lsh" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv " +
        "FROM embeddings WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 10"),
    "q30_multimodal_features" ->
      ("SELECT doc_id AS media_id, " +
        "['image','audio','video'][(doc_id % 3)::INT + 1] AS media_type, " +
        "(strlen(text) % 1024 + 16)::BIGINT AS width, " +
        "((strlen(text) // 7) % 1024 + 16)::BIGINT AS height, " +
        "(CASE WHEN doc_id % 3 = 2 THEN strlen(text) % 300 + 1 " +
        "ELSE 1 END)::BIGINT AS n_frames FROM documents"),
    "q43_embed_neardup" ->
      ("WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "e AS (SELECT vec_id, v FROM base UNION ALL " +
        "SELECT vec_id + 1000000, [v[i] * (1 + 0.01 * ((i - 1) % 7 - 3)) " +
        "FOR i IN range(1, len(v) + 1)] FROM base), " +
        "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "list_dot_product(a.v,b.v) / (sqrt(list_dot_product(a.v,a.v)) * " +
        "sqrt(list_dot_product(b.v,b.v))) AS cosine " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
        "SELECT id_a, id_b, round(cosine, 6) AS cosine_r FROM p " +
        "WHERE cosine >= 0.9"),
    "q44_sessionize" ->
      ("WITH g AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts > lag(ts) OVER w + INTERVAL 2 HOUR THEN 1 ELSE 0 END AS ns " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id " +
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq FROM g) " +
        "SELECT user_id, session_seq::BIGINT AS session_seq, " +
        "CAST(min(ts) AS TIMESTAMP) AS session_start, " +
        "CAST(max(ts) AS TIMESTAMP) AS session_end, count(*) AS n_events " +
        "FROM s GROUP BY user_id, session_seq"),
    "q45_bucketed_join" ->
      ("SELECT o_orderkey, sum(l_quantity) AS sum_qty, " +
        "max(o_totalprice) AS max_total, count(*) AS n " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderkey"),
    "q46_date_prune" ->
      ("SELECT event_id, user_id FROM events " +
        "WHERE CAST(ts AS DATE) > DATE '2024-01-10'"),
    "q47_ivf_ann" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 10"),
    // identical contract to q47: the persisted-index path must return the
    // exact top-k over the same derived clustered corpus
    "q64_ivf_indexed" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 10"),
    "q65_components_distributed" ->
      ("WITH RECURSIVE ids AS (SELECT doc_id AS d FROM documents), " +
        "n AS (SELECT count(*) AS n FROM documents), " +
        "ch AS (SELECT d AS id_a, d + 1 AS id_b FROM ids, n " +
        "WHERE d % 10 <> 9 AND d < n - 1), " +
        "ov AS (SELECT d AS id_a, (d * 31) % n AS id_b FROM ids, n " +
        "WHERE d % 97 = 0), " +
        "p AS (SELECT * FROM ch UNION ALL SELECT * FROM ov), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM p " +
        "UNION SELECT id_b, id_a FROM p), " +
        "reach(a, b) AS (SELECT src, dst FROM edges " +
        "UNION SELECT r.a, e.dst FROM reach r JOIN edges e " +
        "ON e.src = r.b WHERE e.dst <> r.a), " +
        "cl AS (SELECT a, least(a, min(b)) AS cluster_id FROM reach GROUP BY a) " +
        "SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id " +
        "FROM documents d LEFT JOIN cl ON cl.a = d.doc_id"),
    "q66_hll_completeness" ->
      ("WITH s AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) " +
        "AS TIMESTAMP) AS w, count(*) AS n_expected, " +
        "count(DISTINCT event_id) AS src_d FROM events GROUP BY 1), " +
        "i AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) " +
        "AS TIMESTAMP) AS w, count(*) AS n_ingested, " +
        "count(DISTINCT event_id) AS ing_d FROM events " +
        "WHERE NOT (event_id % 2 = 0 AND day(ts) % 5 = 0) GROUP BY 1) " +
        "SELECT w, n_expected, n_ingested, " +
        "ing_d * 1.0 / src_d >= 0.75 AS passed FROM s JOIN i USING (w)"),
    "q51_rest_pages" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "q52_catalog_register" ->
      ("SELECT event_id, user_id, event_type, strftime(ts, '%Y-%m-%d') AS dt " +
        "FROM events"),
    "q53_histogram_chunks" ->
      "SELECT * FROM orders",
    "q56_jdbc_bulk" ->
      "SELECT * FROM orders",
    "q54_copy_exec" ->
      "SELECT * FROM supplier",
    "q252_copy_unpack" ->
      "SELECT s_suppkey, s_name, s_nationkey FROM supplier",
    "q55_purge_partitions" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE c_custkey % 7 <> 0"),
    "q49_salted_join" ->
      ("SELECT o_orderpriority, sum(l_quantity) AS sum_qty, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority"),
    "q50_frame_sample" ->
      ("SELECT doc_id AS media_id, " +
        "unnest(range(0, (strlen(text) % 300 + 1)::BIGINT, 7)) AS frame_idx " +
        "FROM documents WHERE doc_id % 3 = 2"),
    "q48_stratified_sample" ->
      ("SELECT doc_id, lang, source FROM documents " +
        "WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < " +
        "CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 20 ELSE 10 END"),
    "q67_incremental_dedup" ->
      ("WITH batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0 " +
        "UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 8 = 1 " +
        "UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 8 = 4), " +
        "committed AS (SELECT DISTINCT md5(text) AS h FROM documents " +
        "WHERE doc_id % 4 <> 0) " +
        "SELECT md5(text) AS content_hash, min(doc_id) AS doc_id FROM batch " +
        "WHERE md5(text) NOT IN (SELECT h FROM committed) GROUP BY 1"),
    "q68_gopher_repetition" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN len(string_split(text,' ')) < 2 " +
        "THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+1],' ') " +
        "FOR i IN range(1, len(string_split(text,' ')))] END AS sh " +
        "FROM documents), " +
        "c AS (SELECT doc_id, unnest(sh) AS g FROM t), " +
        "cnt AS (SELECT doc_id, g, count(*) AS cnt FROM c GROUP BY 1, 2) " +
        "SELECT doc_id, " +
        "round(max(cnt) * 1.0 / sum(cnt), 6) AS top_bigram_frac, " +
        "round(1.0 - count(*) * 1.0 / sum(cnt), 6) AS dup_bigram_frac " +
        "FROM cnt GROUP BY doc_id"),
    "q69_pii_redact" ->
      ("WITH inj AS (SELECT doc_id, text || ' contact user' || doc_id || " +
        "'@example.com via 10.' || (doc_id % 200) || '.0.1' AS it " +
        "FROM documents) " +
        "SELECT doc_id, " +
        "regexp_replace(regexp_replace(regexp_replace(it, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), " +
        "'\\+?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g') AS redacted, " +
        "len(regexp_extract_all(it, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email, " +
        "len(regexp_extract_all(it, " +
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ip " +
        "FROM inj"),
    "q70_tfidf_topk" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term " +
        "FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), " +
        "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT count(*) * 1.0 AS n FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.term, tf.tf * (n.n / dfq.df) AS score " +
        "FROM tf JOIN dfq USING (term), n) " +
        "SELECT doc_id, term, round(score, 6) AS score_r, rk FROM " +
        "(SELECT doc_id, term, score, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY score DESC, term) AS rk FROM sc) WHERE rk <= 3"),
    "q73_lsh_index_neardup" ->
      ("WITH t AS (SELECT doc_id, list_distinct(" +
        "CASE WHEN len(string_split(text,' ')) < 3 THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+2],' ') " +
        "FOR i IN range(1, len(string_split(text,' '))-1)] END) AS sh " +
        "FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.sh,b.sh))::DOUBLE / " +
        "len(list_distinct(list_concat(a.sh,b.sh))) AS j " +
        "FROM t a JOIN t b ON a.doc_id % 4 <> 0 AND b.doc_id % 4 = 0) " +
        "SELECT id_a, id_b, round(j, 6) AS jaccard_r FROM p WHERE j >= 0.5"),
    "q74_schema_evolve" ->
      ("SELECT CAST(CAST(l_quantity AS FLOAT) AS DOUBLE) AS l_quantity, " +
        "l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
        "CAST(NULL AS VARCHAR) AS note FROM lineitem"),
    "q78_partial_commit" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    "q80_es_bulk_roundtrip" ->
      "SELECT s_suppkey, s_name, s_acctbal FROM supplier",
    // the records parsed back off the Event Hubs wire must equal the source
    "q161_eventhub_publish" ->
      "SELECT s_suppkey, s_name, s_acctbal FROM supplier",
    // double-published KV upserts land exactly one doc per key
    "q162_couchbase_upsert" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // every page the recursive partitioner must discover + the
    // deterministic metrics the endpoint serves for it
    "q163_webmaster_pages" ->
      ("SELECT 'g/' || lang || '/' || doc_id AS page, " +
        "(doc_id % 97)::BIGINT AS clicks, " +
        "(doc_id % 1009 + 1)::BIGINT AS impressions, " +
        "(doc_id % 500) / 10.0 AS position FROM documents"),
    // the 3-file SFTP drop parsed back losslessly (incrementality is
    // certified in-query: the post-commit re-plan must be empty)
    "q164_sftp_drop" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part",
    // the 4-file two-folder Drive drop, recursively listed and parsed
    // back losslessly (paged listings; post-commit re-plan empty)
    "q165_gdrive_drop" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    // the async GA unsampled report downloaded from Drive and parsed
    // back losslessly (lifecycle certified in-query)
    "q166_ga_unsampled" ->
      "SELECT c_custkey, c_name, c_nationkey FROM customer",
    // the AQuA batch-query export parsed back losslessly
    "q167_zuora_aqua" ->
      "SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size FROM part",
    // mirrors SubstringDedup.stats exactly: plant prefix copies, hash
    // every 20-token window with the portable md5 fingerprint, keeper =
    // min(doc) per fingerprint, merged-span coverage via the lag gap
    "q168_substring_dedup" ->
      ("WITH base AS (SELECT doc_id, text FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 40), " +
        "corpus AS (SELECT doc_id, text FROM base UNION ALL " +
        "SELECT doc_id + 1000000, " +
        "array_to_string((string_split(text, ' '))[1:30], ' ') " +
        "FROM base WHERE doc_id % 5 = 0), " +
        "tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus), " +
        "g AS (SELECT doc_id, i AS pos, ('0x' || substr(md5(" +
        "array_to_string(w[i:i+19], ' ')), 1, 15))::BIGINT AS h " +
        "FROM tok, UNNEST(CASE WHEN len(w) >= 20 THEN " +
        "range(1, len(w) - 18) ELSE []::BIGINT[] END) AS t(i)), " +
        "keep AS (SELECT h, min(doc_id) AS keeper FROM g GROUP BY 1), " +
        "dup AS (SELECT g.doc_id, g.pos FROM g JOIN keep USING (h) " +
        "WHERE g.doc_id > keep.keeper), " +
        "cov AS (SELECT doc_id, pos, pos - lag(pos) OVER " +
        "(PARTITION BY doc_id ORDER BY pos) AS gap FROM dup), " +
        "agg AS (SELECT doc_id, count(*)::BIGINT AS dup_windows, " +
        "sum(least(COALESCE(gap, 20), 20))::BIGINT AS dup_tokens " +
        "FROM cov GROUP BY 1), " +
        "n AS (SELECT doc_id, greatest(len(string_split(text, ' ')) - 19, 0)::BIGINT " +
        "AS n_grams FROM corpus) " +
        "SELECT n.doc_id, n_grams, COALESCE(dup_windows, 0)::BIGINT AS dup_windows, " +
        "COALESCE(dup_tokens, 0)::BIGINT AS dup_tokens " +
        "FROM n LEFT JOIN agg USING (doc_id) WHERE n_grams > 0"),
    // the enveloped record decodes back byte-exactly and the embedded
    // metadata id is the md5 of the canonical metadata JSON — DuckDB
    // recomputes it from the same canonical string
    "q169_meta_envelope" ->
      ("SELECT doc_id, text, md5('{\"dataset-level\":{" +
        "\"Content-Type\":\"graft+recordWithMetadata\"," +
        "\"Dataset-URN\":\"urn:graft:documents\"," +
        "\"Inner-Content-Type\":\"text/plain\"," +
        "\"Transfer-Encoding\":[\"identity\"]},\"file-level\":{}}') " +
        "AS m_id FROM documents"),
    // per-record lookup enrichment: the endpoint lowercases the
    // segment, a pure function DuckDB recomputes
    "q170_http_enrich" ->
      ("SELECT c_custkey, CAST(200 AS BIGINT) AS http_status, " +
        "lower(c_mktsegment) AS http_response FROM customer"),
    "q172_value_audit" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))" +
        "::BIGINT % 1000000 < 250000"),
    // the diff's planted corruption is a pure function of o_orderkey,
    // so DuckDB recomputes every count: keys %101==0 exist only in the
    // PULL-phase audit; o_totalprice mismatches are the %97==0 keys
    // that survived; o_orderstatus was never corrupted
    "q173_value_audit_diff" ->
      ("WITH m AS (SELECT " +
        "count(*) FILTER (WHERE o_orderkey % 101 = 0)::BIGINT AS only_a, " +
        "count(*) FILTER (WHERE o_orderkey % 97 = 0 " +
        "AND o_orderkey % 101 <> 0)::BIGINT AS tp_mism FROM orders) " +
        "SELECT 'o_orderstatus' AS col_name, 0::BIGINT AS mismatches, " +
        "only_a AS only_in_a, 0::BIGINT AS only_in_b FROM m " +
        "UNION ALL SELECT 'o_totalprice', tp_mism, only_a, 0::BIGINT FROM m"),
    // the decade-star components resolve to cluster = decade head, and
    // the split is the banded portable hash OF THE CLUSTER id — DuckDB
    // recomputes both, so any per-doc (leaky) assignment hash-mismatches
    "q174_leaksafe_split" ->
      ("SELECT doc_id, cluster_id, CASE WHEN h < 80 THEN 'train' " +
        "WHEN h < 90 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT doc_id, doc_id - doc_id % 10 AS cluster_id, " +
        "('0x' || substr(md5(CAST(doc_id - doc_id % 10 AS VARCHAR)),1,15))" +
        "::BIGINT % 100 AS h FROM documents)"),
    // planted score (n_chars) and label (doc_id%3==0) are pure SQL, so
    // DuckDB recomputes all four confusion cells at every grid point
    "q175_calibration_curve" ->
      ("WITH g AS (SELECT CAST(n_chars AS DOUBLE) AS s, " +
        "(doc_id % 3 = 0) AS y FROM documents), " +
        "t(threshold) AS (VALUES (0.0),(100.0),(500.0),(1000.0),(5000.0)) " +
        "SELECT threshold, " +
        "count(*) FILTER (WHERE s >= threshold AND y)::BIGINT AS tp, " +
        "count(*) FILTER (WHERE s >= threshold AND NOT y)::BIGINT AS fp, " +
        "count(*) FILTER (WHERE s < threshold AND y)::BIGINT AS fn, " +
        "count(*) FILTER (WHERE s < threshold AND NOT y)::BIGINT AS tn " +
        "FROM g, t GROUP BY threshold"),
    // exact brute-force top-5 over the same derived clustered corpus —
    // the IVF-confined graph must equal it (q47's recall-1.0 contract,
    // extended to every vector as a source)
    "q176_knn_graph" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "scored AS (SELECT a.vec_id AS src_id, b.vec_id AS neighbor_id, " +
        "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * " +
        "sqrt(list_dot_product(b.v, b.v))) AS cosine " +
        "FROM e a, e b WHERE a.vec_id <> b.vec_id) " +
        "SELECT src_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY src_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) " +
        "WHERE rank <= 5"),
    // components of the mutual kNN graph = the planted classes, whose
    // min vec_id is the class index
    "q177_semantic_clusters" ->
      "SELECT vec_id, vec_id % 16 AS cluster_id FROM embeddings",
    // exact integer TV over the class histogram (bins = classes, since
    // the in-query gate certified the class<->cell bijection)
    "q178_embedding_drift" ->
      ("WITH c AS (SELECT vec_id % 16 AS cls, count(*)::BIGINT AS ca " +
        "FROM embeddings GROUP BY cls), " +
        "t AS (SELECT sum(ca)::BIGINT AS na, " +
        "sum(CASE WHEN cls >= 4 THEN ca ELSE 0 END)::BIGINT AS nb FROM c), " +
        "s AS (SELECT sum(abs(ca * (SELECT nb FROM t) - " +
        "(CASE WHEN cls >= 4 THEN ca ELSE 0 END) * (SELECT na FROM t)))" +
        "::BIGINT AS d FROM c) " +
        "SELECT na AS n_a, nb AS n_b, (500 * d) // (na * nb) AS tv_permille " +
        "FROM t, s"),
    // the q64 exact-top-k contract, reached through the incremental
    // init/append/replay lifecycle instead of one static build
    // the folded index (q187) must answer byte-identically to the
    // unfolded incremental one (q179): both share this exact-search oracle
    "q187_ivf_compact" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 10"),
    "q179_ivf_incremental" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 10"),
    // the same constructed pages, the same line/page rules as string
    // pure functions (DuckDB lambdas; 'g' flag = Spark's global replace)
    "q180_c4_line_clean" ->
      ("WITH m AS (SELECT doc_id, " +
        "'A first proper sentence line.' || chr(10) || text || chr(10) || " +
        "'enable javascript to continue.' || chr(10) || " +
        "'Too short.' || chr(10) || " +
        "'Another perfectly fine line!' || chr(10) || " +
        "CASE WHEN doc_id % 7 = 0 THEN 'sprinkled lorem ipsum here.' " +
        "ELSE 'A clean closing line?' END || " +
        "CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'code { brace.' " +
        "ELSE '' END || " +
        "CASE WHEN doc_id % 13 = 0 THEN chr(10) || " +
        "'This mentions contraband openly.' ELSE '' END AS t " +
        "FROM documents), " +
        "c AS (SELECT doc_id, array_to_string(list_filter(" +
        "string_split(t, chr(10)), x -> " +
        "regexp_matches(trim(x), '[.!?]\"?$') AND " +
        "len(regexp_split_to_array(trim(x), '\\s+')) >= 3 AND " +
        "NOT contains(lower(trim(x)), 'javascript')), chr(10)) AS text " +
        "FROM m) " +
        "SELECT doc_id, text FROM c WHERE " +
        "length(regexp_replace(text, '[^.!?]', '', 'g')) >= 3 AND " +
        "NOT contains(lower(text), 'lorem ipsum') AND " +
        "NOT contains(text, '{') AND " +
        "NOT regexp_matches(lower(text), '\\b(?:contraband)\\b')"),
    // identical list pipeline: split -> trim -> drop empties ->
    // distinct; every signal integer, gate cross-multiplied
    "q181_dup_segments" ->
      ("WITH m AS (SELECT doc_id, " +
        "'A recurring boilerplate footer line' || chr(10) || text || " +
        "chr(10) || CASE WHEN doc_id % 3 = 0 THEN " +
        "'A recurring boilerplate footer line' || chr(10) || " +
        "'A recurring boilerplate footer line' " +
        "ELSE 'unique tail ' || doc_id END AS t FROM documents), " +
        "s AS (SELECT doc_id, list_filter(list_transform(" +
        "string_split(t, chr(10)), x -> trim(x)), x -> length(x) > 0) " +
        "AS segs FROM m), " +
        "v AS (SELECT doc_id, len(segs)::BIGINT AS n_segments, " +
        "len(list_distinct(segs))::BIGINT AS n_distinct_segments, " +
        "list_sum(list_transform(segs, x -> length(x)))::BIGINT " +
        "AS seg_chars, " +
        "list_sum(list_transform(list_distinct(segs), x -> length(x)))" +
        "::BIGINT AS distinct_seg_chars FROM s) " +
        "SELECT doc_id, n_segments, n_distinct_segments, seg_chars, " +
        "distinct_seg_chars, " +
        "((n_segments - n_distinct_segments) * 100 <= n_segments * 30 " +
        "AND (seg_chars - distinct_seg_chars) * 100 <= seg_chars * 20) " +
        "AS kept FROM v"),
    // same portable doc hash, same per-stratum rank, same cluster
    // quarantine — every role recomputed
    "q182_eval_carve" ->
      ("WITH c AS (SELECT doc_id, lang, doc_id - doc_id % 10 AS cluster_id, " +
        "('0x' || substr(md5('eval:' || CAST(doc_id AS VARCHAR)),1,15))" +
        "::BIGINT AS h FROM documents), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang " +
        "ORDER BY h, doc_id) AS rn FROM c), " +
        "ec AS (SELECT DISTINCT cluster_id FROM r WHERE rn <= 5) " +
        "SELECT doc_id, lang, cluster_id, " +
        "CASE WHEN rn <= 5 THEN 'eval' WHEN cluster_id IN " +
        "(SELECT cluster_id FROM ec) THEN 'quarantine' " +
        "ELSE 'train' END AS role FROM r"),
    "q183_corpus_report" ->
      ("WITH a AS (SELECT source, count(*)::BIGINT AS n_docs, " +
        "sum(length(text))::BIGINT AS chars, " +
        "sum(len(string_split(text, ' ')))::BIGINT AS tokens, " +
        "sum(CAST(ceil(length(text) / 4.0) AS BIGINT))::BIGINT " +
        "AS tokens_bpe_est, " +
        "count(DISTINCT lang)::BIGINT AS n_langs " +
        "FROM documents GROUP BY source) " +
        "SELECT source, n_docs, chars, tokens, tokens_bpe_est, n_langs, " +
        "CAST((chars * 1000) // (SELECT sum(chars) FROM a) AS BIGINT) " +
        "AS char_share_permille FROM a"),
    // replay the affine int8 coding (q82's expressions), reconstruct,
    // then the q47 exact-top-k contract over the RECONSTRUCTED corpus
    "q184_ivf_sq8" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "b AS (SELECT vec_id, v, list_aggregate(v, 'min') AS mn, " +
        "list_aggregate(v, 'max') AS mx FROM e), " +
        "c AS (SELECT vec_id, v, mn, mx, (mx - mn)/255.0 AS sc FROM b), " +
        "d AS (SELECT vec_id, mn, mx, sc, list_transform(v, x -> " +
        "CASE WHEN sc = 0 THEN 0 " +
        "ELSE CAST(floor((x - mn)/sc + 0.5) AS INTEGER) - 128 END) " +
        "AS codes FROM c), " +
        "r AS (SELECT vec_id, list_transform(codes, q -> " +
        "(CAST(q AS DOUBLE) + 128) * sc + mn) AS rv FROM d), " +
        "qs AS (SELECT e.vec_id AS query_id, e.v AS qv FROM e " +
        "WHERE e.vec_id < 5), " +
        "cs AS (SELECT vec_id AS neighbor_id, rv AS cv FROM r), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM qs, cs " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) " +
        "WHERE rank <= 10"),
    // the Spark side generates PNGs whose dims derive from doc_id and
    // decodes them back through the REAL JDK codec; the oracle recomputes
    // the dims formula — any codec-path fault diverges the hash
    "q185_image_decode" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 32)::BIGINT AS width, " +
        "(16 + doc_id % 24)::BIGINT AS height, 1::BIGINT AS n_frames " +
        "FROM documents"),
    // q185's dims arithmetic through REAL VP8L decodes
    "q262_webp_decode" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 32)::BIGINT AS width, " +
        "(16 + doc_id % 24)::BIGINT AS height, 1::BIGINT AS n_frames " +
        "FROM documents"),
    // ID3v2+ID3v1 on % 4 = 0, ID3v1 alone on % 4 = 2
    "q267_mp3_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN 2 WHEN doc_id % 4 = 2 THEN 1 " +
        "ELSE 0 END::INT AS n_stripped, " +
        "doc_id % 4 IN (0, 2) AS had_metadata FROM documents"),
    // cue k of doc id spans [k*2000 + (id%5)*100, +1500] ms
    "q268_caption_cues" ->
      ("SELECT doc_id AS media_id, s.s::INT AS seq, " +
        "(s.s*2000 + (doc_id % 5)*100)::BIGINT AS t_start_ms, " +
        "(s.s*2000 + (doc_id % 5)*100 + 1500)::BIGINT AS t_end_ms " +
        "FROM documents JOIN (SELECT * FROM generate_series(0,3) s(s)) s " +
        "ON s.s <= doc_id % 4"),
    // Artist + GPS sub-IFD on % 4 = 0, Artist alone on % 4 = 2
    "q264_tiff_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN 2 WHEN doc_id % 4 = 2 THEN 1 " +
        "ELSE 0 END::INT AS n_stripped, " +
        "doc_id % 4 IN (0, 2) AS had_metadata FROM documents"),
    // q233's bucket arithmetic over TIFF IFD dims
    "q265_tiff_aspect_buckets" ->
      ("WITH s AS (SELECT doc_id, (16 + doc_id % 32)::INT AS w, " +
        "(16 + doc_id % 24)::INT AS h FROM documents), " +
        "d AS (SELECT doc_id, w, h, abs(w*1 - h*1) AS d0, " +
        "abs(w*3 - h*4) AS d1, abs(w*4 - h*3) AS d2, " +
        "abs(w*9 - h*16) AS d3, abs(w*16 - h*9) AS d4 FROM s) " +
        "SELECT doc_id AS media_id, w AS width, h AS height, " +
        "CASE WHEN d0*3 <= d1*1 AND d0*4 <= d2*1 AND d0*9 <= d3*1 " +
        "AND d0*16 <= d4*1 THEN '1:1' " +
        "WHEN d1*4 <= d2*3 AND d1*9 <= d3*3 AND d1*16 <= d4*3 THEN '4:3' " +
        "WHEN d2*9 <= d3*4 AND d2*16 <= d4*4 THEN '3:4' " +
        "WHEN d3*16 <= d4*9 THEN '16:9' ELSE '9:16' END AS bucket FROM d"),
    // q185's dims arithmetic through REAL JDK TIFF decodes
    "q266_tiff_decode" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 32)::BIGINT AS width, " +
        "(16 + doc_id % 24)::BIGINT AS height, 1::BIGINT AS n_frames " +
        "FROM documents"),
    // the PNG corpus transcoded to VP8L keeps its dims exactly
    "q263_webp_transcode" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 32)::BIGINT AS width, " +
        "(16 + doc_id % 24)::BIGINT AS height, 1::BIGINT AS n_frames " +
        "FROM documents"),
    "q186_image_resize" ->
      ("SELECT doc_id AS media_id, 24::BIGINT AS width, " +
        "18::BIGINT AS height, true AS content_nontrivial FROM documents"),
    // planted duplicate groups: content is a pure function of
    // doc_id % 25, so the perceptual-hash groups must recover it
    "q188_image_exact_dedup" ->
      ("SELECT doc_id AS media_id, (doc_id % 25)::BIGINT AS group_rep " +
        "FROM documents WHERE (doc_id // 25) % 2 = 0"),
    "q189_image_neardup" ->
      ("SELECT doc_id AS media_id, (doc_id % 25)::BIGINT AS cluster_id " +
        "FROM documents"),
    "q190_audio_decode" ->
      ("SELECT doc_id AS media_id, (400 + doc_id % 800)::BIGINT AS n_frames, " +
        "((400 + doc_id % 800) * 1000 // 8000)::BIGINT AS duration_ms, " +
        "true AS energy_sane FROM documents"),
    "q192_image_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 25) < 5 AS contaminated " +
        "FROM documents"),
    // unperturbed renders are a pure function of the base id, so the
    // survivor set is doc_id arithmetic: new bases (25..49), min id per
    // base among the batch's unperturbed copies
    "q193_image_incremental_dedup" ->
      ("SELECT min(doc_id) AS media_id FROM documents " +
        "WHERE doc_id >= 250 AND doc_id % 50 >= 25 " +
        "AND (doc_id // 50) % 2 = 0 GROUP BY doc_id % 50"),
    "q194_audio_dedup" ->
      ("SELECT doc_id AS media_id, (doc_id % 20)::BIGINT AS group_rep " +
        "FROM documents"),
    // three rendering kinds per pitch group (base / half-volume /
    // detuned) all land in the base's cluster; min member id per group
    // is the base id itself
    "q195_audio_neardup" ->
      ("SELECT doc_id AS media_id, (doc_id % 20)::BIGINT AS cluster_id " +
        "FROM documents"),
    // perturbed copies cluster with their base; min member id per
    // texture group is the base id itself
    "q197_video_neardup" ->
      ("SELECT doc_id AS media_id, (doc_id % 20)::BIGINT AS cluster_id " +
        "FROM documents"),
    "q198_audio_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 20) < 5 AS contaminated " +
        "FROM documents"),
    // first-seen admission: batch 0 carries all 25 base contents, whose
    // min ids are exactly 0..24
    "q201_stream_media_dedup" ->
      ("SELECT doc_id AS media_id FROM documents WHERE doc_id < 25"),
    // batch 0 admits the 10 base clips; the trimmed (batch 1) and
    // silence-padded (batch 2) re-uploads are refused on >= 2 committed
    // hop-aligned window values despite fresh whole-clip fingerprints
    "q238_stream_part_admission" ->
      ("SELECT doc_id AS media_id FROM documents WHERE doc_id < 10"),
    "q202_video_frame_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 20) < 5 AS contaminated " +
        "FROM documents"),
    "q206_video_overlap" ->
      ("SELECT doc_id AS media_id, (doc_id % 20)::BIGINT AS cluster_id " +
        "FROM documents"),
    // trimmed + padded renders share >= 2 hop-aligned windows with
    // their base; min member id per group is the group index itself
    "q207_audio_shift" ->
      ("SELECT doc_id AS media_id, (doc_id % 10)::BIGINT AS cluster_id " +
        "FROM documents"),
    // eval = trimmed renders of groups 0..4; every base and padded
    // corpus render of those groups shares >= 2 hop-aligned windows
    "q210_audio_window_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 10) < 5 AS contaminated " +
        "FROM documents WHERE (doc_id // 10) % 3 <> 1"),
    // thumbnails (doc_id % 5 = 0) gate and never commit a fingerprint;
    // clean parity-even renders admit first-seen per texture group —
    // the min id per group is the group index itself; later duplicates
    // land in neither output
    "q211_stream_gated_admission" ->
      ("SELECT doc_id AS media_id, 'admitted' AS outcome FROM documents " +
        "WHERE doc_id < 20 AND doc_id % 5 <> 0 " +
        "UNION ALL SELECT doc_id AS media_id, 'gated' AS outcome " +
        "FROM documents WHERE doc_id % 5 = 0"),
    // every modality plants the SAME stage arithmetic: %5 defects gate,
    // whole-hash dedup keeps min id per (group, kind) so ids >= 60 drop,
    // and the kind-1 eval renders of groups {1,2} leak into every kind
    // of those groups through shared parts
    "q217_media_pipeline_deep" ->
      ("SELECT doc_id AS media_id, m.media_type, " +
        "CASE WHEN doc_id % 5 = 0 THEN 'gated' " +
        "WHEN doc_id >= 60 THEN 'dup_dropped' " +
        "WHEN doc_id % 20 IN (1, 2) THEN 'contaminated' " +
        "ELSE 'kept' END AS stage FROM documents CROSS JOIN " +
        "(VALUES ('image'), ('audio'), ('video')) AS m(media_type)"),
    // 800 frames at 8 kHz resample to 1600 at 16 kHz — same 100 ms
    "q235_audio_resample" ->
      ("SELECT doc_id AS media_id, 1600::BIGINT AS n_frames, " +
        "100::BIGINT AS duration_ms FROM documents"),
    // nearest of the 5 default ratio buckets by the NORMALIZED distance
    // |w/h - bw/bh|, compared with the bh denominators cross-multiplied
    // away (d_i*bh_j <= d_j*bh_i), ties to the earliest bucket; dims are
    // 16 + id%32 x 16 + id%24. bh per bucket: 1, 3, 4, 9, 16.
    "q233_aspect_buckets" ->
      ("WITH s AS (SELECT doc_id, (16 + doc_id % 32)::INT AS w, " +
        "(16 + doc_id % 24)::INT AS h FROM documents), " +
        "d AS (SELECT doc_id, w, h, abs(w*1 - h*1) AS d0, " +
        "abs(w*3 - h*4) AS d1, abs(w*4 - h*3) AS d2, " +
        "abs(w*9 - h*16) AS d3, abs(w*16 - h*9) AS d4 FROM s) " +
        "SELECT doc_id AS media_id, w AS width, h AS height, " +
        "CASE WHEN d0*3 <= d1*1 AND d0*4 <= d2*1 AND d0*9 <= d3*1 " +
        "AND d0*16 <= d4*1 THEN '1:1' " +
        "WHEN d1*4 <= d2*3 AND d1*9 <= d3*3 AND d1*16 <= d4*3 THEN '4:3' " +
        "WHEN d2*9 <= d3*4 AND d2*16 <= d4*4 THEN '3:4' " +
        "WHEN d3*16 <= d4*9 THEN '16:9' ELSE '9:16' END AS bucket FROM d"),
    // 100 ms/frame renders: tick k (200 ms at fps=5) shows frame 2k;
    // ticks strictly inside the 200*(1 + id%4) ms duration
    "q234_video_fps_sample" ->
      ("SELECT doc_id AS media_id, s.s::INT AS tick, " +
        "(2*s.s)::INT AS frame_idx, (200*s.s)::BIGINT AS t_ms " +
        "FROM documents JOIN (SELECT * FROM generate_series(0,3) s(s)) s " +
        "ON s.s <= doc_id % 4"),
    // q222's stage arithmetic, then among texture-group survivors a
    // second rank window over the caption key (doc_id % 12)
    "q232_paired_caption_dedup" ->
      ("WITH s AS (SELECT doc_id, n_chars < 200 AS cap_g, " +
        "doc_id % 5 = 0 AS img_def, " +
        "CASE WHEN (doc_id // 20) % 2 = 0 THEN 1152 ELSE 288 END AS res " +
        "FROM documents), " +
        "msurv AS (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY doc_id % 20 ORDER BY res DESC, doc_id ASC) AS rk " +
        "FROM s WHERE NOT cap_g AND NOT img_def), " +
        "csurv AS (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY doc_id % 12 ORDER BY doc_id ASC) AS crk " +
        "FROM msurv WHERE rk = 1) " +
        "SELECT s.doc_id AS media_id, 'image' AS media_type, " +
        "CASE WHEN s.cap_g THEN 'caption_gated' " +
        "WHEN s.img_def THEN 'media_gated' " +
        "WHEN msurv.rk > 1 THEN 'dup_dropped' " +
        "WHEN csurv.crk = 1 THEN 'kept' ELSE 'caption_dup' END AS stage " +
        "FROM s LEFT JOIN msurv ON s.doc_id = msurv.doc_id " +
        "LEFT JOIN csurv ON s.doc_id = csurv.doc_id"),
    // per modality: the disjoint %5/%11/%7 defect chain fails quality,
    // %4 carries injected metadata — the chains are independent
    "q231_media_hygiene_card" ->
      ("SELECT m.media_type, count(*)::BIGINT AS n, " +
        "sum(CASE WHEN doc_id % 5 = 0 OR doc_id % 11 = 0 OR " +
        "doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_quality_fail, " +
        "sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_with_metadata FROM documents CROSS JOIN " +
        "(VALUES ('image'), ('audio'), ('video')) m(media_type) " +
        "GROUP BY 1"),
    // exactly one comment extension planted on doc_id % 4 = 0
    "q230_video_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END::INT AS n_stripped, " +
        "doc_id % 4 = 0 AS had_metadata FROM documents"),
    // exactly one LIST/INFO block planted on doc_id % 4 = 0
    "q239_avi_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END::INT AS n_stripped, " +
        "doc_id % 4 = 0 AS had_metadata FROM documents"),
    // one APP1 segment planted on doc_id % 4 = 0, trailing on % 4 = 2
    "q251_jpeg_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 OR doc_id % 4 = 2 THEN 1 ELSE 0 " +
        "END::INT AS n_stripped, " +
        "doc_id % 4 = 0 OR doc_id % 4 = 2 AS had_metadata FROM documents"),
    // EXIF + XMP chunks planted on % 4 = 0, trailing bytes on % 4 = 2
    "q254_webp_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN 2 WHEN doc_id % 4 = 2 THEN 1 " +
        "ELSE 0 END::INT AS n_stripped, " +
        "doc_id % 4 IN (0, 2) AS had_metadata FROM documents"),
    // q233's bucket arithmetic over WebP header dims
    "q255_webp_aspect_buckets" ->
      ("WITH s AS (SELECT doc_id, (16 + doc_id % 32)::INT AS w, " +
        "(16 + doc_id % 24)::INT AS h FROM documents), " +
        "d AS (SELECT doc_id, w, h, abs(w*1 - h*1) AS d0, " +
        "abs(w*3 - h*4) AS d1, abs(w*4 - h*3) AS d2, " +
        "abs(w*9 - h*16) AS d3, abs(w*16 - h*9) AS d4 FROM s) " +
        "SELECT doc_id AS media_id, w AS width, h AS height, " +
        "CASE WHEN d0*3 <= d1*1 AND d0*4 <= d2*1 AND d0*9 <= d3*1 " +
        "AND d0*16 <= d4*1 THEN '1:1' " +
        "WHEN d1*4 <= d2*3 AND d1*9 <= d3*3 AND d1*16 <= d4*3 THEN '4:3' " +
        "WHEN d2*9 <= d3*4 AND d2*16 <= d4*4 THEN '3:4' " +
        "WHEN d3*16 <= d4*9 THEN '16:9' ELSE '9:16' END AS bucket FROM d"),
    // one udta box planted on doc_id % 4 = 0, trailing bytes on % 4 = 2
    "q246_mp4_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 OR doc_id % 4 = 2 THEN 1 ELSE 0 " +
        "END::INT AS n_stripped, " +
        "doc_id % 4 = 0 OR doc_id % 4 = 2 AS had_metadata FROM documents"),
    // the companded track expands to 800 + id%800 linear samples
    "q250_g711_audio_demux" ->
      ("SELECT doc_id AS media_id, " +
        "(800 + doc_id % 800)::BIGINT AS n_frames, " +
        "((800 + doc_id % 800) * 1000 // 8000)::BIGINT AS duration_ms " +
        "FROM documents"),
    // the h1 heading survives as 'Doc <id>' + blank line + exact text
    "q269_warc_html_text" ->
      ("SELECT doc_id, 'Doc ' || doc_id || chr(10) || chr(10) || text " +
        "AS text FROM documents"),
    // shard members carry the documents' UTF-8 text bytes
    "q261_tar_shards" ->
      ("SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes " +
        "FROM documents"),
    // the lossless FLAC decode recovers exactly the encoded samples
    "q259_flac_audio" ->
      ("SELECT doc_id AS media_id, " +
        "(800 + doc_id % 800)::BIGINT AS n_frames, " +
        "((800 + doc_id % 800) * 1000 // 8000)::BIGINT AS duration_ms " +
        "FROM documents"),
    // a VORBIS_COMMENT planted on % 4 = 0, a PICTURE block on % 4 = 2
    "q260_flac_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 OR doc_id % 4 = 2 THEN 1 ELSE 0 " +
        "END::INT AS n_stripped, " +
        "doc_id % 4 = 0 OR doc_id % 4 = 2 AS had_metadata FROM documents"),
    // ADPCM WAVs decode to exactly the fact-chunk frame count
    "q253_adpcm_audio" ->
      ("SELECT doc_id AS media_id, " +
        "(800 + doc_id % 800)::BIGINT AS n_frames, " +
        "((800 + doc_id % 800) * 1000 // 8000)::BIGINT AS duration_ms " +
        "FROM documents"),
    // the demuxed soun track is 800 + id%800 samples at 8 kHz
    "q247_mp4_audio_demux" ->
      ("SELECT doc_id AS media_id, " +
        "(800 + doc_id % 800)::BIGINT AS n_frames, " +
        "((800 + doc_id % 800) * 1000 // 8000)::BIGINT AS duration_ms " +
        "FROM documents"),
    // exactly one LIST chunk planted on doc_id % 4 = 0
    "q229_audio_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END::INT AS n_stripped, " +
        "doc_id % 4 = 0 AS had_metadata FROM documents"),
    // planted bar widths are pure arithmetic in base 3
    "q227_image_bars" ->
      ("SELECT doc_id AS media_id, (doc_id % 3)::INT AS bar_top, " +
        "((doc_id // 3) % 3)::INT AS bar_bottom, " +
        "((doc_id // 9) % 3)::INT AS bar_left, " +
        "((doc_id // 27) % 3)::INT AS bar_right FROM documents"),
    // exactly one tEXt chunk planted on doc_id % 4 = 0
    "q228_media_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END::INT AS n_stripped, " +
        "doc_id % 4 = 0 AS had_metadata FROM documents"),
    // payload bytes are a pure function of (group, parity) = id % 50;
    // the byte-group representative is the minimum id sharing them
    "q225_media_byte_dedup" ->
      ("SELECT doc_id AS media_id, (doc_id % 50)::BIGINT AS group_rep " +
        "FROM documents"),
    // the planted blur chain: upscaled renders are blurry, per-pixel
    // textures are not
    "q226_image_sharpness" ->
      ("SELECT doc_id AS media_id, doc_id % 3 = 0 AS blurry " +
        "FROM documents"),
    // q222's stage arithmetic plus: survivors of the eval groups {1, 2}
    // flag contaminated instead of kept
    "q224_paired_decontaminated" ->
      ("WITH s AS (SELECT doc_id, n_chars < 200 AS cap_g, " +
        "doc_id % 5 = 0 AS img_def, " +
        "CASE WHEN (doc_id // 20) % 2 = 0 THEN 1152 ELSE 288 END AS res " +
        "FROM documents), " +
        "surv AS (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY doc_id % 20 ORDER BY res DESC, doc_id ASC) AS rk " +
        "FROM s WHERE NOT cap_g AND NOT img_def) " +
        "SELECT s.doc_id AS media_id, 'image' AS media_type, " +
        "CASE WHEN s.cap_g THEN 'caption_gated' " +
        "WHEN s.img_def THEN 'media_gated' " +
        "WHEN surv.rk = 1 AND s.doc_id % 20 IN (1, 2) THEN 'contaminated' " +
        "WHEN surv.rk = 1 THEN 'kept' ELSE 'dup_dropped' END AS stage " +
        "FROM s LEFT JOIN surv ON s.doc_id = surv.doc_id"),
    // 1 + id % 4 utterances of 2 windows each: segment s starts at
    // window 3*s (2 content + 1 silent gap per cycle)
    "q223_audio_segments" ->
      ("SELECT doc_id AS media_id, s.s::INT AS segment_idx, " +
        "(3*s.s)::INT AS start_window, 2::INT AS n_windows " +
        "FROM documents JOIN (SELECT * FROM generate_series(0,3) s(s)) s " +
        "ON s.s <= doc_id % 4"),
    // caption gate first (n_chars < 200), then the planted image-defect
    // chain (% 5), then keep-best: per texture group the highest-
    // resolution gate-survivor with the smallest id is kept (base
    // renders are 36x32 = 1152 px on even id/20 cycles, 18x16 = 288
    // otherwise); everyone else in the cluster drops
    "q222_paired_curation" ->
      ("WITH s AS (SELECT doc_id, n_chars < 200 AS cap_g, " +
        "doc_id % 5 = 0 AS img_def, " +
        "CASE WHEN (doc_id // 20) % 2 = 0 THEN 1152 ELSE 288 END AS res " +
        "FROM documents), " +
        "surv AS (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY doc_id % 20 ORDER BY res DESC, doc_id ASC) AS rk " +
        "FROM s WHERE NOT cap_g AND NOT img_def) " +
        "SELECT s.doc_id AS media_id, 'image' AS media_type, " +
        "CASE WHEN s.cap_g THEN 'caption_gated' " +
        "WHEN s.img_def THEN 'media_gated' " +
        "WHEN surv.rk = 1 THEN 'kept' ELSE 'dup_dropped' END AS stage " +
        "FROM s LEFT JOIN surv ON s.doc_id = surv.doc_id"),
    // perceptual clusters = doc_id % 25 (the planted image groups), and
    // the split is the banded portable hash OF THE CLUSTER id — a per-
    // item (leaky) assignment hash-mismatches
    "q221_media_leaksafe_split" ->
      ("SELECT doc_id AS media_id, cluster_id, " +
        "CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' " +
        "ELSE 'test' END AS split FROM " +
        "(SELECT doc_id, (doc_id % 25)::BIGINT AS cluster_id, " +
        "('0x' || substr(md5(CAST(doc_id % 25 AS VARCHAR)),1,15))" +
        "::BIGINT % 100 AS h FROM documents)"),
    // 1 + id % 4 scenes of 2 frames each: scene s starts at frame 2*s
    "q220_video_scenes" ->
      ("SELECT doc_id AS media_id, s.s::INT AS scene_idx, " +
        "(2*s.s)::INT AS start_frame, 2::INT AS scene_frames " +
        "FROM documents JOIN (SELECT * FROM generate_series(0,3) s(s)) s " +
        "ON s.s <= doc_id % 4"),
    // base, rot90, rot180 and mirrored renders share orientation hashes
    // (D4 closure); min member id per group is the base id itself
    "q218_image_rotation" ->
      ("SELECT doc_id AS media_id, (doc_id % 20)::BIGINT AS cluster_id " +
        "FROM documents"),
    // eval = rot90 renders of groups 0..4; every base, rot180 and
    // mirrored corpus render of those groups matches one of the eval
    // set's 8 orientation hashes
    "q219_image_rotation_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 20) < 5 AS contaminated " +
        "FROM documents WHERE (doc_id // 20) % 4 <> 1"),
    // deep pipeline over kind-0 renders: dedup keeps min id per texture
    // group (= the group index, ids 0..19); the rot90 eval renders of
    // groups 0..4 flag those groups' survivors through the orientation
    // probe (tiles turn with a rotation and see nothing)
    "q236_deep_rotation_decontaminate" ->
      ("SELECT doc_id AS media_id, 'image' AS media_type, " +
        "CASE WHEN doc_id >= 20 THEN 'dup_dropped' " +
        "WHEN doc_id < 5 THEN 'contaminated' " +
        "ELSE 'kept' END AS stage " +
        "FROM documents WHERE (doc_id // 20) % 4 = 0"),
    // base, cropped and border-extended renders share >= 4 pixel-
    // identical tiles; min member id per group is the base id itself
    "q214_image_crop" ->
      ("SELECT doc_id AS media_id, (doc_id % 20)::BIGINT AS cluster_id " +
        "FROM documents"),
    // eval = cropped renders of groups 0..4; every base and extended
    // corpus render of those groups shares >= 4 tiles with one of them
    "q215_image_tile_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 20) < 5 AS contaminated " +
        "FROM documents WHERE (doc_id // 20) % 3 <> 1"),
    // batch 0 admits the 10 bases; batches 1 (trimmed) and 2 (padded)
    // each part-refuse their 10 re-uploads — the part leg of the card
    "q245_part_admission_card" ->
      ("SELECT 0::BIGINT AS batch, 10::BIGINT AS n_admitted, " +
        "0::BIGINT AS n_gated, 0::BIGINT AS n_part_refused " +
        "UNION ALL SELECT 1::BIGINT, 0::BIGINT, 0::BIGINT, 10::BIGINT " +
        "UNION ALL SELECT 2::BIGINT, 0::BIGINT, 0::BIGINT, 10::BIGINT"),
    // batch 0 admits the 16 clean group minima and gates its
    // thumbnails; batch 1 admits nothing (all duplicates of batch 0)
    "q216_admission_card" ->
      ("SELECT 0::BIGINT AS batch, (SELECT count(*) FROM documents " +
        "WHERE doc_id < 20 AND doc_id % 5 <> 0)::BIGINT AS n_admitted, " +
        "(SELECT count(*) FROM documents WHERE doc_id % 5 = 0 AND " +
        "doc_id < 200)::BIGINT AS n_gated " +
        "UNION ALL SELECT 1::BIGINT, 0::BIGINT, " +
        "(SELECT count(*) FROM documents WHERE doc_id % 5 = 0 AND " +
        "doc_id >= 200)::BIGINT"),
    // each shift cluster keeps the member with the most content
    // windows; base and padded tie at 4 and the base id g wins
    "q213_audio_keeplongest" ->
      ("SELECT DISTINCT (doc_id % 10)::BIGINT AS media_id, " +
        "4::BIGINT AS n_windows FROM documents"),
    // each overlap cluster keeps its longest member (the 6-frame
    // extended cut); the earliest extended copy of group g is id g+40
    "q212_video_keeplongest" ->
      ("SELECT DISTINCT (doc_id % 20 + 40)::BIGINT AS media_id, " +
        "6::BIGINT AS n_frames FROM documents"),
    // every modality plants the SAME stage arithmetic: %5 defects gate,
    // ids >= 20 lose their duplicate cluster to the group's base id,
    // the eval set carries groups {1,2}
    "q209_media_pipeline" ->
      ("SELECT doc_id AS media_id, m.media_type, " +
        "CASE WHEN doc_id % 5 = 0 THEN 'gated' " +
        "WHEN doc_id >= 20 THEN 'dup_dropped' " +
        "WHEN doc_id IN (1, 2) THEN 'contaminated' " +
        "ELSE 'kept' END AS stage FROM documents CROSS JOIN " +
        "(VALUES ('image'), ('audio'), ('video')) AS m(media_type)"),
    // the generator's disjoint defect chain; a single-frame GIF is also
    // trivially static (one distinct frame hash)
    "q208_video_quality" ->
      ("SELECT doc_id AS media_id, doc_id % 5 = 0 AS too_few_frames, " +
        "doc_id % 5 = 0 OR doc_id % 11 = 0 AS static_video, " +
        "doc_id % 5 <> 0 AND doc_id % 11 <> 0 AND doc_id % 7 = 0 " +
        "AS too_short, " +
        "doc_id % 5 <> 0 AND doc_id % 11 <> 0 AND doc_id % 7 <> 0 " +
        "AS passes FROM documents"),
    // the generator's disjoint defect chain, gate by gate
    "q204_image_quality" ->
      ("SELECT doc_id AS media_id, doc_id % 5 = 0 AS too_small, " +
        "doc_id % 5 <> 0 AND doc_id % 11 = 0 AS extreme_aspect, " +
        "doc_id % 5 <> 0 AND doc_id % 11 <> 0 AND doc_id % 7 = 0 " +
        "AS low_contrast, " +
        "doc_id % 5 <> 0 AND doc_id % 11 <> 0 AND doc_id % 7 <> 0 " +
        "AS passes FROM documents"),
    "q205_audio_quality" ->
      ("SELECT doc_id AS media_id, doc_id % 5 = 0 AS too_short, " +
        "doc_id % 5 <> 0 AND doc_id % 11 = 0 AS silent, " +
        "doc_id % 5 <> 0 AND doc_id % 11 <> 0 AND doc_id % 7 = 0 " +
        "AS clipped, " +
        "doc_id % 5 <> 0 AND doc_id % 11 <> 0 AND doc_id % 7 <> 0 " +
        "AS passes FROM documents"),
    // unperturbed images collapse to 25 contents, volume-variant audio
    // to 20 fingerprints, unperturbed videos to 20 — all doc arithmetic
    "q203_media_card" ->
      ("WITH i AS (SELECT count(*)::BIGINT n FROM documents " +
        "WHERE (doc_id // 25) % 2 = 0), " +
        "a AS (SELECT count(*)::BIGINT n FROM documents), " +
        "v AS (SELECT count(*)::BIGINT n FROM documents " +
        "WHERE (doc_id // 20) % 2 = 0) " +
        "SELECT 'image' AS media_type, n AS n_items, 25::BIGINT AS " +
        "n_distinct, (n - 25)::BIGINT AS n_exact_dup, " +
        "round((n - 25)::DOUBLE / n, 4) AS dup_rate FROM i " +
        "UNION ALL SELECT 'audio', n, 20::BIGINT, (n - 20)::BIGINT, " +
        "round((n - 20)::DOUBLE / n, 4) FROM a " +
        "UNION ALL SELECT 'video', n, 20::BIGINT, (n - 20)::BIGINT, " +
        "round((n - 20)::DOUBLE / n, 4) FROM v"),
    // one survivor per texture group: the full-size render, whose id is
    // the group index itself (thumbnails lose on decoded area)
    "q200_image_keepbest" ->
      ("SELECT DISTINCT (doc_id % 20)::BIGINT AS media_id, " +
        "36::BIGINT AS width, 32::BIGINT AS height FROM documents"),
    "q199_video_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 20) < 5 AS contaminated " +
        "FROM documents"),
    // the GIF writer plants 2 + doc_id % 6 frames at 10 cs each; the
    // reader must recover exactly those counts/dims/delays, and every-2nd
    // sampling decodes ceil(n/2) frames
    "q196_gif_frames" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 16)::BIGINT AS width, " +
        "(2 + doc_id % 6)::BIGINT AS n_frames, " +
        "((2 + doc_id % 6) * 100)::BIGINT AS duration_ms, " +
        "((2 + doc_id % 6 + 1) // 2)::BIGINT AS n_sampled FROM documents"),
    // q72's gram arithmetic folded into q222's stage algebra: caption
    // length gate, then the 4-gram leak probe (eval = docs at %50=0 —
    // which self-flag as corpus pairs), then planted image defects and
    // keep-best-resolution dedup over what remains
    "q243_paired_caption_decontaminated" ->
      ("WITH g AS (SELECT doc_id, CASE WHEN len(string_split(text,' ')) < 4 " +
        "THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+3],' ') " +
        "FOR i IN range(1, len(string_split(text,' '))-2)] END AS sh " +
        "FROM documents), " +
        "bench AS (SELECT DISTINCT unnest(sh) AS gr FROM g " +
        "WHERE doc_id % 50 = 0), " +
        "cont AS (SELECT DISTINCT doc_id FROM " +
        "(SELECT doc_id, unnest(sh) AS gr FROM g) c JOIN bench USING (gr)), " +
        "s AS (SELECT doc_id, n_chars < 200 AS cap_g, " +
        "doc_id IN (SELECT doc_id FROM cont) AS cap_cont, " +
        "doc_id % 5 = 0 AS img_def, " +
        "CASE WHEN (doc_id // 20) % 2 = 0 THEN 1152 ELSE 288 END AS res " +
        "FROM documents), " +
        "msurv AS (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY doc_id % 20 ORDER BY res DESC, doc_id ASC) AS rk " +
        "FROM s WHERE NOT cap_g AND NOT cap_cont AND NOT img_def) " +
        "SELECT s.doc_id AS media_id, 'image' AS media_type, " +
        "CASE WHEN s.cap_g THEN 'caption_gated' " +
        "WHEN s.cap_cont THEN 'caption_contaminated' " +
        "WHEN s.img_def THEN 'media_gated' " +
        "WHEN msurv.rk = 1 THEN 'kept' ELSE 'dup_dropped' END AS stage " +
        "FROM s LEFT JOIN msurv ON s.doc_id = msurv.doc_id"),
    // caption gate first, then min caption-passing id per (texture
    // group, crop kind) survives whole-hash dedup; survivors of the
    // eval'd groups 0..4 flag through the tile-level probe
    "q242_paired_deep_decontaminated" ->
      ("WITH s AS (SELECT doc_id, n_chars < 200 AS cap_g, " +
        "(doc_id // 20) % 3 AS kind FROM documents " +
        "WHERE (doc_id // 20) % 3 <> 1), " +
        "msurv AS (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY doc_id % 20, kind ORDER BY doc_id ASC) AS rk " +
        "FROM s WHERE NOT cap_g) " +
        "SELECT s.doc_id AS media_id, 'image' AS media_type, " +
        "CASE WHEN s.cap_g THEN 'caption_gated' " +
        "WHEN msurv.rk > 1 THEN 'dup_dropped' " +
        "WHEN s.doc_id % 20 < 5 THEN 'contaminated' " +
        "ELSE 'kept' END AS stage " +
        "FROM s LEFT JOIN msurv ON s.doc_id = msurv.doc_id"),
    // eval = CFR re-renders of groups 0..4's timelines; every VFR
    // corpus render of those groups time-samples to the same fold
    "q244_video_fps_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 20) < 5 AS contaminated " +
        "FROM documents WHERE (doc_id // 20) % 2 = 0"),
    // eval = mp4/MJPEG re-renders of groups 0..4's timelines; every GIF
    // corpus render of those groups time-samples within re-encode
    // tolerance of an eval fold
    "q249_video_cross_decontaminate" ->
      ("SELECT doc_id AS media_id, (doc_id % 20) < 5 AS contaminated " +
        "FROM documents WHERE (doc_id // 20) % 2 = 0"),
    // the demuxed soundtrack is 800 + id%800 samples at 8 kHz
    "q241_avi_audio_demux" ->
      ("SELECT doc_id AS media_id, " +
        "(800 + doc_id % 800)::BIGINT AS n_frames, " +
        "((800 + doc_id % 800) * 1000 // 8000)::BIGINT AS duration_ms " +
        "FROM documents"),
    // VFR and CFR renders of one timeline share every time-sampled
    // frame; min member id per content group is the group index
    "q240_video_fps_dedup" ->
      ("SELECT doc_id AS media_id, (doc_id % 20)::BIGINT AS group_rep " +
        "FROM documents"),
    // the mp4 mirror of q196/q237 with NATIVE VFR timing: frame f of n
    // displays (f+1)*50 ms, so duration = 25*n*(n+1); n = 2 + id%6
    "q248_mp4_frames" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 16)::BIGINT AS width, " +
        "(2 + doc_id % 6)::BIGINT AS n_frames, " +
        "(25 * (2 + doc_id % 6) * (3 + doc_id % 6))::BIGINT AS duration_ms, " +
        "((2 + doc_id % 6 + 1) // 2)::BIGINT AS n_sampled FROM documents"),
    // the Matroska mirror of q248: same VFR arithmetic, parsed from an
    // EBML container instead of ISO-BMFF
    "q256_mkv_frames" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 16)::BIGINT AS width, " +
        "(2 + doc_id % 6)::BIGINT AS n_frames, " +
        "(25 * (2 + doc_id % 6) * (3 + doc_id % 6))::BIGINT AS duration_ms, " +
        "((2 + doc_id % 6 + 1) // 2)::BIGINT AS n_sampled FROM documents"),
    // the demuxed A_PCM track is 800 + id%800 samples at 8 kHz
    "q257_mkv_audio_demux" ->
      ("SELECT doc_id AS media_id, " +
        "(800 + doc_id % 800)::BIGINT AS n_frames, " +
        "((800 + doc_id % 800) * 1000 // 8000)::BIGINT AS duration_ms " +
        "FROM documents"),
    // one Tags element planted on doc_id % 4 = 0, trailing on % 4 = 2
    "q258_mkv_scrub_report" ->
      ("SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 4 = 0 OR doc_id % 4 = 2 THEN 1 ELSE 0 " +
        "END::INT AS n_stripped, " +
        "doc_id % 4 = 0 OR doc_id % 4 = 2 AS had_metadata FROM documents"),
    // the AVI mirror of q196: same planted frame-count/dims/duration
    // arithmetic, parsed from a real RIFF/AVI container instead of GIF
    "q237_avi_frames" ->
      ("SELECT doc_id AS media_id, (16 + doc_id % 16)::BIGINT AS width, " +
        "(2 + doc_id % 6)::BIGINT AS n_frames, " +
        "((2 + doc_id % 6) * 100)::BIGINT AS duration_ms, " +
        "((2 + doc_id % 6 + 1) // 2)::BIGINT AS n_sampled FROM documents"),
    // same exact-top-1 contract as q100: the indexed PQ lifecycle is
    // certified in-query against the inline ADC, and the re-ranked
    // top-1 must match DuckDB's brute-force exact answer
    "q191_ivf_pq_incremental" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank, " +
        "true AS ok FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank = 1"),
    // the replica equals the partition-filtered source: lifecycle
    // (incremental + deregister) is certified in-query by require()s
    "q171_hive_copy" ->
      ("SELECT dt, count(*)::BIGINT AS n, sum(user_id)::BIGINT AS sum_uid " +
        "FROM (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, " +
        "user_id FROM events) " +
        "WHERE dt > (SELECT min(strftime(CAST(ts AS TIMESTAMP), " +
        "'%Y-%m-%d')) FROM events) GROUP BY dt"),
    "q86_stream_dedup" ->
      "SELECT event_id, user_id, event_type FROM events",
    "q98_stream_dedup_wm" ->
      "SELECT event_id, user_id FROM events",
    "q99_crypto_roundtrip" ->
      "SELECT doc_id, text FROM documents",
    "q101_sfdc_bulk" ->
      "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer",
    "q105_snapshot_replicate" ->
      "SELECT event_id, user_id, event_type FROM events",
    "q112_merge_cow" ->
      ("WITH base AS (SELECT event_id, user_id, event_type, value, " +
        "strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt FROM events), " +
        "chg AS (SELECT event_id, user_id, event_type, value * 2 AS value, " +
        "dt, 'U' AS op FROM base WHERE event_id % 7 = 0 AND event_id % 13 <> 0 " +
        "UNION ALL SELECT event_id, user_id, event_type, value, dt, 'D' " +
        "FROM base WHERE event_id % 13 = 0 " +
        "UNION ALL SELECT event_id + 1000000, user_id, 'insert', value, " +
        "'2024-02-01', 'U' FROM base WHERE event_id % 17 = 0), " +
        "m AS (SELECT b.* FROM base b WHERE b.event_id NOT IN " +
        "(SELECT event_id FROM chg) " +
        "UNION ALL SELECT event_id, user_id, event_type, value, dt " +
        "FROM chg WHERE op <> 'D') " +
        "SELECT event_id, user_id, event_type, value, dt FROM m"),
    "q137_rollup_tree" -> {
      def grain(g: String): String =
        s"SELECT '$g' AS grain, event_type, date_trunc('$g', " +
          "CAST(ts AS TIMESTAMP)) AS bucket, count(*)::BIGINT AS n, " +
          "sum(value) AS sum_value FROM events GROUP BY 2, 3"
      Seq("hour", "day", "month").map(grain).mkString(" UNION ALL ")
    },
    "q141_heavy_hitters" ->
      ("SELECT word, count(*)::BIGINT AS cnt FROM (SELECT " +
        "unnest(string_split(text, ' ')) AS word FROM documents) " +
        "GROUP BY word ORDER BY cnt DESC, word LIMIT 25"),
    "q160_corpus_gini" ->
      ("WITH s AS (SELECT source, sum(len(string_split(text, ' ')))::BIGINT " +
        "AS x FROM documents GROUP BY source), " +
        "r AS (SELECT x, row_number() OVER (ORDER BY x, source)::BIGINT " +
        "AS i FROM s) " +
        "SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS total, " +
        "((1000 * (2 * sum(i * x) - (count(*) + 1) * sum(x))) // " +
        "(count(*) * sum(x)))::BIGINT AS gini_permille FROM r"),
    "q158_hll_rollup" ->
      ("SELECT strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), " +
        "'%Y-%m-%d') AS week, count(DISTINCT user_id)::BIGINT " +
        "AS exact_users, true AS ok FROM events GROUP BY 1"),
    "q159_scd2_asof" ->
      ("WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "event_type, value, event_id FROM events WHERE " +
        "CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY ts DESC, event_id DESC) AS rn FROM c) " +
        "SELECT user_id, event_type, value, ts AS valid_from FROM r " +
        "WHERE rn = 1"),
    "q157_drift_series" ->
      ("WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
        "floor(value) AS bin FROM events WHERE value IS NOT NULL), " +
        "ca AS (SELECT day AS pair, bin, count(*)::BIGINT AS c FROM e " +
        "GROUP BY 1, 2), " +
        "cb AS (SELECT day + 1 AS pair, bin, count(*)::BIGINT AS c FROM e " +
        "GROUP BY 1, 2), " +
        "j AS (SELECT COALESCE(ca.pair, cb.pair) AS pair, " +
        "COALESCE(ca.bin, cb.bin) AS bin, COALESCE(ca.c, 0) AS ca, " +
        "COALESCE(cb.c, 0) AS cb FROM ca FULL JOIN cb " +
        "ON ca.pair = cb.pair AND ca.bin = cb.bin), " +
        "t AS (SELECT pair, ca, cb, sum(ca) OVER (PARTITION BY pair) AS na, " +
        "sum(cb) OVER (PARTITION BY pair) AS nb FROM j), " +
        "g AS (SELECT pair, max(na) AS na, max(nb) AS nb, " +
        "sum(abs(ca * nb - cb * na)) AS s FROM t GROUP BY pair) " +
        "SELECT strftime(pair, '%Y-%m-%d') AS day, na::BIGINT AS n_a, " +
        "nb::BIGINT AS n_b, (500 * s // (na * nb))::BIGINT AS tv_permille " +
        "FROM g WHERE na > 0 AND nb > 0"),
    "q156_distribution_drift" ->
      ("WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, " +
        "floor(value) AS bin FROM events WHERE value IS NOT NULL), " +
        "ca AS (SELECT event_type, bin, count(*)::BIGINT AS c FROM e " +
        "WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1, 2), " +
        "cb AS (SELECT event_type, bin, count(*)::BIGINT AS c FROM e " +
        "WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1, 2), " +
        "j AS (SELECT COALESCE(ca.event_type, cb.event_type) AS event_type, " +
        "COALESCE(ca.bin, cb.bin) AS bin, COALESCE(ca.c, 0) AS ca, " +
        "COALESCE(cb.c, 0) AS cb FROM ca FULL JOIN cb " +
        "ON ca.event_type = cb.event_type AND ca.bin = cb.bin), " +
        "t AS (SELECT event_type, ca, cb, " +
        "sum(ca) OVER (PARTITION BY event_type) AS na, " +
        "sum(cb) OVER (PARTITION BY event_type) AS nb FROM j) " +
        "SELECT event_type, max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b, " +
        "(CASE WHEN max(na) = 0 OR max(nb) = 0 THEN 1000 " +
        "ELSE 500 * sum(abs(ca * nb - cb * na)) // (max(na) * max(nb)) " +
        "END)::BIGINT AS tv_permille FROM t GROUP BY event_type"),
    "q155_session_funnel" -> {
      val w = "PARTITION BY user_id, session_seq ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING"
      "WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, " +
        "event_type FROM events), " +
        "g AS (SELECT *, CASE WHEN lag(ts) OVER uw IS NULL OR ts > " +
        "lag(ts) OVER uw + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns " +
        "FROM o WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "sg AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, " +
        "event_id ROWS UNBOUNDED PRECEDING) AS session_seq FROM g), " +
        s"s0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END) " +
        s"OVER ($w) AS r0 FROM sg), " +
        s"s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= r0 " +
        s"THEN ts END) OVER ($w) AS r1 FROM s0), " +
        s"s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND " +
        s"ts >= r1 THEN ts END) OVER ($w) AS r2 FROM s1) " +
        "SELECT user_id, session_seq::BIGINT AS session_seq, " +
        "max(CASE WHEN r2 IS NOT NULL THEN 3 WHEN r1 IS NOT NULL THEN 2 " +
        "WHEN r0 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS depth " +
        "FROM s2 GROUP BY user_id, session_seq"
    },
    "q153_fuzzy_join" ->
      ("WITH n AS (SELECT DISTINCT p_name FROM part), " +
        "m AS (SELECT DISTINCT substr(p_name, 1, len(p_name) - 1) AS mut " +
        "FROM part) " +
        "SELECT a.p_name, b.mut, levenshtein(a.p_name, b.mut)::BIGINT " +
        "AS dist FROM n a JOIN m b ON substr(a.p_name, 1, 4) = " +
        "substr(b.mut, 1, 4) WHERE levenshtein(a.p_name, b.mut) <= 2"),
    "q154_setsim_join" ->
      ("WITH w AS (SELECT doc_id, w FROM (SELECT doc_id, " +
        "unnest(string_split(text, ' ')) AS w FROM documents) " +
        "WHERE len(w) > 0), " +
        "s AS (SELECT doc_id, list(DISTINCT w) AS toks FROM w GROUP BY 1) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "len(list_intersect(a.toks, b.toks))::BIGINT AS inter, " +
        "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))" +
        "::BIGINT AS uni FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.toks, b.toks)) * 1000 >= 950 * " +
        "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))"),
    "q152_dataset_card" ->
      ("WITH tok AS (SELECT doc_id, unnest(range(1, " +
        "len(string_split(text, ' ')) + 1)) AS i, " +
        "unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "r AS (SELECT doc_id, tok, i, i - row_number() OVER " +
        "(PARTITION BY doc_id, tok ORDER BY i) AS grp FROM tok), " +
        "runs AS (SELECT doc_id, max(cnt) AS max_run FROM (SELECT doc_id, " +
        "count(*) AS cnt FROM r GROUP BY doc_id, tok, grp) GROUP BY doc_id) " +
        "SELECT source, count(*)::BIGINT AS n_docs, " +
        "sum(len(string_split(text, ' ')))::BIGINT AS total_tokens, " +
        "count(DISTINCT lang)::BIGINT AS n_langs, " +
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars, " +
        "sum(CASE WHEN max_run < 3 THEN 1 ELSE 0 END)::BIGINT AS clean_docs " +
        "FROM documents JOIN runs USING (doc_id) GROUP BY source"),
    "q151_training_pipeline" ->
      ("WITH d0 AS (SELECT doc_id, source, text, " +
        "len(string_split(text, ' '))::BIGINT AS n_toks FROM documents), " +
        "tok AS (SELECT doc_id, unnest(range(1, " +
        "len(string_split(text, ' ')) + 1)) AS i, " +
        "unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "r AS (SELECT doc_id, tok, i, i - row_number() OVER " +
        "(PARTITION BY doc_id, tok ORDER BY i) AS grp FROM tok), " +
        "runs AS (SELECT doc_id, max(cnt) AS max_run FROM (SELECT doc_id, " +
        "count(*) AS cnt FROM r GROUP BY doc_id, tok, grp) GROUP BY doc_id), " +
        "gated AS (SELECT d0.* FROM d0 JOIN runs USING (doc_id) " +
        "WHERE n_toks >= 30 AND max_run < 3), " +
        "dd AS (SELECT * FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM gated) " +
        "WHERE rn = 1), " +
        "tr AS (SELECT doc_id, source, n_toks FROM dd WHERE " +
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 80), " +
        "qk AS (SELECT doc_id, source, n_toks, ('0x' || " +
        "substr(md5('quota' || doc_id::VARCHAR), 1, 15))::BIGINT AS qh " +
        "FROM tr), " +
        "cap AS (SELECT doc_id, source, n_toks FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY source ORDER BY qh, doc_id) AS rnk " +
        "FROM qk) WHERE rnk <= 15), " +
        "k AS (SELECT doc_id, source, n_toks AS w, ('0x' || " +
        "substr(md5('seq' || doc_id::VARCHAR), 1, 15))::BIGINT AS h FROM cap), " +
        "c AS (SELECT doc_id, source, w, COALESCE(sum(w) OVER (ORDER BY h, " +
        "doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT " +
        "AS cum FROM k), " +
        "e AS (SELECT doc_id, source, w, cum, unnest(generate_series(" +
        "cum // 256, (cum + w - 1) // 256)) AS seq_id FROM c WHERE w > 0) " +
        "SELECT doc_id, source, seq_id::BIGINT AS seq_id, " +
        "greatest(0, cum - seq_id * 256)::BIGINT AS seq_pos, " +
        "greatest(0, seq_id * 256 - cum)::BIGINT AS doc_off, " +
        "(least((seq_id + 1) * 256, cum + w) - " +
        "greatest(seq_id * 256, cum))::BIGINT AS n_tokens FROM e"),
    "q149_grouped_percentiles" ->
      ("WITH q AS (SELECT event_type, floor(value) AS v FROM events " +
        "WHERE value IS NOT NULL), " +
        "pc AS (SELECT event_type, v, count(*)::BIGINT AS cnt FROM q " +
        "GROUP BY 1, 2), " +
        "c AS (SELECT event_type, v, sum(cnt) OVER (PARTITION BY event_type " +
        "ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS cum, " +
        "sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n FROM pc) " +
        "SELECT event_type, max(n) AS n, " +
        "min(CASE WHEN cum * 100 >= n * 25 THEN v END) AS p25, " +
        "min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS p50, " +
        "min(CASE WHEN cum * 100 >= n * 75 THEN v END) AS p75, " +
        "min(CASE WHEN cum * 100 >= n * 95 THEN v END) AS p95 " +
        "FROM c GROUP BY event_type"),
    "q150_centroid_cosine" ->
      ("WITH e AS (SELECT vec_id, label::BIGINT AS label, " +
        "[round(x * 1000) for x in embedding::DOUBLE[]] AS v " +
        "FROM embeddings), " +
        "s AS (SELECT label, i, sum(v[i]) AS sv FROM e CROSS JOIN " +
        "(SELECT unnest(generate_series(1, 64)) AS i) t GROUP BY 1, 2), " +
        "sv AS (SELECT label, list(sv ORDER BY i) AS c FROM s GROUP BY 1) " +
        "SELECT e.vec_id, e.label, round(list_dot_product(e.v, sv.c) / " +
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(sv.c, " +
        "sv.c))), 6) AS cos_c FROM e JOIN sv USING (label)"),
    "q148_winsorize" ->
      ("WITH q AS (SELECT event_id, floor(value) AS v FROM events " +
        "WHERE value IS NOT NULL), " +
        "pc AS (SELECT v, count(*)::BIGINT AS cnt FROM q GROUP BY v), " +
        "c AS (SELECT v, sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED " +
        "PRECEDING)::BIGINT AS cum, sum(cnt) OVER ()::BIGINT AS n FROM pc), " +
        "cut AS (SELECT min(CASE WHEN cum * 100 >= n * 5 THEN v END) AS lo, " +
        "min(CASE WHEN cum * 100 >= n * 95 THEN v END) AS hi FROM c) " +
        "SELECT q.event_id, q.v, least(greatest(q.v, cut.lo), cut.hi) " +
        "AS v_clipped FROM q, cut"),
    "q147_transition_matrix" ->
      ("WITH n AS (SELECT event_type, lead(event_type) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS next_type " +
        "FROM events) SELECT event_type, next_type, count(*)::BIGINT AS n " +
        "FROM n WHERE next_type IS NOT NULL GROUP BY 1, 2"),
    "q146_seq_pack" ->
      ("WITH k AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS w, " +
        "('0x' || substr(md5('seq' || doc_id::VARCHAR), 1, 15))::BIGINT AS h " +
        "FROM documents), " +
        "c AS (SELECT doc_id, w, COALESCE(sum(w) OVER (ORDER BY h, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT " +
        "AS cum_before FROM k), " +
        "e AS (SELECT doc_id, w, cum_before, unnest(generate_series(" +
        "cum_before // 512, (cum_before + w - 1) // 512)) AS seq_id " +
        "FROM c WHERE w > 0) " +
        "SELECT doc_id, cum_before, seq_id::BIGINT AS seq_id, " +
        "greatest(0, cum_before - seq_id * 512)::BIGINT AS seq_pos, " +
        "greatest(0, seq_id * 512 - cum_before)::BIGINT AS doc_off, " +
        "(least((seq_id + 1) * 512, cum_before + w) - " +
        "greatest(seq_id * 512, cum_before))::BIGINT AS n_tokens FROM e"),
    "q142_hash_split" ->
      ("SELECT doc_id, lang, source, CASE " +
        "WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END " +
        "AS split FROM (SELECT doc_id, lang, source, " +
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS h " +
        "FROM documents)"),
    "q143_funnel_depth" ->
      ("WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, " +
        "event_type FROM events), " +
        "s0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END) " +
        "OVER w AS r0 FROM o WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)), " +
        "s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= r0 " +
        "THEN ts END) OVER w AS r1 FROM s0 WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)), " +
        "s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= r1 " +
        "THEN ts END) OVER w AS r2 FROM s1 WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) " +
        "SELECT user_id, max(CASE WHEN r2 IS NOT NULL THEN 3 " +
        "WHEN r1 IS NOT NULL THEN 2 WHEN r0 IS NOT NULL THEN 1 ELSE 0 END)" +
        "::BIGINT AS depth FROM s2 GROUP BY user_id"),
    "q144_cohort_retention" ->
      ("WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) " +
        "AS day FROM events), " +
        "c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id) " +
        "SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day, " +
        "date_diff('day', c.cohort, e.day)::BIGINT AS days_since, " +
        "count(DISTINCT e.user_id)::BIGINT AS n_users " +
        "FROM e JOIN c USING (user_id) GROUP BY 1, 2"),
    "q138_cube_report" ->
      ("WITH e AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), " +
        "'%Y-%m-%d') AS day, value FROM events) " +
        "SELECT event_type, day, GROUPING(event_type, day)::BIGINT AS gid, " +
        "count(*)::BIGINT AS n, sum(value) AS sum_value FROM e " +
        "GROUP BY CUBE (event_type, day)"),
    "q139_pivot_wide" ->
      ("SELECT user_id, " +
        "sum(CASE WHEN event_type = 'click' THEN value END) AS click, " +
        "sum(CASE WHEN event_type = 'view' THEN value END) AS view, " +
        "sum(CASE WHEN event_type = 'purchase' THEN value END) AS purchase, " +
        "sum(CASE WHEN event_type = 'signup' THEN value END) AS signup, " +
        "sum(CASE WHEN event_type = 'error' THEN value END) AS error " +
        "FROM events GROUP BY user_id"),
    "q140_unpivot_long" ->
      ("SELECT user_id, event_type, sum(value) AS sum_value " +
        "FROM events WHERE event_type IN " +
        "('click', 'view', 'purchase', 'signup', 'error') " +
        "GROUP BY user_id, event_type"),
    "q136_session_window" ->
      ("WITH g AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, " +
        "CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL " +
        "OR CAST(ts AS TIMESTAMP) > lag(CAST(ts AS TIMESTAMP)) OVER w " +
        "+ INTERVAL 2 HOUR THEN 1 ELSE 0 END AS ns FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, value, sum(ns) OVER (PARTITION BY user_id " +
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS seq FROM g) " +
        "SELECT user_id, min(ts) AS session_start, " +
        "max(ts) + INTERVAL 2 HOUR AS session_end, " +
        "count(*)::BIGINT AS n_events, sum(value) AS sum_value " +
        "FROM s GROUP BY user_id, seq"),
    "q135_change_feed" ->
      ("WITH oldt AS (SELECT event_id, user_id, event_type, value " +
        "FROM events), " +
        "newt AS (SELECT event_id, user_id, event_type, " +
        "CASE WHEN event_id % 5 = 0 THEN value + 100 ELSE value END AS value " +
        "FROM events WHERE event_id % 11 <> 0), " +
        "d AS (SELECT COALESCE(o.event_id, n.event_id) AS event_id, " +
        "CASE WHEN o.event_id IS NULL THEN 'I' " +
        "WHEN n.event_id IS NULL THEN 'D' " +
        "WHEN NOT (o.user_id IS NOT DISTINCT FROM n.user_id " +
        "AND o.event_type IS NOT DISTINCT FROM n.event_type " +
        "AND o.value IS NOT DISTINCT FROM n.value) THEN 'U' END AS op, " +
        "CASE WHEN n.event_id IS NULL THEN o.user_id ELSE n.user_id END AS user_id, " +
        "CASE WHEN n.event_id IS NULL THEN o.event_type ELSE n.event_type END AS event_type, " +
        "CASE WHEN n.event_id IS NULL THEN o.value ELSE n.value END AS value " +
        "FROM oldt o FULL JOIN newt n ON o.event_id = n.event_id) " +
        "SELECT event_id, op, user_id, event_type, value FROM d " +
        "WHERE op IS NOT NULL"),
    "q134_mv_refresh" ->
      ("SELECT user_id, event_type, count(*)::BIGINT AS n, " +
        "sum(value) AS total, min(value) AS vmin, max(value) AS vmax, " +
        "sum(value) / count(*) AS avg_value FROM events GROUP BY 1, 2"),
    "q133_mixture_plan" ->
      ("WITH s AS (SELECT source, count(*)::BIGINT AS n_docs, " +
        "sum(len(string_split(text, ' ')))::BIGINT AS n_tokens " +
        "FROM documents GROUP BY 1), " +
        "tot AS (SELECT sum(n_tokens)::BIGINT AS t, count(*)::BIGINT AS ns " +
        "FROM s) " +
        "SELECT source, n_docs, n_tokens, " +
        "((n_tokens * 1000) // t)::BIGINT AS share_permille, " +
        "(((1000000 // ns) * 1000) // n_tokens)::BIGINT AS epochs_milli " +
        "FROM s, tot"),
    "q132_contamination_report" ->
      ("WITH g AS (SELECT doc_id, CASE WHEN len(string_split(text,' ')) < 4 " +
        "THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+3],' ') " +
        "FOR i IN range(1, len(string_split(text,' '))-2)] END AS sh " +
        "FROM documents), " +
        "eg AS (SELECT DISTINCT eval_doc_id, gr FROM " +
        "(SELECT doc_id AS eval_doc_id, unnest(sh) AS gr FROM g " +
        "WHERE doc_id % 50 = 0)), " +
        "cg AS (SELECT DISTINCT doc_id, gr FROM " +
        "(SELECT doc_id, unnest(sh) AS gr FROM g WHERE doc_id % 50 <> 0)), " +
        "hits AS (SELECT eval_doc_id, " +
        "count(DISTINCT doc_id)::BIGINT AS n_contaminated_docs, " +
        "count(*)::BIGINT AS n_gram_hits FROM cg JOIN eg USING (gr) " +
        "GROUP BY 1) " +
        "SELECT e.eval_doc_id, " +
        "COALESCE(h.n_contaminated_docs, 0)::BIGINT AS n_contaminated_docs, " +
        "COALESCE(h.n_gram_hits, 0)::BIGINT AS n_gram_hits " +
        "FROM (SELECT doc_id AS eval_doc_id FROM documents " +
        "WHERE doc_id % 50 = 0) e LEFT JOIN hits h USING (eval_doc_id)"),
    "q131_repetition_runs" ->
      ("WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "t AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, " +
        "unnest(toks) AS tok FROM s), " +
        "r AS (SELECT doc_id, tok, i, i - row_number() OVER " +
        "(PARTITION BY doc_id, tok ORDER BY i) AS grp FROM t), " +
        "runs AS (SELECT doc_id, count(*)::BIGINT AS run FROM r " +
        "GROUP BY doc_id, tok, grp) " +
        "SELECT doc_id, max(run)::BIGINT AS max_run FROM runs GROUP BY 1"),
    "q130_backfill_plan" ->
      ("WITH d AS (SELECT DISTINCT strftime(CAST(ts AS TIMESTAMP), " +
        "'%Y-%m-%d') AS dt FROM events), " +
        "present AS (SELECT dt FROM d WHERE dt NOT IN " +
        "('2024-01-05', '2024-01-12', '2024-01-20')), " +
        "bounds AS (SELECT min(dt) AS lo, max(dt) AS hi FROM present), " +
        "all_days AS (SELECT strftime(unnest(generate_series(" +
        "CAST(lo AS DATE), CAST(hi AS DATE), INTERVAL 1 DAY)), " +
        "'%Y-%m-%d') AS dt FROM bounds) " +
        "SELECT dt FROM all_days " +
        "WHERE dt NOT IN (SELECT dt FROM present)"),
    "q129_asof_nearest" ->
      ("WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, " +
        "max(value) AS pval FROM events WHERE event_type = 'purchase' " +
        "GROUP BY 1, 2), " +
        "c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts " +
        "FROM events WHERE event_type = 'click') " +
        "SELECT c.event_id, c.user_id, " +
        "(SELECT p.pts FROM p WHERE p.user_id = c.user_id " +
        "ORDER BY abs(epoch_us(p.pts - c.cts)), (p.pts > c.cts) LIMIT 1) " +
        "AS near_ts, " +
        "(SELECT p.pval FROM p WHERE p.user_id = c.user_id " +
        "ORDER BY abs(epoch_us(p.pts - c.cts)), (p.pts > c.cts) LIMIT 1) " +
        "AS near_value FROM c"),
    "q128_asof_forward" ->
      ("WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS next_purchase_ts, " +
        "max(value) AS next_purchase_value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts " +
        "FROM events WHERE event_type = 'click') " +
        "SELECT c.event_id, c.user_id, p.next_purchase_ts, " +
        "p.next_purchase_value FROM c ASOF LEFT JOIN p " +
        "ON c.user_id = p.user_id AND c.cts <= p.next_purchase_ts"),
    "q127_fk_violations" ->
      ("SELECT o_orderkey, o_custkey FROM orders o " +
        "WHERE NOT EXISTS (SELECT 1 FROM customer c " +
        "WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 10 <> 0)"),
    "q126_sliding_window" ->
      ("WITH j AS (SELECT unnest(range(4)) AS j), " +
        "w AS (SELECT e.event_type, e.value, " +
        "time_bucket(INTERVAL '15 minutes', CAST(e.ts AS TIMESTAMP)) " +
        "- to_minutes(15 * j.j::INT) AS win_start, " +
        "CAST(e.ts AS TIMESTAMP) AS t FROM events e CROSS JOIN j) " +
        "SELECT win_start, event_type, count(*)::BIGINT AS n, " +
        "sum(value) AS sum_value FROM w " +
        "WHERE t >= win_start AND t < win_start + INTERVAL '1 hour' " +
        "GROUP BY 1, 2"),
    "q125_epoch_compaction" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    "q124_filter_funnel" -> {
      val stop = graft.text.TextStats.defaultStopwords
        .map(w => s"'$w'").mkString(",")
      "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks, " +
        "CASE WHEN len(string_split(text,' ')) < 2 THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+1],' ') " +
        "FOR i IN range(1, len(string_split(text,' ')))] END AS sh " +
        "FROM documents), " +
        "c AS (SELECT doc_id, unnest(sh) AS g FROM t), " +
        "cnt AS (SELECT doc_id, g, count(*) AS cnt FROM c GROUP BY 1, 2), " +
        "bg AS (SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams, " +
        "count(*)::BIGINT AS n_distinct_bigrams, " +
        "max(cnt)::BIGINT AS max_bigram_cnt FROM cnt GROUP BY doc_id), " +
        "sig AS (SELECT t.doc_id, len(toks)::BIGINT AS n_tokens, " +
        "(length(text) - (len(toks) - 1))::BIGINT AS sum_tok_len, " +
        "bg.n_bigrams, bg.n_distinct_bigrams, bg.max_bigram_cnt, " +
        s"len(list_intersect(toks, [$stop]))::BIGINT AS stop_hits " +
        "FROM t JOIN bg ON t.doc_id = bg.doc_id) " +
        "SELECT count(*)::BIGINT AS n_docs, " +
        "sum(CASE WHEN NOT (n_tokens BETWEEN 20 AND 1000) THEN 1 ELSE 0 END)::BIGINT AS fail_len, " +
        "sum(CASE WHEN NOT (sum_tok_len >= n_tokens * 3 AND sum_tok_len <= n_tokens * 10) THEN 1 ELSE 0 END)::BIGINT AS fail_tok_len, " +
        "sum(CASE WHEN NOT ((n_bigrams - n_distinct_bigrams) * 100 <= n_bigrams * 18) THEN 1 ELSE 0 END)::BIGINT AS fail_rep, " +
        "sum(CASE WHEN NOT (max_bigram_cnt * 5 <= n_bigrams) THEN 1 ELSE 0 END)::BIGINT AS fail_top_bigram, " +
        "sum(CASE WHEN NOT (stop_hits >= 2) THEN 1 ELSE 0 END)::BIGINT AS fail_stopword, " +
        "sum(CASE WHEN n_tokens BETWEEN 20 AND 1000 " +
        "AND sum_tok_len >= n_tokens * 3 AND sum_tok_len <= n_tokens * 10 " +
        "AND (n_bigrams - n_distinct_bigrams) * 100 <= n_bigrams * 18 " +
        "AND max_bigram_cnt * 5 <= n_bigrams AND stop_hits >= 2 " +
        "THEN 1 ELSE 0 END)::BIGINT AS survivors FROM sig"
    },
    "q123_snapshot_incremental_read" ->
      ("SELECT event_id, user_id, event_type, value FROM events " +
        "WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00'"),
    "q122_stream_snapshot_ingest" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    "q121_rollup_report" ->
      ("SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n, " +
        "sum(l_quantity) AS sum_qty FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
    "q120_bloom_point" ->
      ("SELECT event_id, user_id, event_type, value FROM events " +
        "WHERE event_id IN (7, 42, 555, 900)"),
    "q119_profile" -> {
      def block(expr: String, name: String): String =
        s"SELECT '$name' AS colname, max(n) AS n, " +
          s"(SELECT count(*)::BIGINT FROM lineitem WHERE ($expr) IS NULL) AS nulls, " +
          "count(*)::BIGINT AS n_distinct, min(v) AS vmin, max(v) AS vmax, " +
          "min(CASE WHEN cum*100 >= n*50 THEN v END) AS p50, " +
          "min(CASE WHEN cum*100 >= n*90 THEN v END) AS p90, " +
          "min(CASE WHEN cum*100 >= n*99 THEN v END) AS p99 " +
          "FROM (SELECT v, cnt, sum(cnt) OVER (ORDER BY v ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum, " +
          "sum(cnt) OVER ()::BIGINT AS n " +
          s"FROM (SELECT CAST($expr AS DOUBLE) AS v, count(*)::BIGINT AS cnt " +
          s"FROM lineitem WHERE ($expr) IS NOT NULL GROUP BY 1))"
      Seq(block("l_quantity", "l_quantity"),
        block("l_discount", "l_discount"),
        block("floor(l_extendedprice)", "l_price_fl")).mkString(" UNION ALL ")
    },
    "q118_snapshot_diff" ->
      ("WITH oldt AS (SELECT event_id, user_id, event_type, value " +
        "FROM events), " +
        "newt AS (SELECT event_id, user_id, event_type, " +
        "CASE WHEN event_id % 7 = 0 THEN value * 2 ELSE value END AS value " +
        "FROM events WHERE event_id % 13 <> 0 " +
        "UNION ALL SELECT event_id + 1000000, user_id, 'insert', value " +
        "FROM events WHERE event_id % 17 = 0), " +
        "d AS (SELECT COALESCE(o.event_id, n.event_id) AS event_id, " +
        "CASE WHEN o.event_id IS NULL THEN 'I' " +
        "WHEN n.event_id IS NULL THEN 'D' " +
        "WHEN NOT (o.user_id IS NOT DISTINCT FROM n.user_id " +
        "AND o.event_type IS NOT DISTINCT FROM n.event_type " +
        "AND o.value IS NOT DISTINCT FROM n.value) THEN 'U' END AS op, " +
        "CASE WHEN n.event_id IS NULL THEN o.user_id ELSE n.user_id END AS user_id, " +
        "CASE WHEN n.event_id IS NULL THEN o.event_type ELSE n.event_type END AS event_type, " +
        "CASE WHEN n.event_id IS NULL THEN o.value ELSE n.value END AS value " +
        "FROM oldt o FULL JOIN newt n ON o.event_id = n.event_id) " +
        "SELECT event_id, op, user_id, event_type, value FROM d " +
        "WHERE op IS NOT NULL"),
    "q117_stream_outer_join" ->
      ("SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id " +
        "FROM events c LEFT JOIN events p ON c.user_id = p.user_id " +
        "AND p.event_type = 'purchase' " +
        "AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP) - INTERVAL 1 HOUR " +
        "AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) " +
        "WHERE c.event_type = 'click'"),
    "q116_incremental_agg" ->
      ("SELECT user_id, event_type, count(*)::BIGINT AS n, " +
        "sum(value) AS total, min(value) AS vmin, max(value) AS vmax, " +
        "sum(value) / count(*) AS avg_value FROM events GROUP BY 1, 2"),
    "q115_gap_fill" ->
      ("WITH agg AS (SELECT user_id, date_trunc('hour', " +
        "CAST(ts AS TIMESTAMP)) AS h, max(value) AS v FROM events " +
        "GROUP BY 1, 2), " +
        "span AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM agg " +
        "GROUP BY 1), " +
        "grid AS (SELECT user_id, unnest(generate_series(lo, hi, " +
        "INTERVAL 1 HOUR)) AS h FROM span) " +
        "SELECT g.user_id, g.h AS hour, " +
        "last_value(a.v IGNORE NULLS) OVER (PARTITION BY g.user_id " +
        "ORDER BY g.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS value FROM grid g " +
        "LEFT JOIN agg a ON g.user_id = a.user_id AND g.h = a.h"),
    "q114_compact_files" ->
      ("SELECT event_id, user_id, event_type, " +
        "strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt FROM events"),
    "q113_zorder_box" ->
      ("SELECT event_id, user_id, event_type FROM events " +
        "WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00' " +
        "AND user_id BETWEEN 0 AND 3"),
    "q111_stats_pruned" ->
      ("SELECT event_id, user_id, event_type FROM events " +
        "WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'"),
    "q110_ccnet_tiers" ->
      ("WITH g AS (SELECT doc_id, unnest([substr(text, i, 3) " +
        "FOR i IN range(1, greatest(length(text) - 2, 0) + 1)]) AS gram " +
        "FROM documents), " +
        // the model trains on the same 20% hash-sample the engine uses
        "m AS (SELECT gram, count(*) AS cnt FROM g WHERE " +
        "('0x' || substr(md5('ngram:' || doc_id::VARCHAR), 1, 15))::BIGINT " +
        "% 5 = 0 GROUP BY 1 HAVING count(*) >= 2), " +
        "sc AS (SELECT doc_id, count(*)::BIGINT AS n_grams, " +
        "sum(CASE WHEN m.cnt IS NULL THEN 0 " +
        "ELSE length(bin(m.cnt)) - 1 END)::BIGINT AS fam_raw " +
        "FROM g LEFT JOIN m USING (gram) GROUP BY 1), " +
        "s AS (SELECT doc_id, (fam_raw * 1000) // n_grams AS fam_q " +
        "FROM sc WHERE n_grams > 0), " +
        "per AS (SELECT fam_q, count(*)::BIGINT AS c FROM s GROUP BY 1), " +
        "cum AS (SELECT fam_q, COALESCE(sum(c) OVER (ORDER BY fam_q DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT " +
        "AS before FROM per), " +
        "n AS (SELECT count(*)::BIGINT AS n FROM s), " +
        "t AS (SELECT fam_q, (CASE WHEN before < 1 * n // 3 THEN 1 " +
        "WHEN before < 2 * n // 3 THEN 2 ELSE 3 END)::BIGINT AS tier " +
        "FROM cum, n) " +
        "SELECT s.doc_id, s.fam_q, t.tier FROM s JOIN t USING (fam_q)"),
    "q109_split_skew_join" ->
      ("WITH dim AS (SELECT user_id, count(*)::BIGINT AS purchase_cnt " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1) " +
        "SELECT e.event_id, e.user_id, dim.purchase_cnt " +
        "FROM events e LEFT JOIN dim ON e.user_id = dim.user_id"),
    "q108_scd2_history" ->
      ("WITH d AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, " +
        "value, row_number() OVER (PARTITION BY user_id, ts " +
        "ORDER BY event_id DESC) AS rn FROM events), " +
        "k AS (SELECT user_id, ts, event_type, value FROM d WHERE rn = 1) " +
        "SELECT user_id, event_type, value, ts AS valid_from, " +
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to FROM k"),
    "q107_stream_interval_join" ->
      ("SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id " +
        "FROM events c JOIN events p ON c.user_id = p.user_id " +
        "AND c.event_type = 'click' AND p.event_type = 'purchase' " +
        "AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP) - INTERVAL 1 HOUR " +
        "AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)"),
    "q106_volume_drift" ->
      ("WITH v AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), " +
        "'%Y-%m-%d') AS d, count(*)::BIGINT AS n FROM events GROUP BY 1, 2), " +
        "m AS (SELECT event_type, d, n, CAST(round(2 * quantile_cont(n, 0.5) " +
        "OVER (PARTITION BY event_type ORDER BY d " +
        "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS BIGINT) AS baseline_med2 " +
        "FROM v) " +
        "SELECT event_type, d, n, baseline_med2, " +
        "CASE WHEN baseline_med2 IS NULL THEN false " +
        "ELSE abs(2 * n - baseline_med2) * 100 > baseline_med2 * 20 END AS drifted " +
        "FROM m"),
    "q102_dsir_select" ->
      // mirrors Dsir.selectLikeTarget exactly: md5-hash each WORD into
      // 16384 buckets, bigram bucket = (31*h(a)+h(b)) mod 16384,
      // lam = flog2(cnt_en+1) - flog2(cnt_all+1) (+64 shift keeps the
      // integer division non-negative), mean permille, deterministic
      // top-100. Target ⊆ raw, so raw-side LEFT JOIN covers every
      // populated bucket.
      ("WITH tok AS (SELECT doc_id, lang, list_filter(" +
        "regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w " +
        "FROM documents), " +
        "wb AS (SELECT doc_id, lang, list_transform(w, x -> " +
        "('0x' || substr(md5(x), 1, 15))::BIGINT % 16384) AS h FROM tok), " +
        "b AS (SELECT doc_id, lang, unnest(h || (CASE WHEN len(h) < 2 " +
        "THEN []::BIGINT[] ELSE [(h[i] * 31 + h[i+1]) % 16384 " +
        "FOR i IN range(1, len(h))] END)) AS bucket FROM wb), " +
        "tcnt AS (SELECT bucket, count(*) AS cnt_t FROM b WHERE lang = 'en' GROUP BY 1), " +
        "rcnt AS (SELECT bucket, count(*) AS cnt_r FROM b GROUP BY 1), " +
        "lam AS (SELECT r.bucket, (length(bin(COALESCE(t.cnt_t, 0) + 1)) - 1) - " +
        "(length(bin(r.cnt_r + 1)) - 1) AS lam " +
        "FROM rcnt r LEFT JOIN tcnt t USING (bucket)), " +
        "sc AS (SELECT b.doc_id, count(*)::BIGINT AS n_grams, " +
        "sum(COALESCE(lam.lam, 0) + 64)::BIGINT AS lam_sum " +
        "FROM b LEFT JOIN lam USING (bucket) GROUP BY 1) " +
        "SELECT doc_id, n_grams, (lam_sum * 1000 // n_grams)::BIGINT AS dsir_q " +
        "FROM sc WHERE n_grams > 0 ORDER BY dsir_q DESC, doc_id LIMIT 100"),
    // the PQ pipeline self-certifies reconstruction error + top-1
    // recovery in-query (raise_error), so the certified output IS the
    // exact top-1 — the q47/q64 brute-force cosine SQL at rank 1
    "q100_pq_ann" ->
      ("WITH e AS (SELECT vec_id, [embedding[i]::DOUBLE + " +
        "CASE WHEN i - 1 = vec_id % 16 THEN 10.0 ELSE 0.0 END " +
        "FOR i IN range(1, len(embedding) + 1)] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank, " +
        "true AS ok FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank = 1"),
    // certification (c) pins survivors == base ids: every planted
    // near-copy (vec_id+1e6) is dropped, every base vector survives
    "q103_semdedup" ->
      "SELECT vec_id, true AS ok FROM embeddings",
    // the in-query decode∘encode identity certifies the tokenizer; the
    // certified word count is Dsir.wordTokens' split, SQL-expressible
    "q104_bpe_tokens" ->
      ("SELECT doc_id, len(list_filter(" +
        "regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))" +
        "::BIGINT AS n_words, true AS ok FROM documents"),
    // the in-query 95%-accuracy gate certifies the learned filter; the
    // planted label (more 'slow' than 'fast' mentions) is the output
    "q145_quality_classifier" ->
      ("SELECT doc_id, CAST(len(string_split(text, 'slow')) > " +
        "len(string_split(text, 'fast')) AS INT) AS label, true AS ok " +
        "FROM documents"),
    "q87_shard_pack" ->
      ("WITH k AS (SELECT doc_id, source, n_chars, " +
        "('0x' || substr(md5('shard' || doc_id::VARCHAR), 1, 15))::BIGINT AS h " +
        "FROM documents), " +
        // ::BIGINT everywhere a sum appears: DuckDB widens sum(BIGINT)
        // to HUGEINT, which hash-mismatches Spark's BIGINT (q71 lesson)
        "c AS (SELECT doc_id, source, COALESCE(sum(n_chars) OVER " +
        "(ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT " +
        "AS cum_before FROM k) " +
        "SELECT doc_id, source, cum_before, " +
        "(cum_before // 25000)::BIGINT AS shard_id FROM c"),
    "q88_token_chunks" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "w AS (SELECT doc_id, toks, unnest(range((len(toks)-1)//24 + 1)) AS k FROM t) " +
        "SELECT doc_id, k::BIGINT AS chunk_idx, " +
        "array_to_string(toks[k*24+1 : k*24+32], ' ') AS chunk_text, " +
        "len(toks[k*24+1 : k*24+32])::BIGINT AS n_chunk_tokens FROM w"),
    "q89_quota_cap" ->
      ("WITH k AS (SELECT doc_id, source, " +
        "('0x' || substr(md5('quota' || doc_id::VARCHAR), 1, 15))::BIGINT AS h " +
        "FROM documents), " +
        "r AS (SELECT doc_id, source, row_number() OVER " +
        "(PARTITION BY source ORDER BY h, doc_id) AS rnk FROM k) " +
        "SELECT doc_id, source, rnk::BIGINT AS quota_rank FROM r WHERE rnk <= 10"),
    "q91_quality_filter" -> {
      val stop = graft.text.TextStats.defaultStopwords
        .map(w => s"'$w'").mkString(",")
      "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks, " +
        "CASE WHEN len(string_split(text,' ')) < 2 THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+1],' ') " +
        "FOR i IN range(1, len(string_split(text,' ')))] END AS sh " +
        "FROM documents), " +
        "c AS (SELECT doc_id, unnest(sh) AS g FROM t), " +
        "cnt AS (SELECT doc_id, g, count(*) AS cnt FROM c GROUP BY 1, 2), " +
        "bg AS (SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams, " +
        "count(*)::BIGINT AS n_distinct_bigrams, " +
        "max(cnt)::BIGINT AS max_bigram_cnt FROM cnt GROUP BY doc_id), " +
        "sig AS (SELECT t.doc_id, len(toks)::BIGINT AS n_tokens, " +
        "(length(text) - (len(toks) - 1))::BIGINT AS sum_tok_len, " +
        "bg.n_bigrams, bg.n_distinct_bigrams, bg.max_bigram_cnt, " +
        s"len(list_intersect(toks, [$stop]))::BIGINT AS stop_hits " +
        "FROM t JOIN bg ON t.doc_id = bg.doc_id) " +
        "SELECT * FROM sig WHERE n_tokens BETWEEN 20 AND 1000 " +
        "AND sum_tok_len >= n_tokens * 3 AND sum_tok_len <= n_tokens * 10 " +
        "AND (n_bigrams - n_distinct_bigrams) * 100 <= n_bigrams * 18 " +
        "AND max_bigram_cnt * 5 <= n_bigrams AND stop_hits >= 2"
    },
    "q90_training_export" ->
      ("WITH k AS (SELECT doc_id, source, n_chars, text, " +
        "('0x' || substr(md5('quota' || doc_id::VARCHAR), 1, 15))::BIGINT AS qh " +
        "FROM documents), " +
        "r AS (SELECT doc_id, n_chars, text, row_number() OVER " +
        "(PARTITION BY source ORDER BY qh, doc_id) AS rnk FROM k), " +
        "s AS (SELECT doc_id, n_chars, text, " +
        "('0x' || substr(md5('shard' || doc_id::VARCHAR), 1, 15))::BIGINT AS sh " +
        "FROM r WHERE rnk <= 10), " +
        "c AS (SELECT doc_id, text, COALESCE(sum(n_chars) OVER " +
        "(ORDER BY sh, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT " +
        "AS cb FROM s), " +
        "p AS (SELECT doc_id, text, (cb // 5000)::BIGINT AS shard_id FROM c), " +
        "t AS (SELECT doc_id, shard_id, string_split(text, ' ') AS toks FROM p), " +
        "w AS (SELECT doc_id, shard_id, toks, " +
        "unnest(range((len(toks)-1)//48 + 1)) AS kk FROM t) " +
        "SELECT doc_id, shard_id, kk::BIGINT AS chunk_idx, " +
        "array_to_string(toks[kk*48+1 : kk*48+64], ' ') AS chunk_text FROM w"),
    "q85_neardup_keepbest" ->
      ("WITH RECURSIVE t AS (SELECT doc_id, list_distinct(" +
        "CASE WHEN len(string_split(text,' ')) < 3 THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+2],' ') " +
        "FOR i IN range(1, len(string_split(text,' '))-1)] END) AS sh " +
        "FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.sh,b.sh))::DOUBLE / " +
        "len(list_distinct(list_concat(a.sh,b.sh))) >= 0.5), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM p " +
        "UNION SELECT id_b, id_a FROM p), " +
        "reach(a, b) AS (SELECT src, dst FROM edges " +
        "UNION SELECT r.a, e.dst FROM reach r JOIN edges e " +
        "ON e.src = r.b WHERE e.dst <> r.a), " +
        "cl AS (SELECT a, least(a, min(b)) AS cluster_id FROM reach GROUP BY a), " +
        "lab AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id, " +
        "d.lang, d.source, d.n_chars FROM documents d LEFT JOIN cl ON cl.a = d.doc_id) " +
        "SELECT doc_id, lang, source, n_chars FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY cluster_id " +
        "ORDER BY n_chars DESC, doc_id) AS rn FROM lab) WHERE rn = 1"),
    "q83_cluster_survivors" ->
      ("WITH RECURSIVE ids AS (SELECT doc_id AS d FROM documents), " +
        "n AS (SELECT count(*) AS n FROM documents), " +
        "ch AS (SELECT d AS id_a, d + 1 AS id_b FROM ids, n " +
        "WHERE d % 10 <> 9 AND d < n - 1), " +
        "ov AS (SELECT d AS id_a, (d * 31) % n AS id_b FROM ids, n " +
        "WHERE d % 97 = 0), " +
        "p AS (SELECT * FROM ch UNION ALL SELECT * FROM ov), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM p " +
        "UNION SELECT id_b, id_a FROM p), " +
        "reach(a, b) AS (SELECT src, dst FROM edges " +
        "UNION SELECT r.a, e.dst FROM reach r JOIN edges e " +
        "ON e.src = r.b WHERE e.dst <> r.a), " +
        "cl AS (SELECT a, least(a, min(b)) AS cluster_id FROM reach GROUP BY a), " +
        "lab AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id, " +
        "d.lang, d.source, d.n_chars FROM documents d LEFT JOIN cl ON cl.a = d.doc_id) " +
        "SELECT doc_id, lang, source, n_chars FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY cluster_id " +
        "ORDER BY n_chars DESC, doc_id) AS rn FROM lab) WHERE rn = 1"),
    "q84_span_dedup_withindoc" ->
      ("WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sp AS (SELECT doc_id, [array_to_string(w[i*3+1 : i*3+3], ' ') " +
        "FOR i IN range(CAST(ceil(len(w)/3.0) AS BIGINT))] AS spans FROM s) " +
        "SELECT doc_id, array_to_string(list_filter(spans, " +
        "(x, i) -> list_position(spans, x) = i), ' ') AS text_dedup FROM sp"),
    "q82_embed_quantize" ->
      ("WITH m AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT vec_id, v, list_aggregate(v, 'min') AS mn, list_aggregate(v, 'max') AS mx FROM m), " +
        "c AS (SELECT vec_id, v, mn, mx, (mx - mn)/255.0 AS sc FROM b), " +
        "c2 AS (SELECT vec_id, mn, mx, list_transform(v, x -> CASE WHEN sc = 0 THEN 0 " +
        "ELSE CAST(floor((x - mn)/sc + 0.5) AS INTEGER) - 128 END) AS codes FROM c) " +
        "SELECT vec_id, unnest(range(len(codes))) AS i, unnest(codes) AS q8, mn, mx FROM c2"),
    "q81_span_dedup" ->
      ("WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "e AS (SELECT doc_id, unnest(range(CAST(ceil(len(w)/8.0) AS BIGINT))) AS pos, w FROM s), " +
        "sp AS (SELECT doc_id, pos, array_to_string(w[pos*8+1 : pos*8+8], ' ') AS span FROM e), " +
        "k AS (SELECT doc_id, pos, span FROM (SELECT doc_id, pos, span, " +
        "row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn FROM sp) WHERE rn = 1) " +
        "SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS text_dedup " +
        "FROM k GROUP BY doc_id"),
    "q79_corpus_mix" ->
      ("WITH c AS (SELECT doc_id, source, lang, " +
        "(CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END) + " +
        "(CASE WHEN ('0x' || substr(md5('mix' || doc_id::VARCHAR), 1, 15))::BIGINT " +
        "% 100 < (CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 40 ELSE 0 END) " +
        "THEN 1 ELSE 0 END) AS copies FROM documents) " +
        "SELECT doc_id, source, lang, unnest(range(copies)) AS epoch " +
        "FROM c WHERE copies > 0"),
    "q92_mix_temperature" ->
      ("WITH per AS (SELECT source, sum(n_chars)::BIGINT AS n_w " +
        "FROM documents GROUP BY 1), " +
        "d AS (SELECT sum(pow(n_w::DOUBLE, 0.5)) AS den, " +
        "sum(n_w)::BIGINT AS tot FROM per), " +
        "w AS (SELECT source, CAST(round(100.0 * pow(n_w::DOUBLE, 0.5) " +
        "/ den * (tot::DOUBLE * 0.5) / n_w::DOUBLE) AS BIGINT) AS w_pct " +
        "FROM per, d), " +
        "c AS (SELECT doc_id, doc.source, w_pct // 100 + " +
        "(CASE WHEN ('0x' || substr(md5('mix' || doc_id::VARCHAR), 1, 15))::BIGINT " +
        "% 100 < w_pct % 100 THEN 1 ELSE 0 END) AS copies " +
        "FROM documents doc JOIN w ON doc.source = w.source) " +
        "SELECT doc_id, source, unnest(range(copies)) AS epoch " +
        "FROM c WHERE copies > 0"),
    "q93_lm_familiarity" ->
      ("WITH g AS (SELECT doc_id, unnest([substr(text, i, 3) " +
        "FOR i IN range(1, greatest(length(text) - 2, 0) + 1)]) AS gram " +
        "FROM documents), " +
        "m AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1 " +
        "HAVING count(*) >= 2), " +
        "s AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams, " +
        "sum(CASE WHEN m.cnt IS NULL THEN 0 " +
        "ELSE length(bin(m.cnt)) - 1 END)::BIGINT AS fam_raw " +
        "FROM g LEFT JOIN m USING (gram) GROUP BY 1) " +
        "SELECT doc_id, n_grams, (fam_raw * 1000) // n_grams AS fam_q " +
        "FROM s WHERE n_grams > 0"),
    "q95_asof_join" ->
      ("WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS last_purchase_ts, " +
        "max(value) AS last_purchase_value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets FROM events) " +
        "SELECT e.event_id, e.user_id, p.last_purchase_ts, p.last_purchase_value " +
        "FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id " +
        "AND e.ets >= p.last_purchase_ts"),
    "q97_stream_asof" ->
      ("WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS last_purchase_ts, " +
        "max(value) AS last_purchase_value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets FROM events) " +
        "SELECT e.event_id, e.user_id, p.last_purchase_ts, p.last_purchase_value " +
        "FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id " +
        "AND e.ets >= p.last_purchase_ts"),
    "q96_range_join" ->
      ("WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "top AS (SELECT ws FROM h ORDER BY n DESC, ws LIMIT 24), " +
        "w AS (SELECT ws + INTERVAL 10 MINUTE AS win_start, " +
        "ws + INTERVAL 50 MINUTE AS win_end FROM top) " +
        "SELECT e.event_id, w.win_start FROM events e, w " +
        "WHERE CAST(e.ts AS TIMESTAMP) >= w.win_start " +
        "AND CAST(e.ts AS TIMESTAMP) < w.win_end"),
    "q94_semantic_decontam" ->
      ("WITH e AS (SELECT embedding::DOUBLE[] AS ev FROM embeddings " +
        "WHERE vec_id < 20), " +
        "s AS (SELECT c.vec_id, max(list_dot_product(cv, ev) / " +
        "(sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(ev, ev)))) AS mc " +
        "FROM (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) c, e " +
        "GROUP BY 1) " +
        "SELECT vec_id, round(mc, 6) AS max_cos_r, " +
        "round(mc, 6) >= 0.9 AS contaminated FROM s"),
    "q77_fs_retention" ->
      ("WITH e AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d, " +
        "value FROM events), " +
        "top5 AS (SELECT DISTINCT d FROM e ORDER BY d DESC LIMIT 5) " +
        "SELECT d, count(*) AS n, round(sum(value), 3) AS sum_value_r " +
        "FROM e WHERE d IN (SELECT d FROM top5) GROUP BY d"),
    "q76_config_retention" ->
      ("WITH v AS (SELECT event_type, " +
        "strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY d DESC) AS rn FROM v) " +
        "SELECT event_type, d, n FROM r WHERE rn <= " +
        "CASE event_type WHEN 'click' THEN 6 WHEN 'error' THEN 2 ELSE 3 END"),
    "q75_stage_metrics" ->
      ("WITH c AS (SELECT count(*) AS n_read, " +
        "count(*) FILTER (WHERE l_quantity <= 45) AS n_passed, " +
        "count(*) FILTER (WHERE l_quantity > 45) AS n_rejected, " +
        "count(*) FILTER (WHERE l_quantity <= 45 AND l_orderkey % 2 = 0) AS n_evens, " +
        "count(*) FILTER (WHERE l_quantity <= 45 AND l_orderkey % 2 = 1) AS n_odds " +
        "FROM lineitem) " +
        "SELECT 'q75job' AS context, 'records.read' AS metric, n_read AS value FROM c " +
        "UNION ALL SELECT 'q75job', 'records.passed', n_passed FROM c " +
        "UNION ALL SELECT 'q75job', 'records.rejected', n_rejected FROM c " +
        "UNION ALL SELECT 'q75job', 'records.routed', n_evens + n_odds FROM c " +
        "UNION ALL SELECT 'q75job', 'records.written', n_evens + n_odds FROM c " +
        "UNION ALL SELECT 'q75job.source', 'records.read', n_read FROM c " +
        "UNION ALL SELECT 'q75job.source', 'records.passed', n_passed FROM c " +
        "UNION ALL SELECT 'q75job.source', 'records.rejected', n_rejected FROM c " +
        "UNION ALL SELECT 'q75job.branch.evens', 'records.routed', n_evens FROM c " +
        "UNION ALL SELECT 'q75job.branch.evens', 'records.written', n_evens FROM c " +
        "UNION ALL SELECT 'q75job.branch.odds', 'records.routed', n_odds FROM c " +
        "UNION ALL SELECT 'q75job.branch.odds', 'records.written', n_odds FROM c"),
    "q71_corpus_profile" ->
      ("SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars, " +
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars, " +
        "quantile_cont(n_chars, 0.5) AS median_chars, " +
        "round(sum(n_chars)::DOUBLE / count(*), 6) AS mean_chars_r " +
        "FROM documents GROUP BY lang"),
    "q72_decontaminate" ->
      ("WITH g AS (SELECT doc_id, CASE WHEN len(string_split(text,' ')) < 4 " +
        "THEN [text] " +
        "ELSE [array_to_string(string_split(text,' ')[i:i+3],' ') " +
        "FOR i IN range(1, len(string_split(text,' '))-2)] END AS sh " +
        "FROM documents), " +
        "bench AS (SELECT DISTINCT unnest(sh) AS gr FROM g WHERE doc_id % 50 = 0), " +
        "corp AS (SELECT doc_id, unnest(sh) AS gr FROM g WHERE doc_id % 50 <> 0), " +
        "contaminated AS (SELECT DISTINCT doc_id FROM corp JOIN bench USING (gr)) " +
        "SELECT d.doc_id, d.lang, d.source FROM documents d " +
        "WHERE d.doc_id % 50 <> 0 " +
        "AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)"),
    "q28_ann_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv " +
        "FROM embeddings WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings), " +
        "scored AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * " +
        "sqrt(list_dot_product(cv, cv))) AS cosine FROM q, c " +
        "WHERE neighbor_id <> query_id) " +
        "SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 10"),
  )
}
