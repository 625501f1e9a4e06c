package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gripql._
import graft.model.GraphFrame
import graft.compiler.Traversal

/** Self-measured baseline runner — the reference ships benchmark harnesses
  * but publishes no numbers (BASELINE.md), so this reproduces its workload
  * shapes on the Spark engine and prints one JSON line to record:
  *  - graph-bench synthetic: 50k roots × (1 vertex + 3 out-edges + 3
  *    vertices) = 200k vertices / 150k edges
  *    (reference: benchmark/graph-bench/main.go:99-160)
  *  - full scans V()/E() (reference: benchmark/engine_test.go:17-45)
  *  - 1-hop V().hasLabel("Person").out("knows").count()
  *    (reference: benchmark/graph-bench/main.go:156-190)
  *  - 3-hop point traversal (conformance ot_path_optimize.py shape)
  *  - term/histogram/percentile aggregations over one label
  */
object Baseline {
  def synth(spark: SparkSession): GraphFrame = {
    val roots = spark.range(50000).select(
      concat(lit("p:"), col("id")).as("gid"), lit("Person").as("label"),
      to_json(struct(col("id").as("n"), (col("id") % 97).cast("double").as("score"))).as("data"))
    val kids = spark.range(150000).select(
      concat(lit("k:"), col("id")).as("gid"), lit("Person").as("label"),
      to_json(struct(col("id").as("n"), (col("id") % 89).cast("double").as("score"))).as("data"))
    val edges = spark.range(150000).select(
      concat(lit("e:"), col("id")).as("gid"), lit("knows").as("label"),
      concat(lit("p:"), col("id") % 50000).as("from"), concat(lit("k:"), col("id")).as("to"),
      lit("{}").as("data"))
    GraphFrame(roots.unionByName(kids), edges)
  }

  /** Synthetic near-dup corpus for the scaling probe: ~150 words drawn by
    * hash from a 500-word shared vocabulary (template-homogeneous, like
    * the driver corpus), and the last 2% of docs are near-copies of early
    * docs (149 shared words + 1 unique), so the LSH path has real work. */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val vocab = array((0 until 500).map(i => lit(s"w$i")): _*)
    val seed = col("id") % lit(math.max(1L, n * 49 / 50))
    // hash (seed, k) as a PAIR: the earlier seed*31+k form made
    // consecutive seeds draw the same hash-input range shifted by 31, so
    // every seed-neighbor pair silently shared 118/149 words — ~49k
    // accidental near-dup pairs at 50k docs instead of the 1k planted
    val words = (0 until 149).map(k =>
      element_at(vocab, (pmod(xxhash64(seed, lit(k)), lit(500)) + 1).cast("int")))
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words :+ concat(lit("u"), col("id")): _*).as("text"))
  }

  def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def median3(f: => Unit): Double = Seq(timeIt(f), timeIt(f), timeIt(f)).sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-baseline").toString

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // focused runs: SPARK_GRAFT_BASELINE_SECTIONS=jsontax,streamidx runs
    // only those probe sections (default: everything)
    val sections = sys.env.get("SPARK_GRAFT_BASELINE_SECTIONS").map(_.split(",").toSet)
    def sec(name: String): Boolean = sections.forall(_.contains(name))
    def Q = Query()

    if (sec("core")) {
    results("ingest_200k_150k") = timeIt { synth(spark).save(dir) }
    val g = GraphFrame.load(spark, dir)
    def run(q: Query): Unit = Traversal.run(spark, g, q).count()

    results("v_count") = median3 { run(Q.V().count()) }
    results("e_count") = median3 { run(Q.E().count()) }
    results("onehop_label_out_count") = median3 { run(Q.V().hasLabel("Person").out("knows").count()) }
    results("threehop_point") = median3 { run(Q.V("p:17").out().out().out()) }
    results("agg_term_hist_pct") = median3 { run(Q.V().hasLabel("Person").aggregate(
      Agg.Term("t", "score", 10), Agg.Histogram("h", "score", 10),
      Agg.Percentile("p", "score", Seq(25, 50, 75, 99)))) }

    // bucketed layout: the same 1-hop under shuffle-join conditions
    // (broadcast disabled — the big-data regime), plain parquet vs the
    // bucketed adjacency layout; the delta is the stored side's shuffle
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      results("onehop_shuffle_plain") = median3 {
        run(Q.V().hasLabel("Person").out("knows").count())
      }
      graft.model.BucketedGraph.drop(spark, "baseline_bg")
      results("bucketed_save") = timeIt {
        graft.model.BucketedGraph.save(spark, g, "baseline_bg")
      }
      val bg = graft.model.BucketedGraph.load(spark, "baseline_bg")
      results("onehop_shuffle_bucketed") = median3 {
        Traversal.run(spark, bg, Q.V().hasLabel("Person").out("knows").count()).count()
      }
      graft.model.BucketedGraph.drop(spark, "baseline_bg")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } // sec("core")

    if (sec("corpus")) {
    // corpus scaling probe: the dedup family at bench scale (5k docs =
    // sf0.1's documents table) and at 10x, single timed run each after the
    // 5k warm-up — the 10x/1x ratio is the evidence that the LSH banded
    // join scales near-linearly rather than quadratically
    // MATERIALIZE the corpora before timing: corpus() is a lazy 149-wide
    // hash projection, and an op that scans its input k times would
    // otherwise be charged k corpus syntheses (curate measured 2x its
    // real cost before this) — the probe times the OPERATOR on data at
    // rest, like the driver's parquet tables
    val c5 = corpus(spark, 5000).localCheckpoint(true)
    val c50 = corpus(spark, 50000).localCheckpoint(true)
    // one unrecorded warm-up run so the 5k number measures the pipeline,
    // not the shingle/hash machinery's first-touch classload — otherwise
    // the 10x/1x ratio reads flatter than it is
    graft.pipeline.Dedup.nearDupMinhash(c5, "doc_id", "text").count()
    results("minhash_neardup_5k") = timeIt { graft.pipeline.Dedup.nearDupMinhash(c5, "doc_id", "text").count() }
    results("minhash_neardup_50k") = timeIt { graft.pipeline.Dedup.nearDupMinhash(c50, "doc_id", "text").count() }
    // the production banding for a 0.5 threshold: 16 bands x 4 rows
    // (collision threshold (1/16)^(1/4) = 0.5) — the default 32x2 is kept
    // loose for exact-oracle recall and admits this corpus's j~0.18
    // background; this row is the evidence that the knob, not the
    // algorithm, is what the homogeneous-corpus ratio measures
    results("minhash_neardup_50k_16x4") = timeIt {
      graft.pipeline.Dedup.nearDupMinhash(c50, "doc_id", "text", bands = 16).count() }
    results("exact_dedup_50k") = timeIt { graft.pipeline.Dedup.exact(c50, "doc_id", "text").count() }
    results("curate_50k") = timeIt { graft.pipeline.Curation.curate(c50, "doc_id", "text").count() }
    // simhash at the PRODUCTION radius (Manku et al. run 64-bit simhash at
    // radius ~3; 7 is this library's default) — the p03 bench entry pins
    // radius 13 for exact-Jaccard oracle parity, where the hamming ball
    // itself is quadratic on a homogeneous corpus, so the scale evidence
    // has to come from the radius the operator is meant to run at
    graft.pipeline.Dedup.nearDupSimhash(c5, "doc_id", "text").count()
    results("simhash_neardup_5k") = timeIt { graft.pipeline.Dedup.nearDupSimhash(c5, "doc_id", "text").count() }
    results("simhash_neardup_50k") = timeIt { graft.pipeline.Dedup.nearDupSimhash(c50, "doc_id", "text").count() }
    } // sec("corpus")

    if (sec("index")) {
    // physical field-index probe: 2M one-label vertices, string point
    // predicate on an indexed field. The unindexed plan decodes every
    // row's data column through the JSON extraction; the indexed layout
    // (materialized __idx column, range-sorted files) answers from a
    // pushed parquet filter over stats-pruned files/row groups. The
    // rows-read metric is the skip evidence; the time ratio is the win.
    {
      import org.apache.spark.sql.functions.{col, concat, lit, format_string}
      val idxRoot = java.nio.file.Files.createTempDirectory("graft-baseline-idx").toString
      val cat = new graft.model.Catalog(spark, idxRoot)
      val pv = spark.range(2000000L).select(
        concat(lit("v"), col("id")).as("gid"), lit("Person").as("label"),
        format_string("""{"name":"n%d","pad":"%08d"}""", col("id") % 10000, col("id")).as("data"))
      val pe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], GraphFrame.edgeSchema)
      cat.createGraph("idxprobe", GraphFrame(pv, pe))
      val pq = Q.V().hasLabel("Person").has(graft.gripql.P.eq_("name", "n4242"))
      def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
        // collect() executes THIS df's plan (count() would plan a separate
        // aggregate query and leave these metrics untouched)
        df.collect()
        def scans(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
          case other => other.children.map(scans).sum
        }
        scans(df.queryExecution.executedPlan)
      }
      // plain measurements BEFORE the build: the re-layout replaces the
      // label's files, so pre-index frames are stale afterwards
      val plainG = cat.graph("idxprobe").copy(fieldIndex = None)
      results("idx_point_plain_2m") = median3 {
        Traversal.run(spark, plainG, pq).count() }
      val rowsPlain = scala.util.Try(scanRows(Traversal.run(spark, plainG, pq))).getOrElse(-1L)
      results("idx_build_2m") = timeIt { cat.addIndex("idxprobe", "Person", "name") }
      val ig = cat.graph("idxprobe")
      results("idx_point_indexed_2m") = median3 {
        Traversal.run(spark, ig, pq).count() }
      val rowsIdx = scala.util.Try(scanRows(Traversal.run(spark, ig, pq))).getOrElse(-1L)
      results("idx_scan_rows_plain") = rowsPlain.toDouble
      results("idx_scan_rows_indexed") = rowsIdx.toDouble

      // numeric-range seek (r12): the same layout with a NUMERIC field
      // leading the sort — GT/LT/BETWEEN rewrite onto the float64
      // __idxn column as a pushed range filter, so the 20-row answer
      // reads only the row groups whose min/max band intersects
      // [4242, 4243). A separate graph so `num` is the leading (only)
      // index field; on a graph where another field leads, numeric
      // skipping is stats-assisted rather than clustered.
      val nv = spark.range(2000000L).select(
        concat(lit("v"), col("id")).as("gid"), lit("Person").as("label"),
        format_string("""{"num":%d,"pad":"%08d"}""", col("id") % 100000, col("id")).as("data"))
      cat.createGraph("idxprobe_n", GraphFrame(nv, pe))
      val nq = Q.V().hasLabel("Person").has(graft.gripql.P.between("num", 4242, 4243))
      val plainN = cat.graph("idxprobe_n").copy(fieldIndex = None)
      results("idxn_range_plain_2m") = median3 {
        Traversal.run(spark, plainN, nq).count() }
      val rowsPlainN = scala.util.Try(scanRows(Traversal.run(spark, plainN, nq))).getOrElse(-1L)
      cat.addIndex("idxprobe_n", "Person", "num")
      val ign = cat.graph("idxprobe_n")
      results("idxn_range_indexed_2m") = median3 {
        Traversal.run(spark, ign, nq).count() }
      val rowsIdxN = scala.util.Try(scanRows(Traversal.run(spark, ign, nq))).getOrElse(-1L)
      results("idxn_scan_rows_plain") = rowsPlainN.toDouble
      results("idxn_scan_rows_indexed") = rowsIdxN.toDouble
    }
    } // sec("index")

    if (sec("skew")) {
    // AQE skew-join probe (r12): a power-law hop at 10M edges where one
    // "celebrity" vertex owns 20% of the edges — the supernode shape a
    // 100× property graph is guaranteed to have. With broadcast disabled
    // (the big-data regime) the hop is a sort-merge join on e.from, and
    // the hub key lands 2M edge rows in one reduce partition; AQE's skew
    // handling must split it instead of leaving one straggler task. The
    // probe lowers the skew thresholds to fire at ~100 MB probe scale —
    // at production scale the 256 MB default fires with no tuning.
    {
      import org.apache.spark.sql.functions.{col, concat, lit, when, pmod, xxhash64}
      val nV = 1000000L
      val sv = spark.range(nV + 1).select(
        when(col("id") === nV, lit("hub")).otherwise(concat(lit("v"), col("id"))).as("gid"),
        lit("Person").as("label"), lit("{}").as("data")).localCheckpoint(true)
      val se = spark.range(10000000L).select(
        concat(lit("e"), col("id")).as("gid"), lit("knows").as("label"),
        when(col("id") % 5 === 0, lit("hub"))
          .otherwise(concat(lit("v"), pmod(xxhash64(col("id")), lit(nV)))).as("from"),
        concat(lit("v"), pmod(xxhash64(col("id"), lit(1L)), lit(nV))).as("to"),
        lit("{}").as("data")).localCheckpoint(true)
      val sg = GraphFrame(sv, se)
      val sq = Q.V().hasLabel("Person").out("knows").count()
      def hopWithPlan(): (Double, Boolean) = {
        val out = Traversal.run(spark, sg, sq)
        val t = timeIt { out.collect() }
        (t, out.queryExecution.executedPlan.toString.contains("skew=true"))
      }
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        val (_, split) = hopWithPlan() // warm + capture the plan verdict
        results("skew_hop_10m_aqe") = median3 { hopWithPlan() }
        results("skew_hop_10m_aqe_split") = if (split) 1.0 else 0.0
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        hopWithPlan()
        results("skew_hop_10m_noskewjoin") = median3 { hopWithPlan() }
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
      }
      sv.unpersist(); se.unpersist()
    }
    } // sec("skew")

    if (sec("loop")) {
    // jump-loop scale probe (r12), mirroring the components scale proof:
    // a 1M-vertex ring walked by a counter-terminated mark/jump loop, so
    // the frontier stays 1M rows for EVERY round. Linear 20r/5r scaling
    // (~4×) is the evidence the per-iteration localCheckpoint keeps
    // lineage flat — quadratic lineage would superlinearize the total
    // (reference semantics: engine/logic/jump.go; ot_repeat.py:35-57).
    {
      import org.apache.spark.sql.functions.{col, concat, lit, pmod}
      val n = 1000000L
      val lv = spark.range(n).select(concat(lit("v"), col("id")).as("gid"),
        lit("N").as("label"), lit("{}").as("data")).localCheckpoint(true)
      val le = spark.range(n).select(concat(lit("e"), col("id")).as("gid"),
        lit("n").as("label"), concat(lit("v"), col("id")).as("from"),
        concat(lit("v"), pmod(col("id") + 1L, lit(n))).as("to"),
        lit("{}").as("data")).localCheckpoint(true)
      val lg = GraphFrame(lv, le)
      // emit=false pure walk: downstream sees nothing (reference
      // jump.go:155-190), the work IS the k rounds, and the engine frees
      // each round's frontier checkpoint as the next materializes — loop
      // storage stays O(1 round) at any depth. The counter lives on a
      // MARK ($s.c): set() on the current element is dropped when out()
      // replaces it (the reference's set-then-hop rule).
      def walk(k: Int) = Q.V().hasLabel("N")
        .set("c", graft.gripql.GValue.GInt(0)).as("s")
        .mark("a").increment("$s.c", 1).out("n")
        .jump("a", Some(graft.gripql.P.lt("$s.c", k)), emit = false).count()
      def runWalk(k: Int): Unit = Traversal.run(spark, lg, walk(k)).collect()
      runWalk(2) // warm the loop machinery
      results("jump_ring_1m_5r") = timeIt { runWalk(5) }
      results("jump_ring_1m_20r") = timeIt { runWalk(20) }
      lv.unpersist(); le.unpersist()
    }
    } // sec("loop")

    if (sec("ingest")) {
    // incremental-ingest probe (r12): MutableGraph's merge is an anti-join
    // + union + full label rewrite per save — correct, but the write cost
    // tracks the LABEL size, not the delta size. Upserting the same 1k
    // vertices into a 200k-row label vs a 2M-row label isolates that:
    // near-10× growth = the overwrite dominating, the number that
    // motivates the delta-log/MERGE-INTO collapse the class doc names.
    {
      import org.apache.spark.sql.functions.{col, concat, lit, format_string}
      val upRoot = java.nio.file.Files.createTempDirectory("graft-baseline-up").toString
      val cat = new graft.model.Catalog(spark, upRoot)
      val ee = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], GraphFrame.edgeSchema)
      // 200k→2M→20M: at the small end fixed job overhead dominates and the
      // upsert time barely moves; the 20M point exposes the label-size-
      // proportional full-rewrite term the MERGE-INTO note is about
      for ((nRows, tag) <- Seq((200000L, "200k"), (2000000L, "2m"), (20000000L, "20m"))) {
        val pv = spark.range(nRows).select(
          concat(lit("v"), col("id")).as("gid"), lit("Person").as("label"),
          format_string("""{"n":%d}""", col("id")).as("data"))
        cat.createGraph(s"up$tag", GraphFrame(pv, ee))
        val g0 = GraphFrame.load(spark, s"$upRoot/up$tag")
        val mg = new graft.model.MutableGraph(spark, g0.vertices, g0.edges, Some(g0))
        (0 until 1000).foreach(i => mg.addVertex(s"u$i", "Person", s"""{"n":$i}"""))
        results(s"upsert_1k_into_$tag") = timeIt {
          mg.graph.save(s"$upRoot/up$tag.merged")
        }
      }
      // the delta path (r12): 2M rows × ~0.5 KB incompressible documents
      // across 20 labels, 1k upserts into ONE. saveIncremental's probe
      // scans two thin key columns and rewrites one label's partition;
      // the full save re-encodes every byte of all 20 — write
      // amplification scales with row BYTES, which is exactly what the
      // 30-byte synthetic rows of the earlier probes hid (20M×30 B
      // measured incremental 3.4 s vs full 3.9 s; real documents are
      // KB-scale and the gap is the partition ratio).
      import org.apache.spark.sql.functions.sha2
      val pad = concat((0 until 8).map(k =>
        sha2(concat(col("id").cast("string"), lit(s"k$k")), 256)): _*)
      val mv = spark.range(2000000L).select(
        concat(lit("v"), col("id")).as("gid"),
        concat(lit("L"), col("id") % 20).as("label"),
        format_string("""{"n":%d,"pad":"%s"}""", col("id"), pad).as("data"))
      cat.createGraph("upml", GraphFrame(mv, ee))
      val mgi = graft.model.MutableGraph(spark,
        GraphFrame.load(spark, s"$upRoot/upml"))
      (0 until 1000).foreach(i => mgi.addVertex(s"u$i", "L7", s"""{"n":$i}"""))
      results("upsert_1k_incr_2m_wide_20lbl") = timeIt { mgi.saveIncremental(s"$upRoot/upml") }
      val mgf = graft.model.MutableGraph(spark,
        GraphFrame.load(spark, s"$upRoot/upml"))
      (0 until 1000).foreach(i => mgf.addVertex(s"w$i", "L7", s"""{"n":$i}"""))
      results("upsert_1k_full_2m_wide_20lbl") = timeIt { mgf.graph.save(s"$upRoot/upml.full") }
    }
    } // sec("ingest")

    if (sec("jsontax")) {
    // JSON-parse-tax probe (r13, VERDICT task 5): every has() on an
    // UNINDEXED field pays get_json_object + try_cast per row
    // (Fields.scala); at 100 TB that parse is the dominant scan cost for
    // ad-hoc predicates. Isolate it: the same 2M-row numeric predicate,
    // selective enough that result handling is negligible but WIDE enough
    // (~50% of rows pass) that parquet row-group stats cannot shortcut
    // the scan — over (a) the stored JSON text (the engine's unindexed
    // path), (b) a shredded double sidecar column (what a sampled-schema-
    // driven shred would store), (c) a stored VariantType column (Spark
    // 4's semi-structured binary encoding). The (a)/(b) ratio is the
    // parse tax; (c) sits between (binary navigation, no text parse).
    {
      import org.apache.spark.sql.functions.{col, concat, lit, format_string,
        get_json_object, try_parse_json, try_variant_get}
      val root = java.nio.file.Files.createTempDirectory("graft-jsontax").toString
      // 20M rows: the 2M form finished sub-second on idle runs and the
      // parse-vs-column signal drowned in job overhead + box noise
      val base = spark.range(20000000L).select(
        concat(lit("v"), col("id")).as("gid"),
        format_string(
          """{"num":%d,"name":"n%d","pad":"%08d","tags":["a","b"],"extra":{"x":%d}}""",
          col("id") % 100000, col("id") % 10000, col("id"), col("id") % 7).as("data"))
      base.write.mode("overwrite").parquet(s"$root/json")
      base.withColumn("num_shred",
          get_json_object(col("data"), "$.num").try_cast("double"))
        .write.mode("overwrite").parquet(s"$root/shred")
      val canVariant =
        try {
          base.withColumn("var", try_parse_json(col("data")))
            .write.mode("overwrite").parquet(s"$root/variant")
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      val jdf = spark.read.parquet(s"$root/json")
      val sdf = spark.read.parquet(s"$root/shred")
      // the numeric has() expression exactly as Fields.scala compiles it
      val jsonPred = get_json_object(col("data"), "$.num").try_cast("double") >= lit(50000.0)
      def cnt(df: org.apache.spark.sql.DataFrame,
              p: org.apache.spark.sql.Column): Unit =
        assert(df.filter(p).count() == 10000000L)
      cnt(jdf, jsonPred) // warm
      results("jsontax_json_parse_20m") = median3 { cnt(jdf, jsonPred) }
      results("jsontax_shredded_20m") = median3 {
        cnt(sdf, col("num_shred") >= lit(50000.0)) }
      if (canVariant) {
        val vdf = spark.read.parquet(s"$root/variant")
        val vPred = try_variant_get(col("var"), "$.num", "double") >= lit(50000.0)
        cnt(vdf, vPred) // warm
        results("jsontax_variant_20m") = median3 { cnt(vdf, vPred) }
      }
      // context row: the same predicate through the full traversal engine
      val jg = GraphFrame(jdf.select(col("gid"), lit("P").as("label"), col("data")),
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          GraphFrame.edgeSchema))
      val tq = Q.V().hasLabel("P").has(graft.gripql.P.gte("num", 50000))
      Traversal.run(spark, jg, tq).count() // warm
      results("jsontax_traversal_20m") = median3 {
        assert(Traversal.run(spark, jg, tq).count() == 10000000L) }
      // the engine's own answer (r13): shredGraph materializes every
      // sampled scalar field as a stored column — the same traversal
      // then reads a pushed parquet filter instead of parsing JSON
      val cat = new graft.model.Catalog(spark, s"$root/cat")
      cat.createGraph("shred", jg)
      results("jsontax_shred_build_20m") = timeIt { cat.shredGraph("shred") }
      val sg = cat.graph("shred")
      Traversal.run(spark, sg, tq).count() // warm
      results("jsontax_shred_traversal_20m") = median3 {
        assert(Traversal.run(spark, sg, tq).count() == 10000000L) }
    }
    } // sec("jsontax")

    if (sec("ride")) {
    // sidecar-riding probe (r13): post-hop predicates/aggregations used
    // to pay get_json_object per JOINED row with nothing pushable to the
    // far-side scan. With sidecar columns riding the traversal the same
    // `out().has(...)` reads a materialized column that Catalyst pushes
    // through the hop join into the parquet scan. Shape: 100k seeds
    // fan out 20× to a 2M-row indexed label; the predicate passes 5%.
    {
      import org.apache.spark.sql.functions.{col, concat, lit, format_string, explode, sequence}
      val root = java.nio.file.Files.createTempDirectory("graft-ride").toString
      val cat = new graft.model.Catalog(spark, root)
      val seeds = spark.range(100000L).select(
        concat(lit("s"), col("id")).as("gid"), lit("S").as("label"), lit("{}").as("data"))
      val pv = spark.range(2000000L).select(
        concat(lit("v"), col("id")).as("gid"), lit("P").as("label"),
        format_string("""{"num":%d,"name":"n%d","pad":"%08d"}""",
          col("id") % 100000, col("id") % 10000, col("id")).as("data"))
      val ev = spark.range(100000L)
        .select(col("id"), explode(sequence(lit(0), lit(19))).as("j"))
        .select(concat(lit("e"), col("id"), lit("_"), col("j")).as("gid"),
          lit("e").as("label"), concat(lit("s"), col("id")).as("from"),
          concat(lit("v"), col("id") * 20 + col("j")).as("to"), lit("{}").as("data"))
      val topo = Some(Seq(graft.model.EdgeType("S", "e", "P")))
      cat.createGraph("ride", GraphFrame(seeds.unionByName(pv), ev, topology = topo))
      val plainG = cat.graph("ride").copy(fieldIndex = None, topology = topo)
      val hopQ = Q.V().hasLabel("S").out().has(graft.gripql.P.gte("num", 95000))
      val termQ = Q.V().hasLabel("S").out()
        .aggregate(graft.gripql.Agg.Term("t", "name", 10))
      Traversal.run(spark, plainG, hopQ).count() // warm
      results("ride_hop_filter_plain_2m") = median3 {
        assert(Traversal.run(spark, plainG, hopQ).count() == 100000L) }
      results("ride_hop_term_plain_2m") = median3 {
        assert(Traversal.run(spark, plainG, termQ).count() == 10L) }
      results("ride_shred_build_2m") = timeIt { cat.shredGraph("ride") }
      val sg = cat.graph("ride").copy(topology = topo)
      Traversal.run(spark, sg, hopQ).count() // warm
      results("ride_hop_filter_shred_2m") = median3 {
        assert(Traversal.run(spark, sg, hopQ).count() == 100000L) }
      results("ride_hop_term_shred_2m") = median3 {
        assert(Traversal.run(spark, sg, termQ).count() == 10L) }
    }
    } // sec("ride")

    if (sec("streamidx")) {
    // index-maintenance-under-ingest probe (r13, VERDICT task 6):
    // Catalog.upsertGraph re-lays a touched INDEXED label out label-wide
    // regardless of batch size — a 1k-row micro-batch into a 2M-row label
    // pays the same rebuild as a 100k one. The 1k-vs-100k delta shows how
    // much of the per-batch cost is batch-proportional (the merge) vs
    // label-proportional (the rebuild); the unindexed twin isolates the
    // rebuild itself. If rebuild dominates at production batch sizes, an
    // incremental sorted-merge into the existing layout is the r14 shape.
    {
      import org.apache.spark.sql.functions.{col, concat, lit, format_string}
      val root = java.nio.file.Files.createTempDirectory("graft-stridx").toString
      val cat = new graft.model.Catalog(spark, root)
      val ee = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], GraphFrame.edgeSchema)
      def freshGraph(name: String, indexed: Boolean): graft.model.MutableGraph = {
        val pv = spark.range(2000000L).select(
          concat(lit("v"), col("id")).as("gid"), lit("P").as("label"),
          format_string("""{"k":"v%07d","pad":"%08d"}""", col("id"), col("id")).as("data"))
        cat.createGraph(name, GraphFrame(pv, ee))
        if (indexed) cat.addIndex(name, "P", "k")
        graft.model.MutableGraph(spark, cat.graph(name))
      }
      for ((batch, tag) <- Seq(1000 -> "1k", 100000 -> "100k")) {
        val mgI = freshGraph(s"si_$tag", indexed = true)
        (0 until batch).foreach(i => mgI.addVertex(s"u$i", "P", s"""{"k":"u%07d"}""".format(i)))
        results(s"stridx_upsert_${tag}_indexed_2m") = timeIt { cat.upsertGraph(s"si_$tag", mgI) }
        val mgP = freshGraph(s"sp_$tag", indexed = false)
        (0 until batch).foreach(i => mgP.addVertex(s"u$i", "P", s"""{"k":"u%07d"}""".format(i)))
        results(s"stridx_upsert_${tag}_plain_2m") = timeIt { cat.upsertGraph(s"sp_$tag", mgP) }
      }
    }
    } // sec("streamidx")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"baseline","unit":"sec","workloads":$qs,"cpus":$cpus}""")
    spark.stop()
  }
}
