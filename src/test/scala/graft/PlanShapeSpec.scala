package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** Asserted physical-plan invariants for the pipeline operators whose
  * 100-TB viability depends on plan shape, not just row correctness —
  * `PlanAudit` prints these plans for eyeballing; this spec makes the
  * load-bearing properties (broadcast vs shuffled joins, shuffle-free
  * maps, no cartesian anywhere) fail the suite when they regress. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  lazy val docs: DataFrame = (0L until 60L)
    .map(i => (i, (0 until 20).map(j => s"w${(i * 7 + j) % 40}").mkString(" "), s"src${i % 4}"))
    .toDF("doc_id", "text", "source")

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("dedupPassages: flagged set arrives by broadcast anti-join, no cartesian") {
    val p = plan(Dedup.dedupPassages(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti") && p.contains("Broadcast"),
      s"common-passage removal must be a broadcast anti-join:\n$p")
  }

  test("corpusRarity: vocabulary join is never a cartesian, aggregates are partial") {
    val p = plan(TextAnalysis.corpusRarity(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"),
      s"vocabulary count must map-side combine before its exchange:\n$p")
  }

  test("contaminationReport: bench shingles broadcast, counts partial-combine") {
    val bench = docs.limit(5)
    val p = plan(Dedup.contaminationReport(docs, "doc_id", "text", bench, "doc_id", "text"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the eval-suite shingle set must broadcast:\n$p")
    assert(p.contains("partial_count"),
      s"per-item hit counts must map-side combine:\n$p")
  }

  test("lexicalDiversity: token aggregates partial-combine, no joins at all") {
    val p = plan(TextAnalysis.lexicalDiversity(docs, "doc_id", "text"))
    assert(!p.contains("Join"), s"per-doc diversity needs no join:\n$p")
    assert(p.contains("partial_count"),
      s"(doc, token) counts must map-side combine before the exchange:\n$p")
  }

  test("centroidOutliers: centroid table broadcasts back, scoring never shuffles the corpus") {
    val vecs = (0L until 50L)
      .map(i => (i, (0 until 8).map(j => ((i * 31 + j) % 13).toFloat), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val p = plan(Similarity.centroidOutliers(vecs, "vec_id", "embedding", "label"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the |labels| x dim centroid table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"scoring must not shuffle the corpus against the centroids:\n$p")
  }

  test("mix: pure narrow map — no Exchange in the plan at all") {
    val p = plan(Curation.mix(docs, "doc_id", "source", Map("src0" -> 2.5, "src1" -> 0.4)))
    assert(!p.contains("Exchange"), s"mixture upsampling must not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("decontaminate: benchmark shingles broadcast, corpus side does not shuffle") {
    val bench = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val p = plan(Dedup.decontaminate(corpus, "doc_id", "text", bench, "text"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"decontamination must broadcast the benchmark shingle set:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("chunk: shuffle-free — one Generate, no Exchange") {
    val p = plan(TextAnalysis.chunk(docs, "doc_id", "text", 8, 2))
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange"), s"chunking must stay embarrassingly parallel:\n$p")
  }

  test("bloom decontamination: membership is join-free bit arithmetic") {
    val bench = docs.filter($"doc_id" % 10 === 0)
    val bloom = Dedup.benchmarkBloom(bench, "text")
    val p = plan(Dedup.decontaminateBloom(docs, "doc_id", "text", bloom))
    assert(!p.contains("Join"), s"bloom membership must not join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  lazy val events: DataFrame = (0L until 200L)
    .map(i => (i, i * 1000000000L, i % 20, Seq("view", "click", "purchase")(i.toInt % 3), 1.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("funnel: stage chain keyed on user_id throughout, no cartesian") {
    val p = plan(Events.funnel(events, Seq("view", "click", "purchase")))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"stage joins must stay equi-joins:\n$p")
  }

  test("retention: one distinct pass then key-reusing aggregates, no cartesian") {
    val p = plan(Events.retention(events))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"cohort aggregates must map-side combine:\n$p")
  }

  test("degree histogram: edge side pre-aggregates before the vertex join") {
    val v = (0L until 50L).map(i => (s"v$i", "person", "{}")).toDF("gid", "label", "data")
    val e = (0L until 150L).map(i => (s"e$i", "knows", s"v${i % 50}", s"v${(i + 1) % 50}", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val p = plan(graft.model.GraphAlgos.degreeHistogram(
      graft.model.GraphFrame(v, e), "person", "knows"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"),
      s"edge counting must partial-aggregate before its exchange:\n$p")
  }

  test("bm25: df stats and corpus scalars broadcast, no cartesian") {
    val p = plan(Search.bm25(docs, "doc_id", "text", Seq("w1", "w2")))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the tiny (term df × corpus stats) side must arrive by broadcast:\n$p")
    assert(p.contains("partial_count"),
      s"tf counting must map-side combine before its exchange:\n$p")
  }

  test("qualityRules: shuffle-free — no Exchange anywhere in the plan") {
    // on this local fixture Catalyst folds the whole thing to a
    // LocalTableScan — itself evidence every gate is a pure expression;
    // the load-bearing invariant is the absence of any shuffle
    val p = plan(Curation.qualityRules(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"), s"rule gates must not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("collocations: unigram/bigram joins never cartesian, counts partial-agg") {
    val p = plan(TextAnalysis.collocations(docs, "text", minCount = 2))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"),
      s"bigram counting must map-side combine before its exchange:\n$p")
  }

  test("bigramLogLoss: model joins on the bigram key, never cartesian, partial aggs") {
    val p = plan(TextAnalysis.bigramLogLoss(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"),
      s"model counting must map-side combine:\n$p")
  }

  // (containmentPairs' single-pass direction split can't be plan-pinned
  // here: withShingles eagerly localCheckpoints the result, so the
  // returned frame's executedPlan is just the checkpoint scan. The
  // explode-not-union shape lives in Dedup.containmentPairs with the
  // rationale; PipelineSpec pins the output.)

  test("corpusReport: single aggregation pass, no joins at all") {
    val p = plan(Curation.corpusReport(docs, "doc_id", "text"))
    assert(!p.contains("Join"), s"the report is one scan + one aggregate:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("anomaly: per-type stats broadcast back onto the hourly frame") {
    val ev = (0L until 200L).map(i =>
      (i, (i % 50) * 3600L * 1000000000L, i % 7, s"t${i % 3}", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val p = plan(Events.anomaly(ev))
    assert(p.contains("BroadcastHashJoin"),
      s"types-sized stats must broadcast, not shuffle the hourly frame:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("annIvfPq: candidate stage carries PQ codes only — raw vectors touch nothing before the rerank join-back") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window}
    val dim = 8
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dim)(j => (if (i < 20) 1.0f else -1.0f) + 0.01f * ((i * 7 + j) % 5)))
    }.toDF("vec_id", "embedding")
    val out = Similarity.annIvfPq(vecs, "vec_id", "embedding",
      vecs.limit(2), "vec_id", "embedding",
      k = 3, dim = dim, nlist = 4, nprobe = 2, m = 2, ksub = 4, shortlist = 8)
    // pin on the optimized LOGICAL plan (node classes, not plan-string
    // formatting) so the assertion survives AQE/physical rendering changes
    val lp = out.queryExecution.optimizedPlan
    // the ADC shortlist window ranks candidates by code-table score; if
    // __v reaches it, every (corpus/nlist)·nprobe candidate row shuffles
    // dim×8 bytes of payload and PQ's compression is forfeited
    val shortWin = lp.collect { case w: Window if w.output.exists(_.name == "__sr") => w }
    assert(shortWin.nonEmpty, s"shortlist window not found:\n$lp")
    shortWin.foreach(w => assert(!w.output.exists(n => n.name == "__v" || n.name == "__q"),
      s"ADC shortlist stage must not carry raw vectors (corpus OR query side):\n$w"))
    // the probe join on __bucket is the candidate-volume join: its output
    // must be (ids, bucket, code, ADC tables) — never a raw vector
    val bucketJoins = lp.collect {
      case j: Join if j.output.exists(_.name == "__bucket") && j.output.exists(_.name == "code") => j
    }
    assert(bucketJoins.nonEmpty, s"bucket probe join not found:\n$lp")
    bucketJoins.foreach(j => assert(!j.output.exists(n => n.name == "__v" || n.name == "__q"),
      s"candidate join must project codes and tables, not vectors:\n$j"))
  }

  test("nearDupEmbed: broadcast under the size guard, partitioned nested loop above it") {
    val dim = 8
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(dim)(j => (if (i % 2 == 0) 1.0f else -1.0f) + 0.01f * ((i + j) % 3)))
    }.toDF("vec_id", "embedding")
    // small corpus, default guard: the build side must broadcast so the
    // pair join is a codegen'd BroadcastNestedLoopJoin
    val small = Similarity.nearDupEmbed(vecs, "vec_id", "embedding", 0.99)
    val pSmall = plan(small)
    assert(pSmall.contains("BroadcastNestedLoopJoin"),
      s"under the guard the pair join must broadcast:\n$pSmall")
    val rows = small.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // guard forced to 0 bytes: the hint must NOT fire (no driver-side
    // collect of an over-budget build side); the join runs partitioned
    // over the same checkpointed frame and the pairs are identical
    spark.conf.set("graft.embed.broadcastBytes", "0")
    try {
      val big = Similarity.nearDupEmbed(vecs, "vec_id", "embedding", 0.99)
      val pBig = plan(big)
      assert(!pBig.contains("BroadcastNestedLoopJoin"),
        s"above the guard the build side must not broadcast:\n$pBig")
      assert(big.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.sameElements(rows))
    } finally spark.conf.unset("graft.embed.broadcastBytes")
    assert(rows.nonEmpty)
  }

  test("field index: indexed has() pushes a real parquet filter; results unchanged") {
    import graft.model.{Catalog, GraphFrame}
    import graft.gripql.{Query, P}
    import graft.compiler.Traversal
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val cat = new Catalog(spark, root)
    val v = (0 until 500).map { i =>
      (s"v$i", if (i % 5 == 0) "Person" else "Thing",
        s"""{"name":"n${i % 97}","age":${i % 80}}""")
    }.toDF("gid", "label", "data")
    val e = Seq.empty[(String, String, String, String, String)]
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("g", GraphFrame(v, e))
    val q = Query().V().hasLabel("Person").has(P.eq_("name", "n42"))
    val plainRows = Traversal.run(spark, cat.graph("g"), q)
      .select("gid").collect().map(_.getString(0)).sorted

    cat.addIndex("g", "Person", "name")
    val g = cat.graph("g")
    assert(g.fieldIndex.exists(_.entries == Set(("Person", "name"))))
    val out = Traversal.run(spark, g, q)
    // the physical scan must carry the materialized column as a PUSHED
    // parquet filter (row-group min/max skip over the sorted layout) —
    // not just a post-scan JSON extraction
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("__idx_name"),
      s"indexed has() must push __idx_name to the parquet scan:\n$p")
    // and the rows are exactly the unindexed ones
    assert(out.select("gid").collect().map(_.getString(0)).sorted
      .sameElements(plainRows))
    assert(plainRows.nonEmpty)

    // an index on only SOME of the restricted labels must NOT rewrite
    // (null __idx rows in uncovered labels would be wrongly dropped)
    val qBoth = Query().V().hasLabel("Person", "Thing").has(P.eq_("name", "n42"))
    val pBoth = Traversal.run(spark, g, qBoth).queryExecution.executedPlan.toString
    assert(!pBoth.contains("__idx_name"),
      s"partially-covered label set must not use the index:\n$pBoth")
    val bothRows = Traversal.run(spark, g, qBoth)
      .select("gid").collect().map(_.getString(0)).sorted
    val bothPlain = Traversal.run(spark, cat.graph("g").copy(fieldIndex = None), qBoth)
      .select("gid").collect().map(_.getString(0)).sorted
    assert(bothRows.sameElements(bothPlain) && bothRows.length > plainRows.length)

    // a RE-SAVE over an indexed graph must rebuild the index over the new
    // rows — stale .indices metadata over plain re-saved files would read
    // all-null index columns and wrongly drop every indexed match
    val v2 = (0 until 100).map { i =>
      (s"w$i", "Person", s"""{"name":"n${i % 7}"}""")
    }.toDF("gid", "label", "data")
    cat.createGraph("g", GraphFrame(v2, e))
    val afterResave = Traversal.run(spark,
      cat.graph("g"), Query().V().hasLabel("Person").has(P.eq_("name", "n3")))
      .select("gid").collect().map(_.getString(0)).sorted
    val expected2 = (0 until 100).filter(_ % 7 == 3).map(i => s"w$i").sorted
    assert(afterResave.toSeq == expected2, afterResave.mkString(","))

    // ot_index metadata surface still intact after the physical build
    assert(cat.listIndices("g") == Seq(("Person", "name")))
    cat.deleteIndex("g", "Person", "name")
    assert(cat.listIndices("g").isEmpty)
    assert(cat.graph("g").fieldIndex.isEmpty)
  }

  test("field index: randomized equivalence — indexed plans answer exactly like unindexed ones") {
    import graft.model.{Catalog, GraphFrame}
    import graft.gripql.{Query, P}
    import graft.compiler.Traversal
    val rnd = new scala.util.Random(20260815L)
    val root = java.nio.file.Files.createTempDirectory("graft-idx-prop").toString
    val cat = new Catalog(spark, root)
    val labels = Seq("A", "B", "C")
    // values drawn from a small pool so EQ/WITHIN hit; ~15% of rows MISS
    // the field entirely; ~10% carry a JSON-null value
    val v = (0 until 800).map { i =>
      val l = labels(rnd.nextInt(3))
      val d = rnd.nextInt(100) match {
        case m if m < 15 => """{"other":1}"""
        case m if m < 25 => """{"tag":null}"""
        case _ => s"""{"tag":"t${rnd.nextInt(12)}","n":${rnd.nextInt(50)}}"""
      }
      (s"v$i", l, d)
    }.toDF("gid", "label", "data")
    val e = Seq.empty[(String, String, String, String, String)]
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("pg", GraphFrame(v, e))
    cat.addIndex("pg", "A", "tag")
    cat.addIndex("pg", "B", "tag")
    cat.addIndex("pg", "A", "n")
    cat.addIndex("pg", "B", "n")
    // re-load AFTER the re-layout: addIndex swaps the label's files, so
    // frames loaded before it are stale (the documented contract)
    val plain = cat.graph("pg").copy(fieldIndex = None)
    val indexed = cat.graph("pg")
    def rows(g: GraphFrame, q: Query): Seq[String] =
      Traversal.run(spark, g, q).select("gid").collect().map(_.getString(0)).sorted.toSeq
    val queries = Seq(
      // fully covered label sets — the rewrite fires
      Query().V().hasLabel("A").has(P.eq_("tag", "t3")),
      Query().V().hasLabel("A", "B").has(P.eq_("tag", "t7")),
      Query().V().hasLabel("B").has(P.within("tag", "t1", "t5")),
      // uncovered / partially covered — the rewrite must stay off
      Query().V().hasLabel("C").has(P.eq_("tag", "t3")),
      Query().V().hasLabel("A", "C").has(P.eq_("tag", "t3")),
      Query().V().has(P.eq_("tag", "t3")),
      // numeric predicates over the indexed float64 column (r12): every
      // ordered op, numeric EQ/WITHIN, and the never-rewritten NEQ/WITHOUT
      // (they keep missing-field rows a pushed comparison would drop)
      Query().V().hasLabel("A").has(P.gt("n", 25)),
      Query().V().hasLabel("A", "B").has(P.lte("n", 10)),
      Query().V().hasLabel("B").has(P.between("n", 5, 20)),
      Query().V().hasLabel("A").has(P.inside("n", 5, 20)),
      Query().V().hasLabel("A").has(P.outside("n", 5, 45)),
      Query().V().hasLabel("A").has(P.eq_("n", 7)),
      Query().V().hasLabel("B").has(P.within("n", 3, 14, 41)),
      Query().V().hasLabel("A").has(P.neq("n", 7)),
      Query().V().hasLabel("A").has(P.without("n", 3, 14)),
      // ordered comparison on a non-castable STRING field: engine says
      // false everywhere, the idxn column is all-null — both empty
      Query().V().hasLabel("A").has(P.gt("tag", 3)),
      Query().V().hasLabel("A").has(P.eq_("other", 1)),
      // composition: filters around hops-of-zero still agree
      Query().V().hasLabel("A").has(P.eq_("tag", "t2")).hasId(
        (0 until 800 by 3).map(i => s"v$i"): _*))
    for (q <- queries)
      assert(rows(indexed, q) == rows(plain, q), s"mismatch for $q")
    // the covered EQ query really did rewrite
    val p = Traversal.run(spark, indexed,
      Query().V().hasLabel("A").has(P.eq_("tag", "t3")))
      .queryExecution.executedPlan.toString
    assert(p.contains("__idx_tag"), p)
    // ...and the covered numeric range rewrote onto the float64 column as
    // a PUSHED parquet filter (the kvindex range-seek analogue)
    val pn = Traversal.run(spark, indexed,
      Query().V().hasLabel("A").has(P.gt("n", 25)))
      .queryExecution.executedPlan.toString
    assert(pn.contains("PushedFilters") && pn.contains("__idxn_n"),
      s"numeric range must push __idxn_n to the parquet scan:\n$pn")
    // NEQ must never reach the SCAN as a pushed filter (a pushed
    // comparison would drop missing-field rows the engine keeps). The r13
    // sidecar may still evaluate it as a row-level filter on the
    // materialized column — `!coalesce(__idxn = x, false)` keeps nulls —
    // which the randomized equivalence above already proved row-exact.
    val pneq = Traversal.run(spark, indexed,
      Query().V().hasLabel("A").has(P.neq("n", 7)))
      .queryExecution.executedPlan.toString
    val pushedNeq = "PushedFilters: \\[[^\\]]*__idxn_n".r
    assert(pushedNeq.findFirstIn(pneq).isEmpty,
      s"NEQ must not reach the scan as a pushed filter:\n$pneq")
  }

  test("edge field index: randomized equivalence, pushed filter, traversal semantics intact") {
    import graft.model.{Catalog, GraphFrame}
    import graft.gripql.{Query, P}
    import graft.compiler.Traversal
    val rnd = new scala.util.Random(20260815L)
    val root = java.nio.file.Files.createTempDirectory("graft-eidx").toString
    val cat = new Catalog(spark, root)
    val v = (0 until 200).map(i => (s"v$i", "node", "{}")).toDF("gid", "label", "data")
    val e = (0 until 900).map { i =>
      val l = if (i % 3 == 0) "x" else "y"
      val d = rnd.nextInt(100) match {
        case m if m < 15 => """{"other":1}"""
        case _ => s"""{"w":${rnd.nextInt(50)},"tag":"t${rnd.nextInt(8)}"}"""
      }
      (s"e$i", l, s"v${rnd.nextInt(200)}", s"v${rnd.nextInt(200)}", d)
    }.toDF("gid", "label", "from", "to", "data")
    cat.createGraph("eg", GraphFrame(v, e))
    cat.addEdgeIndex("eg", "x", "w")
    cat.addEdgeIndex("eg", "x", "tag")
    assert(cat.listEdgeIndices("eg").toSet == Set(("x", "w"), ("x", "tag")))
    assert(cat.listIndices("eg").isEmpty) // sides don't leak into each other
    val plain = cat.graph("eg").copy(edgeFieldIndex = None)
    val indexed = cat.graph("eg")
    def rows(g: GraphFrame, q: Query): Seq[String] =
      Traversal.run(spark, g, q).select("gid").collect().map(_.getString(0)).sorted.toSeq
    val queries = Seq(
      Query().E().hasLabel("x").has(P.eq_("tag", "t3")),
      Query().E().hasLabel("x").has(P.between("w", 5, 20)),
      Query().E().hasLabel("x").has(P.gt("w", 25)),
      // uncovered label / NEQ — the rewrite must stay off yet agree
      Query().E().hasLabel("y").has(P.eq_("tag", "t3")),
      Query().E().hasLabel("x").has(P.neq("w", 7)),
      // traversal semantics through an indexed seed: hop to vertices
      Query().E().hasLabel("x").has(P.lt("w", 10)).out(),
      Query().E().hasLabel("x").has(P.lt("w", 10)).in())
    for (q <- queries)
      assert(rows(indexed, q) == rows(plain, q), s"mismatch for $q")
    // the covered numeric range pushed the float64 column to the scan
    val pn = Traversal.run(spark, indexed,
      Query().E().hasLabel("x").has(P.between("w", 5, 20)))
      .queryExecution.executedPlan.toString
    assert(pn.contains("PushedFilters") && pn.contains("__idxn_w"),
      s"edge numeric range must push __idxn_w:\n$pn")
    // the vertex-side index path is untouched by an edge registration
    assert(indexed.fieldIndex.isEmpty && indexed.edgeFieldIndex.isDefined)
    // deleteEdgeIndex drops only its entry
    cat.deleteEdgeIndex("eg", "x", "tag")
    assert(cat.listEdgeIndices("eg") == Seq(("x", "w")))
  }

  test("shredded sidecar: sampled fields serve pushed predicates with no addIndex; upserts keep them current") {
    import graft.model.{Catalog, GraphFrame, MutableGraph}
    import graft.gripql.{Query, P}
    import graft.compiler.Traversal
    val root = java.nio.file.Files.createTempDirectory("graft-shred").toString
    val cat = new Catalog(spark, root)
    // mixed docs: scalar fields (shredded), a container + dotted + missing
    // fields (never shredded), one label with punctuation
    val v = (0 until 600).map { i =>
      val l = if (i % 2 == 0) "Doc" else "t:y"
      (s"v$i", l,
        s"""{"n":${i % 40},"tag":"t${i % 7}","arr":[1,2],"a.b":1${if (i % 5 == 0) "" else s""","rare":"r${i % 3}""""}}""")
    }.toDF("gid", "label", "data")
    val e = (0 until 100).map(i => (s"e$i", "link", s"v$i", s"v${i + 1}", s"""{"w":$i}"""))
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("sh", GraphFrame(v, e))
    val built = cat.shredGraph("sh")
    assert(built(("vertices", "Doc")) == Seq("n", "rare", "tag"), built.toString)
    assert(built(("vertices", "t:y")) == Seq("n", "rare", "tag"))
    assert(built(("edges", "link")) == Seq("w"))
    // shredded entries ARE index entries
    assert(cat.listIndices("sh").toSet ==
      Set(("Doc", "n"), ("Doc", "rare"), ("Doc", "tag"),
          ("t:y", "n"), ("t:y", "rare"), ("t:y", "tag")))
    assert(cat.listEdgeIndices("sh") == Seq(("link", "w")))
    val g = cat.graph("sh")
    val plain = g.copy(fieldIndex = None, edgeFieldIndex = None)
    def rows(gr: GraphFrame, q: Query): Seq[String] =
      Traversal.run(spark, gr, q).select("gid").collect().map(_.getString(0)).sorted.toSeq
    for (q <- Seq(
        Query().V().hasLabel("Doc").has(P.eq_("tag", "t3")),
        Query().V().hasLabel("Doc").has(P.between("n", 5, 20)),
        Query().V().hasLabel("Doc").has(P.eq_("rare", "r1")), // missing on some rows
        Query().V().hasLabel("t:y").has(P.gt("n", 25)),
        Query().E().hasLabel("link").has(P.lt("w", 10))))
      assert(rows(g, q) == rows(plain, q), s"mismatch for $q")
    // the numeric predicate pushed the shredded float64 column — NO
    // addIndex was ever called
    val pn = Traversal.run(spark, g,
      Query().V().hasLabel("Doc").has(P.between("n", 5, 20)))
      .queryExecution.executedPlan.toString
    assert(pn.contains("PushedFilters") && pn.contains("__idxn_n"), pn)
    // fused incremental maintenance keeps shredded columns current
    val mg = MutableGraph(spark, cat.graph("sh"))
    mg.addVertex("v900", "Doc", """{"n":7,"tag":"t3"}""")
    cat.upsertGraph("sh", mg)
    val got = rows(cat.graph("sh"), Query().V().hasLabel("Doc").has(P.eq_("tag", "t3")))
    assert(got.contains("v900"), got.toString)
  }

  test("field index: a pre-upgrade layout (string column only) never serves numeric rewrites") {
    // simulate an index directory built by the pre-r12 relayout: the
    // stored partition carries __idx_<f> but NOT __idxn_<f>. Coverage is
    // decided from the files on disk, so numeric predicates must stay on
    // the engine filter (rewriting onto the imposed all-null __idxn
    // column would silently drop every row) while string point
    // predicates still use the index.
    import graft.model.{Catalog, GraphFrame}
    import graft.gripql.{Query, P}
    import graft.compiler.Traversal
    val root = java.nio.file.Files.createTempDirectory("graft-idx-old").toString
    val cat = new Catalog(spark, root)
    val v = (0 until 400).map(i => (s"v$i", "P", s"""{"n":${i % 50}}"""))
      .toDF("gid", "label", "data")
    val e = Seq.empty[(String, String, String, String, String)]
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("old", GraphFrame(v, e))
    cat.addIndex("old", "P", "n")
    // strip the numeric column from the stored files (the old layout)
    val part = s"$root/old/vertices/label=P"
    val tmp = s"$root/old/.strip"
    spark.read.parquet(part).drop(Catalog.idxNumCol("n"))
      .write.mode("overwrite").parquet(tmp)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(part))
    assert(new java.io.File(tmp).renameTo(new java.io.File(part)))

    val g = cat.graph("old")
    assert(g.fieldIndex.exists(fi =>
      fi.entries == Set(("P", "n")) && fi.numEntries.isEmpty))
    val nq = Query().V().hasLabel("P").has(P.gt("n", 25))
    val got = Traversal.run(spark, g, nq)
      .select("gid").collect().map(_.getString(0)).sorted.toSeq
    val want = (0 until 400).filter(_ % 50 > 25).map(i => s"v$i").sorted
    assert(got == want)
    val plan = Traversal.run(spark, g, nq).queryExecution.executedPlan.toString
    assert(!plan.contains("__idxn_n"), s"numeric rewrite on a string-only layout:\n$plan")
    // the string column still serves point predicates
    val sq = Query().V().hasLabel("P").has(P.eq_("n", "25"))
    val splan = Traversal.run(spark, g, sq).queryExecution.executedPlan.toString
    assert(splan.contains("__idx_n"), splan)
  }

  test("field index: idxCol is injective for punctuated fields") {
    import graft.model.Catalog
    assert(Catalog.idxCol("a_b") == "__idx_a_b") // plain names stay stable
    assert(Catalog.idxCol("a.b") != Catalog.idxCol("a_b"))
    assert(Catalog.idxCol("a.b") != Catalog.idxCol("a-b"))
    assert(Catalog.idxNumCol("a.b") != Catalog.idxNumCol("a_b"))
  }

  test("sidecar riding: post-hop predicates read materialized columns and push into the far-side scan") {
    import graft.model.{Catalog, EdgeType, GraphFrame}
    import graft.gripql.{Query, P, Agg}
    import graft.compiler.Traversal
    val root = java.nio.file.Files.createTempDirectory("graft-ride").toString
    val cat = new Catalog(spark, root)
    val rnd = new scala.util.Random(20260815L)
    // person --owns--> asset graph; asset fields indexed; ~15% of assets
    // MISS the fields, some carry JSON null
    val people = (0 until 300).map(i => (s"p$i", "person", s"""{"age":${i % 70}}"""))
    val assets = (0 until 400).map { i =>
      // `mix` cycles through every FieldType incl. containers, JSON null,
      // and plain absence — the type-tag surfaces must agree on all of them
      val mix = i % 6 match {
        case 0 => ""","mix":"s1""""
        case 1 => s""","mix":${i % 50}"""
        case 2 => ""","mix":[1,2]"""
        case 3 => ""","mix":{"x":1}"""
        case 4 => ""","mix":null"""
        case _ => "" // absent
      }
      val d = rnd.nextInt(100) match {
        case m if m < 15 => s"""{"other":1$mix}"""
        case m if m < 25 => s"""{"kind":null,"value":${rnd.nextInt(1000)}$mix}"""
        case _ => s"""{"kind":"k${rnd.nextInt(6)}","value":${rnd.nextInt(1000)}$mix}"""
      }
      (s"a$i", "asset", d)
    }
    val v = (people ++ assets).toDF("gid", "label", "data")
    val e = (0 until 900).map(i =>
      (s"e$i", "owns", s"p${rnd.nextInt(300)}", s"a${rnd.nextInt(400)}", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val topo = Some(Seq(EdgeType("person", "owns", "asset")))
    cat.createGraph("ride", GraphFrame(v, e, topology = topo))
    cat.addIndex("ride", "asset", "kind")
    cat.addIndex("ride", "asset", "value")
    cat.addIndex("ride", "asset", "mix")
    val g = cat.graph("ride").copy(topology = topo)
    val plain = g.copy(fieldIndex = None)
    def rows(gr: GraphFrame, q: Query): Seq[String] =
      Traversal.run(spark, gr, q).select("gid").collect().map(_.getString(0)).sorted.toSeq
    def agg(gr: GraphFrame, q: Query): Seq[(String, String, Double)] =
      Traversal.run(spark, gr, q).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq

    // topology supplies the landed label set: out().has(...) resolves
    // through the sidecar and the predicate reaches the far-side scan
    val qHop = Query().V().hasLabel("person").out().has(P.gt("value", 500))
    assert(rows(g, qHop) == rows(plain, qHop))
    val pHop = Traversal.run(spark, g, qHop).queryExecution.executedPlan.toString
    assert(pHop.contains("PushedFilters") && pHop.contains("__idxn_value"),
      s"post-hop numeric predicate must push the sidecar column into the scan:\n$pHop")
    assert(!pHop.contains("get_json_object"),
      s"covered post-hop predicate must not parse JSON:\n$pHop")

    // explicit hasLabel after the hop works without topology too
    val gNoTopo = g.copy(topology = None)
    val plainNoTopo = gNoTopo.copy(fieldIndex = None)
    val qHL = Query().V().hasLabel("person").out().hasLabel("asset").has(P.eq_("kind", "k3"))
    assert(rows(gNoTopo, qHL) == rows(plainNoTopo, qHL))
    val pHL = Traversal.run(spark, gNoTopo, qHL).queryExecution.executedPlan.toString
    assert(pHL.contains("PushedFilters") && pHL.contains("__idx_kind"), pHL)

    // randomized equivalence across the statements that resolve fields
    val queries = Seq(
      Query().V().hasLabel("person").out().has(P.eq_("kind", "k2")),
      Query().V().hasLabel("person").out().has(P.within("kind", "k1", "k4")),
      Query().V().hasLabel("person").out().has(P.between("value", 100, 600)),
      Query().V().hasLabel("person").out().has(P.neq("kind", "k2")), // NEQ keeps missing-field rows
      Query().V().hasLabel("person").outNull().has(P.gt("value", 500)), // left_outer: null-landed rows
      Query().V().hasLabel("person").both().has(P.lt("value", 300)),
      Query().V().hasLabel("person").out().distinct("kind"),
      Query().V().hasLabel("person").out().as("x").has(P.gt("value", 700)).select("x"),
      Query().V().hasLabel("person").outE().out().has(P.gt("value", 800)),
      // uncovered field / label set: no rewrite yet identical rows
      Query().V().hasLabel("person").out().has(P.eq_("other", 1)),
      Query().V().out().has(P.gt("value", 500)), // label state unknown mid-hop
      // set() overrides the stored value BEFORE the sidecar read
      Query().V().hasLabel("person").out()
        .set("value", graft.gripql.GValue.GInt(50)).has(P.lt("value", 100)))
    for (q <- queries)
      assert(rows(g, q) == rows(plain, q), s"mismatch for $q")

    // aggregations resolve through the sidecar: term + histogram + percentile
    val qAgg = Query().V().hasLabel("person").out().aggregate(
      Agg.Term("t", "kind"), Agg.Histogram("h", "value", 100))
    assert(agg(g, qAgg) == agg(plain, qAgg))
    // plan pin on the pure key-count path (the mixed fan-out eagerly
    // checkpoints, hiding its upstream plan)
    val qTerm = Query().V().hasLabel("person").out().aggregate(Agg.Term("t", "kind"))
    assert(agg(g, qTerm) == agg(plain, qTerm))
    val pAgg = Traversal.run(spark, g, qTerm).queryExecution.executedPlan.toString
    assert(pAgg.contains("__idx_kind"),
      s"term key must read the sidecar column:\n$pAgg")

    // ---- type-tag surfaces (r13 __idxt sidecar) ----
    // exists(): hasKey + distinct's drop-missing rule — JSON-null rows
    // EXIST, absent rows don't; the covered form is a pushable IsNotNull
    for (q <- Seq(
        Query().V().hasLabel("person").out().hasKey("mix"),
        Query().V().hasLabel("person").out().hasKey("kind"), // null-bearing
        Query().V().hasLabel("person").out().distinct("mix"),
        Query().V().hasLabel("person").out().distinct("kind")))
      assert(rows(g, q) == rows(plain, q), s"mismatch for $q")
    val pHK = Traversal.run(spark, g,
      Query().V().hasLabel("person").out().hasKey("mix"))
      .queryExecution.executedPlan.toString
    assert(pHK.contains("IsNotNull(__idxt_mix"),
      s"covered hasKey must push IsNotNull on the type tag:\n$pHK")
    assert(!pHK.contains("json_object_keys"),
      s"covered hasKey must not parse the document:\n$pHK")
    // term over a mixed-type field: container values skipped, scalars
    // counted as their raw text — and NO document parse when covered
    val qMix = Query().V().hasLabel("person").out().aggregate(Agg.Term("t", "mix"))
    assert(agg(g, qMix) == agg(plain, qMix))
    val pMix = Traversal.run(spark, g, qMix).queryExecution.executedPlan.toString
    assert(!pMix.contains("parse_json"),
      s"covered term must take its container test from the type tag:\n$pMix")
    // type aggregation reads the tag directly (missing/JSON null → UNKNOWN)
    val qType = Query().V().hasLabel("person").out().aggregate(Agg.TypeAgg("ty", "mix"))
    assert(agg(g, qType) == agg(plain, qType))
    assert(agg(g, qType).map(_._2).toSet ==
      Set("STRING", "NUMERIC", "ARRAY", "MAP", "UNKNOWN"))

    // jump loops keep the plain path (one traveler schema across rounds)
    val qLoop = Query().V().hasLabel("person").mark("s")
      .out().jump("s", Some(P.gt("value", 990)), emit = true).limit(5)
    assert(Traversal.run(spark, g, qLoop).count() ==
      Traversal.run(spark, plain, qLoop).count())
  }

  test("survivorsBy: losers return as a broadcast anti-join, corpus never shuffles for it") {
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("a_id", "b_id")
    val p = plan(Dedup.survivorsBy(docs, "doc_id",
      org.apache.spark.sql.functions.length($"text").cast("double"), pairs))
    assert(p.contains("LeftAnti") && p.contains("Broadcast"),
      s"loser set must anti-join by broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
