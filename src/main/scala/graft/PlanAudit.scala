package graft

import org.apache.spark.sql.SparkSession
import graft.gripql._
import graft.model.TpchGraph
import graft.compiler.Traversal

/** Dev tool: print formatted plans for representative queries so pushdown /
  * broadcast / codegen regressions are visible (`PushedFilters`,
  * `ReadSchema`, `WholeStageCodegen`, no ScalaUDF in hot paths). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = TpchGraph(spark, dir)
    def Q = Query()
    val cases: Seq[(String, Query)] = Seq(
      "point_lookup" -> Q.V("c:17"),
      "label_has_filter" -> Q.V().hasLabel("customer").has(P.gt("c_acctbal", 5000)),
      "one_hop" -> Q.V().hasLabel("orders").out("customer"),
      "three_hop_count" -> Q.V().hasLabel("customer").in("customer").outE("item").count(),
      "count_agg" -> Q.V().hasLabel("customer").count(),
      // driver-bench outliers from round 2: check far-side union pruning
      // after hops and the variant path into term aggregation
      "multihop_term_agg" -> Q.V().hasLabel("customer").out("nation").out("region")
        .aggregate(Agg.Term("r", "r_name", 0)),
      "and_or_filter" -> Q.V().hasLabel("customer").has(
        P.and_(P.gte("c_acctbal", 1000), P.or_(P.eq_("c_mktsegment", "BUILDING"), P.eq_("c_mktsegment", "MACHINERY")))),
      "edge_state_in" -> Q.E().hasLabel("customer").in(),
      // point-seed adjacency seek: the literal gid must appear as a
      // PushedFilters In/EqualTo on the EDGE scans, not just the seed scan
      "point_bothe" -> Q.V("n:3").bothE())
    for ((name, q) <- cases) {
      println(s"==== $name ====")
      Traversal.run(spark, g, q).explain("formatted")
    }
    // pipeline plans: the embed near-dup join condition must short-circuit
    // on the id test and carry graft_dot (not an interpreted fold or a
    // too-big-to-JIT unrolled sum); unwind→term must fuse (no json_set UDF)
    println("==== embed_neardup_pair_join ====")
    graft.pipeline.Similarity.nearDupEmbed(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", 0.45)
      .explain("formatted")
    println("==== unwind_term_fused ====")
    Traversal.run(spark, g,
      Q.V().hasLabel("part").unwind("words").aggregate(Agg.Term("w", "words", 0)))
      .explain("formatted")
    // GRIPPER mapped view: a label scan + property filter must still reach
    // the parquet scan as PushedFilters (the mapping synthesizes data with
    // to_json, so JsonShredding has to see through it), and a hop join
    // must prune to the mapped topology's reachable branches
    println("==== gripper_label_has_filter ====")
    val gg = graft.model.Gripper.graph(
      """
vertices:
  - {gid: "n:", label: nation, data: {source: t, collection: nation}}
  - {gid: "r:", label: region, data: {source: t, collection: region}}
edges:
  - {gid: nr, from: "n:", to: "r:", label: region,
     data: {source: t, collection: nation, fromField: n_nationkey, toField: n_regionkey}}
""",
      Map("t" -> graft.model.Gripper.DirSource(spark, dir,
        idCols = Map("nation" -> "n_nationkey", "region" -> "r_regionkey"))))
    Traversal.run(spark, gg,
      Q.V().hasLabel("nation").has(P.eq_("n_name", "KENYA"))).explain("formatted")
    println("==== gripper_hop ====")
    Traversal.run(spark, gg, Q.V().hasLabel("nation").out("region")).explain("formatted")
    // chunking must stay shuffle-free: one Generate inside the scan stage,
    // NO Exchange anywhere, and the parquet scan pruned to (doc_id, text)
    println("==== chunk_shuffle_free ====")
    graft.pipeline.TextAnalysis.chunk(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 32, 8)
      .explain("formatted")
    // decontamination: the benchmark shingle set must arrive as a
    // BroadcastHashJoin LeftSemi (the corpus side must NOT exchange before
    // the join) and the final count must show a partial_count before its
    // single hash exchange
    println("==== decontaminate_broadcast_semi ====")
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    graft.pipeline.Dedup.decontaminate(
      docsDf.filter(org.apache.spark.sql.functions.col("doc_id") % 20 =!= 0), "doc_id", "text",
      docsDf.filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0), "text")
      .explain("formatted")
    // split assignment is a pure per-row map: no Exchange, ReadSchema
    // pruned to the id column alone
    println("==== split_shuffle_free ====")
    graft.pipeline.Curation.split(docsDf, "doc_id").explain("formatted")
    // passage dedup: the flagged passage set must arrive as a BROADCAST
    // anti-join (never a shuffled join on the passage text), and nothing
    // in the plan may be a cartesian product
    println("==== passage_dedup_broadcast_anti ====")
    graft.pipeline.Dedup.dedupPassages(docsDf, "doc_id", "text").explain("formatted")
    // corpus rarity: vocabulary self-join on the token — partial
    // aggregation before each exchange, no cartesian
    println("==== rarity_vocab_join ====")
    graft.pipeline.TextAnalysis.corpusRarity(docsDf, "doc_id", "text").explain("formatted")
    // mixture upsampling: a literal CASE + explode — no Exchange at all,
    // scan pruned to (doc_id, source)
    println("==== mix_shuffle_free ====")
    graft.pipeline.Curation.mix(docsDf, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.4)).explain("formatted")
    // physical field index (r12): the indexed STRING point predicate and
    // the NUMERIC range predicate must both reach the vertex scan as
    // PushedFilters on the materialized __idx_* / __idxn_* columns (the
    // kvindex term/range seek as parquet row-group skipping)
    println("==== field_index_seeks ====")
    locally {
      import org.apache.spark.sql.functions.{col, concat, lit, format_string}
      val idxRoot = java.nio.file.Files.createTempDirectory("graft-audit-idx").toString
      val cat = new graft.model.Catalog(spark, idxRoot)
      val pv = spark.range(100000L).select(
        concat(lit("v"), col("id")).as("gid"), lit("Person").as("label"),
        format_string("""{"name":"n%d","age":%d}""", col("id") % 997, col("id") % 80).as("data"))
      val pe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.GraphFrame.edgeSchema)
      cat.createGraph("auditidx", graft.model.GraphFrame(pv, pe))
      cat.addIndex("auditidx", "Person", "name")
      cat.addIndex("auditidx", "Person", "age")
      val ig = cat.graph("auditidx")
      println("---- string point seek ----")
      Traversal.run(spark, ig,
        Q.V().hasLabel("Person").has(P.eq_("name", "n42"))).explain("formatted")
      println("---- numeric range seek ----")
      Traversal.run(spark, ig,
        Q.V().hasLabel("Person").has(P.between("age", 10, 12))).explain("formatted")
    }
    spark.stop()
  }
}
