package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A property graph as a pair of DataFrames — the Spark-native analogue of
  * the reference's Graph (reference: gripql/gripql.proto:10-14,194-206).
  *
  * Schema:
  *   vertices: gid STRING, label STRING, data STRING (JSON document)
  *   edges:    gid STRING, label STRING, from STRING, to STRING, data STRING
  *
  * `data` stays a schemaless JSON text column (the reference's property bag
  * is protobuf Struct = arbitrary JSON); typed extraction happens lazily in
  * query predicates via `get_json_object`, which Catalyst prunes/pushes.
  * At 100 TB scale the backing store is label-partitioned Parquet so
  * hasLabel() becomes partition pruning rather than a scan.
  */
/** One edge type of a graph schema: edges labeled `label` connect a
  * `from`-labeled vertex to a `to`-labeled vertex. The triple set is the
  * planning contract the reference exposes as its sampled schema
  * (reference: gripql/gripql.proto:194-206 Graph schema, schema/scan.go):
  * when present it must cover EVERY edge label in the graph, and the
  * compiler uses it to prune adjacency joins to the reachable labels. */
case class EdgeType(from: String, label: String, to: String)

/** Physical field index over a SAVED graph (Catalog.addIndex re-layout —
  * the Spark analogue of the reference's vertex field indices,
  * kvindex/kvindex.go:88-145, which turn `has()` scans into index seeks):
  * `vertices` is the same vertex rowset re-read WITH its materialized
  * `__idx_<field>` columns (each the stored `get_json_object(data, $.f)`
  * of an indexed field, rows range-sorted by it at build time), and
  * `entries` the (label, field) pairs covered. The traversal compiler
  * seeds label-restricted point lookups from this frame so the predicate
  * lands on a real parquet column — pushed filter + row-group skip —
  * instead of a post-scan JSON extraction. */
/** `entries` = (label, field) pairs whose STRING `__idx_*` column is
  * materialized in the stored files; `numEntries` ⊆ entries additionally
  * have the float64 `__idxn_*` column (r12 layout) and so can serve
  * numeric range predicates. The split exists because coverage is decided
  * from the files actually on disk, not the registry: an index directory
  * built by an older layout must not have numeric predicates rewritten
  * onto a column its files don't carry (the imposed read schema would
  * yield all-null and the pushed filter would silently drop every row).
  * `rows` is the SAME element rowset (vertices or, for an edge index,
  * edges) re-read with the materialized index columns. */
case class FieldIndex(rows: DataFrame, entries: Set[(String, String)],
                      numEntries: Set[(String, String)] = Set.empty,
                      /** (label, field) pairs whose stored files carry the
                        * `__idxt_*` presence/type tag (r13 layout) — serves
                        * exists()/hasKey, distinct's drop-missing rule, the
                        * term aggregation's container skip, and `type`
                        * aggregations without a document parse. Decided
                        * from footers like [[numEntries]], so pre-r13
                        * layouts simply never substitute these reads. */
                      typeEntries: Set[(String, String)] = Set.empty)

case class GraphFrame(vertices: DataFrame, edges: DataFrame,
                      topology: Option[Seq[EdgeType]] = None,
                      /** Same edge rows as `edges` but physically
                        * organized for `to`-keyed joins (bucketed storage,
                        * [[BucketedGraph]]); in()/inE() hops read this copy
                        * when present so neither adjacency direction
                        * shuffles the edge side. */
                      edgesByTo: Option[DataFrame] = None,
                      /** Physical field index when the backing store has
                        * one (see [[FieldIndex]]); absent for in-memory /
                        * unindexed graphs. */
                      fieldIndex: Option[FieldIndex] = None,
                      /** Edge-side physical field index — value-add over
                        * the reference, whose AddIndex is vertex-only
                        * (gripql/gripql.proto AddIndex); the same relayout
                        * machinery applies verbatim to edge label
                        * partitions (Catalog.addEdgeIndex). */
                      edgeFieldIndex: Option[FieldIndex] = None) {
  /** Persist as label-partitioned parquet (the "label index" of the
    * reference's KV backends becomes partition pruning). The topology
    * contract round-trips as a tiny JSON dataset so a saved+loaded graph
    * plans identically to the original. */
  def save(dir: String): Unit = {
    // the two sides are independent jobs into disjoint directories —
    // submitting them concurrently lets the smaller side's write ride the
    // executor slots the larger side's task tail leaves idle (guide §2.6);
    // Spark's scheduler interleaves the jobs, output is identical
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fv = scala.concurrent.Future {
        vertices.write.mode("overwrite").partitionBy("label").parquet(s"$dir/vertices")
      }
      val fe = scala.concurrent.Future {
        edges.write.mode("overwrite").partitionBy("label").parquet(s"$dir/edges")
      }
      scala.concurrent.Await.result(fv.zip(fe),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    val spark = vertices.sparkSession
    val tPath = new org.apache.hadoop.fs.Path(s"$dir/topology")
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    topology match {
      case Some(ts) =>
        import spark.implicits._
        ts.toDF().coalesce(1).write.mode("overwrite").json(s"$dir/topology")
      case None =>
        // a topology=None graph saved over a previous topology-bearing save
        // must NOT resurrect the old contract on load — stale triples would
        // silently prune hops over edge labels added since
        if (fs.exists(tPath)) fs.delete(tPath, true)
    }
  }
}

object GraphFrame {
  val vertexSchema: StructType = StructType(Seq(
    StructField("gid", StringType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("data", StringType, nullable = true)))

  val edgeSchema: StructType = StructType(Seq(
    StructField("gid", StringType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("from", StringType, nullable = false),
    StructField("to", StringType, nullable = false),
    StructField("data", StringType, nullable = true)))

  /** (from-label, edge-label, to-label) triples observed in the data —
    * the fallback when no topology/schema is declared; one small
    * distinct query over edges joined to vertex labels. */
  def deriveTriples(g: GraphFrame): Seq[EdgeType] = {
    import org.apache.spark.sql.functions.col
    val vl = g.vertices.select(col("gid"), col("label"))
    g.edges.alias("e")
      .join(vl.select(col("gid").as("from"), col("label").as("__fl")), Seq("from"))
      .join(vl.select(col("gid").as("to"), col("label").as("__tl")), Seq("to"))
      .select(col("__fl"), col("e.label").as("label"), col("__tl"))
      .distinct().collect()
      .map(r => EdgeType(r.getString(0), r.getString(1), r.getString(2))).toSeq
  }

  /** Roll back any swap a crashed [[MutableGraph.saveIncremental]] or
    * Catalog index relayout left half-done, restoring the pre-save state.
    *
    * COMMIT CONTRACT (read this before pointing `dir` at an object
    * store): the stage-then-swap protocols commit each label partition
    * with two `FileSystem.rename` calls. On HDFS and local filesystems
    * rename is atomic, so every crash leaves each label either fully old
    * (live partition intact, or moved to its `.__old` backup inside the
    * stage directory) or fully new — this method restores the backups and
    * discards uncommitted staged rows, so a load after ANY crash sees a
    * consistent graph (labels the crash interrupted roll back; labels
    * already swapped stay committed — per-label atomicity, exactly the
    * granularity a partition-overwrite MERGE has). On S3-class object
    * stores rename is copy+delete and NOT atomic: a crash mid-copy can
    * leave a partial partition that this rollback cannot detect. Do not
    * run the incremental-save/relayout paths against such a store without
    * an atomic-rename layer (HDFS, a committer service) — or switch the
    * graph to the built-in pointer-commit protocol
    * ([[graft.model.Catalog.enableManifestCommit]] / [[Manifest]]), which
    * replaces every swap with write-new-dirs + one atomic manifest
    * replacement and needs no rename at all. (The full
    * [[GraphFrame.save]] path is safe everywhere since Spark's own
    * output committer handles it.)
    *
    * Single-writer: recovery deletes the stage directories, so it must
    * not run concurrently with a live save/relayout on the same `dir`
    * (the same discipline the swap itself already requires). */
  def recoverInterruptedSwaps(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    for ((stageName, sideName) <- Seq(
        (".delta-stage-vertices", "vertices"), (".delta-stage-edges", "edges"),
        (".reindex", "vertices"), (".reindex-edges", "edges"))) {
      val stage = new org.apache.hadoop.fs.Path(s"$dir/$stageName")
      val fs = stage.getFileSystem(conf)
      if (fs.exists(stage)) {
        val side = new org.apache.hadoop.fs.Path(s"$dir/$sideName")
        for (st <- fs.listStatus(stage) if st.getPath.getName.endsWith(".__old")) {
          val live = new org.apache.hadoop.fs.Path(side,
            st.getPath.getName.stripSuffix(".__old"))
          // crash between the two renames: the backup is the only copy
          if (!fs.exists(live)) fs.rename(st.getPath, live)
        }
        // staged rows whose save never returned are uncommitted — discard
        fs.delete(stage, true)
      }
    }
  }

  /** Load a saved graph, including the topology contract if present.
    * Honors the swap protocols' crash recovery first (see
    * [[recoverInterruptedSwaps]]), so a graph interrupted mid-
    * incremental-save or mid-index-relayout loads intact. */
  def load(spark: SparkSession, dir: String): GraphFrame = {
    import spark.implicits._
    recoverInterruptedSwaps(spark, dir)
    val tPath = new org.apache.hadoop.fs.Path(s"$dir/topology")
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val topo =
      if (fs.exists(tPath))
        // explicit schema: an EMPTY declared topology ("no edges allowed")
        // writes a data-less JSON dataset that schema inference can't read
        Some(spark.read.schema(org.apache.spark.sql.Encoders.product[EdgeType].schema)
          .json(s"$dir/topology").as[EdgeType].collect().toSeq)
      else None
    // explicit schemas: an empty side (a vertex-only graph has no edge
    // part-files at all) would otherwise fail parquet schema inference
    GraphFrame(
      loadSide(spark, dir, "vertices", vertexSchema)
        .select("gid", "label", "data"),
      loadSide(spark, dir, "edges", edgeSchema)
        .select("gid", "label", "from", "to", "data"),
      topo)
  }

  /** One side's rows: the pointer-commit manifest when present (union of
    * the committed per-label directories, label injected from the
    * manifest key — see [[Manifest]]), else the plain
    * label-partitioned-directory read. */
  private[model] def loadSide(spark: SparkSession, dir: String, side: String,
                              schema: StructType): DataFrame = {
    val sidePath = new org.apache.hadoop.fs.Path(s"$dir/$side")
    val fs = sidePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Manifest.read(fs, sidePath) match {
      case Some(m) => manifestSide(spark, sidePath, m, schema)
      case None => spark.read.schema(schema).parquet(s"$dir/$side")
    }
  }

  /** Union of a manifest's committed per-label directories, projected to
    * `schema`'s column order. Committed files carry no partition column,
    * so `label` is injected from the manifest key (unescaping Spark's
    * partition-value spelling). Each label stays its own scan branch —
    * exactly the plan shape the plain partitioned read produces, so
    * label-pruning (`label isin ...` → dropped union branches) and
    * pushed data filters behave identically. */
  private[model] def manifestSide(spark: SparkSession,
                                  sidePath: org.apache.hadoop.fs.Path,
                                  m: Manifest.SideManifest,
                                  schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val fileSchema = StructType(schema.fields.filterNot(_.name == "label"))
    val order = schema.fieldNames.map(col).toSeq
    val perLabel = m.partitions.toSeq.sortBy(_._1).map { case (labelDir, rel) =>
      val labelValue = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(labelDir.stripPrefix("label="))
      spark.read.schema(fileSchema).parquet(new org.apache.hadoop.fs.Path(sidePath, rel).toString)
        .withColumn("label", lit(labelValue))
        .select(order: _*)
    }
    perLabel.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
  }

  /** Load from JSON-lines vertex/edge files (the reference's bulk-load
    * format, e.g. conformance/graphs/swapi.vertices — reference:
    * conformance/README.md:10-33). `data` is kept as raw JSON text.
    */
  def fromJsonLines(spark: SparkSession, vertexFile: String, edgeFile: String): GraphFrame = {
    // Read whole lines as text, extract top-level keys; keeping `data` as the
    // original JSON substring preserves value types exactly.
    val vRaw = spark.read.text(vertexFile)
    val v = vRaw.select(
      get_json_object(col("value"), "$.gid").as("gid"),
      get_json_object(col("value"), "$.label").as("label"),
      get_json_object(col("value"), "$.data").as("data"))
    val eRaw = spark.read.text(edgeFile)
    val e = eRaw.select(
      get_json_object(col("value"), "$.gid").as("gid"),
      get_json_object(col("value"), "$.label").as("label"),
      get_json_object(col("value"), "$.from").as("from"),
      get_json_object(col("value"), "$.to").as("to"),
      get_json_object(col("value"), "$.data").as("data"))
    GraphFrame(v, e)
  }
}
