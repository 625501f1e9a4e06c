package graft.model

import org.apache.spark.sql.SparkSession

/** Graph + index catalog over a root directory of saved graphs
  * (reference: ListGraphs gripql/gripql.proto:351-355, AddIndex/DeleteIndex
  * :468-481, kvindex/kvindex.go:88-145, conformance ot_index.py).
  *
  * On Spark the label "index" is physical (label-partitioned parquet →
  * partition pruning). Field indices are physical too: addIndex re-lays
  * the label's vertex partition out with a materialized
  * `__idx_<field>` column (the stored `get_json_object` of the field),
  * rows range-sorted by it — so an indexed point predicate becomes a
  * pushed parquet filter over tightly-bounded row groups, the
  * kvindex.go:88-145 seek re-expressed as columnar layout. DeleteIndex
  * drops the metadata only; a stale column is a still-correct
  * materialization that simply stops being read (the next save()
  * rewrites without it). With several indexed fields on one label the
  * sort is lexicographic by field name order — the first field gets
  * perfect clustering, later ones only stats-assisted skipping. */
class Catalog(spark: SparkSession, root: String) {
  private def dir(graph: String) = s"$root/$graph"
  private def idxFile(graph: String) = java.nio.file.Paths.get(s"$root/$graph/.indices")

  def createGraph(name: String, g: GraphFrame): Unit = {
    g.save(dir(name))
    // a (re)save writes plain (gid, label, data) files; any REGISTERED
    // index must be rebuilt over the new rows, or the next load would
    // read the index columns as all-null and indexed filters would
    // wrongly drop every row (the reference backfills its field indices
    // on write the same way, kvindex/kvindex.go AddVertexIndex)
    listIndices(name).map(_._1).distinct.foreach(relayout(name, _))
  }

  def dropGraph(name: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(dir(name)))
  }

  def listGraphs(): Seq[String] = {
    val d = new java.io.File(root)
    if (!d.exists()) Nil
    else d.listFiles().filter(f => f.isDirectory && new java.io.File(f, "vertices").exists())
      .map(_.getName).toSeq.sorted
  }

  def graph(name: String): GraphFrame = {
    val g0 = GraphFrame.load(spark, dir(name))
    // a posted schema doubles as the planner's pruning contract: its edge
    // triples are exactly the EdgeType topology, so hop joins over a
    // schema'd graph prune to reachable labels (GraphFrame.topology)
    val g = if (g0.topology.isEmpty && hasPostedSchema(name))
      g0.copy(topology = Some(topologyOf(getSchema(name))))
    else g0
    val idx = listIndices(name)
    if (idx.isEmpty) g
    else {
      // re-read vertices WITH the materialized index columns (absent in
      // some label partitions → null there; the compiler only uses an
      // index column under a label restriction fully covered by entries)
      val extra = idx.map(_._2).distinct.sorted.map(f =>
        org.apache.spark.sql.types.StructField(Catalog.idxCol(f),
          org.apache.spark.sql.types.StringType, nullable = true))
      val schema = org.apache.spark.sql.types.StructType(
        GraphFrame.vertexSchema.fields.toSeq ++ extra)
      val iv = spark.read.schema(schema).parquet(s"${dir(name)}/vertices")
      g.copy(fieldIndex = Some(FieldIndex(iv, idx.toSet)))
    }
  }

  private def schemaDir(name: String) = s"${dir(name)}/.schema"
  private def hasPostedSchema(name: String): Boolean =
    new java.io.File(s"${schemaDir(name)}/vertices").exists()

  /** Explicitly posted schema (reference: AddSchema gripql/gripql.proto:
    * 483-488): a schema GRAPH — one vertex per label, one edge per
    * (from,label,to) triple — stored beside the graph; [[getSchema]]
    * prefers it over sampling. */
  def addSchema(name: String, schema: GraphFrame): Unit =
    schema.save(schemaDir(name))

  /** The posted schema if present, else sampled (reference: GetSchema /
    * SampleSchema — schema/scan.go). */
  def getSchema(name: String, sampleN: Int = 50): GraphFrame =
    if (hasPostedSchema(name)) GraphFrame.load(spark, schemaDir(name))
    else SchemaSampler.sampleSchema(spark, graph(name), sampleN)

  /** EdgeType triples of a schema graph (its edges connect label vertices). */
  def topologyOf(schema: GraphFrame): Seq[EdgeType] =
    schema.edges.select("from", "label", "to").collect()
      .map(r => EdgeType(r.getString(0), r.getString(1), r.getString(2))).toSeq

  def listLabels(name: String): (Seq[String], Seq[String]) =
    SchemaSampler.listLabels(graph(name))

  /** Field index registration + physical build (label is always indexed).
    * Registers the (label, field) entry, then re-lays the label's vertex
    * partition out around the field (see class doc). The build is an
    * explicit one-shot — at scale one range shuffle of one label's rows,
    * the same cost class as the reference's index backfill
    * (kvindex/kvindex.go AddVertexIndex scan). The re-layout REPLACES the
    * label's files: GraphFrames loaded before addIndex hold stale file
    * listings and must be re-loaded via [[graph]] (the usual DDL-vs-open-
    * reader contract; the reference's KV backfill has the same hazard). */
  def addIndex(graph: String, label: String, field: String): Unit = {
    val cur = listIndices(graph).toSet + ((label, field))
    java.nio.file.Files.writeString(idxFile(graph),
      cur.toSeq.sorted.map { case (l, f) => s"$l\t$f" }.mkString("\n"))
    relayout(graph, label)
  }

  /** Rewrite one label's vertex partition with materialized, sorted
    * `__idx_*` columns for every index registered on that label. No-op
    * when the label has no stored rows yet (the index stays registered;
    * a later save() + addIndex re-run builds it). */
  private def relayout(graph: String, label: String): Unit = {
    val part = new org.apache.hadoop.fs.Path(s"${dir(graph)}/vertices/label=$label")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(part)) return
    val fields = listIndices(graph).collect { case (`label`, f) => f }.sorted
    import org.apache.spark.sql.functions.{col, get_json_object}
    // partition files hold (gid, data) — label is the directory key; old
    // __idx columns are recomputed rather than trusted
    val base = spark.read.parquet(part.toString).select("gid", "data")
    val withIdx = fields.foldLeft(base)((d, f) =>
      d.withColumn(Catalog.idxCol(f), get_json_object(col("data"), "$." + f)))
    val tmp = new org.apache.hadoop.fs.Path(part.toString + ".__reindex")
    // range-sort: each output file (and row group) gets a tight min/max
    // band of the leading index field
    withIdx.orderBy(fields.map(f => col(Catalog.idxCol(f))): _*)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(part, true)
    if (!fs.rename(tmp, part))
      throw new java.io.IOException(s"index re-layout: rename $tmp -> $part failed")
  }

  def deleteIndex(graph: String, label: String, field: String): Unit = {
    val cur = listIndices(graph).toSet - ((label, field))
    java.nio.file.Files.writeString(idxFile(graph),
      cur.toSeq.sorted.map { case (l, f) => s"$l\t$f" }.mkString("\n"))
  }

  def listIndices(graph: String): Seq[(String, String)] = {
    val p = idxFile(graph)
    if (!java.nio.file.Files.exists(p)) Nil
    else java.nio.file.Files.readString(p).split("\n").filter(_.nonEmpty).toSeq
      .map { l => val Array(a, b) = l.split("\t", 2); (a, b) }
  }
}

object Catalog {
  /** Parquet column name materializing an indexed field's extraction. */
  def idxCol(field: String): String =
    "__idx_" + field.replaceAll("[^A-Za-z0-9_]", "_")
}
