package graft.model

import org.apache.spark.sql.SparkSession

/** Graph + index catalog over a root directory of saved graphs
  * (reference: ListGraphs gripql/gripql.proto:351-355, AddIndex/DeleteIndex
  * :468-481, kvindex/kvindex.go:88-145, conformance ot_index.py).
  *
  * On Spark the label "index" is physical (label-partitioned parquet →
  * partition pruning) and field indices are advisory metadata: parquet
  * min/max row-group stats already give index-grade skipping for point
  * predicates, so Add/DeleteIndex record intent and ListIndices reports
  * label + field entries — the API surface a reference client expects. */
class Catalog(spark: SparkSession, root: String) {
  private def dir(graph: String) = s"$root/$graph"
  private def idxFile(graph: String) = java.nio.file.Paths.get(s"$root/$graph/.indices")

  def createGraph(name: String, g: GraphFrame): Unit = g.save(dir(name))

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
    val g = GraphFrame.load(spark, dir(name))
    // a posted schema doubles as the planner's pruning contract: its edge
    // triples are exactly the EdgeType topology, so hop joins over a
    // schema'd graph prune to reachable labels (GraphFrame.topology)
    if (g.topology.isEmpty && hasPostedSchema(name))
      g.copy(topology = Some(topologyOf(getSchema(name))))
    else g
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

  /** Advisory field index registration (label is always indexed). */
  def addIndex(graph: String, label: String, field: String): Unit = {
    val cur = listIndices(graph).toSet + ((label, field))
    java.nio.file.Files.writeString(idxFile(graph),
      cur.toSeq.sorted.map { case (l, f) => s"$l\t$f" }.mkString("\n"))
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
