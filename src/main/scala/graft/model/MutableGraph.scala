package graft.model

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The Edit/DML surface: AddVertex/AddEdge upsert-by-gid, deletes with
  * incident-edge cleanup, and a validated BulkAdd stream (reference:
  * gripql/gripql.proto:425-503, kvgraph/graph.go, conformance
  * ot_update.py / ot_bulk.py).
  *
  * Spark-first shape: every mutation is a MERGE-style plan — new rows
  * last-wins-deduped, existing rows anti-joined out, union written back.
  * Single-element calls buffer locally and flush as ONE batch before any
  * read, so a bulk load of N elements costs one merge, not N (the batch
  * analogue of the reference's streaming BulkAdd). At scale the write-back
  * is a partition-overwrite of label-partitioned parquet ([[GraphFrame.save]]);
  * on a lakehouse table format this whole class collapses into MERGE INTO.
  */
class MutableGraph(spark: SparkSession, v0: DataFrame, e0: DataFrame) {
  import MutableGraph._

  private var v: DataFrame = v0
  private var e: DataFrame = e0
  private val vBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
  private val eBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, String)]

  def addVertex(gid: String, label: String, dataJson: String = "{}"): Unit =
    vBuf += ((gid, label, dataJson))

  /** gid defaults to a generated unique id (reference generates a UUID,
    * kvgraph/graph.go AddEdge). */
  def addEdge(from: String, to: String, label: String, dataJson: String = "{}",
              gid: String = null): Unit = {
    val g = if (gid == null) java.util.UUID.randomUUID().toString else gid
    eBuf += ((g, label, from, to, dataJson))
  }

  /** Validated bulk stream: elements with missing gid/label/from/to are
    * counted as errors and skipped; valid elements are inserted
    * (reference: ot_bulk.py test_bulkload_validate). Returns error count. */
  def bulkAdd(vertices: Seq[(String, String, String)],
              edges: Seq[(String, String, String, String, String)]): Long = {
    var errors = 0L
    vertices.foreach { case t @ (gid, label, _) =>
      if (gid == null || gid.isEmpty || label == null || label.isEmpty) errors += 1
      else vBuf += t
    }
    edges.foreach { case t @ (_, label, from, to, _) =>
      if (label == null || label.isEmpty || from == null || from.isEmpty ||
          to == null || to.isEmpty) errors += 1
      else eBuf += ((if (t._1 == null || t._1.isEmpty) java.util.UUID.randomUUID().toString else t._1,
        label, from, to, t._5))
    }
    errors
  }

  def deleteVertex(gid: String): Unit = {
    flush()
    v = v.filter(col("gid") =!= gid)
    // incident edges go with the vertex (reference: ot_update.py test_delete_edge)
    e = e.filter(col("from") =!= gid && col("to") =!= gid)
  }

  def deleteEdge(gid: String): Unit = {
    flush()
    e = e.filter(col("gid") =!= gid)
  }

  /** Merge pending buffers: last add wins per gid, then MERGE over the
    * stored rows (anti-join + union). */
  def flush(): Unit = {
    import spark.implicits._
    if (vBuf.nonEmpty) {
      val newV = lastWins(vBuf.toSeq.toDF("gid", "label", "data"), spark)
      v = v.join(broadcast(newV.select("gid")), Seq("gid"), "left_anti")
        .unionByName(newV)
      vBuf.clear()
    }
    if (eBuf.nonEmpty) {
      val newE = lastWins(eBuf.toSeq.toDF("gid", "label", "from", "to", "data"), spark)
      e = e.join(broadcast(newE.select("gid")), Seq("gid"), "left_anti")
        .unionByName(newE)
      eBuf.clear()
    }
  }

  def graph: GraphFrame = { flush(); GraphFrame(v, e) }

  def getVertex(gid: String): Option[Row] = {
    flush(); v.filter(col("gid") === gid).collect().headOption
  }

  def getEdge(gid: String): Option[Row] = {
    flush(); e.filter(col("gid") === gid).collect().headOption
  }

  def save(dir: String): Unit = graph.save(dir)
}

object MutableGraph {
  /** An empty writable graph. */
  def empty(spark: SparkSession): MutableGraph = {
    val v = spark.createDataFrame(new java.util.ArrayList[Row](), GraphFrame.vertexSchema)
    val e = spark.createDataFrame(new java.util.ArrayList[Row](), GraphFrame.edgeSchema)
    new MutableGraph(spark, v, e)
  }

  def apply(spark: SparkSession, g: GraphFrame): MutableGraph =
    new MutableGraph(spark, g.vertices, g.edges)

  /** Keep only the LAST row per gid (upsert ordering: later add wins,
    * reference ot_update.py test_replace). */
  private def lastWins(df: DataFrame, spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("gid").orderBy(col("__ord").desc)
    df.withColumn("__ord", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__ord", "__rn")
  }
}
