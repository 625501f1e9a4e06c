package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic "collections as graph" mapping — the Spark-native analogue of
  * the reference's GRIPPER federated source (reference:
  * gripper/gripper.proto, gripper/graph.go: external tables exposed as
  * vertices/edges via a mapping config). Any DataFrames become a queryable
  * GraphFrame; `data` is synthesized with to_json and the JsonShredding
  * rule (graft.plans) turns predicates over it back into pushable column
  * references, so the mapping costs nothing at scan time.
  *
  * TpchGraph is one hand-tuned instance of this shape.
  */
object TableGraph {
  /** One vertex class: rows of `table`, gid = prefix + key, label fixed,
    * data = JSON of `dataCols` (all non-key columns when empty). */
  case class VertexMapping(table: DataFrame, gidPrefix: String, keyCol: String,
                           label: String, dataCols: Seq[String] = Nil)

  /** One edge class: rows of `table`, endpoints built from prefixed key
    * columns, gid = gidPrefix + key columns joined with ':'. */
  case class EdgeMapping(table: DataFrame, gidPrefix: String, keyCols: Seq[String],
                         label: String,
                         fromPrefix: String, fromCol: String,
                         toPrefix: String, toCol: String,
                         dataCols: Seq[String] = Nil)

  private def dataJson(df: DataFrame, cols: Seq[String], exclude: Seq[String]): Column = {
    val use = if (cols.nonEmpty) cols else df.columns.toSeq.filterNot(exclude.contains)
    if (use.isEmpty) lit("{}") else to_json(struct(use.map(col): _*))
  }

  def apply(vertices: Seq[VertexMapping], edges: Seq[EdgeMapping]): GraphFrame = {
    require(vertices.nonEmpty, "at least one vertex mapping required")
    val vs = vertices.map { m =>
      m.table.select(
        concat(lit(m.gidPrefix), col(m.keyCol).cast("string")).as("gid"),
        lit(m.label).as("label"),
        dataJson(m.table, m.dataCols, Seq(m.keyCol)).as("data"))
    }.reduce(_ unionByName _)
    val es =
      if (edges.isEmpty)
        vertices.head.table.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), GraphFrame.edgeSchema)
      else edges.map { m =>
        m.table.select(
          concat((lit(m.gidPrefix) +: m.keyCols.flatMap(k => Seq(col(k).cast("string"), lit(":")))
            .dropRight(1)): _*).as("gid"),
          lit(m.label).as("label"),
          concat(lit(m.fromPrefix), col(m.fromCol).cast("string")).as("from"),
          concat(lit(m.toPrefix), col(m.toCol).cast("string")).as("to"),
          dataJson(m.table, m.dataCols, m.keyCols ++ Seq(m.fromCol, m.toCol)).as("data"))
      }.reduce(_ unionByName _)
    GraphFrame(vs, es)
  }
}
