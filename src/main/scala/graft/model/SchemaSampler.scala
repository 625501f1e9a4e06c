package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GJson

/** Graph catalog + schema sampling (reference: ListLabels
  * gripql/gripql.proto:351-355, SampleSchema gdbi/schema/scanner.go:14-40,
  * field typing gripql/schema.go:4-40, conformance ot_schema.py).
  *
  * The sampled schema is itself a graph: one vertex per vertex label
  * (gid = label, data = field → FieldType name), one edge per
  * (from-label, edge-label, to-label) triple observed in the graph, with
  * gid "(from)--label->(to)" — the reference's format.
  */
object SchemaSampler {
  /** Distinct vertex + edge labels — on label-partitioned parquet this is
    * partition-listing, not a scan. */
  def listLabels(g: GraphFrame): (Seq[String], Seq[String]) = (
    g.vertices.select("label").distinct().collect().map(_.getString(0)).sorted.toSeq,
    g.edges.select("label").distinct().collect().map(_.getString(0)).sorted.toSeq)

  /** field→type JSON document from exploded (group key..., key, data) rows;
    * labels whose sampled data has no keys still yield "{}". */
  private def typeDoc(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val exploded = df.select(groupCols.map(col) :+
      explode_outer(json_object_keys(col("data"))).as("key") :+ col("data"): _*)
    val keyTypes = exploded
      .withColumn("type", when(col("key").isNotNull, GJson.json_type_dyn(col("data"), col("key"))))
      .groupBy(groupCols.head, groupCols.tail :+ "key": _*)
      .agg(last("type").as("type"))
    keyTypes.groupBy(groupCols.head, groupCols.tail: _*)
      .agg(to_json(map_from_entries(sort_array(
        collect_list(when(col("key").isNotNull, struct(col("key"), col("type"))))))).as("data"))
  }

  /** Sample the graph into a schema GraphFrame: `sampleN` elements per
    * vertex label (merged field types, later samples win) plus the edge
    * label triples they participate in. */
  def sampleSchema(spark: SparkSession, g: GraphFrame, sampleN: Int = 50): GraphFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("label").orderBy("gid")
    val sampledV = g.vertices
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= sampleN)
      .drop("__rn")

    val vSchema = typeDoc(sampledV, Seq("label"))
      .select(col("label").as("gid"), col("label"), col("data"))

    val vLab = g.vertices.select(col("gid"), col("label"))
    val triples = g.edges.alias("e")
      .join(vLab.select(col("gid").as("from"), col("label").as("__fl")), Seq("from"))
      .join(vLab.select(col("gid").as("to"), col("label").as("__tl")), Seq("to"))
      .select(col("__fl"), col("e.label").as("label"), col("__tl"), col("e.data").as("data"))

    val eSchema = typeDoc(triples, Seq("__fl", "label", "__tl")).select(
      concat(lit("("), col("__fl"), lit(")--"), col("label"), lit("->("), col("__tl"), lit(")")).as("gid"),
      col("label"),
      col("__fl").as("from"), col("__tl").as("to"),
      col("data"))

    GraphFrame(vSchema, eSchema)
  }
}
