package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF (N-Triples) bulk ingest — the reference's `grip rdf` loader mapping
  * re-expressed as DataFrame transforms (reference: cmd/rdf/main.go):
  *   - subject IRIs become vertices
  *   - `rdf:type` triples set the vertex label (default "rdf:Resource")
  *   - literal-object triples become vertex data properties
  *   - IRI-object triples become edges labeled by the predicate
  *
  * One pass over the triples, three derived frames — at scale this is a
  * single text scan plus two hash aggregations on subject.
  */
object Rdf {
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Parse N-Triples text into (subject, predicate, object, isLiteral). */
  def triples(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    // <s> <p> <o> .   |   <s> <p> "literal"(^^<datatype-iri> | @lang)? .
    val iriObj = """^<([^>]+)>\s+<([^>]+)>\s+<([^>]+)>\s*\.\s*$"""
    val litObj = """^<([^>]+)>\s+<([^>]+)>\s+"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]+>|@[A-Za-z0-9-]+)?\s*\.\s*$"""
    lines.select(
        regexp_extract(col("value"), iriObj, 1).as("s_iri"),
        regexp_extract(col("value"), iriObj, 2).as("p_iri"),
        regexp_extract(col("value"), iriObj, 3).as("o_iri"),
        regexp_extract(col("value"), litObj, 1).as("s_lit"),
        regexp_extract(col("value"), litObj, 2).as("p_lit"),
        regexp_extract(col("value"), litObj, 3).as("o_lit"))
      .select(
        when(col("s_iri") =!= "", col("s_iri")).otherwise(col("s_lit")).as("s"),
        when(col("s_iri") =!= "", col("p_iri")).otherwise(col("p_lit")).as("p"),
        when(col("s_iri") =!= "", col("o_iri")).otherwise(col("o_lit")).as("o"),
        (col("s_iri") === "").as("isLiteral"))
      .filter(col("s") =!= "")
  }

  /** Build a GraphFrame from an N-Triples file. */
  def load(spark: SparkSession, path: String): GraphFrame = {
    val t = triples(spark, path)
    val labels = t.filter(!col("isLiteral") && col("p") === RdfType)
      .groupBy(col("s")).agg(first(col("o")).as("label"))
    val props = t.filter(col("isLiteral"))
      .groupBy(col("s"))
      .agg(to_json(map_from_entries(sort_array(collect_list(struct(col("p"), col("o")))))).as("data"))
    val edgeT = t.filter(!col("isLiteral") && col("p") =!= RdfType)
    // every IRI that appears as subject or edge object is a vertex
    val subjects = t.select(col("s")).union(edgeT.select(col("o").as("s"))).distinct()
    val vertices = subjects
      .join(labels, Seq("s"), "left_outer")
      .join(props, Seq("s"), "left_outer")
      .select(col("s").as("gid"),
        coalesce(col("label"), lit("rdf:Resource")).as("label"),
        coalesce(col("data"), lit("{}")).as("data"))
    val edges = edgeT.select(
      concat(col("s"), lit("|"), col("p"), lit("|"), col("o")).as("gid"),
      col("p").as("label"), col("s").as("from"), col("o").as("to"), lit("{}").as("data"))
    GraphFrame(vertices, edges)
  }
}
