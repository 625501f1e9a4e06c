package graft.model

import org.apache.spark.sql.SparkSession

/** Bucketed graph storage: the 100 TB layout for traversal-heavy graphs.
  *
  * Every hop is an equi-join between the traveler stream and an edge or
  * vertex table. With plain parquet both sides shuffle per hop; bucketing
  * the stored tables on their join keys makes the STORED side's shuffle
  * disappear (Spark reads each bucket as a pre-hashed partition), so a hop
  * shuffles only the traveler stream — usually orders of magnitude smaller
  * than the 100 TB edge set.
  *
  * Edges are written TWICE, bucketed by `from` and by `to` — the same
  * doubling as the reference's KV backend, which maintains separate
  * out-adjacency and in-adjacency index prefixes so either direction is a
  * seek (reference: kvgraph/graph.go:352-431, keys OutEdgePrefix /
  * InEdgePrefix); here the "index" is the bucket layout and the compiler
  * picks the copy matching the hop direction ([[GraphFrame.edgesByTo]]).
  *
  * Tables land in the session catalog (`<name>_v`, `<name>_eout`,
  * `<name>_ein`); with a persistent metastore/warehouse they survive
  * sessions, exactly like any bucketed warehouse table.
  */
object BucketedGraph {
  def save(spark: SparkSession, g: GraphFrame, name: String, buckets: Int = 64): Unit = {
    g.vertices.write.mode("overwrite")
      .bucketBy(buckets, "gid").sortBy("gid").saveAsTable(s"${name}_v")
    g.edges.write.mode("overwrite")
      .bucketBy(buckets, "from").sortBy("from").saveAsTable(s"${name}_eout")
    g.edges.write.mode("overwrite")
      .bucketBy(buckets, "to").sortBy("to").saveAsTable(s"${name}_ein")
  }

  def load(spark: SparkSession, name: String): GraphFrame =
    GraphFrame(
      spark.table(s"${name}_v"),
      spark.table(s"${name}_eout"),
      topology = None,
      edgesByTo = Some(spark.table(s"${name}_ein")))

  def drop(spark: SparkSession, name: String): Unit =
    for (s <- Seq("_v", "_eout", "_ein"))
      spark.sql(s"DROP TABLE IF EXISTS $name$s")
}
