package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph analytics beyond GripQL's per-traveler algebra — shapes a
  * property-graph warehouse asks of the same vertex/edge frames the
  * traversal compiler reads. (The reference exposes only traversal-scoped
  * aggregations, `gripql/gripql.proto:190-217`; a degree distribution
  * there requires client-side iteration, which is exactly what a 100-TB
  * engine cannot do.) */
object GraphAlgos {
  /** Degree distribution: for every vertex of `vertexLabel`, its count of
    * `edgeLabel` edges in direction `dir` ("out" = edges leaving the
    * vertex, "in" = edges arriving), INCLUDING zero-degree vertices —
    * then the histogram of those counts. Output: (deg, n_vertices).
    *
    * Scale shape: the edge side aggregates to one row per endpoint
    * before joining (never a row-per-edge join against the vertex set),
    * the vertex join reuses the same gid key, and the final histogram
    * aggregate is tiny (distinct degree values). Label filters prune to
    * single branches of the label-partitioned union. */
  /** Weakly connected components over one edge label: every vertex keyed
    * by its component's MINIMUM gid (string order — the same min both
    * the distributed star-contraction and any SQL ground truth compute);
    * vertices touching no such edge are their own singleton components.
    * Output: (gid, component).
    *
    * Scale shape: delegates to the alternating-star contraction of
    * [[graft.pipeline.Dedup.clusters]] (log-rounds of bounded joins with
    * checkpointed frontiers, with a driver-local union-find fast path
    * below its threshold), then one left join to re-attach isolated
    * vertices. */
  def connectedComponents(g: GraphFrame, edgeLabel: String,
                          maxIters: Int = 50): DataFrame = {
    val pairs = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("__a"), col("to").as("__b"))
    val assigned = graft.pipeline.Dedup.clusters(pairs, "__a", "__b", maxIters)
    g.vertices.select(col("gid"))
      .join(assigned, col("gid") === col("id"), "left")
      .select(col("gid"), coalesce(col("cluster_id"), col("gid")).as("component"))
  }

  def degreeHistogram(g: GraphFrame, vertexLabel: String, edgeLabel: String,
                      dir: String = "out"): DataFrame = {
    require(dir == "out" || dir == "in", s"dir must be 'out' or 'in', got $dir")
    val key = if (dir == "out") "from" else "to"
    val vs = g.vertices.filter(col("label") === vertexLabel).select(col("gid"))
    val perVertex = g.edges.filter(col("label") === edgeLabel)
      .groupBy(col(key).as("gid")).agg(count(lit(1)).as("deg"))
    vs.join(perVertex, Seq("gid"), "left")
      .select(coalesce(col("deg"), lit(0L)).as("deg"))
      .groupBy("deg")
      .agg(count(lit(1)).as("n_vertices"))
  }
}
