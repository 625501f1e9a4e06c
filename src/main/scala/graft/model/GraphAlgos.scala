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

  /** Multi-source BFS: hop distance from the seed set to every vertex
    * reachable over `edgeLabel` within `maxHops` (unreached vertices are
    * absent, seeds are distance 0). Output: (gid, dist).
    *
    * Scale shape: classic frontier expansion — each round joins only the
    * CURRENT frontier (not the visited set) against the edge list, anti-
    * joins out already-visited vertices, and checkpoints the frontier so
    * the plan never re-derives prior rounds (same hygiene as the
    * traversal jump loop). Rounds are bounded by `maxHops`; per-round
    * cost is |frontier| × avg-degree, the best any distributed BFS
    * does. */
  def bfs(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
          maxHops: Int = 10, undirected: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"need maxHops >= 0, got $maxHops")
    require(seeds.columns.length == 1,
      s"seeds must be a single gid column, got (${seeds.columns.mkString(", ")}) — " +
        "select the gid column explicitly before calling bfs")
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).localCheckpoint(true)
    var dist = seeds.select(col(seeds.columns.head).as("gid"), lit(0).as("dist"))
      .distinct().localCheckpoint(true)
    var frontier = dist
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(e, frontier("gid") === e("u"))
        .select(col("v").as("gid")).distinct()
        .join(dist.select("gid"), Seq("gid"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(true)
      dist = dist.unionByName(next).localCheckpoint(true)
      frontier = next
      hop += 1
    }
    dist.withColumn("dist", col("dist").cast("long"))
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
