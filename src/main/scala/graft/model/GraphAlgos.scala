package graft.model

import org.apache.spark.sql.{Column, DataFrame}
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
      // the visited set is a lazy union of the (checkpointed) frontiers:
      // every leaf is already materialized, so re-checkpointing the union
      // each round was an O(|visited|) copy per round for nothing
      dist = dist.unionByName(next)
      frontier = next
      hop += 1
    }
    // exit materialization when the loop ran — the union's arity is
    // data-dependent, see [[labeledBfs]]'s SF-invariant-plan rationale
    val out = dist.withColumn("dist", col("dist").cast("long"))
    if (hop > 1) out.localCheckpoint(true) else out
  }

  /** PageRank over one edge label with damping `d`: fixed `iters` rounds of
    * power iteration from the uniform start, dangling mass (vertices with
    * no out-edges) redistributed uniformly each round — the standard
    * r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/outdeg(u) + dangling/N). Parallel
    * edges count as extra weight (matching a multigraph's random surfer).
    * Output: (gid, rank), Σ rank = 1.
    *
    * Scale shape: the edge list is repartitioned by source ONCE and
    * checkpointed, so each round only the (narrow) rank frame shuffles to
    * meet it; per-round contributions pre-aggregate map-side before the
    * destination shuffle; each round's ranks are checkpointed so the plan
    * never re-derives prior rounds (same frontier hygiene as [[bfs]]).
    * The dangling mass is a 1-row aggregate over the same rank⋈outdeg
    * join (never touching the edge list) fused into the round's single
    * action as a broadcast scalar frame — the join's shuffle output is
    * shared with the contribution branch via exchange reuse, and no
    * driver-synchronous `.first()` blocks between rounds. (A tempting
    * alternative — riding the dangling mass through the message
    * aggregate as a null-destination group — re-executes the full EDGE
    * join in the scalar branch because the pushed-down null filters make
    * the two aggregate plans non-identical; measured on the plan, not
    * guessed.) */
  /** Labeled multi-source BFS shared by [[closenessCentrality]] and
    * [[eccentricity]]: (seed, gid, dist) for everything within `maxHops`
    * of each seed, plus the deduplicated seed frame — k seeds ride ONE
    * frontier loop instead of k passes; the frontier state is
    * |seeds| × |reached|, and the per-round join stays frontier-sized.
    * Exact all-vertex variants are these with seeds = V (cost |V| BFS
    * sources); at 100 TB sample seeds (landmark estimation) instead. */
  private def labeledBfs(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
                         maxHops: Int, undirected: Boolean): (DataFrame, DataFrame) = {
    require(maxHops >= 1, s"need maxHops >= 1, got $maxHops")
    require(seeds.columns.length == 1,
      s"seeds must be a single gid column, got (${seeds.columns.mkString(", ")})")
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).localCheckpoint(true)
    val seedCol = seeds.select(col(seeds.columns.head).as("seed")).distinct()
      .localCheckpoint(true)
    var dist = seedCol.select(col("seed"), col("seed").as("gid"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(e, frontier("gid") === e("u"))
        .select(col("seed"), col("v").as("gid")).distinct()
        .join(dist.select("seed", "gid"), Seq("seed", "gid"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(true)
      // lazy union of checkpointed frontiers — see [[bfs]]
      dist = dist.unionByName(next)
      frontier = next
      hop += 1
    }
    // Materialize the final union ONCE whenever the loop ran: the union's
    // ARITY is data-dependent (one arm per non-empty round), so a lazy
    // return hands every consumer a plan whose shape differs between
    // scale factors — which defeats the bench's small-SF codegen warm
    // pass and lands a fresh whole-stage compile inside the timed run
    // (the r13 q82 regression, +0.38 s settled: probed cold 1.70 s lazy
    // vs 0.96 s materialized, warm-equal). The copy pass is
    // frontier-state-sized — trivially cheap next to one Janino compile —
    // and buys each consumer the SAME single-leaf plan at every SF.
    (if (hop > 1) dist.localCheckpoint(true) else dist, seedCol)
  }

  /** Per-seed eccentricity within the `maxHops` horizon: the greatest
    * hop distance from the seed to anything it reaches (0 for isolated
    * seeds) — max over seeds lower-bounds the graph diameter, the
    * landmark-sampling estimate used at scale. Output: (gid, n_reached,
    * eccentricity). */
  def eccentricity(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
                   maxHops: Int = 10, undirected: Boolean = true): DataFrame = {
    val (dist, seedCol) = labeledBfs(g, edgeLabel, seeds, maxHops, undirected)
    val agg = dist.filter(col("dist") > 0).groupBy("seed").agg(
      count(lit(1)).as("__n"), max("dist").as("__e"))
    seedCol.join(agg, Seq("seed"), "left").select(
      col("seed").as("gid"),
      coalesce(col("__n"), lit(0L)).as("n_reached"),
      coalesce(col("__e").cast("long"), lit(0L)).as("eccentricity"))
  }

  /** Closeness + harmonic centrality for a SEED SET over [[labeledBfs]].
    * Per seed s with reachable set R(s) (within `maxHops`, excluding s):
    *   closeness = |R| / Σ d(s,v)    (0.0 when nothing is reachable)
    *   harmonic  = Σ 1/d(s,v)        (robust on disconnected graphs)
    * Output: (gid, n_reached, total_dist, closeness, harmonic) — one row
    * per seed, doubles rounded to 6 places. */
  def closenessCentrality(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
                          maxHops: Int = 10, undirected: Boolean = true): DataFrame = {
    val (dist, seedCol) = labeledBfs(g, edgeLabel, seeds, maxHops, undirected)
    val agg = dist.filter(col("dist") > 0).groupBy("seed").agg(
      count(lit(1)).as("__n"), sum("dist").as("__t"),
      round(count(lit(1)).cast("double") / sum("dist"), 6).as("__c"),
      round(sum(lit(1.0) / col("dist")), 6).as("__h"))
    seedCol.join(agg, Seq("seed"), "left").select(
      col("seed").as("gid"),
      coalesce(col("__n"), lit(0L)).as("n_reached"),
      coalesce(col("__t").cast("long"), lit(0L)).as("total_dist"),
      coalesce(col("__c"), lit(0.0)).as("closeness"),
      coalesce(col("__h"), lit(0.0)).as("harmonic"))
  }

  /** Sampled betweenness centrality — Brandes (2001) dependency
    * accumulation restricted to a SEED sample, the standard estimator
    * when exact all-pairs Brandes (|V| BFS sweeps) is unaffordable:
    * forward, a per-layer multi-source BFS counts shortest paths
    * σ(s,v) = Σ σ(s,u) over shortest-path-DAG predecessors u; backward,
    * layer by layer from the horizon,
    *   δ(v) = Σ_{w succ} σ(v)/σ(w) · (1 + δ(w))
    * and bc(v) = Σ_seeds δ(v) over non-seed layers, doubles rounded
    * to 6. The horizon truncates like [[kCore]]/[[kTruss]]: paths are
    * counted within `maxHops`, so a fixed-R SQL oracle can unroll both
    * sweeps as plain per-layer CTEs. Output: (gid, betweenness) for
    * every vertex some seed reaches at depth ≥ 1 (zeros included);
    * the raw seed-sum is reported unscaled — multiply by |V|/|seeds|
    * for the population estimate.
    *
    * Scale shape: k seeds ride ONE frame per layer (seed column), every
    * join is frontier- or layer-sized and pivots on adjacency, each
    * layer localCheckpoints — the per-round cost is Σ|layer|·degree,
    * never all-pairs. Parallel edges collapse (`distinct`) so σ counts
    * paths, not multi-edge multiplicities. */
  def betweennessSampled(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
                         maxHops: Int = 4, undirected: Boolean = true): DataFrame = {
    require(maxHops >= 1, s"need maxHops >= 1, got $maxHops")
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).distinct().localCheckpoint(true)
    val seedCol = seeds.select(col(seeds.columns.head).as("seed")).distinct()
      .localCheckpoint(true)
    // forward sweep: layers(L) = (seed, gid, sigma) at BFS depth L
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame](
      seedCol.select(col("seed"), col("seed").as("gid"), lit(1L).as("sigma"))
        .localCheckpoint(true))
    var visited = layers.head.select("seed", "gid").localCheckpoint(true)
    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      val prev = layers.last
      val next = prev.join(e, prev("gid") === e("u"))
        .select(col("seed"), col("v").as("gid"), col("sigma"))
        .join(visited, Seq("seed", "gid"), "left_anti")
        .groupBy("seed", "gid").agg(sum("sigma").as("sigma"))
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        layers += next
        visited = visited.union(next.select("seed", "gid")).localCheckpoint(true)
        hop += 1
      }
    }
    val maxL = layers.length - 1
    val spark = g.vertices.sparkSession
    if (maxL == 0) {
      import spark.implicits._
      return Seq.empty[(String, Double)].toDF("gid", "betweenness")
    }
    // backward sweep: horizon layer has delta 0; each layer sums its
    // successors' scaled dependencies
    val deltas = new Array[DataFrame](maxL + 1)
    deltas(maxL) = layers(maxL).withColumn("delta", lit(0.0)).localCheckpoint(true)
    // layer 0 (the seeds') delta is never read — stop the sweep at 1
    var lev = maxL - 1
    while (lev >= 1) {
      val cur = layers(lev).alias("c")
      val up = deltas(lev + 1).alias("w")
      val contrib = cur.join(e, col("c.gid") === e("u"))
        .join(up, col("w.seed") === col("c.seed") && col("w.gid") === e("v"))
        .groupBy(col("c.seed").as("seed"), col("c.gid").as("gid"))
        .agg(sum(col("c.sigma").cast("double") / col("w.sigma")
          * (lit(1.0) + col("w.delta"))).as("__d"))
      deltas(lev) = layers(lev).join(contrib, Seq("seed", "gid"), "left")
        .select(col("seed"), col("gid"), col("sigma"),
          coalesce(col("__d"), lit(0.0)).as("delta"))
        .localCheckpoint(true)
      lev -= 1
    }
    // materialize the delta union once when its arity is > 1: maxL is
    // data-dependent (deepest non-empty layer), so the lazy union's shape
    // differs between scale factors and defeats the small-SF codegen warm
    // pass — same SF-invariant-consumer-plan rationale as [[labeledBfs]]
    val allDeltas = (1 to maxL).map(deltas(_)).reduce(_ unionByName _)
    (if (maxL > 1) allDeltas.localCheckpoint(true) else allDeltas)
      .groupBy("gid").agg(round(sum("delta"), 6).as("betweenness"))
  }

  def pageRank(g: GraphFrame, edgeLabel: String, iters: Int = 20,
               damping: Double = 0.85, undirected: Boolean = false): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0 && damping < 1, s"need 0 < damping < 1, got $damping")
    val verts = g.vertices.select(col("gid")).distinct().localCheckpoint(true)
    val n = verts.count().toDouble
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).repartition(col("u")).localCheckpoint(true)
    val outdeg = e.groupBy(col("u").as("gid"))
      .agg(count(lit(1)).cast("double").as("__outdeg")).localCheckpoint(true)
    var ranks = verts.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val withDeg = ranks.join(outdeg, Seq("gid"), "left")
      val dang = withDeg.filter(col("__outdeg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dang"))
      val contribs = withDeg.filter(col("__outdeg").isNotNull)
        .join(e, col("gid") === col("u"))
        .select(col("v"), (col("rank") / col("__outdeg")).as("__c"))
        .groupBy(col("v").as("gid")).agg(sum("__c").as("__c"))
      ranks = verts.join(contribs, Seq("gid"), "left")
        .crossJoin(broadcast(dang))
        .select(col("gid"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) + col("__dang") / lit(n))).as("rank"))
      // bound lineage every third round only (katz's cadence): an eager
      // materialization per round is pure scheduler overhead on short
      // horizons, and the round's double-read of the previous rank frame
      // (dangling + contribution branches) dedups via exchange reuse
      // inside the one composed plan exactly as it did per round
      if ((i + 1) % 3 == 0 && i + 1 < iters) ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Katz centrality: x_{t+1}(v) = β + α · Σ_{u→v} x_t(u) — the
    * attenuated-walk-count centrality (Katz 1953), the classic companion
    * to [[pageRank]] that rewards reachability by MANY short walks
    * instead of normalizing by out-degree. α must stay below the
    * reciprocal spectral radius for the fixpoint to exist; callers unroll
    * a fixed `iters` (the engine-vs-oracle contract, like pageRank's).
    *
    * Scale shape identical to [[pageRank]]: edge list repartitioned by
    * source once + checkpointed, per round one narrow x-frame shuffle;
    * no dangling machinery (Katz has no mass conservation). */
  def katzCentrality(g: GraphFrame, edgeLabel: String, iters: Int = 3,
                     alpha: Double = 0.1, beta: Double = 1.0,
                     undirected: Boolean = false): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    val verts = g.vertices.select(col("gid")).distinct().localCheckpoint(true)
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).repartition(col("u")).localCheckpoint(true)
    var x = verts.withColumn("katz", lit(beta))
    var i = 0
    while (i < iters) {
      val contribs = x.join(e, col("gid") === col("u"))
        .select(col("v"), col("katz").as("__c"))
        .groupBy(col("v").as("gid")).agg(sum("__c").as("__c"))
      x = verts.join(contribs, Seq("gid"), "left")
        .select(col("gid"),
          (lit(beta) + lit(alpha) * coalesce(col("__c"), lit(0.0))).as("katz"))
      // bound lineage every third round only (aggregateNeighborhood's
      // cadence) — an eager materialization per round is pure scheduler
      // overhead on the short horizons centrality smoothing uses
      if ((i + 1) % 3 == 0 && i + 1 < iters) x = x.localCheckpoint(true)
      i += 1
    }
    x
  }

  /** Edge-weighted PageRank: rank flows along each edge in proportion to
    * its weight share of the source's total out-weight,
    * contrib(u→v) = rank(u)·w(u,v)/W(u) — on a similarity graph (pass
    * e.g. 1/(1+distance) as `weight`) rank concentrates in tightly-knit
    * template families rather than merely high-degree ones. Zero/negative
    * weights are dropped; vertices with no positive out-weight are
    * dangling, their mass redistributing uniformly like [[pageRank]].
    * Output: (gid, rank), unrounded.
    *
    * Scale shape identical to [[pageRank]]: weighted edge list
    * repartitioned by source once + checkpointed, per round one narrow
    * rank-frame shuffle with the dangling scalar fused into the round's
    * single action as a broadcast 1-row frame. */
  def pageRankWeighted(g: GraphFrame, edgeLabel: String, weight: Column,
                       iters: Int = 20, damping: Double = 0.85,
                       undirected: Boolean = false): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0 && damping < 1, s"need 0 < damping < 1, got $damping")
    val verts = g.vertices.select(col("gid")).distinct().localCheckpoint(true)
    val n = verts.count().toDouble
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"), weight.cast("double").as("__w"))
      .filter(col("__w") > 0)
    val e = (if (undirected)
               base.union(base.select(col("v").as("u"), col("u").as("v"), col("__w")))
             else base).repartition(col("u")).localCheckpoint(true)
    val outw = e.groupBy(col("u").as("gid")).agg(sum("__w").as("__ow")).localCheckpoint(true)
    var ranks = verts.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      // same single-action fuse as [[pageRank]]: the dangling scalar is a
      // broadcast 1-row frame over rank⋈outweight, not a driver .first()
      val withW = ranks.join(outw, Seq("gid"), "left")
      val dang = withW.filter(col("__ow").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dang"))
      val contribs = withW.filter(col("__ow").isNotNull)
        .join(e, col("gid") === col("u"))
        .select(col("v"), (col("rank") * col("__w") / col("__ow")).as("__c"))
        .groupBy(col("v").as("gid")).agg(sum("__c").as("__c"))
      ranks = verts.join(contribs, Seq("gid"), "left")
        .crossJoin(broadcast(dang))
        .select(col("gid"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) + col("__dang") / lit(n))).as("rank"))
      // lineage cadence, not per-round eager checkpoints — see [[pageRank]]
      if ((i + 1) % 3 == 0 && i + 1 < iters) ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** HITS hubs-and-authorities (Kleinberg 1999): alternating power
    * iteration a ← Eᵀh, h ← E·a with L2 normalization after each half
    * step — the classic complement to PageRank for directed link
    * analysis (good hubs point at good authorities). Vertices with no
    * qualifying edges score 0 on the corresponding side. Output:
    * (gid, hub, authority), unrounded.
    *
    * Scale shape mirrors [[pageRank]]: edge list repartitioned by source
    * once + checkpointed; each half step is ONE aggregate keyed on the
    * receiving endpoint, with its L2 norm computed from the same
    * aggregate output (vertices absent from it score 0, contributing
    * nothing to the sum of squares) and broadcast back as a 1-row frame
    * off the reused exchange — one checkpointed action per half step,
    * no separate norm scan. */
  def hits(g: GraphFrame, edgeLabel: String, iters: Int = 20): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val verts = g.vertices.select(col("gid")).distinct().localCheckpoint(true)
    val e = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
      .repartition(col("u")).localCheckpoint(true)
    var hub = verts.withColumn("h", lit(1.0)).localCheckpoint(true)
    var auth: DataFrame = null
    var i = 0
    while (i < iters) {
      val aRaw = e.join(hub, col("u") === col("gid"))
        .groupBy(col("v")).agg(sum("h").as("__s"))
      val an = aRaw.agg(sqrt(coalesce(sum(col("__s") * col("__s")), lit(0.0))).as("__n"))
      // auth stays eagerly checkpointed: it is read twice (the next half
      // step AND the norm/final branches), and a fully-lazy alternating
      // chain measured SLOWER — each half step adds a crossJoin+broadcast
      // layer and the composed plan's optimizer time outgrew the saved
      // jobs. hub is read ONCE per subsequent round and its chain depth
      // stays ≤ 1 round with auth materialized, so it skips the per-round
      // checkpoint (cadence-bounded like [[pageRank]]).
      auth = verts.join(aRaw, col("gid") === col("v"), "left")
        .crossJoin(broadcast(an))
        .select(col("gid"),
          when(col("__n") > 0, coalesce(col("__s"), lit(0.0)) / col("__n"))
            .otherwise(lit(0.0)).as("a"))
        .localCheckpoint(true)
      val hRaw = e.join(auth, col("v") === col("gid"))
        .groupBy(col("u")).agg(sum("a").as("__s"))
      val hn = hRaw.agg(sqrt(coalesce(sum(col("__s") * col("__s")), lit(0.0))).as("__n"))
      hub = verts.join(hRaw, col("gid") === col("u"), "left")
        .crossJoin(broadcast(hn))
        .select(col("gid"),
          when(col("__n") > 0, coalesce(col("__s"), lit(0.0)) / col("__n"))
            .otherwise(lit(0.0)).as("h"))
      if ((i + 1) % 3 == 0 && i + 1 < iters) hub = hub.localCheckpoint(true)
      i += 1
    }
    hub.join(auth, "gid").select(col("gid"), col("h").as("hub"), col("a").as("authority"))
  }

  /** Personalized PageRank: the teleport distribution concentrates on a
    * seed set instead of being uniform — ranks measure proximity TO THE
    * SEEDS, the standard "related items" / local-relevance primitive
    * (Page et al. 1999 §6; Jeh & Widom 2003). r ← (1−d)·p + d·(A·r +
    * dangling·p), p = 1/|S| on seeds, 0 elsewhere; dangling mass
    * teleports through p too, so Σr = 1 is preserved.
    *
    * Scale shape identical to [[pageRank]]: edge list repartitioned by
    * source once + checkpointed, one narrow rank frame shuffles per
    * round, dangling scalar fused into the round's single action as a
    * broadcast 1-row frame; the preference vector rides along as a
    * checkpointed (gid, p) frame instead of the uniform constant. */
  def personalizedPageRank(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
                           iters: Int = 20, damping: Double = 0.85,
                           undirected: Boolean = false): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0 && damping < 1, s"need 0 < damping < 1, got $damping")
    val verts = g.vertices.select(col("gid")).distinct().localCheckpoint(true)
    val s = seeds.select(col("gid")).distinct().localCheckpoint(true)
    val ns = s.count().toDouble
    require(ns > 0, "personalizedPageRank needs at least one seed")
    val pref = verts.join(s.withColumn("__p", lit(1.0 / ns)), Seq("gid"), "left")
      .select(col("gid"), coalesce(col("__p"), lit(0.0)).as("__p"))
      .localCheckpoint(true)
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).repartition(col("u")).localCheckpoint(true)
    val outdeg = e.groupBy(col("u").as("gid"))
      .agg(count(lit(1)).cast("double").as("__outdeg")).localCheckpoint(true)
    var ranks = pref.select(col("gid"), col("__p").as("rank")).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      // same single-action fuse as [[pageRank]]
      val withDeg = ranks.join(outdeg, Seq("gid"), "left")
      val dang = withDeg.filter(col("__outdeg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dang"))
      val contribs = withDeg.filter(col("__outdeg").isNotNull)
        .join(e, col("gid") === col("u"))
        .select(col("v"), (col("rank") / col("__outdeg")).as("__c"))
        .groupBy(col("v").as("gid")).agg(sum("__c").as("__c"))
      ranks = pref.join(contribs, Seq("gid"), "left")
        .crossJoin(broadcast(dang))
        .select(col("gid"),
          (lit(1.0 - damping) * col("__p") +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dang") * col("__p"))).as("rank"))
      // lineage cadence, not per-round eager checkpoints — see [[pageRank]]
      if ((i + 1) % 3 == 0 && i + 1 < iters) ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Synchronous label propagation (community detection) over one edge
    * label: every vertex starts as its own community, then for `maxIters`
    * rounds adopts the most frequent community among its neighbors, ties
    * broken toward the MINIMUM community id (string order) so the result
    * is deterministic. Vertices with no neighbors keep their community.
    * Output: (gid, community).
    *
    * Synchronous LPA can oscillate on bipartite structures — `maxIters`
    * bounds the rounds rather than waiting for a fixed point, which is
    * the standard remedy. Scale shape mirrors [[pageRank]]: edge list
    * repartitioned by source once and checkpointed; the per-round
    * (vertex, community) count pre-aggregates before the destination
    * shuffle; argmax resolves inside the same aggregation via a
    * min(struct(-count, community)) — no window, no second shuffle. */
  def labelPropagation(g: GraphFrame, edgeLabel: String, maxIters: Int = 10,
                       undirected: Boolean = true): DataFrame = {
    require(maxIters >= 1, s"need maxIters >= 1, got $maxIters")
    val verts = g.vertices.select(col("gid")).distinct()
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).repartition(col("u")).localCheckpoint(true)
    var labels = verts.withColumn("community", col("gid")).localCheckpoint(true)
    var i = 0
    while (i < maxIters) {
      val best = labels.join(e, labels("gid") === e("u"))
        .groupBy(col("v"), col("community")).agg(count(lit(1)).as("__cnt"))
        .groupBy(col("v").as("gid"))
        .agg(min(struct((-col("__cnt")).as("nc"), col("community").as("c"))).as("__b"))
        .select(col("gid"), col("__b.c").as("__new"))
      labels = labels.join(best, Seq("gid"), "left")
        .select(col("gid"), coalesce(col("__new"), col("community")).as("community"))
      // lineage cadence, not per-round eager checkpoints — see [[pageRank]]
      // (the round's two reads of the previous labels frame hash-exchange
      // on the same gid key, so exchange reuse dedups them in-plan)
      if ((i + 1) % 3 == 0 && i + 1 < maxIters) labels = labels.localCheckpoint(true)
      i += 1
    }
    labels
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

  /** Triangle count (undirected; each triangle counted once). Edges
    * canonicalize to u < v, wedges (a<b<c) form by joining on the middle
    * vertex, and a third canonical edge closes each wedge — the classic
    * two-join distributed triangle enumeration: candidates only ever form
    * through SHARED vertices, never all-triples. At production scale the
    * standard refinement is degree-orientation (point each edge at the
    * higher-degree endpoint) so wedge fan-out is bounded by the smaller
    * degree; canonical-id orientation keeps the same join shape. */
  def triangleCount(g: GraphFrame, edgeLabel: String): DataFrame = {
    val canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val wedges = canon.select(col("u").as("a"), col("v").as("b"))
      .join(canon.select(col("u").as("b"), col("v").as("c")), "b")
    wedges.join(canon.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Global clustering coefficient = 3·triangles / open-or-closed wedges,
    * where the wedge count is Σ d(d−1)/2 over undirected degrees — two
    * scalar aggregates over the canonical edge list plus the triangle
    * join, no new shuffle shapes. Returns one row
    * (n_triangles, n_wedges, coefficient); 0-wedge graphs report 0.0. */
  /** k-core decomposition by iterative peeling: repeatedly delete every
    * vertex whose undirected degree over `edgeLabel` edges is < k, until
    * either no vertex fails (the true k-core, an early exit) or
    * `maxPeels` rounds have run — so with maxPeels = R the result is the
    * R-round truncation, which EQUALS the fixpoint whenever peeling
    * converges within R rounds (it does on bounded-cascade graphs; a
    * fixed R also lets a SQL oracle unroll the rounds as plain CTEs).
    * Output: (gid, deg) — the surviving vertices with their in-core
    * degrees.
    *
    * Scale shape: each round is one degree hash-aggregate over the
    * symmetric edge list plus two anti-joins against the (shrinking)
    * victim set — never a pairwise product; the edge frame is
    * localCheckpoint'ed each round so the loop's lineage stays flat.
    * This is the standard distributed peeling scheme; per-round victim
    * sets are usually a small fraction of vertices, so the anti-join
    * build sides stay broadcast-small. */
  def kCore(g: GraphFrame, edgeLabel: String, k: Int, maxPeels: Int = 10): DataFrame = {
    val canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var sym = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxPeels && !converged) {
      val deg = sym.groupBy("u").agg(count(lit(1)).as("__d"))
      val victims = deg.filter(col("__d") < k).select(col("u").as("__bad"))
        .localCheckpoint()
      if (victims.isEmpty) converged = true
      else {
        val next = sym.join(victims, col("u") === col("__bad"), "left_anti")
          .join(victims, col("v") === col("__bad"), "left_anti")
          .localCheckpoint()
        sym.unpersist(); victims.unpersist()
        sym = next
      }
      round += 1
    }
    sym.groupBy(col("u").as("gid")).agg(count(lit(1)).as("deg"))
  }

  /** Link prediction by neighbor-set Jaccard: for every non-adjacent
    * vertex pair sharing at least one neighbor over `edgeLabel` edges,
    * score = |N(a)∩N(b)| / |N(a)∪N(b)| — the classic common-neighbors
    * similarity (Liben-Nowell & Kleinberg 2003), here the "which
    * documents are ABOUT to be duplicates" signal over a near-dup graph.
    * Output: (gid_a, gid_b, common, score) with gid_a < gid_b, score
    * rounded to 4 decimals.
    *
    * Scale shape: the same middle-vertex wedge join as
    * [[triangleCount]] — candidate pairs only ever form through a SHARED
    * neighbor, never all-pairs; degrees join on the vertex key, and the
    * adjacency exclusion is one anti-join against the canonical edge
    * list. Wedge fan-out is bounded by per-vertex degree (at production
    * scale cap or sample super-node neighbor lists first). */
  def linkPredictJaccard(g: GraphFrame, edgeLabel: String): DataFrame = {
    val canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
    val wedges = sym.select(col("u").as("a"), col("v").as("m"))
      .join(sym.select(col("u").as("m"), col("v").as("b")), "m")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    val deg = sym.groupBy(col("u").as("x")).agg(count(lit(1)).as("d"))
    wedges
      .join(canon, wedges("a") === canon("u") && wedges("b") === canon("v"), "left_anti")
      .join(deg.select(col("x").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("d").as("db")), "b")
      .select(col("a").as("gid_a"), col("b").as("gid_b"), col("common"),
        round(col("common") * lit(1.0) / (col("da") + col("db") - col("common")), 4)
          .as("score"))
  }

  /** Weighted single-source(-set) shortest paths by distributed
    * Bellman-Ford rounds: dist ← min(dist, min_{u→v}(dist(u) + w(u,v))),
    * `maxRounds` times — so the result is exactly the minimum over paths
    * of ≤ `maxRounds` edges (the R-round truncation, which EQUALS the
    * true distance whenever relaxation converges within R rounds; a
    * fixed R also lets a SQL oracle walk the graph with a plain
    * hop-bounded recursive CTE). Early exit when a round changes
    * nothing — monotonicity makes that identical to running all R
    * rounds. Unreached vertices are absent; seeds are distance 0.
    * `weight` is evaluated against the edge row (e.g. a column of the
    * edge frame or an expression over its `data` JSON) and must be
    * non-negative for the truncation to be meaningful. Output:
    * (gid, dist) with dist long.
    *
    * Scale shape mirrors [[pageRank]]: the weighted edge list is
    * repartitioned by source once and checkpointed; each round shuffles
    * only the narrow (gid, dist) frame — candidate relaxations
    * pre-aggregate map-side on the destination key before the min — and
    * each round's frame is checkpointed so lineage stays flat. The
    * change test is one scalar count per round (same legitimate
    * driver-scalar class as the PageRank dangling mass). */
  def shortestPaths(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
                    weight: Column, maxRounds: Int = 10,
                    undirected: Boolean = true): DataFrame = {
    require(maxRounds >= 0, s"need maxRounds >= 0, got $maxRounds")
    require(seeds.columns.length == 1,
      s"seeds must be a single gid column, got (${seeds.columns.mkString(", ")})")
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"), weight.cast("long").as("w"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v"), col("w")))
             else base).repartition(col("u")).localCheckpoint(true)
    var dist = seeds.select(col(seeds.columns.head).as("gid"), lit(0L).as("dist"))
      .distinct().localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val relaxed = dist.join(e, dist("gid") === e("u"))
        .select(col("v").as("gid"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy("gid").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      // a relaxation round can only add vertices or lower distances, so
      // "nothing improved" == "no row differs" == fixpoint reached
      val improved = next.join(dist.withColumnRenamed("dist", "__old"), Seq("gid"), "left")
        .filter(col("__old").isNull || col("dist") < col("__old")).limit(1).count()
      if (improved == 0) converged = true
      dist = next
      round += 1
    }
    dist
  }

  /** Deterministic DeepWalk-style random walks (Perozzi et al. 2014):
    * one walk per seed vertex, `steps` hops, where the "random" neighbor
    * choice at step t is the neighbor minimizing
    * md5(walk_id || '|' || t || '|' || neighbor) — a hash-seeded uniform
    * choice that is reproducible across engines (the property a training
    * pipeline needs for resumable walk-corpus generation, and what lets
    * a SQL oracle replay the walks exactly). A vertex with no qualifying
    * neighbors ends its walk early. Output: (walk_id, step, gid) with
    * step 0 = the seed itself.
    *
    * Scale shape: the symmetric edge list is repartitioned by source
    * once and checkpointed; each step is one join of the narrow
    * (walk_id, gid) frontier against it plus an argmin aggregation on
    * walk_id (min(struct(hash, neighbor)) — no window, no second
    * shuffle), with the frontier checkpointed per step. Walk count
    * scales with seeds, never with edges². */
  def randomWalks(g: GraphFrame, edgeLabel: String, seeds: DataFrame,
                  steps: Int = 3, undirected: Boolean = true): DataFrame = {
    require(steps >= 0, s"need steps >= 0, got $steps")
    require(seeds.columns.length == 1,
      s"seeds must be a single gid column, got (${seeds.columns.mkString(", ")})")
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val e = (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
             else base).distinct().repartition(col("u")).localCheckpoint(true)
    var cur = seeds.select(col(seeds.columns.head).as("walk_id"))
      .distinct().withColumn("gid", col("walk_id")).localCheckpoint(true)
    var out = cur.select(col("walk_id"), lit(0L).as("step"), col("gid"))
    var t = 1
    while (t <= steps && !cur.isEmpty) {
      val next = cur.join(e, cur("gid") === e("u"))
        .groupBy("walk_id")
        .agg(min(struct(
          md5(concat_ws("|", col("walk_id"), lit(t), col("v"))).as("h"),
          col("v").as("v"))).as("__pick"))
        .select(col("walk_id"), col("__pick.v").as("gid"))
        .localCheckpoint(true)
      out = out.unionByName(next.select(col("walk_id"), lit(t.toLong).as("step"), col("gid")))
      cur = next
      t += 1
    }
    // materialize the per-step union once when the walk advanced: its
    // arity is data-dependent (walks can end early on empty frontiers),
    // so a lazy return's plan shape differs between scale factors — same
    // SF-invariant-consumer-plan rationale as [[labeledBfs]]
    if (t > 1) out.localCheckpoint(true) else out
  }

  def clusteringCoefficient(g: GraphFrame, edgeLabel: String): DataFrame = {
    val canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("x")).union(canon.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val wedges = deg.agg(sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
    val tris = triangleCount(g, edgeLabel)
    tris.crossJoin(wedges).select(
      col("n_triangles"), col("n_wedges"),
      when(col("n_wedges") > 0,
        round(col("n_triangles") * 3.0 / col("n_wedges"), 6)).otherwise(0.0)
        .as("coefficient"))
  }

  /** Per-vertex LOCAL clustering coefficient: triangles through each
    * vertex over its wedge count d(d−1)/2 — the per-node counterpart of
    * [[clusteringCoefficient]]'s global ratio, and the classic
    * ego-network-density signal (spam/bot detection: organic neighbors
    * know each other, farmed ones don't). Output: (gid, deg, n_tri,
    * coefficient rounded to 6) for every vertex with at least one
    * qualifying edge; degree-1 vertices score 0.
    *
    * Scale shape: the same two-join wedge closure as [[triangleCount]]
    * (candidates only through shared vertices); each closed triangle
    * credits its three corners via one explode, then a per-vertex
    * aggregate joins the degree frame. */
  def localClustering(g: GraphFrame, edgeLabel: String): DataFrame = {
    val canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("gid")).union(canon.select(col("v").as("gid")))
      .groupBy("gid").agg(count(lit(1)).as("deg"))
    // wedges a<b<c closed by the third canonical edge; credit all corners
    val tri = canon.alias("e1")
      .join(canon.alias("e2"), col("e2.u") === col("e1.v"))
      .join(canon.alias("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("gid"))
      .groupBy("gid").agg(count(lit(1)).as("n_tri"))
    deg.join(tri, Seq("gid"), "left")
      .select(col("gid"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") > 1,
          round(coalesce(col("n_tri"), lit(0L)) * 2.0 / (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("coefficient"))
  }

  /** Newman modularity of a community assignment, per community:
    * q_c = L_c/m − (D_c/2m)², where m = |edges of `edgeLabel` whose BOTH
    * endpoints appear in `communities`| treated as undirected, L_c =
    * intra-community edge count and D_c = the sum of member degrees —
    * total modularity is Σ q_c. `communities` must therefore cover every
    * edge endpoint for textbook m; with a partial assignment the metric
    * is modularity of the INDUCED subgraph (edges touching unassigned
    * vertices drop from m, L_c and D_c alike — consistent, but not
    * comparable across assignments with different coverage). The quality metric
    * every community-detection pass ([[labelPropagation]], the clusters
    * family) should be scored by before its output drives curation
    * decisions. Output: (community, n_intra, deg_sum, q) with q rounded
    * to 6; communities with no incident edges contribute 0 and are
    * omitted.
    *
    * Scale shape: the edge list joins the (vertex-sized) assignment
    * frame once per endpoint on the gid key, then everything aggregates
    * to community-sized frames; the edge-count scalar broadcasts back.
    * Nothing is ever pairwise. */
  def modularity(g: GraphFrame, edgeLabel: String, communities: DataFrame): DataFrame = {
    val e = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    val cm = communities.select(col("gid"), col("community"))
    val ce = e.join(cm.select(col("gid").as("u"), col("community").as("cu")), "u")
      .join(cm.select(col("gid").as("v"), col("community").as("cv")), "v")
    val tot = ce.agg(count(lit(1)).cast("double").as("__m"))
    val intra = ce.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("n_intra"))
    val inc = ce.select(col("cu").as("community"))
      .unionAll(ce.select(col("cv").as("community")))
      .groupBy("community").agg(count(lit(1)).as("deg_sum"))
    inc.join(intra, Seq("community"), "left").crossJoin(broadcast(tot))
      .select(col("community"),
        coalesce(col("n_intra"), lit(0L)).as("n_intra"),
        col("deg_sum"),
        round(coalesce(col("n_intra"), lit(0L)) / col("__m") -
          pow(col("deg_sum") / (lit(2.0) * col("__m")), 2), 6).as("q"))
  }

  /** Per-edge triangle support — |N(u) ∩ N(v)| for every undirected edge
    * {u, v} — the k-truss building block (an edge is in the k-truss iff
    * support ≥ k−2) and the "is this link corroborated by a shared
    * neighborhood?" signal link-cleaning passes cut on. Output:
    * (u, v, support) for every canonical edge, support 0 included.
    *
    * Scale shape: common neighbors arrive through two joins pivoting on
    * the shared endpoint (the same wedge family as [[triangleCount]] /
    * [[linkPredictJaccard]]) — candidates only ever form through
    * adjacent vertices, never all-pairs; the zero-support edges return
    * via one left join of the edge list against the aggregated counts. */
  def trussSupport(g: GraphFrame, edgeLabel: String): DataFrame = {
    val canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val bi = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
    val sup = canon.alias("e")
      .join(bi.alias("n1"), col("n1.u") === col("e.u"))
      .join(bi.alias("n2"), col("n2.u") === col("e.v") && col("n2.v") === col("n1.v"))
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("__s"))
    canon.join(sup, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("__s"), lit(0L)).as("support"))
  }

  /** Per-edge triangle support of one canonical (u < v, deduped) edge
    * frame — the wedge join of [[trussSupport]] factored out so the
    * k-truss peel can re-score the shrinking edge set each round. */
  private def supportOf(canon: DataFrame): DataFrame = {
    val bi = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
    val sup = canon.alias("e")
      .join(bi.alias("n1"), col("n1.u") === col("e.u"))
      .join(bi.alias("n2"), col("n2.u") === col("e.v") && col("n2.v") === col("n1.v"))
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("__s"))
    canon.join(sup, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("__s"), lit(0L)).as("__s"))
  }

  /** k-truss by iterative edge peeling: repeatedly delete every edge in
    * fewer than k−2 triangles of the CURRENT subgraph, up to `maxPeels`
    * rounds (the R-round truncation — identical to the true k-truss
    * whenever peeling converges within R rounds, and a fixed R lets a
    * SQL oracle unroll the rounds as plain CTEs, exactly the [[kCore]]
    * contract). The k-truss is the maximal subgraph where every edge has
    * that many corroborating triangles — the standard dense-cohesion cut
    * above [[trussSupport]]'s raw scores (Cohen 2008). Early exit when a
    * round deletes nothing — monotonicity makes that identical to
    * running all R rounds. Output: (u, v, support) for each surviving
    * canonical edge with its support IN THE SURVIVING SUBGRAPH.
    *
    * Scale shape: each round is one wedge join pivoting on shared
    * endpoints (candidates only form through adjacency, never
    * all-pairs — the [[trussSupport]] shape) plus one filter; the edge
    * frame is localCheckpoint'ed per round so lineage stays flat while
    * the set only shrinks. Per-round cost is bounded by wedge fan-out,
    * i.e. sum of degree², same as a single support pass. */
  def kTruss(g: GraphFrame, edgeLabel: String, k: Int, maxPeels: Int = 3): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    var canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var round = 0
    var lastScored: Option[DataFrame] = None // valid scores of the CURRENT canon
    while (round < maxPeels && lastScored.isEmpty) {
      val scored = supportOf(canon).localCheckpoint()
      if (scored.filter(col("__s") < k - 2).isEmpty) lastScored = Some(scored)
      else {
        val next = scored.filter(col("__s") >= k - 2)
          .select(col("u"), col("v")).localCheckpoint()
        canon.unpersist()
        canon = next
        scored.unpersist()
      }
      round += 1
    }
    // converged rounds already scored the surviving subgraph — reuse it;
    // only the maxPeels-truncation exit (canon changed after its last
    // scoring) pays one more wedge join
    lastScored.getOrElse(supportOf(canon))
      .select(col("u"), col("v"), col("__s").as("support"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of the
    * degrees at the two ends of every undirected edge — positive when
    * hubs link to hubs (social graphs), negative when hubs link to
    * leaves (web/biology); on a near-dup graph it distinguishes "a few
    * giant template families" (negative) from "chains of small
    * clusters". Both orientations of each canonical edge enter the sums
    * (the standard undirected convention), so all six moments are exact
    * integers and the single division happens once, rounded to 6.
    * Output: one row (n_edges, r); r is null for degree-regular graphs
    * (zero variance).
    *
    * Scale shape: canonical edges → one degree aggregate → two
    * vertex-keyed joins to attach endpoint degrees → one scalar
    * aggregate. Nothing pairwise beyond the edge list itself. */
  def assortativity(g: GraphFrame, edgeLabel: String): DataFrame = {
    val canon = g.edges.filter(col("label") === edgeLabel)
      .select(least(col("from"), col("to")).as("u"),
        greatest(col("from"), col("to")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val bi = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
    val deg = bi.groupBy(col("u").as("x")).agg(count(lit(1)).as("d"))
    val ed = bi
      .join(deg.select(col("x").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("__dv")), "v")
    ed.agg(
        count(lit(1)).as("__m"),
        sum(col("__du") * col("__dv")).as("__sxy"),
        sum(col("__du")).as("__sx"), sum(col("__dv")).as("__sy"),
        sum(col("__du") * col("__du")).as("__sxx"),
        sum(col("__dv") * col("__dv")).as("__syy"))
      .select((col("__m") / 2).cast("long").as("n_edges"), {
        val varx = (col("__m") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
        val vary = (col("__m") * col("__syy") - col("__sy") * col("__sy")).cast("double")
        // degree-regular graphs have zero variance: r undefined -> null
        // (explicit guard — ANSI mode makes the bare division an error)
        round(when(varx > 0 && vary > 0,
          (col("__m") * col("__sxy") - col("__sx") * col("__sy")) / sqrt(varx * vary)), 6)
          .as("r")
      })
  }

  /** Iterated mean neighbor aggregation — GNN-style message passing
    * without the learned weights (the GraphSAGE mean aggregator, Hamilton
    * et al. 2017): h₀ = the given per-vertex feature,
    * h_{r+1}(v) = mean of h_r over v's neighbors (vertices with no
    * neighbor keep h_r). `features` is (gid, f); rounds ≥ 1. The
    * smoothed features feed embedding/label propagation pipelines where
    * a vertex's context matters more than its own value. Output:
    * (gid, h) rounded to 4 after the LAST round only.
    *
    * Scale shape: same loop discipline as [[labelPropagation]] — the
    * (doubled, if undirected) edge list is repartitioned on the join key
    * once and checkpointed; each round shuffles only the narrow (gid, h)
    * frame through one join + one pre-aggregated mean. */
  def aggregateNeighborhood(g: GraphFrame, edgeLabel: String, features: DataFrame,
                            rounds: Int = 2, undirected: Boolean = true): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val base = g.edges.filter(col("label") === edgeLabel)
      .select(col("from").as("u"), col("to").as("v"))
    // The feature frame and the edge frame materialize ONCE each (each
    // round reads h TWICE — the neighbor aggregation and the coalesce
    // join — on DIFFERENT keys, so exchange reuse cannot dedup the reads
    // and an expensive features subtree, e.g. a corpus scan + tokenize,
    // would be re-evaluated up to 2×rounds times inside the composed
    // plan; both frames are tiny and these are within-query
    // materializations, not caches). The two are INDEPENDENT blocking
    // jobs — an edge scan+repartition vs a feature scan — so the feature
    // side runs on the overlap thread while the edge checkpoint runs
    // here (guide §2.6, the Dedup.verifyOverlapped bracket).
    val sideH = graft.pipeline.Dedup.sideJob(g.edges.sparkSession.sparkContext)(
      features.select(col("gid"), col("f").cast("double").as("h"))
        .localCheckpoint(true))
    val e =
      try (if (undirected) base.union(base.select(col("v").as("u"), col("u").as("v")))
           else base).repartition(col("v")).localCheckpoint(true)
      catch { case t: Throwable => graft.pipeline.Dedup.drainSide(sideH); throw t }
    var h = scala.concurrent.Await.result(
      sideH, scala.concurrent.duration.Duration.Inf)
    var r = 0
    while (r < rounds) {
      val nb = e.join(h.withColumnRenamed("gid", "v"), "v")
        .groupBy(col("u").as("gid")).agg(avg(col("h")).as("__nh"))
      h = h.join(nb, Seq("gid"), "left")
        .select(col("gid"), coalesce(col("__nh"), col("h")).as("h"))
      // checkpoint to bound lineage only every third round — an eager
      // materialization per round is pure scheduler overhead on the
      // short horizons smoothing actually uses (2-3 rounds)
      if ((r + 1) % 3 == 0 && r + 1 < rounds) h = h.localCheckpoint(true)
      r += 1
    }
    h.select(col("gid"), round(col("h"), 4).as("h"))
  }
}
