package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r14 optimization round): focused A/B timing for the
  * labeledBfs exit-materialization policy (q81/q82 — the one real r13
  * regression), the betweenness per-round job count (q84/q85), and the
  * dedup-graph memo build's driver-blocking job chain (first-consumer
  * cost of q62..q87). Variants are REPLICATED inline so the shipped code
  * stays clean while both shapes are measured on the same session.
  * Usage: tools/runmain.sh graft.ProbeR14 [q82ab|q85ab|memo] [sfDir] [reps]
  */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q82ab")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    var last = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"[probe] $tag%-34s ${(now - last) / 1e9}%6.2f s")
      last = now
    }
    def docs: DataFrame = spark.read.parquet(s"$d/documents.parquet")

    // near-dup graph shared by the graph-analytics entries (replicates
    // SparkEntry.buildDedupGraph without the memo)
    def freshGraph(): graft.model.GraphFrame = {
      val pairs = graft.pipeline.Dedup.nearDupMinhashScored(docs, "doc_id", "text")
      val v = docs.select(concat(lit("d:"), col("doc_id")).as("gid"),
        lit("document").as("label"), lit("{}").as("data"))
      val e = pairs.select(
        concat(lit("e:"), col("a_id"), lit(":"), col("b_id")).as("gid"),
        lit("near_dup").as("label"),
        concat(lit("d:"), col("a_id")).as("from"),
        concat(lit("d:"), col("b_id")).as("to"),
        to_json(struct((col("n_a") + col("n_b") - lit(2L) * col("n_common")).as("w"))).as("data"))
        .localCheckpoint()
      graft.model.GraphFrame(v, e)
    }

    /** labeledBfs replicated with a selectable exit policy:
      * 0 = lazy union at exit (shipped r13 shape)
      * 1 = checkpoint the final union once at exit
      * 2 = re-checkpoint the running union every round (r12 shape) */
    def labeledBfsVariant(g: graft.model.GraphFrame, seeds: DataFrame,
                          maxHops: Int, policy: Int): (DataFrame, DataFrame) = {
      val base = g.edges.filter(col("label") === "near_dup")
        .select(col("from").as("u"), col("to").as("v"))
      val e = base.union(base.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint(true)
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
        dist = if (policy == 2) dist.unionByName(next).localCheckpoint(true)
               else dist.unionByName(next)
        frontier = next
        hop += 1
      }
      if (policy == 1) dist = dist.localCheckpoint(true)
      (dist, seedCol)
    }

    def eccOver(dist: DataFrame, seedCol: DataFrame): Long = {
      val agg = dist.filter(col("dist") > 0).groupBy("seed").agg(
        count(lit(1)).as("__n"), max("dist").as("__e"))
      seedCol.join(agg, Seq("seed"), "left").select(
        col("seed").as("gid"),
        coalesce(col("__n"), lit(0L)).as("n_reached"),
        coalesce(col("__e").cast("long"), lit(0L)).as("eccentricity")).count()
    }

    /** betweennessSampled replicated with a selectable loop policy:
      * 0 = shipped shape (per-round visited re-checkpoint + isEmpty)
      * 1 = visited as a lazy union of checkpointed layers (no per-round
      *     copy; exhaustion still read from the materialized layer) */
    def betweennessVariant(g: graft.model.GraphFrame, seeds: DataFrame,
                           maxHops: Int, policy: Int): Long = {
      val base = g.edges.filter(col("label") === "near_dup")
        .select(col("from").as("u"), col("to").as("v"))
      val e = base.union(base.select(col("v").as("u"), col("u").as("v")))
        .distinct().localCheckpoint(true)
      val seedCol = seeds.select(col(seeds.columns.head).as("seed")).distinct()
        .localCheckpoint(true)
      val layers = scala.collection.mutable.ArrayBuffer[DataFrame](
        seedCol.select(col("seed"), col("seed").as("gid"), lit(1L).as("sigma"))
          .localCheckpoint(true))
      var visited = layers.head.select("seed", "gid")
      if (policy == 0) visited = visited.localCheckpoint(true)
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
          visited =
            if (policy == 0) visited.union(next.select("seed", "gid")).localCheckpoint(true)
            else visited.union(next.select("seed", "gid"))
          hop += 1
        }
      }
      val maxL = layers.length - 1
      if (maxL == 0) return 0L
      val deltas = new Array[DataFrame](maxL + 1)
      deltas(maxL) = layers(maxL).withColumn("delta", lit(0.0)).localCheckpoint(true)
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
      (1 to maxL).map(deltas(_)).reduce(_ unionByName _)
        .groupBy("gid").agg(round(sum("delta"), 6).as("betweenness")).count()
    }

    which match {
      case "q82ab" =>
        val g = freshGraph()
        val e = g.edges.filter(col("label") === "near_dup")
        val seeds = e.select(col("from").as("gid"))
          .union(e.select(col("to").as("gid"))).distinct().orderBy("gid").limit(3)
          .localCheckpoint(true)
        lap("graph+seeds")
        for (rep <- 1 to reps; policy <- Seq(0, 1, 2)) {
          last = System.nanoTime()
          val (dist, sc) = labeledBfsVariant(g, seeds, 4, policy)
          val n = eccOver(dist, sc)
          lap(s"rep$rep ecc policy$policy n=$n")
        }
      case "q85ab" =>
        val g = freshGraph()
        val e = g.edges.filter(col("label") === "near_dup")
        val seeds3 = e.select(col("from").as("gid"))
          .union(e.select(col("to").as("gid"))).distinct().orderBy("gid").limit(3)
          .localCheckpoint(true)
        val seedsAll = e.select(col("from").as("gid"))
          .union(e.select(col("to").as("gid"))).distinct().localCheckpoint(true)
        lap("graph+seeds")
        for (rep <- 1 to reps; policy <- Seq(0, 1)) {
          last = System.nanoTime()
          val n84 = betweennessVariant(g, seeds3, 4, policy)
          lap(s"rep$rep q84-shape policy$policy n=$n84")
          val n85 = betweennessVariant(g, seedsAll, 8, policy)
          lap(s"rep$rep q85-shape policy$policy n=$n85")
        }
      case "memo" =>
        // phase split of the dedup-graph memo build (first-consumer cost):
        // shingle/sig/banded histogram, candidate self-join checkpoint,
        // verify join, edge-frame checkpoint
        for (rep <- 1 to reps) {
          println(s"== memo rep $rep ==")
          last = System.nanoTime()
          val sh = docs.select(col("doc_id").as("__id"),
              graft.pipeline.Dedup.shingles(col("text"), 3).as("__sh"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val sig = graft.pipeline.Dedup.minhashSignatures(sh, "__id", "__sh", 64)
          val cands = graft.pipeline.Dedup.lshCandidates(sig, "__id", "__sig", 32, 2)
          lap("lshCandidates (eager)")
          val pairs = graft.pipeline.Dedup.nearDupMinhashScored(docs, "doc_id", "text")
          lap("nearDupMinhashScored (full)")
          val e = pairs.select(
            concat(lit("e:"), col("a_id"), lit(":"), col("b_id")).as("gid"),
            lit("near_dup").as("label"),
            concat(lit("d:"), col("a_id")).as("from"),
            concat(lit("d:"), col("b_id")).as("to"),
            to_json(struct((col("n_a") + col("n_b") - lit(2L) * col("n_common")).as("w"))).as("data"))
            .localCheckpoint()
          lap(s"edge checkpoint rows=${e.count()}")
          sh.unpersist(false)
          for ((id, rdd) <- spark.sparkContext.getPersistentRDDs) rdd.unpersist(false)
          System.gc()
        }
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
