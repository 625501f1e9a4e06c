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
  * Single-element calls buffer locally; bulk ingest consumes an iterator
  * in bounded chunks or takes a DataFrame outright ([[bulkAddFrames]]),
  * so driver memory never scales with ingest size; everything pending
  * flushes as ONE merge before any read. At scale the write-back is a
  * partition-overwrite of label-partitioned parquet: [[saveIncremental]]
  * rewrites ONLY the label partitions the edits touched (the MERGE INTO
  * shape on plain parquet — on a lakehouse table format it becomes the
  * literal statement), while [[save]] is the full replace.
  */
/** Thread-safety: every public method synchronizes on the instance —
  * the REST facade serializes requests but the gRPC dispatch pool (and a
  * shared REST+gRPC registry) calls in concurrently, and the pending
  * ArrayBuffer/frame state must see one writer at a time. Mutations are
  * driver-side buffer work, so the critical sections are short. */
class MutableGraph(spark: SparkSession, v0: DataFrame, e0: DataFrame,
                   wrapped: Option[GraphFrame] = None) {
  import MutableGraph._

  private var v: DataFrame = v0
  private var e: DataFrame = e0
  // ---- delta tracking for [[saveIncremental]]: which label partitions of
  // the last-persisted state have pending changes. Upserts record a LAZY
  // (gid, label) projection per merged batch (no extra job on the edit
  // path); deletes record labels eagerly (they already run lookups).
  // vBase/eBase snapshot the frames as of the last load/save — the disk
  // state whose partitions the gid probe must be evaluated against.
  private var vBase: DataFrame = v0
  private var eBase: DataFrame = e0
  private val deltaV = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val deltaE = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val delTouchV = scala.collection.mutable.Set.empty[String]
  private val delTouchE = scala.collection.mutable.Set.empty[String]
  private val vBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
  private val eBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, String)]
  // sealed pending batches (columns + "__seq"): driver memory stays bounded
  // by ONE open chunk regardless of ingest size; __seq preserves the
  // add-order across chunks so flush-time last-wins is global
  private val vFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val eFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private var seqNo = 0L
  private def nextSeq(): Long = { seqNo += 1; seqNo }

  private def sealBuffers(): Unit = {
    import spark.implicits._
    if (vBuf.nonEmpty) {
      vFrames += vBuf.toSeq.toDF("gid", "label", "data").withColumn("__seq", lit(nextSeq()))
      vBuf.clear()
    }
    if (eBuf.nonEmpty) {
      eFrames += eBuf.toSeq.toDF("gid", "label", "from", "to", "data").withColumn("__seq", lit(nextSeq()))
      eBuf.clear()
    }
  }

  def addVertex(gid: String, label: String, dataJson: String = "{}"): Unit =
    synchronized { vBuf += ((gid, label, dataJson)) }

  /** gid defaults to a generated unique id (reference generates a UUID,
    * kvgraph/graph.go AddEdge). */
  def addEdge(from: String, to: String, label: String, dataJson: String = "{}",
              gid: String = null): Unit = synchronized {
    val g = if (gid == null) java.util.UUID.randomUUID().toString else gid
    eBuf += ((g, label, from, to, dataJson))
  }

  /** Validated bulk stream (reference: gripql.proto:440-444 streaming
    * BulkAdd, ot_bulk.py test_bulkload_validate): elements with missing
    * gid/label/from/to are counted as errors and skipped; valid elements
    * are inserted. Consumes the iterators in `batchSize` chunks, sealing
    * each chunk into a pending DataFrame — the driver never holds more
    * than one chunk of elements, so ingest size is bounded by the cluster,
    * not driver memory. Returns the error count. */
  def bulkAdd(vertices: Iterator[(String, String, String)],
              edges: Iterator[(String, String, String, String, String)],
              batchSize: Int): Long = synchronized {
    var errors = 0L
    vertices.grouped(batchSize).foreach { chunk =>
      chunk.foreach { case t @ (gid, label, _) =>
        if (gid == null || gid.isEmpty || label == null || label.isEmpty) errors += 1
        else vBuf += t
      }
      sealBuffers()
    }
    edges.grouped(batchSize).foreach { chunk =>
      chunk.foreach { case t @ (_, label, from, to, _) =>
        if (label == null || label.isEmpty || from == null || from.isEmpty ||
            to == null || to.isEmpty) errors += 1
        else eBuf += ((if (t._1 == null || t._1.isEmpty) java.util.UUID.randomUUID().toString else t._1,
          label, from, to, t._5))
      }
      sealBuffers()
    }
    errors
  }

  /** Seq convenience form of the streaming [[bulkAdd]]. */
  def bulkAdd(vertices: Seq[(String, String, String)],
              edges: Seq[(String, String, String, String, String)]): Long =
    bulkAdd(vertices.iterator, edges.iterator, batchSize = 100000)

  /** Distributed bulk ingest — the 100 TB shape: the data is already a
    * DataFrame (files, a stream batch, another table), so it never
    * round-trips through the driver at all. Validation is a distributed
    * filter; the returned error count is ONE aggregate per side. Missing
    * edge gids are filled with uuid() and pinned by an eager checkpoint
    * (uuid() is nondeterministic per execution — without the pin a retry
    * could mint different ids). Either side may be null. */
  def bulkAddFrames(vertices: DataFrame = null, edges: DataFrame = null): Long = synchronized {
    var errors = 0L
    if (vertices != null) {
      val vv = vertices.select(col("gid").cast("string").as("gid"),
        col("label").cast("string").as("label"),
        coalesce(col("data").cast("string"), lit("{}")).as("data"))
      val ok = col("gid").isNotNull && length(col("gid")) > 0 &&
        col("label").isNotNull && length(col("label")) > 0
      // pin BEFORE counting: the error count and the rows that flush must
      // come from the same evaluation of a possibly-nondeterministic
      // source (and the source shouldn't be scanned twice regardless)
      val pinned = vv.localCheckpoint(true)
      val r = pinned.agg(count(lit(1)), count(when(ok, 1))).head()
      errors += r.getLong(0) - r.getLong(1)
      vFrames += pinned.filter(ok).withColumn("__seq", lit(nextSeq()))
    }
    if (edges != null) {
      val ee = edges.select(col("gid").cast("string").as("gid"),
        col("label").cast("string").as("label"),
        col("from").cast("string").as("from"), col("to").cast("string").as("to"),
        coalesce(col("data").cast("string"), lit("{}")).as("data"))
      val ok = col("label").isNotNull && length(col("label")) > 0 &&
        col("from").isNotNull && length(col("from")) > 0 &&
        col("to").isNotNull && length(col("to")) > 0
      // same single-evaluation contract as the vertex side; the second
      // checkpoint additionally pins the minted uuids (nondeterministic
      // per execution — a retry must not re-mint ids)
      val pinned = ee.localCheckpoint(true)
      val r = pinned.agg(count(lit(1)), count(when(ok, 1))).head()
      errors += r.getLong(0) - r.getLong(1)
      eFrames += pinned.filter(ok)
        .withColumn("gid", coalesce(when(length(col("gid")) > 0, col("gid")), expr("uuid()")))
        .withColumn("__seq", lit(nextSeq()))
        .localCheckpoint(true)
    }
    errors
  }

  def deleteVertex(gid: String): Unit = synchronized {
    flush()
    // record the victim's label and its incident edges' labels — those
    // disk partitions must rewrite on the next incremental save (two
    // bounded lookups; deletes are single-element DML, not bulk ingest)
    delTouchV ++= v.filter(col("gid") === gid)
      .select("label").collect().map(_.getString(0))
    delTouchE ++= e.filter(col("from") === gid || col("to") === gid)
      .select("label").distinct().collect().map(_.getString(0))
    v = v.filter(col("gid") =!= gid)
    // incident edges go with the vertex (reference: ot_update.py test_delete_edge)
    e = e.filter(col("from") =!= gid && col("to") =!= gid)
  }

  def deleteEdge(gid: String): Unit = synchronized {
    flush()
    delTouchE ++= e.filter(col("gid") === gid)
      .select("label").collect().map(_.getString(0))
    e = e.filter(col("gid") =!= gid)
  }

  /** Merge pending batches: last add wins per gid (global order = seal
    * order via __seq, add order within a driver-sealed chunk; duplicate
    * gids INSIDE one distributed bulk frame resolve by partition order,
    * which is the only order such a frame has), then ONE MERGE over the
    * stored rows (anti-join + union) however many batches are pending. */
  def flush(): Unit = synchronized {
    sealBuffers()
    if (vFrames.nonEmpty) {
      val newV = lastWins(vFrames.reduce(_ unionByName _)).drop("__seq")
      deltaV += newV.select("gid", "label") // lazy — captured frames are immutable
      v = v.join(broadcast(newV.select("gid")), Seq("gid"), "left_anti")
        .unionByName(newV)
      vFrames.clear()
    }
    if (eFrames.nonEmpty) {
      val newE = lastWins(eFrames.reduce(_ unionByName _)).drop("__seq")
      deltaE += newE.select("gid", "label")
      e = e.join(broadcast(newE.select("gid")), Seq("gid"), "left_anti")
        .unionByName(newE)
      eFrames.clear()
    }
  }

  /** The readable graph. While no mutation has touched the frames, the
    * wrapped graph passes through INTACT — topology-based hop pruning and
    * the to-keyed edge copy of a bucketed graph survive server
    * registration. Any mutation reassigns `v`/`e` (same identity dirty
    * bit as [[derivedTopology]]), after which the extras are dropped:
    * edits may have invalidated the declared topology, and a merged edge
    * frame no longer matches the bucketed to-copy. */
  def graph: GraphFrame = synchronized {
    flush()
    wrapped match {
      case Some(g) if (v eq v0) && (e eq e0) => g
      case _ => GraphFrame(v, e)
    }
  }

  private var topoCache: (DataFrame, DataFrame, Seq[EdgeType]) = null

  /** Observed (from-label, edge-label, to-label) triples, cached across
    * calls until the next mutation. Every mutation reassigns `v`/`e`
    * (flush merges frames, deletes filter in place), so reference
    * identity of the pair is an airtight dirty bit — no invalidation
    * hooks to forget. */
  def derivedTopology: Seq[EdgeType] = synchronized {
    flush()
    if (topoCache == null || !(topoCache._1 eq v) || !(topoCache._2 eq e))
      topoCache = (v, e, GraphFrame.deriveTriples(GraphFrame(v, e)))
    topoCache._3
  }

  def getVertex(gid: String): Option[Row] = synchronized {
    flush(); v.filter(col("gid") === gid).collect().headOption
  }

  def getEdge(gid: String): Option[Row] = synchronized {
    flush(); e.filter(col("gid") === gid).collect().headOption
  }

  def save(dir: String): Unit = graph.save(dir)

  /** Persist the merged state IN PLACE over a previous [[GraphFrame.save]]
    * layout, rewriting only the label partitions the edits touched — the
    * delta-aware collapse of "MERGE INTO" onto plain label-partitioned
    * parquet (the class doc's lakehouse note made real). A plain
    * `save(dir)` back into the directory the graph was loaded from is
    * impossible anyway (Spark refuses to overwrite an input path); this
    * method stages each touched partition from the still-live old files,
    * then swaps staged→live per label with a backup (the same hardened
    * rename dance as Catalog's index relayout — no crash window loses a
    * partition without a recoverable copy).
    *
    * Touched labels = labels of upserted rows ∪ labels the upserted gids
    * HAD on disk (a gid moving labels rewrites both partitions) ∪ labels
    * recorded by deletes. The gid probe is one semi-join against the
    * last-persisted frames; at 100 TB the cost scales with the delta and
    * the touched partitions, never the whole graph.
    *
    * `dir` must be the directory this graph's base frames were loaded
    * from (the probe discovers old partitions by joining against THOSE
    * frames) — merging into some other store needs a load-edit-save
    * cycle against that store.
    *
    * Returns the touched (vertexLabels, edgeLabels), or None when the
    * target had no prior save and a full [[save]] ran instead. Mutations
    * invalidate a declared topology, so like a mutated full save the
    * sidecar is dropped. After the call the instance reads from the
    * freshly persisted files (the in-place analogue of the re-load the
    * DDL-vs-open-reader contract would otherwise demand). */
  def saveIncremental(dir: String): Option[(Set[String], Set[String])] =
    saveIncremental(dir, Map.empty, Map.empty)

  /** As [[saveIncremental]], but labels present in `vIdxFields` /
    * `eIdxFields` (label → indexed fields, sorted) are written in the
    * INDEX layout directly — materialized `__idx_*`/`__idxn_*` columns,
    * rows range-sorted by them — fusing the index rebuild into the one
    * label rewrite the incremental save already pays. Without the fusion
    * a 1k-row micro-batch into a 2M-row indexed label pays the full
    * rewrite TWICE (plain write, then Catalog.relayout's read+sort+write
    * — measured 14.9 s vs 3.5 s unindexed); fused it pays once
    * (Catalog.upsertGraph passes the registered fields). */
  def saveIncremental(dir: String,
                      vIdxFields: Map[String, Seq[String]],
                      eIdxFields: Map[String, Seq[String]]): Option[(Set[String], Set[String])] = synchronized {
    flush()
    val vPath = new org.apache.hadoop.fs.Path(s"$dir/vertices")
    val fs = vPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val result =
      if (!fs.exists(vPath)) { graph.save(dir); None }
      else {
        val tV = touchedLabels(vBase, deltaV.toSeq, delTouchV.toSet)
        val tE = touchedLabels(eBase, deltaE.toSeq, delTouchE.toSet)
        writeTouched(v, s"$dir/vertices", tV, vIdxFields)
        writeTouched(e, s"$dir/edges", tE, eIdxFields)
        // the sidecar is only invalidated by actual mutations — a no-op
        // incremental save must not drop a declared topology
        if (tV.nonEmpty || tE.nonEmpty) {
          val tPath = new org.apache.hadoop.fs.Path(s"$dir/topology")
          if (fs.exists(tPath)) fs.delete(tPath, true)
        }
        Some((tV, tE))
      }
    val fresh = GraphFrame.load(spark, dir)
    v = fresh.vertices; e = fresh.edges
    vBase = v; eBase = e
    deltaV.clear(); deltaE.clear(); delTouchV.clear(); delTouchE.clear()
    result
  }

  /** Re-read the persisted state (Catalog.upsertGraph calls this after an
    * index relayout swaps a just-saved label's files — the old listing
    * would dangle). Only valid when nothing is pending. */
  private[model] def repoint(g: GraphFrame): Unit = synchronized {
    require(vBuf.isEmpty && eBuf.isEmpty && vFrames.isEmpty && eFrames.isEmpty,
      "repoint with pending mutations would drop them")
    v = g.vertices; e = g.edges
    vBase = v; eBase = e
    deltaV.clear(); deltaE.clear(); delTouchV.clear(); delTouchE.clear()
  }

  private def touchedLabels(base: DataFrame, deltas: Seq[DataFrame],
                            fromDeletes: Set[String]): Set[String] = {
    if (deltas.isEmpty) fromDeletes
    else {
      val d = deltas.reduce(_ unionByName _)
      // labels the upserted gids already occupied on disk — their
      // partitions lose the old row versions in the rewrite
      val oldHit = base.join(d.select("gid").distinct(), Seq("gid"), "left_semi")
        .select("label")
      oldHit.unionByName(d.select("label")).distinct()
        .collect().map(_.getString(0)).toSet ++ fromDeletes
    }
  }

  /** Stage the touched-label slice of `df` (computed from the still-live
    * old files), then swap each label partition into place. A label whose
    * rows all vanished is deleted rather than left stale.
    *
    * Commit protocol: per-label stage-then-swap via two atomic renames,
    * rolled back on load after a crash — the atomic-rename requirement
    * (HDFS/local yes, S3-class object stores NO) and the recovery
    * semantics are the documented contract in
    * [[GraphFrame.recoverInterruptedSwaps]]. */
  private def writeTouched(df: DataFrame, path: String, labels: Set[String],
                           idxFields: Map[String, Seq[String]] = Map.empty): Unit = {
    if (labels.isEmpty) return
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(live)
    // pointer-commit mode (Catalog.enableManifestCommit): write fresh
    // commit dirs for every touched label, then replace the ONE manifest
    // file — the only commit point, atomic on object stores too — then
    // GC the replaced/orphaned dirs. No live rename, no crash window
    // that loses a partition (an interrupted run leaves unreferenced
    // dirs the next commit sweeps). See graft.model.Manifest.
    Manifest.read(fs, live) match {
      case Some(m0) =>
        var parts = m0.partitions
        for (l <- labels.toSeq.sorted) {
          val labelDirName = Catalog.labelPartName(l)
          val fields = idxFields.getOrElse(l, Nil)
          // one materialization of the merge slice (same rationale as the
          // fused staging below: emptiness probe + write (+ sort passes))
          val slice = df.filter(col("label") === l).drop("label").localCheckpoint(true)
          try {
            if (slice.isEmpty) parts -= labelDirName
            else {
              val out =
                if (fields.nonEmpty)
                  Catalog.withIdxColumns(slice, fields).orderBy(fields.flatMap(f =>
                    Seq(col(Catalog.idxNumCol(f)), col(Catalog.idxCol(f)))): _*)
                else slice
              val rel = labelDirName + "/" + Manifest.newCommitDir()
              out.write.mode("overwrite")
                .parquet(new org.apache.hadoop.fs.Path(live, rel).toString)
              parts += labelDirName -> rel
            }
          } finally slice.unpersist()
        }
        Manifest.write(fs, live, Manifest.SideManifest(parts))
        for (l <- labels)
          Manifest.gcLabel(fs, live, Catalog.labelPartName(l),
            parts.get(Catalog.labelPartName(l)))
        return
      case None => ()
    }
    // self-heal any swap a crashed previous save left half-done BEFORE
    // clearing the stage (the stage may hold the only copy of a partition)
    GraphFrame.recoverInterruptedSwaps(spark, live.getParent.toString)
    val stage = new org.apache.hadoop.fs.Path(live.getParent, s".delta-stage-${live.getName}")
    fs.delete(stage, true)
    val (idxLabels, plainLabels) = labels.partition(l => idxFields.get(l).exists(_.nonEmpty))
    if (plainLabels.nonEmpty)
      df.filter(col("label").isin(plainLabels.toSeq.sorted: _*))
        .write.mode("overwrite").partitionBy("label").parquet(stage.toString)
    // indexed labels are staged directly in Catalog.relayout's layout:
    // materialized extraction + float64 columns, numeric-leading range
    // sort (same column names, same file shape — graph()'s footer-based
    // coverage check reads them identically)
    for (l <- idxLabels.toSeq.sorted) {
      val fields = idxFields(l)
      // evaluate the merge plan ONCE: the slice is an anti-join + union
      // over the whole label, and the range sort below needs two passes
      // (sampling + sort) plus the emptiness probe — un-checkpointed,
      // each would re-run the merge (measured 40 s vs 13 s at a 100k
      // batch into 2M rows). The checkpoint spills to disk beyond memory,
      // which is the same cost class as the plain-write-then-relayout
      // two-pass — fused-with-checkpoint is never worse, and saves one
      // parquet encode+decode of the label.
      val slice = df.filter(col("label") === l).drop("label").localCheckpoint(true)
      try {
        // an emptied label must stage NOTHING so the swap below deletes
        // it, matching the plain partitionBy path (no dir written for it)
        if (!slice.isEmpty) {
          val withIdx = Catalog.withIdxColumns(slice, fields)
          withIdx.orderBy(fields.flatMap(f =>
              Seq(col(Catalog.idxNumCol(f)), col(Catalog.idxCol(f)))): _*)
            .write.mode("overwrite")
            .parquet(new org.apache.hadoop.fs.Path(stage, Catalog.labelPartName(l)).toString)
        }
      } finally slice.unpersist()
    }
    for (l <- labels.toSeq.sorted) {
      // Spark escapes partition VALUES on write — probe/swap paths must
      // match the escaped spelling or a punctuated label's staged rows
      // would be silently discarded (see Catalog.labelPartName)
      val livePart = new org.apache.hadoop.fs.Path(live, Catalog.labelPartName(l))
      val staged = new org.apache.hadoop.fs.Path(stage, Catalog.labelPartName(l))
      val backup = new org.apache.hadoop.fs.Path(stage, Catalog.labelPartName(l) + ".__old")
      fs.delete(backup, true)
      if (fs.exists(livePart) && !fs.rename(livePart, backup))
        throw new java.io.IOException(s"incremental save: rename $livePart -> $backup failed")
      if (fs.exists(staged) && !fs.rename(staged, livePart)) {
        fs.rename(backup, livePart) // restore before raising
        throw new java.io.IOException(s"incremental save: rename $staged -> $livePart failed")
      }
      fs.delete(backup, true)
    }
    fs.delete(stage, true)
  }
}

object MutableGraph {
  /** An empty writable graph. */
  def empty(spark: SparkSession): MutableGraph = {
    val v = spark.createDataFrame(new java.util.ArrayList[Row](), GraphFrame.vertexSchema)
    val e = spark.createDataFrame(new java.util.ArrayList[Row](), GraphFrame.edgeSchema)
    new MutableGraph(spark, v, e)
  }

  def apply(spark: SparkSession, g: GraphFrame): MutableGraph =
    new MutableGraph(spark, g.vertices, g.edges, Some(g))

  /** Keep only the LAST row per gid (upsert ordering: later add wins,
    * reference ot_update.py test_replace). Input carries a `__seq` batch
    * ordinal; within a batch, monotonically_increasing_id preserves the
    * row order a driver-sealed chunk was built with. */
  private def lastWins(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("gid").orderBy(col("__seq").desc, col("__ord").desc)
    df.withColumn("__ord", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__ord", "__rn")
  }
}
