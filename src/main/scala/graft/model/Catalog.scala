package graft.model

import org.apache.spark.sql.SparkSession

/** Graph + index catalog over a root directory of saved graphs
  * (reference: ListGraphs gripql/gripql.proto:351-355, AddIndex/DeleteIndex
  * :468-481, kvindex/kvindex.go:88-145, conformance ot_index.py).
  *
  * On Spark the label "index" is physical (label-partitioned parquet →
  * partition pruning). Field indices are physical too: addIndex re-lays
  * the label's vertex partition out with a materialized
  * `__idx_<field>` column (the stored `get_json_object` of the field),
  * rows range-sorted by it — so an indexed point predicate becomes a
  * pushed parquet filter over tightly-bounded row groups, the
  * kvindex.go:88-145 seek re-expressed as columnar layout. DeleteIndex
  * drops the metadata only; a stale column is a still-correct
  * materialization that simply stops being read (the next save()
  * rewrites without it). With several indexed fields on one label the
  * sort is lexicographic by field name order — the first field gets
  * perfect clustering, later ones only stats-assisted skipping. */
class Catalog(spark: SparkSession, root: String) {
  private def dir(graph: String) = s"$root/$graph"
  private def idxFile(graph: String) = java.nio.file.Paths.get(s"$root/$graph/.indices")

  def createGraph(name: String, g: GraphFrame): Unit = {
    g.save(dir(name))
    // a (re)save writes plain (gid, label, data) files; any REGISTERED
    // index must be rebuilt over the new rows, or the next load would
    // read the index columns as all-null and indexed filters would
    // wrongly drop every row (the reference backfills its field indices
    // on write the same way, kvindex/kvindex.go AddVertexIndex)
    val reg = listIndices(name)
    reg.map(_._1).distinct.foreach(l =>
      relayout(name, l, reg.collect { case (`l`, f) => f }.sorted))
    val regE = listEdgeIndices(name)
    regE.map(_._1).distinct.foreach(l =>
      relayout(name, l, regE.collect { case (`l`, f) => f }.sorted, side = "edges"))
  }

  /** Persist a mutated graph in place, rewriting only the label
    * partitions the edits touched ([[MutableGraph.saveIncremental]]),
    * then rebuild any registered field indices over exactly those labels
    * — the incremental counterpart of [[createGraph]]'s full
    * save-and-rebuild (the reference's per-mutation index maintenance,
    * kvindex/kvindex.go AddVertexIndex, amortized into the flush). */
  def upsertGraph(name: String, mg: MutableGraph): Unit = {
    val reg = listIndices(name)
    val regE = listEdgeIndices(name)
    def byLabel(r: Seq[(String, String)]): Map[String, Seq[String]] =
      r.groupBy(_._1).map { case (l, fs) => l -> fs.map(_._2).sorted }
    // touched INDEXED labels are written in the index layout by the save
    // itself — one fused rewrite instead of plain-write + relayout (the
    // r13 streaming-ingest probe: 14.9 s → one label pass per batch)
    val touched = mg.saveIncremental(dir(name), byLabel(reg), byLabel(regE))
    touched match {
      case Some(_) => () // incremental path: fused, nothing left to build
      case None => // full save path (first save): plain files, build all
        reg.map(_._1).distinct.foreach(l =>
          relayout(name, l, reg.collect { case (`l`, f) => f }.sorted))
        regE.map(_._1).distinct.foreach(l =>
          relayout(name, l, regE.collect { case (`l`, f) => f }.sorted, side = "edges"))
        if (reg.nonEmpty || regE.nonEmpty)
          mg.repoint(GraphFrame.load(spark, dir(name)))
    }
  }

  def dropGraph(name: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(dir(name)))
  }

  def listGraphs(): Seq[String] = {
    val d = new java.io.File(root)
    if (!d.exists()) Nil
    else d.listFiles().filter(f => f.isDirectory && new java.io.File(f, "vertices").exists())
      .map(_.getName).toSeq.sorted
  }

  def graph(name: String): GraphFrame = {
    val g0 = GraphFrame.load(spark, dir(name))
    // a posted schema doubles as the planner's pruning contract: its edge
    // triples are exactly the EdgeType topology, so hop joins over a
    // schema'd graph prune to reachable labels (GraphFrame.topology)
    val g = if (g0.topology.isEmpty && hasPostedSchema(name))
      g0.copy(topology = Some(topologyOf(getSchema(name))))
    else g0
    g.copy(
      fieldIndex = storedIndex(name, "vertices", listIndices(name),
        GraphFrame.vertexSchema),
      edgeFieldIndex = storedIndex(name, "edges", listEdgeIndices(name),
        GraphFrame.edgeSchema))
  }

  /** FieldIndex over one side's stored files, or None when nothing is
    * registered/covered. Coverage is decided from the files ON DISK, per
    * indexed label: a registry entry only serves the predicate forms
    * whose column its stored partition really carries. This is what makes
    * reading an index directory built by an OLDER layout safe — e.g. a
    * pre-r12 build has only the string `__idx_*` column, and rewriting a
    * numeric predicate onto the (imposed-schema, all-null) `__idxn_*`
    * would silently drop every row. One footer read per indexed label. */
  private def storedIndex(name: String, side: String, idx: Seq[(String, String)],
                          baseSchema: org.apache.spark.sql.types.StructType): Option[FieldIndex] = {
    if (idx.isEmpty) None
    else {
      val sidePath = new org.apache.hadoop.fs.Path(s"${dir(name)}/$side")
      val fs = sidePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // pointer-commit mode: the committed data dirs live behind the
      // manifest (see Manifest); both the footer probe and the rows
      // frame must resolve through it
      val manifest = Manifest.read(fs, sidePath)
      def labelData(l: String): Option[String] = {
        val part = Catalog.labelPartName(l)
        manifest match {
          case Some(m) => m.partitions.get(part).map(rel => s"${dir(name)}/$side/$rel")
          case None => Some(s"${dir(name)}/$side/$part")
        }
      }
      val storedCols: Map[String, Set[String]] = idx.map(_._1).distinct.map { l =>
        l -> (try labelData(l).map(p => spark.read.parquet(p).schema.fieldNames.toSet)
                .getOrElse(Set.empty[String])
              catch { case scala.util.control.NonFatal(_) => Set.empty[String] })
      }.toMap
      val strOk = idx.filter { case (l, f) => storedCols(l).contains(Catalog.idxCol(f)) }.toSet
      val numOk = idx.filter { case (l, f) => storedCols(l).contains(Catalog.idxNumCol(f)) }.toSet
      val typeOk = idx.filter { case (l, f) => storedCols(l).contains(Catalog.idxTypeCol(f)) }.toSet
      if (strOk.isEmpty) None
      else {
        // re-read the side WITH the materialized index columns (absent in
        // some label partitions → null there; the compiler only uses an
        // index column under a label restriction fully covered by entries)
        val extra = idx.map(_._2).distinct.sorted.flatMap(f => Seq(
          org.apache.spark.sql.types.StructField(Catalog.idxCol(f),
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField(Catalog.idxNumCol(f),
            org.apache.spark.sql.types.DoubleType, nullable = true),
          org.apache.spark.sql.types.StructField(Catalog.idxTypeCol(f),
            org.apache.spark.sql.types.StringType, nullable = true)))
        val schema = org.apache.spark.sql.types.StructType(
          baseSchema.fields.toSeq ++ extra)
        val rows = manifest match {
          case Some(m) => GraphFrame.manifestSide(spark, sidePath, m, schema)
          case None => spark.read.schema(schema).parquet(s"${dir(name)}/$side")
        }
        Some(FieldIndex(rows, strOk, numOk, typeOk))
      }
    }
  }

  private def schemaDir(name: String) = s"${dir(name)}/.schema"
  private def hasPostedSchema(name: String): Boolean =
    new java.io.File(s"${schemaDir(name)}/vertices").exists()

  /** Explicitly posted schema (reference: AddSchema gripql/gripql.proto:
    * 483-488): a schema GRAPH — one vertex per label, one edge per
    * (from,label,to) triple — stored beside the graph; [[getSchema]]
    * prefers it over sampling. */
  def addSchema(name: String, schema: GraphFrame): Unit =
    schema.save(schemaDir(name))

  /** The posted schema if present, else sampled (reference: GetSchema /
    * SampleSchema — schema/scan.go). */
  def getSchema(name: String, sampleN: Int = 50): GraphFrame =
    if (hasPostedSchema(name)) GraphFrame.load(spark, schemaDir(name))
    else SchemaSampler.sampleSchema(spark, graph(name), sampleN)

  /** EdgeType triples of a schema graph (its edges connect label vertices). */
  def topologyOf(schema: GraphFrame): Seq[EdgeType] =
    schema.edges.select("from", "label", "to").collect()
      .map(r => EdgeType(r.getString(0), r.getString(1), r.getString(2))).toSeq

  def listLabels(name: String): (Seq[String], Seq[String]) =
    SchemaSampler.listLabels(graph(name))

  /** Field index registration + physical build (label is always indexed).
    * Registers the (label, field) entry, then re-lays the label's vertex
    * partition out around the field (see class doc). The build is an
    * explicit one-shot — at scale one range shuffle of one label's rows,
    * the same cost class as the reference's index backfill
    * (kvindex/kvindex.go AddVertexIndex scan). The re-layout REPLACES the
    * label's files: GraphFrames loaded before addIndex hold stale file
    * listings and must be re-loaded via [[graph]] (the usual DDL-vs-open-
    * reader contract; the reference's KV backfill has the same hazard). */
  def addIndex(graph: String, label: String, field: String): Unit = {
    val cur = listIndices(graph).toSet + ((label, field))
    // build FIRST, register after: if the relayout Spark job fails, a
    // pre-registered entry would make graph() serve a FieldIndex whose
    // covered column reads all-null and indexed queries silently return
    // zero rows — registration must imply a materialized column
    relayout(graph, label, cur.collect { case (`label`, f) => f }.toSeq.sorted)
    writeIndices(graph,
      cur.toSeq.map { case (l, f) => ("V", l, f) } ++
        listEdgeIndices(graph).map { case (l, f) => ("E", l, f) })
  }

  /** Shredded sidecar (r13, the JSON-parse-tax answer): sample each
    * label's stored documents, discover the top-level SCALAR fields, and
    * build the field-index layout for ALL of them at once — after this,
    * every `has()` on a sampled field answers from a materialized
    * column (pushed parquet filter + stored float64 cast) instead of
    * paying `get_json_object` per row, with no per-field `addIndex`
    * calls. Measured on the 2M-row probe: the stock JSON-parse predicate
    * costs 9.8× the shredded-column one. The shredded fields ARE
    * registered index entries, so [[upsertGraph]]'s fused maintenance
    * keeps them current across incremental saves, [[createGraph]]
    * rebuilds them on re-save, and [[deleteIndex]] drops any of them
    * individually.
    *
    * Sampling is per label (`sampleN` stored rows); fields are ranked by
    * sample frequency and capped at `maxFields` — at 100 TB the cap
    * bounds write amplification while columnar reads keep untouched
    * sidecar columns free. Only `[A-Za-z0-9_]` top-level keys with
    * scalar values are shredded (dotted keys would be ambiguous against
    * nested-path predicates; containers aren't comparable scalars).
    * Returns the (label → fields) map it built. */
  def shredGraph(name: String, sampleN: Int = 200, maxFields: Int = 16,
                 sides: Seq[String] = Seq("vertices", "edges")): Map[(String, String), Seq[String]] = {
    val fsRoot = new org.apache.hadoop.fs.Path(dir(name))
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recover ONCE before any concurrent build: recovery deletes whole
    // stage roots, so it must never run inside a parallel relayout
    GraphFrame.recoverInterruptedSwaps(spark, dir(name))
    // per-label work items: (side, label, committed data dir)
    val items = for {
      side <- sides
      sideDir = new org.apache.hadoop.fs.Path(s"${dir(name)}/$side")
      if fs.exists(sideDir)
      sideManifest = Manifest.read(fs, sideDir)
      st <- fs.listStatus(sideDir).toSeq
      if st.isDirectory && st.getPath.getName.startsWith("label=")
      l = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(st.getPath.getName.stripPrefix("label="))
      part = sideManifest match {
        case Some(m) => m.partitions.get(Catalog.labelPartName(l))
          .map(rel => s"${dir(name)}/$side/$rel").orNull
        case None => s"${dir(name)}/$side/${Catalog.labelPartName(l)}"
      }
    } yield (side, l, part)
    // sample + build each label CONCURRENTLY (guide §2.6 — overlap
    // independent jobs): labels are disjoint directories and disjoint
    // Spark jobs, so a small pool lets one label's sort backfill the
    // executors another label's sampling or commit leaves idle; the
    // manifest/rename commits serialize on [[commitLock]]. Results are
    // identical to the serial loop — each label's build touches only its
    // own partition, and registration happens once below.
    def sampleFields(part: String): Seq[String] = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val docs =
        if (part == null) Array.empty[String]
        else spark.read.parquet(part).select("data").limit(sampleN)
          .collect().map(_.getString(0)).filter(d => d != null && d.nonEmpty)
      val freq = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      for (d <- docs) {
        val node = try mapper.readTree(d) catch { case _: Exception => null }
        if (node != null && node.isObject) {
          val it = node.properties().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getKey.matches("[A-Za-z0-9_]+") && e.getValue.isValueNode
                && !e.getValue.isNull)
              freq(e.getKey) += 1
          }
        }
      }
      freq.toSeq.sortBy { case (k, n) => (-n, k) }.take(maxFields).map(_._1).sorted
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, math.max(1, items.size)))
    val built = try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = items.map { case (side, l, part) =>
        scala.concurrent.Future {
          val fields = sampleFields(part)
          if (fields.nonEmpty) {
            relayout(name, l, fields, side, recover = false)
            Some(((side, l), fields))
          } else None
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf).flatten.toMap
    } finally pool.shutdown()
    // register AFTER every build succeeded (the addIndex discipline:
    // registration must imply materialized columns)
    val vNew = built.collect { case (("vertices", l), fs2) => fs2.map(f => (l, f)) }.flatten
    val eNew = built.collect { case (("edges", l), fs2) => fs2.map(f => (l, f)) }.flatten
    writeIndices(name,
      (listIndices(name) ++ vNew).distinct.map { case (l, f) => ("V", l, f) } ++
      (listEdgeIndices(name) ++ eNew).distinct.map { case (l, f) => ("E", l, f) })
    built
  }

  /** Edge-side field index (value-add: the reference's AddIndex is
    * vertex-only, gripql/gripql.proto:468-481) — same build-then-register
    * discipline and relayout machinery as [[addIndex]], applied to the
    * edge label partition; the traversal compiler seeds E()-rooted
    * label-restricted predicates from it the same way. */
  def addEdgeIndex(graph: String, label: String, field: String): Unit = {
    val cur = listEdgeIndices(graph).toSet + ((label, field))
    relayout(graph, label, cur.collect { case (`label`, f) => f }.toSeq.sorted,
      side = "edges")
    writeIndices(graph,
      listIndices(graph).map { case (l, f) => ("V", l, f) } ++
        cur.toSeq.map { case (l, f) => ("E", l, f) })
  }

  /** Rewrite one label's vertex partition with materialized, sorted
    * `__idx_*` (string) and `__idxn_*` (float64 try_cast — the reference's
    * cast.ToFloat64E comparison type, engine/logic/match.go:27-69) columns
    * for every index in `fields`. No-op when the label has no stored rows
    * yet (the index stays registered; a later save() + addIndex re-run
    * builds it).
    *
    * Crash-safety: the rewrite is staged OUTSIDE vertices/ (a temp dir
    * inside it would itself read as a valid `label=X.__reindex` partition
    * with duplicate rows), then swapped live→backup, staged→live,
    * delete-backup — no window loses the partition without a recoverable
    * copy on disk, and GraphFrame.load rolls an interrupted swap back.
    * The atomic-rename requirement this rests on (HDFS/local yes,
    * S3-class object stores NO) is the documented contract in
    * [[GraphFrame.recoverInterruptedSwaps]]. */
  /** Serializes relayout COMMITS (manifest read-modify-write / live
    * renames) when label builds run concurrently ([[shredGraph]]); the
    * expensive sort+write stays outside it. */
  private val commitLock = new Object

  private def relayout(graph: String, label: String, fields: Seq[String],
                       side: String = "vertices", recover: Boolean = true): Unit = {
    // self-heal a crashed previous relayout before probing the partition.
    // Callers running several label builds concurrently recover ONCE up
    // front instead (recovery deletes whole stage roots — it must never
    // race a sibling build's staged dirs).
    if (recover) GraphFrame.recoverInterruptedSwaps(spark, dir(graph))
    val sidePath = new org.apache.hadoop.fs.Path(s"${dir(graph)}/$side")
    val fs = sidePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val labelDirName = Catalog.labelPartName(label)
    import org.apache.spark.sql.functions.col
    val keyCols = if (side == "edges") Seq("gid", "from", "to") else Seq("gid")
    // one-pass build (guide §1.2/§2.4): orderBy's range partitioner
    // SAMPLES its child before the real shuffle pass, so an uncached
    // child evaluates the whole JSON-extraction projection twice — the
    // dominant relayout cost. Caching the extracted frame makes the
    // sample pass populate the cache and the shuffle pass read it: one
    // document parse per row total. MEMORY_AND_DISK bounds the cost at
    // scale (a 100 TB label spills the cache to local disk — the same
    // 1× scratch the sort's shuffle files already cost).
    def sortedByIdx(base0: org.apache.spark.sql.DataFrame)
                   (write: org.apache.spark.sql.DataFrame => Unit): Unit = {
      // scale-adaptive parallelism floor (guide §2.5 input skew / §6): a
      // label stored as one or two single-row-group files scans as one
      // task, so the whole JSON extraction runs on one core. Spreading
      // the RAW rows first costs a trivial shuffle exactly when the
      // label is small (< ~256 MB by scan stats) and under-partitioned;
      // at scale the condition never fires and no extra shuffle is paid.
      val target = spark.sparkContext.defaultParallelism
      // file count, not rdd.getNumPartitions: the RDD accessor forces a
      // full plan-to-RDD conversion per relayout just to read a number;
      // the leaf file list is already computed by the scan relation. For
      // the small-label case this guards (single-digit files under
      // 256 MB) files ≈ scan splits; non-file sources fall back.
      val inFiles = base0.inputFiles.length
      val nParts = if (inFiles > 0) inFiles else base0.rdd.getNumPartitions
      val small = base0.queryExecution.optimizedPlan.stats.sizeInBytes <
        BigInt(256L << 20)
      val base = if (nParts < target && small) base0.repartition(target) else base0
      val withIdx = Catalog.withIdxColumns(base, fields)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try write(withIdx.orderBy(fields.flatMap(f =>
        Seq(col(Catalog.idxNumCol(f)), col(Catalog.idxCol(f)))): _*))
      finally withIdx.unpersist(false)
    }
    // pointer-commit mode: write a fresh commit dir from the committed
    // one, replace the manifest (THE commit), then GC what it replaced —
    // no live rename anywhere (see Manifest)
    Manifest.read(fs, sidePath) match {
      case Some(m) =>
        val relOld = m.partitions.getOrElse(labelDirName, return)
        val base = spark.read.parquet(new org.apache.hadoop.fs.Path(sidePath, relOld).toString)
          .select((keyCols :+ "data").map(col): _*)
        val relNew = labelDirName + "/" + Manifest.newCommitDir()
        sortedByIdx(base)(_.write.mode("overwrite")
          .parquet(new org.apache.hadoop.fs.Path(sidePath, relNew).toString))
        // re-read + replace under the lock: concurrent label builds each
        // fold their own entry into the manifest without losing siblings'
        commitLock.synchronized {
          val mNow = Manifest.read(fs, sidePath).getOrElse(m)
          Manifest.write(fs, sidePath,
            Manifest.SideManifest(mNow.partitions + (labelDirName -> relNew)))
        }
        Manifest.gcLabel(fs, sidePath, labelDirName, Some(relNew))
        return
      case None => ()
    }
    val part = new org.apache.hadoop.fs.Path(sidePath, labelDirName)
    if (!fs.exists(part)) return
    // partition files hold (gid[, from, to], data) — label is the
    // directory key; old __idx columns are recomputed rather than trusted
    val base = spark.read.parquet(part.toString)
      .select((keyCols :+ "data").map(col): _*)
    // side-specific stage roots so crash recovery knows where a backup
    // belongs (".reindex" stays the vertex spelling for back-compat)
    val stageRoot = new org.apache.hadoop.fs.Path(
      s"${dir(graph)}/${if (side == "edges") ".reindex-edges" else ".reindex"}")
    val stage = new org.apache.hadoop.fs.Path(stageRoot, Catalog.labelPartName(label))
    // range-sort, numeric interpretation leading per field: each output
    // file (and row group) gets a tight min/max band of the leading index
    // field in BOTH the float64 and the string reading (equal strings have
    // equal casts, so they stay adjacent under the numeric-first sort)
    sortedByIdx(base)(_.write.mode("overwrite").parquet(stage.toString))
    val backup = new org.apache.hadoop.fs.Path(stageRoot,
      Catalog.labelPartName(label) + ".__old")
    commitLock.synchronized {
      fs.delete(backup, true)
      if (!fs.rename(part, backup))
        throw new java.io.IOException(s"index re-layout: rename $part -> $backup failed")
      if (!fs.rename(stage, part)) {
        fs.rename(backup, part) // restore the live partition before raising
        throw new java.io.IOException(s"index re-layout: rename $stage -> $part failed")
      }
      fs.delete(backup, true)
      // scratch holds only THIS swap's dirs — but under concurrent label
      // builds a sibling's staged dir may live beside ours, so only an
      // empty stage root is removed
      if (fs.exists(stageRoot) && fs.listStatus(stageRoot).isEmpty)
        fs.delete(stageRoot, true)
    }
  }

  /** Switch a saved graph to the pointer-commit (manifest) protocol —
    * the object-store-safe alternative to the rename-swap commit (see
    * [[Manifest]]): after this, `upsertGraph` / `addIndex` /
    * `shredGraph` / streaming ingest commit each change by writing NEW
    * `c-<uuid>` data directories and atomically replacing one small
    * manifest file per side, with no live rename anywhere — safe on
    * S3-class stores where directory rename is copy+delete.
    *
    * The migration itself MOVES the existing files into commit dirs
    * (renames), so run it where rename is trustworthy — at graph
    * creation time, or on HDFS/local before uploading. Idempotent and
    * crash-resumable: files already moved into `c-*` dirs are folded
    * into the fresh commit on re-run (nothing is referenced until the
    * manifest is written, and the manifest is written last).
    *
    * A FULL re-save ([[createGraph]] / GraphFrame.save) rewrites the
    * side with Spark's own output committer in the plain layout and
    * thereby drops the manifest — re-run this after a full rebuild.
    * Loaded frames from before the switch hold stale file listings
    * (the usual DDL-vs-open-reader contract): re-load via [[graph]]. */
  def enableManifestCommit(name: String): Unit = {
    for (side <- Seq("vertices", "edges")) {
      val sidePath = new org.apache.hadoop.fs.Path(s"${dir(name)}/$side")
      val fs = sidePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(sidePath) && !Manifest.exists(fs, sidePath)) {
        // settle any half-done rename swap before freezing the layout
        GraphFrame.recoverInterruptedSwaps(spark, dir(name))
        val parts = for {
          st <- fs.listStatus(sidePath).toSeq.sortBy(_.getPath.getName)
          if st.isDirectory && st.getPath.getName.startsWith("label=")
        } yield {
          val labelDir = st.getPath
          val rel = labelDir.getName + "/" + Manifest.newCommitDir()
          val cdir = new org.apache.hadoop.fs.Path(sidePath, rel)
          fs.mkdirs(cdir)
          // fold in top-level files AND any c-* leftovers from a crashed
          // previous migration; ordinal prefixes keep names collision-free.
          // Marker files (_SUCCESS and other _/. prefixed names Spark's
          // readers skip by convention) are dropped — the ordinal prefix
          // would otherwise un-hide them and break footer reads
          def dataFile(p: org.apache.hadoop.fs.Path): Boolean =
            !p.getName.startsWith("_") && !p.getName.startsWith(".")
          val sources = fs.listStatus(labelDir).toSeq.flatMap { f =>
            if (f.isFile) Seq(f.getPath).filter(dataFile)
            else if (f.getPath.getName.startsWith("c-"))
              fs.listStatus(f.getPath).toSeq.filter(_.isFile).map(_.getPath).filter(dataFile)
            else Nil
          }
          sources.zipWithIndex.foreach { case (src, i) =>
            if (!fs.rename(src, new org.apache.hadoop.fs.Path(cdir, s"m$i-${src.getName}")))
              throw new java.io.IOException(s"manifest migration: rename $src failed")
          }
          for (f <- fs.listStatus(labelDir)
               if f.isDirectory && f.getPath.getName.startsWith("c-")
               if f.getPath.getName != cdir.getName)
            fs.delete(f.getPath, true)
          labelDir.getName -> rel
        }
        Manifest.write(fs, sidePath, Manifest.SideManifest(parts.toMap))
      }
    }
  }

  def deleteIndex(graph: String, label: String, field: String): Unit =
    writeIndices(graph,
      (listIndices(graph).toSet - ((label, field))).toSeq
        .map { case (l, f) => ("V", l, f) } ++
      listEdgeIndices(graph).map { case (l, f) => ("E", l, f) })

  def deleteEdgeIndex(graph: String, label: String, field: String): Unit =
    writeIndices(graph,
      listIndices(graph).map { case (l, f) => ("V", l, f) } ++
      (listEdgeIndices(graph).toSet - ((label, field))).toSeq
        .map { case (l, f) => ("E", l, f) })

  def listIndices(graph: String): Seq[(String, String)] =
    allIndices(graph).collect { case ("V", l, f) => (l, f) }

  /** Edge-side registrations (see [[addEdgeIndex]]). */
  def listEdgeIndices(graph: String): Seq[(String, String)] =
    allIndices(graph).collect { case ("E", l, f) => (l, f) }

  /** Registry file format: one entry per line — vertex entries as
    * `label\tfield` (the pre-r13 spelling, so old registries read
    * unchanged), edge entries as `E\tlabel\tfield`. */
  private def allIndices(graph: String): Seq[(String, String, String)] = {
    val p = idxFile(graph)
    if (!java.nio.file.Files.exists(p)) Nil
    else java.nio.file.Files.readString(p).split("\n").filter(_.nonEmpty).toSeq
      .map { l =>
        l.split("\t", 3) match {
          case Array("E", lbl, f) => ("E", lbl, f)
          case Array(a, b) => ("V", a, b)
          case Array(a, b, c) => ("V", a, s"$b\t$c") // degenerate tab-in-field
          case _ => ("V", l, "")
        }
      }
  }

  private def writeIndices(graph: String, all: Seq[(String, String, String)]): Unit =
    java.nio.file.Files.writeString(idxFile(graph),
      all.distinct.sorted.map {
        case ("E", l, f) => s"E\t$l\t$f"
        case (_, l, f) => s"$l\t$f"
      }.mkString("\n"))
}

object Catalog {
  /** Directory name of a label partition exactly as Spark writes it.
    * Partition VALUES are escaped on write (ExternalCatalogUtils
    * .escapePathName: ':', '%', '/', '#', control chars, …), so every
    * hand-built path that probes or swaps a written partition must
    * escape identically — a raw `label=a:b` probe misses the real
    * `label=a%3Ab` directory (and ':' even throws in Hadoop Path),
    * which for the stage-swap protocols would silently discard the
    * staged rows. */
  def labelPartName(label: String): String =
    "label=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(label)

  /** Parquet column name materializing an indexed field's extraction. */
  def idxCol(field: String): String = "__idx_" + safe(field)

  /** Sibling column materializing `try_cast(__idx_<f> AS double)` — the
    * float64 reading the reference's ordered comparisons use
    * (engine/logic/match.go cast.ToFloat64E); stored so numeric range
    * predicates push down as plain double comparisons. */
  def idxNumCol(field: String): String = "__idxn_" + safe(field)

  /** Third sibling: the field's presence/type tag — NULL when the key is
    * MISSING (or the document is malformed / the parent path absent),
    * "VOID" for a stored JSON null, else the reference's FieldType name
    * (STRING/NUMERIC/BOOL/ARRAY/MAP — gripql/gripql.proto:282-289). This
    * is what lets the parse-heavy non-resolve reads substitute too:
    * `exists()` (hasKey, distinct's drop-missing rule) is exactly
    * `tag IS NOT NULL` — a pushable IsNotNull scan filter — the term
    * aggregation's container-skip test is `tag IN ('MAP','ARRAY')`, and
    * a `type` aggregation reads the tag directly. */
  def idxTypeCol(field: String): String = "__idxt_" + safe(field)

  /** Add the materialized index columns for every field in `fields` to a
    * frame carrying a `data` document column — each reading EXACTLY the
    * expression the engine evaluates per row (compiler/Fields.scala
    * resolve / exists, GJson.json_type), so substituting the stored
    * column for the live expression is an identity. Shared by
    * [[Catalog.relayout]] and the fused incremental staging
    * ([[MutableGraph.saveIncremental]]) so the two writers can never
    * drift.
    *
    * The document parse (`try_parse_json`) and the top-level key list are
    * computed ONCE per row into temp columns all fields' tag expressions
    * reference — CollapseProject keeps expensive multiply-referenced
    * aliases in their own projection, so the build pays one parse per row
    * regardless of the field count (a 16-field shred re-parsing per field
    * measured ~2.5× the build cost). */
  def withIdxColumns(df: org.apache.spark.sql.DataFrame,
                     fields: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    if (fields.isEmpty) return df
    val tmpVar = "__graft_tmp_var"
    var d = df.withColumn(tmpVar, try_parse_json(col("data")))
    for (field <- fields) {
      val data = col("data")
      val str = get_json_object(data, "$." + field)
      // probed (r13, both top-level and nested paths over adversarial
      // docs — missing key, stored null, malformed doc, non-object doc,
      // absent/array parent): schema_of_variant yields "VOID" for a
      // stored JSON null and NULL for a missing key / malformed document
      // — exactly the presence split the tag needs (the VOID row EXISTS,
      // the NULL row does not). The previous json_object_keys presence
      // guard was therefore one full document parse per row buying
      // nothing; the schema probe alone decides NULL (missing) vs the
      // type tag (present). A mismatch is impossible by construction:
      // try_variant_get returns a variant iff the key resolves, and
      // schema_of_variant of a resolved variant is never NULL.
      val sch = schema_of_variant(
        try_variant_get(col(tmpVar), "$." + field, "variant"))
      val typed = when(sch === "VOID", lit("VOID"))
        .when(sch === "STRING", lit("STRING"))
        .when(sch === "BOOLEAN", lit("BOOL"))
        .when(sch.isin("BIGINT", "DOUBLE", "FLOAT") || sch.startsWith("DECIMAL"), lit("NUMERIC"))
        .when(sch.startsWith("OBJECT"), lit("MAP"))
        .when(sch.startsWith("ARRAY"), lit("ARRAY"))
        .otherwise(lit("UNKNOWN"))
      d = d.withColumn(idxCol(field), str)
           .withColumn(idxNumCol(field), str.try_cast("double"))
           .withColumn(idxTypeCol(field), when(sch.isNotNull, typed))
    }
    d.drop(tmpVar)
  }

  /** Injective sanitization: distinct raw fields must never share a
    * column name ('a.b' and 'a_b' both sanitize to a_b — the collision
    * would silently drop one field's extraction in relayout and duplicate
    * column names in graph()'s read schema), so any field that needed
    * escaping carries a short hash of its raw spelling. */
  private def safe(field: String): String = {
    val s = field.replaceAll("[^A-Za-z0-9_]", "_")
    if (s == field) s
    else s + "_" + java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(field) & 0xffffff)
  }
}
