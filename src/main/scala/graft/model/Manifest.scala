package graft.model

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pointer-commit manifest for a graph side (vertices/ or edges/) — the
  * object-store-safe alternative to the stage-then-rename swap protocols
  * (reference durability surface: the reference delegates this to its KV
  * stores' WAL, e.g. badger/pebble under kvgraph/; graft's parquet store
  * must supply its own commit point).
  *
  * Layout under a manifest-mode side:
  * {{{
  *   <side>/.graft-manifest.json          — THE commit point
  *   <side>/label=X/c-<uuid>/part-*.parquet
  * }}}
  * The manifest maps each label's partition dir name (exactly as Spark
  * escapes it — Catalog.labelPartName) to the RELATIVE path of its
  * committed data directory. Writers only ever create NEW `c-<uuid>`
  * directories and then replace the manifest; nothing live is renamed or
  * deleted before the new manifest is durable, so the commit point is
  * the single manifest replacement:
  *
  *  - on HDFS/local, the manifest is written to a temp name and renamed
  *    into place (atomic);
  *  - on S3-class stores, the rename of ONE small object is a single
  *    copy PUT — the destination object appears atomically, so a reader
  *    sees the old manifest or the new one, never a torn file and never
  *    a half-swapped partition. This is the property the rename-swap
  *    protocol could not provide there (multi-file directory rename =
  *    many copy+deletes with crash windows between them).
  *
  * Crash behavior: files written but manifest not yet replaced = orphan
  * `c-*` directories the manifest never references — readers ignore
  * them, and the next successful commit garbage-collects any
  * unreferenced `c-*` dirs of the labels it touches. No recovery step
  * is needed at load time (the manifest IS the consistent state).
  *
  * Single-writer per graph, same as the swap protocols. Readers may
  * hold a loaded frame across a commit: the frames list concrete files
  * at creation, and GC only deletes directories REPLACED by the commit
  * — a reader loaded before the commit may still fail on a deleted old
  * file (the documented DDL-vs-open-reader contract, unchanged).
  */
object Manifest {
  val FileName = ".graft-manifest.json"

  /** labelDirName (e.g. "label=Person") → relative committed data dir. */
  case class SideManifest(partitions: Map[String, String])

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def manifestPath(side: Path): Path = new Path(side, FileName)

  def exists(fs: FileSystem, side: Path): Boolean =
    fs.exists(manifestPath(side))

  def read(fs: FileSystem, side: Path): Option[SideManifest] = {
    val p = manifestPath(side)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      val node = mapper.readTree(bytes)
      val parts = node.get("partitions")
      val b = Map.newBuilder[String, String]
      if (parts != null) {
        val it = parts.properties().iterator()
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      }
      Some(SideManifest(b.result()))
    }
  }

  /** Replace the side's manifest — THE commit. Temp-write + rename: on
    * HDFS/local the rename is atomic; on S3-class stores it is one
    * whole-object copy PUT, which appears atomically. */
  def write(fs: FileSystem, side: Path, m: SideManifest): Unit = {
    val root = mapper.createObjectNode()
    root.put("v", 1)
    val parts = root.putObject("partitions")
    m.partitions.toSeq.sortBy(_._1).foreach { case (k, v) => parts.put(k, v) }
    val tmp = new Path(side, FileName + ".tmp-" + java.util.UUID.randomUUID())
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
    val dst = manifestPath(side)
    fs.delete(dst, false) // local fs rename won't overwrite; S3 PUT replaces anyway
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"manifest commit: rename $tmp -> $dst failed")
  }

  /** A fresh commit-directory name (never reused; uniqueness is the
    * no-overwrite guarantee object stores need). */
  def newCommitDir(): String = "c-" + java.util.UUID.randomUUID().toString

  /** Delete every unreferenced c-* subdir of `labelDir` (orphans from a
    * crashed commit, or the directories a successful commit replaced).
    * Safe to call only AFTER the new manifest is durable. */
  def gcLabel(fs: FileSystem, side: Path, labelDirName: String,
              referenced: Option[String]): Unit = {
    val labelDir = new Path(side, labelDirName)
    if (fs.exists(labelDir)) {
      val keep = referenced.map(r => new Path(side, r).toUri.getPath)
      for (st <- fs.listStatus(labelDir)
           if st.isDirectory && st.getPath.getName.startsWith("c-")
           if !keep.contains(st.getPath.toUri.getPath))
        fs.delete(st.getPath, true)
      // a label whose pointer was removed (all rows deleted) loses the dir
      if (referenced.isEmpty) fs.delete(labelDir, true)
    }
  }
}
