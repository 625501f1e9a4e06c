package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Catalog, GraphFrame, Manifest, MutableGraph}
import graft.gripql.{P, Query}
import graft.compiler.Traversal

/** The pointer-commit (manifest) protocol — Catalog.enableManifestCommit.
  * The rename-swap protocols are correct on HDFS/local but their "no
  * crash window" guarantee rests on atomic directory rename, which
  * S3-class object stores don't have; manifest mode replaces every swap
  * with write-new-dirs + one atomic manifest replacement. These tests pin
  * that the switch preserves every read path (load, field index, shred,
  * traversal plans) and that commits leave no live rename and sweep what
  * they replace. */
class ManifestCommitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def cDirs(side: String, label: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$side/${graft.model.Catalog.labelPartName(label)}")
    val fs = fsOf(side)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("c-")).sorted
  }

  test("enable preserves every read path; upserts and index builds commit via the manifest") {
    val root = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    val cat = new Catalog(spark, root)
    // punctuated label: Spark escapes ':' in partition dir names — the
    // manifest keys must use the escaped spelling end to end
    val v = (0 until 400).map { i =>
      val l = if (i % 3 == 0) "t:y" else "Doc"
      (s"v$i", l, s"""{"n":${i % 50},"tag":"t${i % 7}"}""")
    }.toDF("gid", "label", "data")
    val e = (0 until 100).map(i => (s"e$i", "link", s"v$i", s"v${i + 1}", s"""{"w":$i}"""))
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("m", GraphFrame(v, e))
    cat.addIndex("m", "Doc", "n")

    def gids(q: Query): Seq[String] =
      Traversal.run(spark, cat.graph("m"), q).select("gid")
        .collect().map(_.getString(0)).sorted.toSeq
    val q1 = Query().V().hasLabel("Doc").has(P.between("n", 10, 30))
    val q2 = Query().V().hasLabel("t:y").has(P.eq_("tag", "t3"))
    val q3 = Query().E().hasLabel("link").has(P.lt("w", 10))
    val before = (gids(q1), gids(q2), gids(q3), gids(Query().V()))

    cat.enableManifestCommit("m")
    val vSide = s"$root/m/vertices"
    assert(Manifest.exists(fsOf(vSide), new org.apache.hadoop.fs.Path(vSide)))
    // identical rows on every path: indexed seek, punctuated label, edges
    assert((gids(q1), gids(q2), gids(q3), gids(Query().V())) == before)
    // the indexed predicate still reaches the scan as a pushed filter
    val plan = Traversal.run(spark, cat.graph("m"), q1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("__idxn_n"), plan)

    // ---- upsert commits via the manifest: no stage dir, old dirs GC'd
    val preDirs = cDirs(vSide, "Doc")
    val mg = MutableGraph(spark, cat.graph("m"))
    mg.addVertex("v900", "Doc", """{"n":12,"tag":"t3"}""")
    mg.addVertex("v901", "t:y", """{"tag":"t3"}""")
    cat.upsertGraph("m", mg)
    assert(gids(q1).contains("v900"))
    assert(gids(q2).contains("v901"))
    assert(!fsOf(vSide).exists(new org.apache.hadoop.fs.Path(s"$root/m/.delta-stage-vertices")),
      "manifest-mode commit must not create a rename stage")
    val postDirs = cDirs(vSide, "Doc")
    assert(postDirs.length == 1 && postDirs != preDirs,
      s"exactly one committed dir after GC: $preDirs -> $postDirs")

    // ---- orphans (the crash residue: files written, manifest not
    // replaced) are invisible to readers and swept by the next commit
    val fs = fsOf(vSide)
    val orphan = new org.apache.hadoop.fs.Path(s"$vSide/label=Doc/c-orphan")
    fs.mkdirs(orphan)
    (0 until 3).map(i => (s"z$i", s"""{"n":11}"""))
      .toDF("gid", "data").write.mode("overwrite").parquet(orphan.toString)
    val withOrphan = gids(Query().V())
    assert(!withOrphan.exists(_.startsWith("z")), "orphan rows must be invisible")
    val mg2 = MutableGraph(spark, cat.graph("m"))
    mg2.addVertex("v902", "Doc", """{"n":13}""")
    cat.upsertGraph("m", mg2)
    assert(!fs.exists(orphan), "commit must sweep unreferenced dirs of touched labels")
    assert(cDirs(vSide, "Doc").length == 1)

    // ---- emptied label: pointer removed, directory gone, loads clean
    val mg3 = MutableGraph(spark, cat.graph("m"))
    (0 until 400).filter(_ % 3 == 0).foreach(i => mg3.deleteVertex(s"v$i"))
    mg3.deleteVertex("v901")
    cat.upsertGraph("m", mg3)
    assert(gids(q2).isEmpty)
    assert(cDirs(vSide, "t:y").isEmpty)
    assert(gids(q1).nonEmpty) // untouched label intact

    // ---- addIndex + shredGraph relayout through the pointer path
    cat.addIndex("m", "Doc", "tag")
    assert(gids(Query().V().hasLabel("Doc").has(P.eq_("tag", "t3"))).nonEmpty)
    assert(cDirs(vSide, "Doc").length == 1, "relayout must GC the dir it replaced")
    val built = cat.shredGraph("m")
    assert(built.contains(("edges", "link")))
    val ep = Traversal.run(spark, cat.graph("m"), q3)
      .queryExecution.executedPlan.toString
    assert(ep.contains("__idxn_w"), ep)
    // the vertex deletions above cascaded to incident edges (reference
    // semantics): only edges with both endpoints alive remain — e_i with
    // i % 3 == 1 (neither v_i nor v_{i+1} was a multiple of 3)
    assert(gids(q3) == (0 until 10).filter(_ % 3 == 1).map(i => s"e$i"))
  }

  test("migration is idempotent and folds in a crashed previous attempt") {
    val root = java.nio.file.Files.createTempDirectory("graft-manifest2").toString
    val cat = new Catalog(spark, root)
    val v = (0 until 90).map(i => (s"v$i", "P", s"""{"n":$i}"""))
      .toDF("gid", "label", "data")
    val e = Seq.empty[(String, String, String, String, String)]
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("m2", GraphFrame(v, e))
    // simulate a crashed half-migration: SOME files already moved into a
    // c-dir, manifest never written
    val side = s"$root/m2/vertices"
    val fs = fsOf(side)
    val labelDir = new org.apache.hadoop.fs.Path(s"$side/label=P")
    val half = new org.apache.hadoop.fs.Path(labelDir, "c-crashed")
    fs.mkdirs(half)
    val files = fs.listStatus(labelDir).toSeq.filter(_.isFile).map(_.getPath)
    assert(files.nonEmpty)
    files.take(files.length / 2 max 1).foreach { f =>
      assert(fs.rename(f, new org.apache.hadoop.fs.Path(half, f.getName)))
    }
    cat.enableManifestCommit("m2")
    // every row survives the resumed migration, half-dir swept
    assert(cat.graph("m2").vertices.count() == 90)
    assert(!fs.exists(half))
    assert(cDirs(side, "P").length == 1)
    // enabling again is a no-op
    cat.enableManifestCommit("m2")
    assert(cat.graph("m2").vertices.count() == 90)
  }
}
