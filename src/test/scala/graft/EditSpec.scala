package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.{GraphFrame, MutableGraph}
import graft.compiler.Traversal

/** Edit/DML surface — port of the reference conformance ot_update.py and
  * ot_bulk.py write tests. */
class EditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def Q = Query()
  def n(g: GraphFrame, q: Query): Long = Traversal.run(spark, g, q).count()

  test("duplicate adds upsert by gid (ot_update.test_duplicate)") {
    val mg = MutableGraph.empty(spark)
    mg.addVertex("vertex1", "person", """{"somedata":1}""")
    mg.addVertex("vertex1", "person")
    mg.addVertex("vertex1", "clone", """{"otherdata":"foo"}""")
    mg.addVertex("vertex2", "person")
    mg.addVertex("vertex2", "clone")
    mg.addEdge("vertex1", "vertex2", "friend", """{"field":1}""", gid = "edge1")
    mg.addEdge("vertex1", "vertex2", "friend", gid = "edge1")
    mg.addEdge("vertex1", "vertex2", "friend", """{"weight":5}""", gid = "edge1")
    assert(n(mg.graph, Q.V()) == 2)
    assert(n(mg.graph, Q.E()) == 1)
  }

  test("last add wins entirely (ot_update.test_replace)") {
    val mg = MutableGraph.empty(spark)
    mg.addVertex("vertex1", "person", """{"somedata":1}""")
    mg.addVertex("vertex1", "person")
    mg.addVertex("vertex1", "clone", """{"otherdata":"foo"}""")
    mg.addVertex("vertex2", "person")
    mg.addEdge("vertex1", "vertex2", "friend", """{"field":1}""", gid = "edge1")
    mg.addEdge("vertex1", "vertex2", "friend", gid = "edge1")
    mg.addEdge("vertex1", "vertex2", "friend", """{"weight":5}""", gid = "edge1")
    val v1 = mg.getVertex("vertex1").get
    assert(v1.getAs[String]("label") == "clone")
    assert(v1.getAs[String]("data") == """{"otherdata":"foo"}""")
    assert(mg.getEdge("edge1").get.getAs[String]("data") == """{"weight":5}""")
  }

  test("deletes remove elements and incident edges (ot_update.test_delete/_delete_edge)") {
    val mg = MutableGraph.empty(spark)
    mg.addVertex("vertex1", "person", """{"field1":"value1"}""")
    mg.addVertex("vertex2", "person")
    mg.addVertex("vertex3", "person")
    mg.addVertex("vertex4", "person")
    mg.addEdge("vertex1", "vertex2", "friend", gid = "edge1")
    mg.addEdge("vertex2", "vertex3", "friend", gid = "edge2")
    mg.addEdge("vertex2", "vertex4", "parent", gid = "edge3")
    assert(n(mg.graph, Q.V()) == 4)
    assert(n(mg.graph, Q.E()) == 3)
    mg.deleteVertex("vertex1")
    assert(n(mg.graph, Q.V()) == 3)
    assert(n(mg.graph, Q.E()) == 2)
    mg.deleteEdge("edge2")
    assert(n(mg.graph, Q.E()) == 1)
    // removing a middle vertex strips both its out and in edges
    val mg2 = MutableGraph.empty(spark)
    mg2.addVertex("vertex1", "person")
    mg2.addVertex("vertex2", "person")
    mg2.addVertex("vertex3", "person")
    mg2.addEdge("vertex1", "vertex2", "friend", gid = "edge1")
    mg2.addEdge("vertex2", "vertex3", "friend", gid = "edge2")
    mg2.deleteVertex("vertex2")
    assert(n(mg2.graph, Q.V("vertex1").outE()) == 0)
    assert(n(mg2.graph, Q.V("vertex3").inE()) == 0)
  }

  test("bulk add inserts valid elements (ot_bulk.test_bulkload)") {
    val mg = MutableGraph.empty(spark)
    val errs = mg.bulkAdd(
      Seq(("1", "Person", """{"name":"marko"}"""), ("2", "Person", """{"name":"vadas"}"""),
        ("3", "Software", """{"name":"lop"}"""), ("4", "Person", """{"name":"josh"}"""),
        ("5", "Software", """{"name":"ripple"}"""), ("6", "Person", """{"name":"peter"}""")),
      Seq((null, "created", "1", "3", """{"weight":0.4}"""), (null, "knows", "1", "2", "{}"),
        (null, "knows", "1", "4", "{}"), (null, "created", "4", "3", "{}"),
        (null, "created", "6", "3", "{}"), (null, "created", "4", "5", "{}")))
    assert(errs == 0)
    assert(n(mg.graph, Q.V()) == 6)
    assert(n(mg.graph, Q.E()) == 6)
  }

  test("bulk add flags invalid elements (ot_bulk.test_bulkload_validate)") {
    val mg = MutableGraph.empty(spark)
    val errs = mg.bulkAdd(
      Seq(("1", "Person", "{}"), ("2", "Person", "{}")),
      Seq((null, "created", "1", null, "{}"),  // missing `to`
        (null, null, "1", "2", "{}"),          // missing label
        (null, "knows", "1", "2", "{}")))
    assert(errs == 2)
    assert(n(mg.graph, Q.E()) == 1)
  }

  test("streaming bulk add: chunked iterator, bounded driver buffering") {
    val mg = MutableGraph.empty(spark)
    val n0 = 20000
    // lazy iterator — bulkAdd must consume it in batchSize chunks; the
    // last chunk re-adds gid "0" so last-wins must hold ACROSS chunks
    val vs = Iterator.range(0, n0).map(i => (i.toString, "Doc", s"""{"i":$i}""")) ++
      Iterator(("0", "Doc", """{"i":-1}"""))
    val errs = mg.bulkAdd(vs, Iterator.empty, batchSize = 1000)
    assert(errs == 0)
    assert(n(mg.graph, Q.V()) == n0)
    val d0 = mg.getVertex("0").get.getString(2)
    assert(d0 == """{"i":-1}""")
  }

  test("bulk add from DataFrames: distributed validation, uuid edge gids") {
    import spark.implicits._
    val mg = MutableGraph.empty(spark)
    val vdf = Seq(("a", "Person", """{"x":1}"""), ("b", "Person", "{}"),
      ("", "Person", "{}"), (null, "Person", "{}")).toDF("gid", "label", "data")
    val edf = Seq((null: String, "knows", "a", "b", "{}"),
      (null: String, "knows", "a", null, "{}")).toDF("gid", "label", "from", "to", "data")
    val errs = mg.bulkAddFrames(vdf, edf)
    assert(errs == 3) // two bad vertices + one edge missing `to`
    assert(n(mg.graph, Q.V()) == 2)
    assert(n(mg.graph, Q.E()) == 1)
    // the generated edge gid is pinned: two reads see the same id
    val gid1 = mg.graph.edges.select("gid").head().getString(0)
    val gid2 = mg.graph.edges.select("gid").head().getString(0)
    assert(gid1 == gid2 && gid1.nonEmpty)
  }

  test("round-trip: save + load a mutated graph") {
    val mg = MutableGraph.empty(spark)
    mg.addVertex("a", "x", """{"k":1}""")
    mg.addVertex("b", "y")
    mg.addEdge("a", "b", "z", gid = "e1")
    val dir = java.nio.file.Files.createTempDirectory("graft-dml").toString
    mg.save(dir)
    val g2 = GraphFrame.load(spark, dir)
    assert(n(g2, Q.V()) == 2 && n(g2, Q.E()) == 1)
  }

  test("saving topology=None over a topology-bearing save clears the stale contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topo").toString
    val mg = MutableGraph.empty(spark)
    mg.addVertex("a", "x"); mg.addVertex("b", "y"); mg.addEdge("a", "b", "z")
    GraphFrame(mg.graph.vertices, mg.graph.edges,
      Some(Seq(graft.model.EdgeType("x", "z", "y")))).save(dir)
    assert(GraphFrame.load(spark, dir).topology.isDefined)
    // re-save the same data through a topology-less handle (the
    // MutableGraph path): the old triples must NOT resurrect on load —
    // they would prune hops over any edge label added since
    mg.addEdge("b", "a", "w")
    mg.save(dir)
    val g2 = GraphFrame.load(spark, dir)
    assert(g2.topology.isEmpty)
    assert(n(g2, Q.V("a").out("w")) == 0 && n(g2, Q.V("b").out("w")) == 1)
  }

  test("an explicitly empty topology survives save + load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topo0").toString
    val mg = MutableGraph.empty(spark)
    mg.addVertex("a", "x")
    GraphFrame(mg.graph.vertices, mg.graph.edges, Some(Seq.empty)).save(dir)
    val g2 = GraphFrame.load(spark, dir)
    assert(g2.topology == Some(Seq.empty))
  }

  test("wrapping preserves topology/edgesByTo until the first mutation") {
    val m0 = MutableGraph.empty(spark)
    m0.addVertex("a", "x"); m0.addVertex("b", "y"); m0.addEdge("a", "b", "z")
    val base = m0.graph
    val g = GraphFrame(base.vertices, base.edges,
      Some(Seq(graft.model.EdgeType("x", "z", "y"))), Some(base.edges))
    val mg = MutableGraph(spark, g)
    // unmutated: the wrapped graph passes through whole — the server's
    // registered view keeps topology pruning and the to-keyed edge copy
    assert(mg.graph eq g)
    assert(mg.graph.topology.isDefined && mg.graph.edgesByTo.isDefined)
    // first mutation drops the extras (they may no longer describe the data)
    mg.addEdge("b", "a", "w")
    val g2 = mg.graph
    assert(g2.topology.isEmpty && g2.edgesByTo.isEmpty)
    assert(n(g2, Q.V("b").out("w")) == 1)
  }

  test("concurrent writers interleaved with reads lose no elements") {
    // the gRPC dispatch pool (and a shared REST+gRPC registry) mutates a
    // graph from many threads — every add must survive interleaved flushes
    val mg = MutableGraph.empty(spark)
    val threads = 8
    val perThread = 200
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val done = new java.util.concurrent.CountDownLatch(threads)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    for (t <- 0 until threads) pool.execute { () =>
      try {
        for (i <- 0 until perThread) {
          mg.addVertex(s"v$t-$i", "N")
          if (i % 50 == 0) mg.getVertex(s"v$t-0") // interleave buffer seals
        }
      } catch { case e: Throwable => failed.compareAndSet(null, e) }
      finally done.countDown()
    }
    // liveness gate, not a perf assertion: 1600 adds with interleaved
    // buffer seals run Spark jobs on a local[4] session that shares the
    // box with three other concurrently forked test groups — budget sized
    // for a contended box; a genuine deadlock still fails
    assert(done.await(360, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(failed.get() == null, String.valueOf(failed.get()))
    assert(mg.graph.vertices.count() == threads.toLong * perThread)
  }

  test("derived topology caches across calls and refreshes after mutations") {
    val mg = MutableGraph.empty(spark)
    mg.addVertex("a", "x"); mg.addVertex("b", "y"); mg.addEdge("a", "b", "z")
    val t1 = mg.derivedTopology
    assert(t1 == Seq(graft.model.EdgeType("x", "z", "y")))
    assert(mg.derivedTopology eq t1) // cached: same instance, no recompute
    mg.addEdge("b", "a", "w")
    assert(mg.derivedTopology.toSet ==
      Set(graft.model.EdgeType("x", "z", "y"), graft.model.EdgeType("y", "w", "x")))
  }

  /** Part-files of one label partition (path + length — a rewrite changes
    * the file names, an untouched partition keeps them bit-for-bit). */
  private def partFiles(dir: String, side: String, label: String): Set[(String, Long)] = {
    val d = new java.io.File(s"$dir/$side/label=$label")
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length())).toSet
  }

  test("saveIncremental rewrites only the touched label partitions, in place") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-incsave").toString
    val v = (0 until 300).map(i => (s"v$i", s"L${i % 3}", s"""{"n":$i}"""))
      .toDF("gid", "label", "data")
    val e = (0 until 100).map(i => (s"e$i", s"E${i % 2}", s"v$i", s"v${i + 100}", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    GraphFrame(v, e).save(dir)
    val g0 = GraphFrame.load(spark, dir)
    val mg = MutableGraph(spark, g0)
    // upsert into L0 only (one new row + one overwrite), plus a gid that
    // MOVES from L1 to L0 — its OLD partition must rewrite too
    mg.addVertex("v900", "L0", """{"n":900}""")
    mg.addVertex("v0", "L0", """{"n":-1}""")
    mg.addVertex("v1", "L0", """{"n":901}""") // was L1
    val untouchedBefore = partFiles(dir, "vertices", "L2")
    val eBefore = (partFiles(dir, "edges", "E0"), partFiles(dir, "edges", "E1"))
    val touched = mg.saveIncremental(dir)
    assert(touched.contains((Set("L0", "L1"), Set.empty[String])), touched.toString)
    // untouched partitions kept their exact files; edges untouched entirely
    assert(partFiles(dir, "vertices", "L2") == untouchedBefore)
    assert((partFiles(dir, "edges", "E0"), partFiles(dir, "edges", "E1")) == eBefore)
    // reloaded state is the merged truth
    val g1 = GraphFrame.load(spark, dir)
    assert(g1.vertices.count() == 301)
    assert(g1.vertices.filter(col("gid") === "v1").select("label", "data")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("L0", """{"n":901}""")))
    assert(g1.vertices.filter(col("gid") === "v0").select("data")
      .head().getString(0) == """{"n":-1}""")
    // the instance itself reads the persisted state and stays usable
    assert(n(mg.graph, Q.V().hasLabel("L0")) ==
      g1.vertices.filter(col("label") === "L0").count())
  }

  test("saveIncremental: deletes rewrite victim partitions and drop emptied labels") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-incsave-del").toString
    val v = Seq(("a", "solo", "{}"), ("b", "big", "{}"), ("c", "big", "{}"))
      .toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "other", "b", "c", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    GraphFrame(v, e).save(dir)
    val mg = MutableGraph(spark, GraphFrame.load(spark, dir))
    mg.deleteVertex("a") // empties label 'solo' AND removes incident e1 (label 'link')
    val touched = mg.saveIncremental(dir)
    assert(touched.contains((Set("solo"), Set("link"))), touched.toString)
    assert(!new java.io.File(s"$dir/vertices/label=solo").exists())
    assert(!new java.io.File(s"$dir/edges/label=link").exists())
    val g1 = GraphFrame.load(spark, dir)
    assert(g1.vertices.count() == 2 && g1.edges.count() == 1)
    assert(g1.edges.head().getAs[String]("gid") == "e2")
  }

  test("saveIncremental without a prior save falls back to a full save") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incsave-new").toString + "/g"
    val mg = MutableGraph.empty(spark)
    mg.addVertex("x", "node", "{}")
    assert(mg.saveIncremental(dir).isEmpty) // None = full save ran
    assert(GraphFrame.load(spark, dir).vertices.count() == 1)
  }

  test("Catalog.upsertGraph keeps a physical field index correct over incremental saves") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-incsave-idx").toString
    val cat = new graft.model.Catalog(spark, root)
    val v = (0 until 200).map(i => (s"v$i", if (i % 2 == 0) "P" else "Qq", s"""{"name":"n${i % 9}"}"""))
      .toDF("gid", "label", "data")
    val e = Seq.empty[(String, String, String, String, String)]
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("ig", GraphFrame(v, e))
    cat.addIndex("ig", "P", "name")
    val mg = MutableGraph(spark, cat.graph("ig"))
    mg.addVertex("v998", "P", """{"name":"n3"}""")
    mg.addVertex("v0", "P", """{"name":"nX"}""") // overwrite: leaves n-group 0
    cat.upsertGraph("ig", mg)
    // indexed query over the RE-BUILT index answers the merged truth
    val q = Q.V().hasLabel("P").has(P.eq_("name", "n3"))
    val got = Traversal.run(spark, cat.graph("ig"), q)
      .select("gid").collect().map(_.getString(0)).sorted.toSeq
    val want = ((0 until 200).filter(i => i % 2 == 0 && i % 9 == 3).map(i => s"v$i")
      :+ "v998").sorted
    assert(got == want, s"got $got")
    // the plan still runs through the pushed index column
    val plan = Traversal.run(spark, cat.graph("ig"), q)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__idx_name"), plan)
    // and the mg instance survived the relayout repoint
    assert(n(mg.graph, Q.V().hasLabel("P")) == 101)
  }

  test("saveIncremental handles labels Spark escapes in partition paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ':' '%' '#' are all escaped by Spark on write (label=a%3Ab...); the
    // swap protocol must probe the ESCAPED directory or the staged rows
    // are silently discarded (and ':' even throws in a raw Hadoop Path)
    val punct = "a:b%c#d"
    val dir = java.nio.file.Files.createTempDirectory("graft-incsave-esc").toString
    val v = Seq(("v1", punct, """{"n":1}"""), ("v2", "plain", "{}"))
      .toDF("gid", "label", "data")
    val e = Seq(("e1", s"rel:$punct", "v1", "v2", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    GraphFrame(v, e).save(dir)
    val mg = MutableGraph(spark, GraphFrame.load(spark, dir))
    mg.addVertex("v3", punct, """{"n":3}""")
    mg.addVertex("v1", punct, """{"n":-1}""") // overwrite within the escaped label
    mg.addEdge("v3", "v2", s"rel:$punct", "{}", gid = "e2")
    val touched = mg.saveIncremental(dir)
    assert(touched.contains((Set(punct), Set(s"rel:$punct"))), touched.toString)
    val g1 = GraphFrame.load(spark, dir)
    assert(g1.vertices.filter(col("label") === punct).count() == 2)
    assert(g1.vertices.filter(col("gid") === "v1").head().getAs[String]("data") == """{"n":-1}""")
    assert(g1.edges.filter(col("label") === s"rel:$punct").count() == 2)
    assert(g1.vertices.count() == 3)
  }

  test("Catalog index relayout handles labels Spark escapes in partition paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val punct = "ty:pe"
    val root = java.nio.file.Files.createTempDirectory("graft-idx-esc").toString
    val cat = new graft.model.Catalog(spark, root)
    val v = (0 until 50).map(i => (s"v$i", punct, s"""{"name":"n${i % 5}"}"""))
      .toDF("gid", "label", "data")
    val e = Seq.empty[(String, String, String, String, String)]
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("eg", GraphFrame(v, e))
    cat.addIndex("eg", punct, "name")
    val q = Q.V().hasLabel(punct).has(P.eq_("name", "n3"))
    val run = Traversal.run(spark, cat.graph("eg"), q)
    assert(run.count() == 10)
    // the index column was really materialized and serves the predicate
    assert(run.queryExecution.executedPlan.toString.contains("__idx_name"))
  }

  test("crash injection: an interrupted swap rolls back on load, intact either way") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val v = (0 until 40).map(i => (s"v$i", s"L${i % 2}", s"""{"n":$i}"""))
      .toDF("gid", "label", "data")
    val e = Seq(("e1", "z", "v0", "v1", "{}")).toDF("gid", "label", "from", "to", "data")
    GraphFrame(v, e).save(dir)
    def mv(a: String, b: String): Unit = {
      val p = java.nio.file.Paths.get(b)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.move(java.nio.file.Paths.get(a), p)
    }
    def cp(a: String, b: String): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(b))
      for (f <- new java.io.File(a).listFiles())
        java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(b, f.getName))
    }
    // crash state A — stage written, live intact (killed before the first
    // rename): staged rows are uncommitted and must be discarded
    cp(s"$dir/vertices/label=L1", s"$dir/.delta-stage-vertices/label=L0")
    val gA = GraphFrame.load(spark, dir)
    assert(gA.vertices.count() == 40)
    assert(!new java.io.File(s"$dir/.delta-stage-vertices").exists())
    // crash state B — live moved to backup, staged not yet swapped (killed
    // between the two renames): the backup is the only copy and must
    // restore; the staged rows must be discarded
    cp(s"$dir/vertices/label=L1", s"$dir/.delta-stage-vertices/label=L0")
    mv(s"$dir/vertices/label=L0", s"$dir/.delta-stage-vertices/label=L0.__old")
    val gB = GraphFrame.load(spark, dir)
    assert(gB.vertices.count() == 40)
    assert(gB.vertices.filter(col("label") === "L0").count() == 20)
    assert(!new java.io.File(s"$dir/.delta-stage-vertices").exists())
    // same mid-swap crash in the index relayout's stage layout
    mv(s"$dir/vertices/label=L0", s"$dir/.reindex/label=L0.__old")
    val gC = GraphFrame.load(spark, dir)
    assert(gC.vertices.filter(col("label") === "L0").count() == 20)
    assert(!new java.io.File(s"$dir/.reindex").exists())
    // and the graph stays fully usable for a follow-up incremental save
    val mg = MutableGraph(spark, GraphFrame.load(spark, dir))
    mg.addVertex("v100", "L0", """{"n":100}""")
    mg.saveIncremental(dir)
    assert(GraphFrame.load(spark, dir).vertices.count() == 41)
  }

  test("a no-op saveIncremental keeps a declared topology sidecar") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-incsave-topo").toString
    val v = Seq(("a", "x", "{}"), ("b", "y", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "z", "a", "b", "{}")).toDF("gid", "label", "from", "to", "data")
    GraphFrame(v, e, topology = Some(Seq(graft.model.EdgeType("x", "z", "y")))).save(dir)
    val mg = MutableGraph(spark, GraphFrame.load(spark, dir))
    assert(mg.saveIncremental(dir).contains((Set.empty[String], Set.empty[String])))
    val g1 = GraphFrame.load(spark, dir)
    assert(g1.topology.contains(Seq(graft.model.EdgeType("x", "z", "y"))))
  }
}
