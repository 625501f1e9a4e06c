package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.{GraphFrame, Jobs, Catalog, Rdf}
import graft.compiler.Traversal

/** Job spool/resume (pipeline extension), catalog + index APIs, RDF
  * ingest. */
class JobsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
  }
  def Q = Query()

  test("submit spools travelers; resume extends the pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jobs").toString
    val jobId = Jobs.submit(spark, g, Q.V().hasLabel("Character"), dir)
    assert(Jobs.listJobs(dir) == Seq(jobId))
    // resume with .out("homeworld").count() — must equal the direct query
    val resumed = Jobs.resume(spark, g, dir, jobId, Q.out("homeworld").count())
      .collect()(0).getLong(0)
    val direct = Traversal.run(spark, g, Q.V().hasLabel("Character").out("homeworld").count())
      .collect()(0).getLong(0)
    assert(resumed == direct && resumed > 0)
  }

  test("resume preserves marks across the spool boundary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jobs2").toString
    val jobId = Jobs.submit(spark, g, Q.V().hasLabel("Film").as("f").out("characters"), dir)
    val resumed = Jobs.resume(spark, g, dir, jobId, Q.select("f"))
      .select("gid").collect().map(_.getString(0))
    assert(resumed.nonEmpty && resumed.forall(_.startsWith("Film:")))
  }

  test("searchJobs prefix-matches per-statement checksums (>1-stmt floor)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jobs3").toString
    val q = Q.V().hasLabel("Planet")
    val jobId = Jobs.submit(spark, g, q, dir)
    assert(Jobs.searchJobs(dir, q).contains(jobId))
    // a longer query sharing the job's statement prefix reuses the spool
    // (reference JobMatch, jobstorage/query_checksum.go:28-39)
    assert(Jobs.searchJobs(dir, Q.V().hasLabel("Planet").out().count()).contains(jobId))
    assert(Jobs.searchJobs(dir, Q.V().hasLabel("Species")).isEmpty)
    // shorter than the job: not resumable from this spool
    assert(Jobs.searchJobs(dir, Q.V()).isEmpty)
    // 1-statement jobs are below the reference's match floor
    val jobV = Jobs.submit(spark, g, Q.V(), dir)
    assert(!Jobs.searchJobs(dir, Q.V().hasLabel("Planet")).contains(jobV))
  }

  test("searchJobs: legacy spool (no stepChecksums) exact-matches by whole-query checksum") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jobs4").toString
    val q = Q.V().hasLabel("Planet")
    val jobId = Jobs.submit(spark, g, q, dir)
    // rewrite meta.json as a pre-stepChecksums spool would have written it
    val metaPath = java.nio.file.Paths.get(s"$dir/$jobId/meta.json")
    val legacy = java.nio.file.Files.readString(metaPath)
      .replaceAll(""""stepChecksums":\[[^\]]*\],""", "")
    java.nio.file.Files.writeString(metaPath, legacy)
    assert(!legacy.contains("stepChecksums"))
    // exact query still matches via the whole-query checksum...
    assert(Jobs.searchJobs(dir, q).contains(jobId))
    // ...but prefix extension cannot (no per-statement info to compare)
    assert(!Jobs.searchJobs(dir, Q.V().hasLabel("Planet").out().count()).contains(jobId))
    assert(Jobs.searchJobs(dir, Q.V().hasLabel("Species")).isEmpty)
  }

  test("catalog: create/list/drop graphs + index metadata (ot_index shape)") {
    val root = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val cat = new Catalog(spark, root)
    cat.createGraph("swapi", g)
    assert(cat.listGraphs() == Seq("swapi"))
    assert(cat.listLabels("swapi")._1.contains("Character"))
    cat.addIndex("swapi", "Character", "eye_color")
    cat.addIndex("swapi", "Planet", "climate")
    assert(cat.listIndices("swapi") == Seq(("Character", "eye_color"), ("Planet", "climate")))
    cat.deleteIndex("swapi", "Planet", "climate")
    assert(cat.listIndices("swapi") == Seq(("Character", "eye_color")))
    cat.dropGraph("swapi")
    assert(cat.listGraphs().isEmpty)
  }

  test("rdf: N-Triples load maps types to labels, literals to data, IRIs to edges") {
    val nt =
      """<http://ex.org/alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Person> .
        |<http://ex.org/alice> <http://ex.org/name> "Alice" .
        |<http://ex.org/alice> <http://ex.org/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |<http://ex.org/alice> <http://ex.org/knows> <http://ex.org/bob> .
        |<http://ex.org/bob> <http://ex.org/name> "Bob"@en .
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft-rdf", ".nt")
    java.nio.file.Files.writeString(f, nt)
    val rg = Rdf.load(spark, f.toString)
    val verts = rg.vertices.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(verts("http://ex.org/alice")._1 == "http://ex.org/Person")
    assert(verts("http://ex.org/alice")._2.contains("\"Alice\""))
    assert(verts("http://ex.org/alice")._2.contains("\"30\"")) // typed literal kept
    assert(verts("http://ex.org/bob")._1 == "rdf:Resource")
    assert(verts("http://ex.org/bob")._2.contains("\"Bob\"")) // lang-tagged literal kept
    val edges = rg.edges.collect()
    assert(edges.length == 1 && edges(0).getAs[String]("label") == "http://ex.org/knows")
    // loaded graph is traversable
    assert(Traversal.run(spark, rg, Q.V("http://ex.org/alice").out("http://ex.org/knows")).count() == 1)
  }
}
