package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.{GraphFrame, SchemaSampler}
import graft.compiler.{Traversal, Validate}

/** Schema sampling + catalog (ot_schema.py, ot_labels.py) and statement
  * validation errors (ot_error.py, compile.go type-states). */
class SchemaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
  }

  val vExpected = Seq("Character", "Film", "Planet", "Species", "Starship", "Vehicle")
  val eExpected = Seq("characters", "films", "homeworld", "people",
    "pilots", "planets", "residents", "species", "starships", "vehicles")

  test("listLabels returns vertex and edge labels (ot_labels)") {
    val (vl, el) = SchemaSampler.listLabels(g)
    assert(vl == vExpected)
    assert(el == eExpected)
  }

  test("sampled schema has one vertex per label, edge label triples (ot_schema)") {
    val schema = SchemaSampler.sampleSchema(spark, g)
    val vGids = schema.vertices.select("gid").collect().map(_.getString(0)).sorted.toSeq
    assert(vGids == vExpected)
    val eLabels = schema.edges.select("label").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(eLabels == eExpected)
    // sampled field types: Character.name is STRING
    val charData = schema.vertices.filter(org.apache.spark.sql.functions.col("gid") === "Character")
      .select("data").collect()(0).getString(0)
    assert(charData.contains(""""name":"STRING""""))
  }

  test("posted schema wins over sampling and feeds the planner topology") {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val cat = new graft.model.Catalog(spark, root)
    cat.createGraph("swapi", g)
    // no posted schema yet → sampled
    assert(cat.getSchema("swapi").vertices.count() == vExpected.size)
    // post the sampled schema explicitly (AddSchema, gripql.proto:483-488)
    cat.addSchema("swapi", SchemaSampler.sampleSchema(spark, g))
    val posted = cat.getSchema("swapi")
    assert(posted.vertices.select("gid").collect().map(_.getString(0)).sorted.toSeq == vExpected)
    // the schema'd graph now carries the EdgeType topology for hop pruning
    val loaded = cat.graph("swapi")
    assert(loaded.topology.isDefined)
    val topo = loaded.topology.get
    assert(topo.exists(t => t.from == "Character" && t.label == "homeworld" && t.to == "Planet"))
    // and the pruned compiler still answers correctly on the loaded graph
    assert(Traversal.run(spark, loaded, Query().V("Character:1").out("homeworld")).count() == 1)
    assert(Traversal.run(spark, loaded, Query().V("Film:1").out().out().out()).count() == 1814)
  }

  def Q = Query()

  test("invalid traversals error before execution (ot_error, compile.go type-states)") {
    def bad(q: Query): String =
      intercept[IllegalArgumentException](Traversal.run(spark, g, q)).getMessage
    assert(bad(Q.out()).nonEmpty)                       // no V()/E() start
    assert(bad(Q.V().count().out()).contains("out"))    // traversal after terminal
    assert(bad(Q.E().outE()).contains("vertex"))        // edge-state outE
    assert(bad(Q.V().hasLabel()).contains("labels"))    // empty label list
    assert(bad(Q.V().select("nope")).contains("unknown mark"))
    assert(bad(Q.V().as("a").aggregate(Agg.Term("x", "f"), Agg.CountAgg("x"))).contains("duplicate"))
    assert(bad(Q.V().as("_bad")).contains("invalid"))
  }

  test("validate accepts every conformance-shaped query") {
    Validate(Q.V().hasLabel("Character").as("a").out().select("a").stmts)
    Validate(Q.V().set("n", GValue.GInt(0)).mark("a").increment("n", 1)
      .has(P.lt("n", 4)).jump("a", None, emit = true).count().stmts)
    Validate(Q.E().out().outE().in().path().stmts)
  }
}
