package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.{GraphFrame, MutableGraph}
import graft.compiler.Traversal

/** Ports of the remaining reference conformance modules: ot_transform.py
  * (unwind + term agg), ot_struct.py (nested struct property round-trips),
  * ot_keycheck.py (gid prefix-subkey adjacency isolation). */
class ConformanceExtraSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val swapi: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
  }
  private val mapper = new ObjectMapper()
  def Q = Query()

  test("unwind feeds downstream aggregation (ot_transform.test_count)") {
    val rows = Traversal.run(spark, swapi,
        Q.V().hasLabel("Planet").unwind("terrain").aggregate(Agg.Term("t", "terrain", 0)))
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    val allowed = Set("rainforests", "desert", "mountains", "jungle", "grasslands")
    assert(rows.length == 5)
    assert(rows.forall { case (k, v) => allowed.contains(k) && v == 1.0 })
  }

  test("skip compiles to a native offset — one declarative plan, no RDD boundary") {
    val total = Traversal.run(spark, swapi, Q.V()).count()
    val skipped = Traversal.run(spark, swapi, Q.V().skip(3))
    val p = skipped.queryExecution.executedPlan.toString
    assert(!p.contains("ExistingRDD") && !p.contains("SerializeFromObject"),
      s"skip must stay in one declarative plan (the old RDD count-then-drop scanned twice):\n$p")
    assert(skipped.count() == total - 3)
    // range = offset + limit folded into the same plan
    assert(Traversal.run(spark, swapi, Q.V().range(2, 7)).count() == 5)
  }

  test("nested struct properties round-trip (ot_struct)") {
    val mg = MutableGraph.empty(spark)
    mg.addVertex("vertex1", "person", """{"field1":{"test":1,"value":false}}""")
    mg.addVertex("vertex2", "person", """{"field1":{"test":2,"value":true}}""")
    mg.addEdge("vertex1", "vertex2", "friend", """{"edgevals":{"weight":3.14,"count":15}}""", gid = "e1")
    val v = mapper.readTree(mg.getVertex("vertex1").get.getAs[String]("data"))
    assert(v.get("field1").get("test").asInt() == 1 && !v.get("field1").get("value").asBoolean())
    val outE = Traversal.run(spark, mg.graph, Q.V("vertex1").outE()).collect()(0)
    assert(mapper.readTree(outE.getAs[String]("data")).get("edgevals").get("weight").asDouble() == 3.14)
    val inE = Traversal.run(spark, mg.graph, Q.V("vertex2").inE()).collect()(0)
    assert(mapper.readTree(inE.getAs[String]("data")).get("edgevals").get("count").asInt() == 15)
    // deeply nested arrays-of-objects survive and are queryable
    val mg2 = MutableGraph.empty(spark)
    mg2.addVertex("vertex1", "person",
      """{"field1":{"nested":{"test":1,"array":[{"value":{"entry":1}}]}}}""")
    val d = mapper.readTree(mg2.getVertex("vertex1").get.getAs[String]("data"))
    assert(d.get("field1").get("nested").get("array").get(0).get("value").get("entry").asInt() == 1)
    assert(Traversal.run(spark, mg2.graph,
      Q.V().has(P.eq_("field1.nested.test", 1))).count() == 1)
  }

  test("set() fields do not leak onto hopped-to elements") {
    // reference: ValueSet mutates the traveler's THEN-current element,
    // which out() replaces wholesale (engine/core/processors.go:812-830)
    val out = Traversal.run(spark, swapi,
      Q.V("Character:1").set("flag", GValue.GString("x")).out("homeworld")).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.getAs[String]("data").contains("\"flag\"")))
    // but mark-carried fields survive the hop
    val marked = Traversal.run(spark, swapi,
      Q.V("Character:1").set("flag", GValue.GString("x")).as("a").out("homeworld")
        .render(GValue.GString("$a.flag"))).collect()
    assert(marked.forall(_.getString(0) == "\"x\""))
    // set(field, null): the key EXISTS and overrides a stored value
    assert(Traversal.run(spark, swapi,
      Q.V("Character:1").set("nothing", GValue.GNull).hasKey("nothing")).count() == 1)
    assert(Traversal.run(spark, swapi,
      Q.V("Character:1").set("name", GValue.GNull).has(P.eq_("name", "Luke Skywalker"))).count() == 0)
  }

  test("gid prefixes do not bleed across adjacency (ot_keycheck.test_subkey)") {
    val mg = MutableGraph.empty(spark)
    mg.addVertex("Work", "Thing"); mg.addVertex("Workflow", "Thing")
    mg.addVertex("Other", "Thing"); mg.addVertex("OtherGuy", "Thing")
    mg.addEdge("Work", "Other", "edge"); mg.addEdge("Workflow", "OtherGuy", "edge")
    val g = mg.graph
    assert(Traversal.run(spark, g, Q.V("Work").out()).count() == 1)
    assert(Traversal.run(spark, g, Q.V("Work").outE()).count() == 1)
    assert(Traversal.run(spark, g, Q.V("Other").inE()).count() == 1)
  }
}
