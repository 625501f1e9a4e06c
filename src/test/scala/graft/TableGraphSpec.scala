package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.TableGraph
import graft.model.TableGraph.{VertexMapping, EdgeMapping}
import graft.compiler.Traversal

/** Generic table→graph mapping (GRIPPER analogue): arbitrary DataFrames
  * become a traversable property graph. */
class TableGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("relational tables traverse as a graph through the generic mapping") {
    val people = Seq((1L, "ada", 36), (2L, "lin", 28)).toDF("id", "name", "age")
    val follows = Seq((10L, 1L, 2L, "2020")).toDF("fid", "src", "dst", "since")
    val g = TableGraph(
      Seq(VertexMapping(people, "p:", "id", "person")),
      Seq(EdgeMapping(follows, "f:", Seq("fid"), "follows", "p:", "src", "p:", "dst")))
    def Q = Query()
    assert(Traversal.run(spark, g, Q.V().count()).collect()(0).getLong(0) == 2)
    val out = Traversal.run(spark, g, Q.V("p:1").out("follows")).collect()
    assert(out.length == 1 && out(0).getAs[String]("gid") == "p:2")
    // predicates over the synthesized data JSON work (and shred to columns)
    assert(Traversal.run(spark, g,
      Q.V().hasLabel("person").has(P.gt("age", 30)).count()).collect()(0).getLong(0) == 1)
    // edge data keeps non-endpoint columns
    val e = Traversal.run(spark, g, Q.E()).collect()(0)
    assert(e.getAs[String]("data").contains("\"since\":\"2020\""))
  }
}
