package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GJson

/** The variant-native extraction expressions must agree with the Jackson
  * reference implementations cell-for-cell: unwind and the type
  * aggregation switched from interpreted UDFs to codegen'd
  * parse_json/variant_get/schema_of_variant plans, and this suite is the
  * contract that the switch changed nothing observable. */
class GJsonParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val docs = Seq(
    """{"a":[1,2,3]}""",
    """{"a":["x","y"],"b":{"c":[true,false,null]}}""",
    """{"a":[{"k":1},[2,3],"s",4.5,-7,1e3]}""",
    """{"a":"not an array"}""",
    """{"a":{"nested":"obj"}}""",
    """{"a":[]}""",
    """{"a":null}""",
    """{"b":1}""",
    """{}""",
    """{"a":[999999999999,0.001,""]}""",
    "",
    null
  )

  private def df = {
    import spark.implicits._
    docs.toDF("data")
  }

  /** The native variant form of array-element extraction — measured
    * slower than the shipped Jackson UDF (see GJson.json_array_elems),
    * kept HERE so the two forms' semantics stay pinned equal and the
    * production plan can flip back if variant serialization improves. */
  private def variantArrayElems(data: org.apache.spark.sql.Column, path: String) =
    org.apache.spark.sql.functions.transform(
      org.apache.spark.sql.functions.try_variant_get(
        org.apache.spark.sql.functions.try_parse_json(data),
        if (path.isEmpty) "$" else "$." + path, "array<variant>"),
      e => org.apache.spark.sql.functions.to_json(e))

  test("json_array_elems (Jackson) == native variant plan on every document") {
    for (path <- Seq("a", "b.c", "missing.deep")) {
      val rows = df.select(
        variantArrayElems(col("data"), path).as("native"),
        GJson.json_array_elems(col("data"), path).as("jackson")).collect()
      for ((r, d) <- rows.zip(docs)) {
        val n = Option(r.getSeq[String](0)).map(_.toList)
        val j = Option(r.getSeq[String](1)).map(_.toList)
        // exact parity, including a JSON null element as the text "null"
        assert(n == j, s"path=$path doc=$d native=$n jackson=$j")
      }
    }
  }

  test("json_type: native variant plan == Jackson on every document and type") {
    val typed = Seq(
      """{"f":"str"}""", """{"f":1}""", """{"f":-2.5}""", """{"f":1e300}""",
      """{"f":true}""", """{"f":false}""", """{"f":{"x":1}}""", """{"f":[1]}""",
      """{"f":null}""", """{"g":1}""", """{}""", null)
    import spark.implicits._
    val t = typed.toDF("data")
    val rows = t.select(
      GJson.json_type(col("data"), "f").as("native"),
      GJson.json_type_dyn(col("data"), lit("f")).as("jackson")).collect()
    for ((r, d) <- rows.zip(typed))
      assert(r.getString(0) == r.getString(1), s"doc=$d native=${r.getString(0)} jackson=${r.getString(1)}")
  }

  test("json_type: nested path and empty path") {
    import spark.implicits._
    val t = Seq("""{"a":{"b":[1]}}""").toDF("data")
    val r = t.select(
      GJson.json_type(col("data"), "a.b").as("n1"),
      GJson.json_type(col("data"), "").as("n2")).collect()(0)
    assert(r.getString(0) == "ARRAY")
    assert(r.getString(1) == "MAP") // root document
  }

  test("malformed documents degrade gracefully (NULL / UNKNOWN, no throw)") {
    import spark.implicits._
    val t = Seq("not json at all", "{broken", "[1,").toDF("data")
    val rows = t.select(
      GJson.json_array_elems(col("data"), "a").as("el"),
      GJson.json_type(col("data"), "a").as("ty")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0))
      assert(r.getString(1) == "UNKNOWN")
    }
  }

  test("the type-inspection path is UDF-free (stays inside codegen)") {
    val plan = df.select(GJson.json_type(col("data"), "a"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }
}
