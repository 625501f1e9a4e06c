package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ObjectNode, JsonNodeFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import scala.jdk.CollectionConverters._

/** JSON document surgery for the schemaless `data` column.
  *
  * The reference's property bag is arbitrary JSON (protobuf Struct); a few
  * operators mutate or reshape it in ways Spark's built-in JSON functions
  * can't express (set nested field, include/exclude projection, typed array
  * explode) — reference: jsonpath/jsonpath.go:169-355,
  * engine/core/processors.go:464-503,812-853.
  *
  * These run OFF the hot path (projection/transform steps, not scans or
  * joins); predicates and traversals stay on codegen'd built-ins.
  */
object GJson extends Serializable {
  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val nf = JsonNodeFactory.instance

  private def parse(s: String): JsonNode =
    if (s == null || s.isEmpty) nf.objectNode() else mapper.readTree(s)

  private def navParent(root: JsonNode, path: Seq[String], create: Boolean): JsonNode = {
    var node = root
    for (p <- path.dropRight(1)) {
      val next = node match {
        case o: ObjectNode =>
          if (o.get(p) == null || !o.get(p).isObject) {
            if (!create) return null
            val n = nf.objectNode(); o.set[JsonNode](p, n); n
          } else o.get(p)
        case _ => return null
      }
      node = next
    }
    node
  }

  /** Set a (possibly nested, dot-separated) field to a JSON value. */
  def setField(data: String, path: String, valueJson: String): String = {
    val root = parse(data)
    val parts = path.split('.').toSeq
    val parent = navParent(root, parts, create = true)
    parent match {
      case o: ObjectNode => o.set[JsonNode](parts.last, mapper.readTree(valueJson))
      case _ =>
    }
    mapper.writeValueAsString(root)
  }

  /** Elements of an array field, each as JSON text; null when the field is
    * missing, not an array (unwind's null-emit case), or the document is
    * not parseable JSON (matching the variant plan's try_parse_json). */
  def arrayElems(data: String, path: String): Array[String] = {
    if (data == null) return null
    var node = try parse(data) catch { case _: Exception => return null }
    for (p <- path.split('.')) {
      if (node == null || !node.isObject) return null
      node = node.get(p)
    }
    if (node == null || !node.isArray) return null
    node.elements().asScala.map(mapper.writeValueAsString).toArray
  }

  /** Keep only `includes` paths (dot-nested allowed) minus `excludes`
    * (reference: jsonpath/jsonpath.go:254-355). Empty includes = keep all. */
  def selectFields(data: String, includes: Array[String], excludes: Array[String]): String = {
    val root = parse(data)
    if (!root.isObject) return data
    val out: JsonNode =
      if (includes.isEmpty) root.deepCopy[JsonNode]()
      else {
        val o = nf.objectNode()
        for (inc <- includes) {
          val parts = inc.split('.').toSeq
          var src: JsonNode = root
          var ok = true
          for (p <- parts if ok) {
            src = if (src != null && src.isObject) src.get(p) else null
            if (src == null) ok = false
          }
          if (ok) {
            val parent = navParent(o, parts, create = true).asInstanceOf[ObjectNode]
            parent.set[JsonNode](parts.last, src.deepCopy[JsonNode]())
          }
        }
        o
      }
    for (exc <- excludes) {
      val parts = exc.split('.').toSeq
      val parent = navParent(out, parts, create = false)
      parent match {
        case o: ObjectNode => o.remove(parts.last)
        case _ =>
      }
    }
    mapper.writeValueAsString(out)
  }

  /** Runtime type of a field — the reference's FieldType enum
    * (reference: gripql/gripql.proto:282-289). */
  def typeName(data: String, path: String): String = {
    if (data == null) return "UNKNOWN"
    var node = parse(data)
    for (p <- path.split('.') if p.nonEmpty) {
      if (node == null || !node.isObject) return "UNKNOWN"
      node = node.get(p)
    }
    if (node == null) "UNKNOWN"
    else if (node.isTextual) "STRING"
    else if (node.isNumber) "NUMERIC"
    else if (node.isBoolean) "BOOL"
    else if (node.isObject) "MAP"
    else if (node.isArray) "ARRAY"
    else "UNKNOWN"
  }

  /** Merge pending typed-loop-state vars (key "ns\u0000path" → JSON
    * fragment) for one namespace into a data document. Called ONCE at plan
    * output / mark selection — never inside the iterated loop plan. */
  def mergeVars(data: String, vars: Map[String, String], ns: String): String = {
    if (vars == null || vars.isEmpty) return if (data == null) "{}" else data
    val prefix = ns + "\u0000"
    var out = if (data == null) "{}" else data
    // deterministic application order
    for ((k, v) <- vars.toSeq.sortBy(_._1) if k.startsWith(prefix)) {
      val path = k.substring(prefix.length)
      if (path.nonEmpty && v != null) out = setField(out, path, v)
    }
    out
  }

  // ---- Column wrappers ----
  // Document REBUILDS (set/select/merge) stay on Jackson: they must
  // preserve the original field layout of untouched keys, which the
  // variant binary form (sorted field dictionary) cannot round-trip.
  // TYPE inspection with a path known at plan time compiles to native
  // variant expressions (schema_of_variant is codegen'd, no per-row
  // Jackson parse). Array-element EXTRACTION measured faster on the
  // Jackson UDF — see json_array_elems below for the numbers.
  private val setFieldUdf = udf(setField _)
  private val arrayElemsUdf = udf(arrayElems _)
  private val selectFieldsUdf = udf(selectFields _)
  private val typeNameUdf = udf(typeName _)
  private val mergeVarsUdf = udf(mergeVars _)

  import org.apache.spark.sql.functions.{lit, when, transform, to_json,
    try_parse_json, try_variant_get, schema_of_variant}

  private def vPath(path: String): String =
    if (path.isEmpty) "$" else "$." + path

  def json_set(data: Column, path: Column, valueJson: Column): Column = setFieldUdf(data, path, valueJson)

  /** Elements of an array field as JSON text: missing field, non-array
    * value, or unparseable document all yield NULL. Deliberately the
    * Jackson UDF, not the native variant plan
    * (`transform(try_variant_get(parse_json(..)), to_json)`): both were
    * benchmarked at sf0.1 and the variant form measured ~1.5× SLOWER
    * (q36 0.65 s vs 0.39 s, q49 2.66 s vs 1.91 s, same box) — the
    * per-element `to_json(variant)` re-serialization costs more than one
    * Jackson parse+slice per row, and codegen doesn't recover it.
    * GJsonParitySpec keeps the two forms' semantics pinned equal so the
    * plan can flip back if variant serialization improves. */
  def json_array_elems(data: Column, path: String): Column =
    arrayElemsUdf(data, lit(path))

  /** Dynamic-path variant for callers whose path is a per-row value
    * (schema sampling) — variant_get demands a constant path, so this
    * stays on the Jackson UDF. */
  def json_array_elems_dyn(data: Column, path: Column): Column = arrayElemsUdf(data, path)

  def json_select(data: Column, includes: Column, excludes: Column): Column = selectFieldsUdf(data, includes, excludes)

  /** Runtime FieldType of a field, natively (reference:
    * gripql/gripql.proto:282-289): variant schema string folded onto the
    * reference's five-value enum. JSON null ("VOID"), absent field (NULL
    * schema) and malformed documents are all UNKNOWN like [[typeName]]. */
  def json_type(data: Column, path: String): Column = {
    val sch = schema_of_variant(
      try_variant_get(try_parse_json(data), vPath(path), "variant"))
    when(sch.isNull, "UNKNOWN")
      .when(sch === "STRING", "STRING")
      .when(sch === "BOOLEAN", "BOOL")
      .when(sch.isin("BIGINT", "DOUBLE", "FLOAT") || sch.startsWith("DECIMAL"), "NUMERIC")
      .when(sch.startsWith("OBJECT"), "MAP")
      .when(sch.startsWith("ARRAY"), "ARRAY")
      .otherwise(lit("UNKNOWN"))
  }

  def json_type_dyn(data: Column, path: Column): Column = typeNameUdf(data, path)

  def json_merge_vars(data: Column, vars: Column, ns: Column): Column =
    mergeVarsUdf(data, org.apache.spark.sql.functions.transform_values(vars,
      (_, v) => v.getField("json")), ns)
}
