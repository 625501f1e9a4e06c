package graft.gripql

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Protojson-shaped GripQL query reader, so queries captured from the
  * reference's clients replay verbatim (reference: gripql/query.go:280-320
  * protojson marshaling, gripql/python/gripql/query.py statement dicts,
  * gripql/gripql.proto:25-67 GraphStatement).
  *
  * Accepts both the python client's camelCase keys ("outE", "hasLabel")
  * and proto snake_case ("out_e", "has_label"). Input is either a bare
  * statement array or {"graph": ..., "query": [...]}.
  */
object Json {
  private val mapper = new ObjectMapper()

  def parseQuery(json: String): Query = {
    val root = mapper.readTree(json)
    val arr = if (root.isArray) root else root.get("query")
    require(arr != null && arr.isArray, "expected a statement array or {query: [...]}")
    Query(arr.elements().asScala.map(parseStatement).toVector)
  }

  private def strings(n: JsonNode): Seq[String] =
    if (n == null || n.isNull) Nil
    else if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
    else Seq(n.asText())

  private def field(n: JsonNode, names: String*): Option[JsonNode] =
    names.flatMap(k => Option(n.get(k))).headOption

  def parseStatement(n: JsonNode): Stmt = {
    require(n.isObject && n.size() == 1, s"statement must have exactly one key: $n")
    val key = n.fieldNames().next()
    val v = n.get(key)
    key match {
      case "v" => Stmt.V(strings(v))
      case "e" => Stmt.E(strings(v))
      case "in" => Stmt.In(strings(v))
      case "out" => Stmt.Out(strings(v))
      case "both" => Stmt.Both(strings(v))
      case "inE" | "in_e" => Stmt.InE(strings(v))
      case "outE" | "out_e" => Stmt.OutE(strings(v))
      case "bothE" | "both_e" => Stmt.BothE(strings(v))
      case "inNull" | "in_null" => Stmt.In(strings(v), emitNull = true)
      case "outNull" | "out_null" => Stmt.Out(strings(v), emitNull = true)
      case "inENull" | "in_e_null" => Stmt.InE(strings(v), emitNull = true)
      case "outENull" | "out_e_null" => Stmt.OutE(strings(v), emitNull = true)
      case "has" => Stmt.Has(parseHas(v))
      case "hasLabel" | "has_label" => Stmt.HasLabel(strings(v))
      case "hasId" | "has_id" => Stmt.HasId(strings(v))
      case "hasKey" | "has_key" => Stmt.HasKey(strings(v))
      case "fields" => Stmt.Fields(strings(v))
      case "as" => Stmt.As(v.asText())
      case "select" =>
        val marks = strings(field(v, "marks").getOrElse(v))
        if (marks.size == 1) Stmt.SelectOne(marks.head) else Stmt.SelectMany(marks)
      case "limit" => Stmt.Limit(v.asLong())
      case "skip" => Stmt.Skip(v.asLong())
      case "range" => Stmt.Range(
        field(v, "start").map(_.asLong()).getOrElse(0L),
        field(v, "stop").map(_.asLong()).getOrElse(-1L))
      case "count" => Stmt.Count()
      case "distinct" => Stmt.Distinct(strings(v))
      case "set" => Stmt.SetField(v.get("key").asText(), parseValue(v.get("value")))
      case "increment" => Stmt.Increment(v.get("key").asText(),
        field(v, "value").map(_.asLong()).getOrElse(1L))
      case "jump" => Stmt.Jump(v.get("mark").asText(),
        field(v, "expression").filterNot(_.isNull).map(parseHas),
        field(v, "emit").exists(_.asBoolean()))
      case "mark" => Stmt.Mark(v.asText())
      case "render" => Stmt.Render(parseValue(v))
      case "path" => Stmt.Path()
      case "unwind" => Stmt.Unwind(v.asText())
      case "aggregate" =>
        val aggs = field(v, "aggregations").getOrElse(v)
        Stmt.Aggregate(aggs.elements().asScala.map(parseAggregate).toSeq)
      case other => throw new IllegalArgumentException(s"unknown statement type: $other")
    }
  }

  def parseHas(n: JsonNode): HasExpr = {
    require(n.isObject, s"has expression must be an object: $n")
    if (n.has("and")) HasExpr.And(exprList(n.get("and")))
    else if (n.has("or")) HasExpr.Or(exprList(n.get("or")))
    else if (n.has("not")) HasExpr.Not(parseHas(n.get("not")))
    else if (n.has("condition")) {
      val c = n.get("condition")
      val op = c.get("condition").asText() match {
        case "EQ" => CondOp.EQ
        case "NEQ" => CondOp.NEQ
        case "GT" => CondOp.GT
        case "GTE" => CondOp.GTE
        case "LT" => CondOp.LT
        case "LTE" => CondOp.LTE
        case "INSIDE" => CondOp.INSIDE
        case "OUTSIDE" => CondOp.OUTSIDE
        case "BETWEEN" => CondOp.BETWEEN
        case "WITHIN" => CondOp.WITHIN
        case "WITHOUT" => CondOp.WITHOUT
        case "CONTAINS" => CondOp.CONTAINS
        case o => throw new IllegalArgumentException(s"unknown condition: $o")
      }
      HasExpr.Cond(c.get("key").asText(), parseValue(c.get("value")), op)
    } else throw new IllegalArgumentException(s"unknown has expression: $n")
  }

  private def exprList(n: JsonNode): Seq[HasExpr] =
    field(n, "expressions").getOrElse(n).elements().asScala.map(parseHas).toSeq

  def parseValue(n: JsonNode): GValue =
    if (n == null || n.isNull) GValue.GNull
    else if (n.isTextual) GValue.GString(n.asText())
    else if (n.isIntegralNumber) GValue.GInt(n.asLong())
    else if (n.isNumber) GValue.num(n.asDouble()) // 1000.0 == 1000 on the wire
    else if (n.isBoolean) GValue.GBool(n.asBoolean())
    else if (n.isArray) GValue.GArray(n.elements().asScala.map(parseValue).toSeq)
    else GValue.GObj(n.fields().asScala.map(e => e.getKey -> parseValue(e.getValue)).toSeq)

  def parseAggregate(n: JsonNode): Agg = {
    val name = n.get("name").asText()
    if (n.has("term")) {
      val t = n.get("term")
      Agg.Term(name, t.get("field").asText(), field(t, "size").map(_.asInt()).getOrElse(0))
    } else if (n.has("histogram")) {
      val h = n.get("histogram")
      Agg.Histogram(name, h.get("field").asText(), h.get("interval").asDouble())
    } else if (n.has("percentile")) {
      val p = n.get("percentile")
      Agg.Percentile(name, p.get("field").asText(),
        p.get("percents").elements().asScala.map(_.asDouble()).toSeq)
    } else if (n.has("field")) {
      Agg.FieldAgg(name, n.get("field").get("field").asText())
    } else if (n.has("type")) {
      Agg.TypeAgg(name, n.get("type").get("field").asText())
    } else if (n.has("count")) {
      Agg.CountAgg(name)
    } else throw new IllegalArgumentException(s"unknown aggregation: $n")
  }
}
