package graft.gripql

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** JavaScript query strings — the reference CLI evaluates the query text
  * in a JS VM seeded with gripql.js builders, JSON-marshals the result,
  * and protojson-parses it into a GraphQuery (reference:
  * cmd/query/main.go:29-62, gripql/javascript/gripql.js). This is the
  * same pipeline with a small purpose-built JS interpreter: expressions,
  * variables, arithmetic/concatenation, and the gripql.js global builders
  * evaluate to exactly the JSON the reference's VM would produce, then
  * [[Json.parseQuery]] takes over. Driver-side only, config-sized input —
  * never on a hot path.
  *
  * Supported JS subset: `var`/`let`/`const`, assignment, `;`-separated
  * statements, `//` and C-style comments, string/number/bool/null/array/
  * object literals, `+ - * / %` (with JS string-concat `+`), `! && ||`,
  * comparisons, member access, indexing, and call chains. Functions,
  * loops, and prototypes are out of scope — query strings don't use them
  * (underscore.js is loaded by the reference CLI but unused by the query
  * idiom). */
object JsQuery {
  private val F = JsonNodeFactory.instance

  /** Boundary rejection: the input IS JavaScript but uses a construct
    * outside the interpreted subset (functions, loops, ...). Distinct
    * from a generic parse failure so callers with a non-JS fallback
    * (the CLI's fluent-text parser) can surface this message instead
    * of masking it with the fallback's own confusing error. */
  final class UnsupportedJsConstruct(msg: String) extends IllegalArgumentException(msg)

  /** Evaluate a JS query string to a gripql [[Query]]. The script's last
    * statement must evaluate to a traversal (a `{query: [...]}` object,
    * as V()/E()/query() chains produce). */
  def eval(script: String): Query = {
    val v = evalValue(script)
    require(v.isObject && v.get("query") != null && v.get("query").isArray,
      "js query must evaluate to a traversal (V()..., E()..., or query()...)")
    Json.parseQuery(v.toString)
  }

  /** Evaluate a JS script to its final value as a Jackson node. Lexer
    * slips on malformed input (truncated escapes, bad number forms) are
    * normalized to IllegalArgumentException so callers have one error
    * contract to catch. */
  def evalValue(script: String): JsonNode =
    try new Interp(script).program()
    catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"malformed js query (${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  // JSON.stringify semantics: integral doubles print without ".0" —
  // [[GValue.num]] is the single home of that rule, shared with the
  // builder and text-parser layers so the three front doors can't drift
  private def num(d: Double): JsonNode = GValue.num(d) match {
    case GValue.GInt(l) => F.numberNode(l)
    case _ => F.numberNode(d)
  }

  private def truthy(n: JsonNode): Boolean = n match {
    case null => false
    case _ if n.isNull => false
    case _ if n.isBoolean => n.asBoolean()
    case _ if n.isNumber => n.asDouble() != 0.0
    case _ if n.isTextual => n.asText().nonEmpty
    case _ => true
  }

  /** gripql.js `process()`: FALSY → [] (JS `if (!val) val = []`, so 0,
    * "", false, null all coerce — `within("x", 0)` means "within the
    * empty set"), scalar → [scalar], array → itself, anything else →
    * error (gripql/javascript/gripql.js:1-10). */
  private def process(args: Seq[JsonNode]): ArrayNode = {
    val out = F.arrayNode()
    args match {
      case Nil => ()
      case Seq(one) if !truthy(one) => ()
      case Seq(one) if one.isArray => one.forEach(e => { out.add(e); () })
      case Seq(one) if one.isTextual || one.isNumber => out.add(one); ()
      case Seq(other) =>
        throw new IllegalArgumentException(s"cannot process into an array: $other")
      case many => many.foreach(a => { out.add(a); () }) // varargs form
    }
    out
  }

  private def obj(kvs: (String, JsonNode)*): ObjectNode = {
    val o = F.objectNode()
    kvs.foreach { case (k, v) => o.set[JsonNode](k, v) }
    o
  }

  private def cond(op: String, args: Seq[JsonNode], listValue: Boolean): ObjectNode = {
    require(args.nonEmpty && args.head.isTextual, s"$op needs a string key")
    val v: JsonNode =
      if (listValue) process(args.drop(1))
      else args.lift(1).getOrElse(F.nullNode())
    obj("condition" -> obj("key" -> args.head, "value" -> v,
      "condition" -> F.textNode(op)))
  }

  /** The gripql.js global functions (predicates, aggregation builders,
    * traversal roots). */
  private def global(name: String, args: Seq[JsonNode]): JsonNode = name match {
    case "query" => obj("query" -> F.arrayNode())
    case "V" => builderCall(obj("query" -> F.arrayNode()), "V", args)
    case "E" => builderCall(obj("query" -> F.arrayNode()), "E", args)
    case "and_" | "and" =>
      obj("and" -> obj("expressions" -> { val a = F.arrayNode(); args.foreach(a.add); a }))
    case "or_" | "or" =>
      obj("or" -> obj("expressions" -> { val a = F.arrayNode(); args.foreach(a.add); a }))
    case "not_" | "not" =>
      require(args.nonEmpty, "not_ needs an expression"); obj("not" -> args.head)
    case "eq" => cond("EQ", args, listValue = false)
    case "neq" => cond("NEQ", args, listValue = false)
    case "gt" => cond("GT", args, listValue = false)
    case "gte" => cond("GTE", args, listValue = false)
    case "lt" => cond("LT", args, listValue = false)
    case "lte" => cond("LTE", args, listValue = false)
    case "contains" => cond("CONTAINS", args, listValue = false)
    case "inside" => cond("INSIDE", args, listValue = true)
    case "outside" => cond("OUTSIDE", args, listValue = true)
    case "between" => cond("BETWEEN", args, listValue = true)
    case "within" => cond("WITHIN", args, listValue = true)
    case "without" => cond("WITHOUT", args, listValue = true)
    case "term" =>
      require(args.length >= 2, "term(name, field, size?)")
      val t = obj("field" -> args(1))
      args.lift(2).filter(_.isNumber).foreach(s => t.set[JsonNode]("size", s))
      obj("name" -> args.head, "term" -> t)
    case "percentile" =>
      require(args.length >= 2, "percentile(name, field, percents?)")
      val ps = args.lift(2).map(p => process(Seq(p))).getOrElse {
        val a = F.arrayNode(); Seq(1, 5, 25, 50, 75, 95, 99).foreach(a.add); a
      }
      obj("name" -> args.head, "percentile" -> obj("field" -> args(1), "percents" -> ps))
    case "histogram" =>
      require(args.length >= 3, "histogram(name, field, interval)")
      obj("name" -> args.head,
        "histogram" -> obj("field" -> args(1), "interval" -> args(2)))
    // field/type/count exist in the python builder surface
    // (gripql/python/gripql/aggregations.py:31-49) but not gripql.js —
    // accepted here so python-spelled scripts run through the CLI too
    case "field" =>
      require(args.length >= 2, "field(name, field)")
      obj("name" -> args.head, "field" -> obj("field" -> args(1)))
    case "type" =>
      require(args.nonEmpty, "type(name, field?)")
      obj("name" -> args.head, "type" -> obj("field" -> args.lift(1).getOrElse(args.head)))
    case "count" =>
      require(args.length == 1, "count(name)")
      obj("name" -> args.head, "count" -> F.objectNode())
    case other =>
      throw new IllegalArgumentException(s"unknown function '$other' in js query")
  }

  /** gripql.js builder method dispatch: push the statement node, return
    * the (mutated) builder — aliasing works like the JS original. */
  private def builderCall(recv: ObjectNode, method: String, args: Seq[JsonNode]): ObjectNode = {
    val q = recv.get("query").asInstanceOf[ArrayNode]
    def push(kv: (String, JsonNode)): ObjectNode = { q.add(obj(kv)); recv }
    def arg(i: Int): JsonNode = args.lift(i).getOrElse(F.nullNode())
    method match {
      case "V" => push("v" -> process(args))
      case "E" => push("e" -> process(args))
      case "out" => push("out" -> process(args))
      case "outNull" => push("outNull" -> process(args))
      case "in_" | "in" => push("in" -> process(args))
      case "inNull" => push("inNull" -> process(args))
      case "both" => push("both" -> process(args))
      case "outV" => push("outV" -> process(args))
      case "inV" => push("inV" -> process(args))
      case "bothV" => push("bothV" -> process(args))
      case "outE" => push("outE" -> process(args))
      case "outENull" => push("outENull" -> process(args))
      case "inE" => push("inE" -> process(args))
      case "inENull" => push("inENull" -> process(args))
      case "bothE" => push("bothE" -> process(args))
      case "as_" | "as" => push("as" -> arg(0))
      case "select" => push("select" -> obj("marks" -> process(args)))
      case "limit" => push("limit" -> arg(0))
      case "skip" => push("skip" -> arg(0))
      case "range" => push("range" -> obj("start" -> arg(0), "stop" -> arg(1)))
      case "count" => push("count" -> F.textNode(""))
      case "distinct" => push("distinct" -> process(args))
      case "fields" => push("fields" -> (if (args.isEmpty) F.arrayNode() else process(args)))
      case "render" => push("render" -> arg(0))
      case "has" => push("has" -> arg(0))
      case "hasLabel" => push("hasLabel" -> process(args))
      case "hasId" => push("hasId" -> process(args))
      case "hasKey" => push("hasKey" -> process(args))
      case "set" => push("set" -> obj("key" -> arg(0), "value" -> arg(1)))
      case "increment" =>
        // one-arg form: JSON.stringify drops the undefined value, so the
        // field is OMITTED (gripql.js:131-134) and the protojson default
        // applies — ours is 1 (Json.scala, python-client semantics;
        // the reference's own JS and python clients disagree here: its
        // proto3 default makes the JS one-arg form increment by 0)
        val inc = obj("key" -> arg(0))
        args.lift(1).filterNot(_.isNull).foreach(v => inc.set[JsonNode]("value", v))
        push("increment" -> inc)
      case "mark" => push("mark" -> arg(0))
      case "jump" => push("jump" -> obj("mark" -> arg(0), "expression" -> arg(1),
        "emit" -> arg(2)))
      case "unwind" => push("unwind" -> arg(0))
      case "path" => push("path" -> F.arrayNode())
      case "aggregate" =>
        push("aggregate" -> obj("aggregations" -> {
          val a = F.arrayNode(); args.foreach(a.add); a
        }))
      case other =>
        throw new IllegalArgumentException(s"unknown traversal method '.$other' in js query")
    }
  }

  // --------------------------------------------------------- interpreter

  private final class Interp(s: String) {
    private var i = 0
    private val env = scala.collection.mutable.LinkedHashMap.empty[String, JsonNode]

    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at offset $i in js query")

    private def ws(): Unit = {
      var go = true
      while (go) {
        go = false
        while (i < s.length && s(i).isWhitespace) { i += 1; go = true }
        if (i + 1 < s.length && s(i) == '/' && s(i + 1) == '/') {
          while (i < s.length && s(i) != '\n') i += 1
          go = true
        } else if (i + 1 < s.length && s(i) == '/' && s(i + 1) == '*') {
          val end = s.indexOf("*/", i + 2)
          if (end < 0) err("unterminated comment")
          i = end + 2; go = true
        }
      }
    }
    private def peek: Char = { ws(); if (i < s.length) s(i) else '\u0000' }
    private def at(t: String): Boolean = { ws(); s.startsWith(t, i) }
    private def eat(t: String): Unit = { if (!at(t)) err(s"expected '$t'"); i += t.length }
    private def opt(t: String): Boolean = if (at(t)) { i += t.length; true } else false
    // operators that must not swallow a longer operator's prefix
    private def optOp(t: String, notFollowedBy: Char): Boolean = {
      ws()
      if (s.startsWith(t, i) &&
          (i + t.length >= s.length || s(i + t.length) != notFollowedBy)) {
        i += t.length; true
      } else false
    }

    private def identLike: Boolean = { val c = peek; c.isLetter || c == '_' || c == '$' }
    private def ident(): String = {
      ws(); val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '$')) i += 1
      if (i == start) err("expected identifier")
      s.substring(start, i)
    }

    private def strLit(): String = {
      val quote = peek
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != quote) {
        if (s(i) == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'u' => val h = s.substring(i + 1, i + 5); i += 4
              Integer.parseInt(h, 16).toChar
            case c => c
          })
        } else sb.append(s(i))
        i += 1
      }
      if (i >= s.length) err("unterminated string")
      i += 1
      sb.toString
    }

    private def numLit(): Double = {
      ws(); val start = i
      while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
        ((s(i) == '+' || s(i) == '-') && i > start && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
      if (i == start) err("expected number")
      s.substring(start, i).toDouble
    }

    /** program := statement* ; value of the last statement. */
    def program(): JsonNode = {
      var last: JsonNode = F.nullNode()
      ws()
      while (i < s.length) {
        last = statement()
        while (opt(";")) ()
        ws()
      }
      last
    }

    // JS constructs the reference's full VM would run but this subset
    // interpreter deliberately doesn't (query strings don't use them) —
    // named loudly so a user hitting the boundary sees which construct,
    // not a confusing parse error (reference surface: cmd/query/main.go:29-62).
    // TRUE reserved words only: 'of'/'async'/'await'/'yield' are contextual
    // keywords, legal as variable names in classic scripts ('for...of' is
    // already caught at 'for'; 'async function' is caught below), so they
    // stay usable as identifiers
    private val unsupportedKeywords = Set(
      "function", "for", "while", "do", "if", "else", "switch", "return",
      "try", "catch", "throw", "class", "new", "delete", "typeof", "void",
      "in")

    private def unsupported(name: String): Nothing =
      throw new UnsupportedJsConstruct(
        s"unsupported JS construct '$name' in js query — only expression " +
          "scripts (var/let/const, literals, operators, gripql builder " +
          "chains) are interpreted; the reference CLI's full JS VM is out of scope")

    private def statement(): JsonNode = {
      ws()
      val save = i
      if (identLike) {
        val name = ident()
        if (unsupportedKeywords.contains(name)) unsupported(name)
        if (name == "async") { // contextual: only 'async function' is a construct
          val mark = i; ws()
          if (s.startsWith("function", i)) unsupported("async function")
          i = mark
        }
        if (name == "var" || name == "let" || name == "const") {
          val v = ident()
          val value = if (opt("=")) expr() else F.nullNode()
          env(v) = value
          return value
        }
        ws()
        if (s.startsWith("=>", i))
          throw new UnsupportedJsConstruct(
            "unsupported JS construct 'arrow function' in js query — user-defined " +
              "functions are outside the interpreted subset")
        // plain assignment: ident = expr (but not ==)
        if (i < s.length && s(i) == '=' && (i + 1 >= s.length || s(i + 1) != '=')) {
          i += 1
          val value = expr()
          env(name) = value
          return value
        }
        i = save // not a declaration/assignment — re-parse as expression
      }
      expr()
    }

    private def expr(): JsonNode = orExpr()

    private def orExpr(): JsonNode = {
      var l = andExpr()
      while (opt("||")) { val r = andExpr(); l = if (truthy(l)) l else r }
      l
    }
    private def andExpr(): JsonNode = {
      var l = eqExpr()
      while (opt("&&")) { val r = eqExpr(); l = if (truthy(l)) r else l }
      l
    }
    private def eqExpr(): JsonNode = {
      var l = relExpr()
      var go = true
      while (go) {
        if (opt("===") || opt("==")) l = F.booleanNode(jsEquals(l, relExpr()))
        else if (opt("!==") || opt("!=")) l = F.booleanNode(!jsEquals(l, relExpr()))
        else go = false
      }
      l
    }
    private def relExpr(): JsonNode = {
      var l = addExpr()
      var go = true
      while (go) {
        if (opt("<=")) l = F.booleanNode(l.asDouble() <= addExpr().asDouble())
        else if (opt(">=")) l = F.booleanNode(l.asDouble() >= addExpr().asDouble())
        else if (optOp("<", '=')) l = F.booleanNode(l.asDouble() < addExpr().asDouble())
        else if (optOp(">", '=')) l = F.booleanNode(l.asDouble() > addExpr().asDouble())
        else go = false
      }
      l
    }
    private def addExpr(): JsonNode = {
      var l = mulExpr()
      var go = true
      while (go) {
        if (optOp("+", '+')) {
          val r = mulExpr()
          l = if (l.isTextual || r.isTextual)
            F.textNode(asStr(l) + asStr(r))
          else num(l.asDouble() + r.asDouble())
        } else if (optOp("-", '-')) l = num(l.asDouble() - mulExpr().asDouble())
        else go = false
      }
      l
    }
    private def mulExpr(): JsonNode = {
      var l = unary()
      var go = true
      while (go) {
        if (opt("*")) l = num(l.asDouble() * unary().asDouble())
        else if (opt("%")) l = num(l.asDouble() % unary().asDouble())
        else if (at("/") && !at("//")) { i += 1; l = num(l.asDouble() / unary().asDouble()) }
        else go = false
      }
      l
    }
    private def unary(): JsonNode = {
      if (optOp("!", '=')) F.booleanNode(!truthy(unary()))
      else if (optOp("-", '-')) num(-unary().asDouble())
      else postfix()
    }

    private def jsEquals(a: JsonNode, b: JsonNode): Boolean =
      if (a.isNumber && b.isNumber) a.asDouble() == b.asDouble() else a == b

    private def asStr(n: JsonNode): String =
      if (n.isTextual) n.asText()
      else if (n.isNumber && n.isIntegralNumber) n.asLong().toString
      else if (n.isNumber) n.asDouble().toString
      else if (n.isBoolean) n.asBoolean().toString
      else if (n.isNull) "null"
      else n.toString

    /** call chains, member access, indexing. */
    private def postfix(): JsonNode = {
      var v = primary()
      var go = true
      while (go) {
        if (opt(".")) {
          val m = ident()
          if (peek == '(') {
            val as = callArgs()
            v = v match {
              case o: ObjectNode if o.get("query") != null && o.get("query").isArray =>
                builderCall(o, m, as)
              case other => err(s"cannot call '.$m' on $other")
            }
          } else v = Option(v.get(m)).getOrElse(F.nullNode())
        } else if (peek == '[') {
          eat("["); val idx = expr(); eat("]")
          v = if (v.isArray) Option(v.get(idx.asInt())).getOrElse(F.nullNode())
          else Option(v.get(asStr(idx))).getOrElse(F.nullNode())
        } else go = false
      }
      v
    }

    private def callArgs(): Seq[JsonNode] = {
      eat("(")
      val as = Seq.newBuilder[JsonNode]
      if (peek != ')') { as += expr(); while (opt(",")) as += expr() }
      eat(")")
      as.result()
    }

    private def primary(): JsonNode = {
      val c = peek
      if (c == '(') { eat("("); val v = expr(); eat(")"); v }
      else if (c == '"' || c == '\'') F.textNode(strLit())
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) num(numLit())
      else if (c == '[') {
        eat("[")
        val a = F.arrayNode()
        if (peek != ']') { a.add(expr()); while (opt(",")) a.add(expr()) }
        eat("]")
        a
      } else if (c == '{') {
        eat("{")
        val o = F.objectNode()
        if (peek != '}') {
          def kv(): Unit = {
            val k = if (peek == '"' || peek == '\'') strLit() else ident()
            eat(":"); o.set[JsonNode](k, expr()); ()
          }
          kv(); while (opt(",")) kv()
        }
        eat("}")
        o
      } else if (identLike) {
        val name = ident()
        name match {
          case "true" => F.booleanNode(true)
          case "false" => F.booleanNode(false)
          case "null" | "undefined" => F.nullNode()
          case _ =>
            if (peek == '(') global(name, callArgs())
            else env.getOrElse(name,
              err(s"undefined variable '$name'"))
        }
      } else err(s"unexpected character '$c'")
    }
  }
}
