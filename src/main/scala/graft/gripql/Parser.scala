package graft.gripql

/** Parse the textual query form — `V().hasLabel("x").out().count()` — into
  * a [[Query]]. This is how every human uses the reference CLI, which
  * evaluates the same method-chain surface in an embedded JS VM
  * (reference: cmd/query/main.go:29-62); here it is a small
  * recursive-descent parser over exactly the statement algebra, so a
  * malformed query fails with a position-tagged error instead of a VM
  * stack trace, and there is no general-purpose interpreter in the path.
  *
  * Accepted atoms: double/single-quoted strings (JSON escapes), integer
  * and decimal numbers, true/false/null, arrays, objects (render
  * templates). Predicate and aggregation builders may be bare
  * (`gt("f",1)`) or namespaced (`gripql.gt("f",1)`). `as` may be spelled
  * `as_` (python-client spelling, reference gripql/python/__init__.py).
  */
object Parser {
  def parse(text: String): Query = new P(text).full()

  /** Parse a seedless extension chain (`.out().count()`), the job-resume
    * form — statements validate when compiled in extension mode. */
  def parseExtension(text: String): Query = new P(text).extension()

  /** Render a Query back to the textual surface this parser accepts —
    * `parse(render(q)) == q` for queries in the grammar's normal form
    * (range bounds as numbers, one `select` name = SelectOne; the one
    * lossy spot is Percentile.exact, which the text form cannot spell).
    * Used by the CLI and by the parser round-trip property test. */
  def render(q: Query): String = q.stmts.map(renderStmt).mkString(".")

  private def jstr(s: String): String = GValue.toJson(GValue.GString(s))
  private def args(xs: Seq[String]): String = xs.map(jstr).mkString(", ")

  private def renderStmt(s: Stmt): String = s match {
    case Stmt.V(ids) => s"V(${args(ids)})"
    case Stmt.E(ids) => s"E(${args(ids)})"
    case Stmt.Out(ls, emitNull) => s"${if (emitNull) "outNull" else "out"}(${args(ls)})"
    case Stmt.In(ls, emitNull) => s"${if (emitNull) "inNull" else "in"}(${args(ls)})"
    case Stmt.Both(ls) => s"both(${args(ls)})"
    case Stmt.OutE(ls, emitNull) => s"${if (emitNull) "outENull" else "outE"}(${args(ls)})"
    case Stmt.InE(ls, emitNull) => s"${if (emitNull) "inENull" else "inE"}(${args(ls)})"
    case Stmt.BothE(ls) => s"bothE(${args(ls)})"
    case Stmt.Has(e) => s"has(${renderPred(e)})"
    case Stmt.HasLabel(ls) => s"hasLabel(${args(ls)})"
    case Stmt.HasId(ids) => s"hasId(${args(ids)})"
    case Stmt.HasKey(ks) => s"hasKey(${args(ks)})"
    case Stmt.Limit(n) => s"limit($n)"
    case Stmt.Skip(n) => s"skip($n)"
    case Stmt.Range(a, b) => s"range($a, $b)"
    case Stmt.Distinct(fs) => s"distinct(${args(fs)})"
    case Stmt.As(n) => s"as(${jstr(n)})"
    case Stmt.SelectOne(n) => s"select(${jstr(n)})"
    case Stmt.SelectMany(ns) => s"select(${args(ns)})"
    case Stmt.Fields(fs) => s"fields(${args(fs)})"
    case Stmt.Render(t) => s"render(${GValue.toJson(t)})"
    case Stmt.Path() => "path()"
    case Stmt.Unwind(f) => s"unwind(${jstr(f)})"
    case Stmt.SetField(k, v) => s"set(${jstr(k)}, ${GValue.toJson(v)})"
    case Stmt.Increment(k, d) => s"increment(${jstr(k)}, $d)"
    case Stmt.Mark(n) => s"mark(${jstr(n)})"
    case Stmt.Jump(m, cond, emit) =>
      s"jump(${jstr(m)}, ${cond.map(renderPred).getOrElse("null")}, $emit)"
    case Stmt.Count() => "count()"
    case Stmt.Aggregate(aggs) => s"aggregate(${aggs.map(renderAgg).mkString(", ")})"
  }

  private def renderPred(e: HasExpr): String = e match {
    case HasExpr.And(cs) => s"and(${cs.map(renderPred).mkString(", ")})"
    case HasExpr.Or(cs) => s"or(${cs.map(renderPred).mkString(", ")})"
    case HasExpr.Not(c) => s"not(${renderPred(c)})"
    case HasExpr.Cond(k, v, op) =>
      val name = op match {
        case CondOp.EQ => "eq"; case CondOp.NEQ => "neq"
        case CondOp.GT => "gt"; case CondOp.GTE => "gte"
        case CondOp.LT => "lt"; case CondOp.LTE => "lte"
        case CondOp.INSIDE => "inside"; case CondOp.OUTSIDE => "outside"
        case CondOp.BETWEEN => "between"; case CondOp.WITHIN => "within"
        case CondOp.WITHOUT => "without"; case CondOp.CONTAINS => "contains"
      }
      val vs = (op, v) match {
        // ranges render as two scalar args, the form the grammar re-coerces
        case (CondOp.INSIDE | CondOp.OUTSIDE | CondOp.BETWEEN, GValue.GArray(Seq(a, b))) =>
          s"${GValue.toJson(a)}, ${GValue.toJson(b)}"
        case _ => GValue.toJson(v)
      }
      s"$name(${jstr(k)}, $vs)"
  }

  private def renderAgg(a: Agg): String = a match {
    case Agg.Term(n, f, size) =>
      if (size > 0) s"term(${jstr(n)}, ${jstr(f)}, $size)" else s"term(${jstr(n)}, ${jstr(f)})"
    case Agg.Histogram(n, f, i) => s"histogram(${jstr(n)}, ${jstr(f)}, ${GValue.toJson(GValue.GNum(i))})"
    case Agg.Percentile(n, f, ps, _) =>
      s"percentile(${jstr(n)}, ${jstr(f)}, ${ps.map(p => GValue.toJson(GValue.GNum(p))).mkString(", ")})"
    case Agg.FieldAgg(n, f) => s"field(${jstr(n)}, ${jstr(f)})"
    case Agg.TypeAgg(n, f) => s"type(${jstr(n)}, ${jstr(f)})"
    case Agg.CountAgg(n) => s"count(${jstr(n)})"
  }

  private final class P(s: String) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at offset $i in query: $s")
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    private def eat(c: Char): Unit = { ws(); if (peek != c) err(s"expected '$c'"); i += 1 }
    private def opt(c: Char): Boolean = { ws(); if (peek == c) { i += 1; true } else false }

    private def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (i == start) err("expected identifier")
      s.substring(start, i)
    }

    private def str(): String = {
      ws()
      val quote = peek
      if (quote != '"' && quote != '\'') err("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != quote) {
        if (s(i) == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'u' =>
              val h = s.substring(i + 1, i + 5); i += 4
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

    private def number(): GValue = {
      ws()
      val start = i
      if (peek == '-') i += 1
      while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
        ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
      val t = s.substring(start, i)
      if (t.isEmpty || t == "-") err("expected number")
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) GValue.num(t.toDouble)
      else GValue.GInt(t.toLong)
    }

    /** A literal value (never a predicate). */
    private def value(): GValue = {
      ws()
      peek match {
        case '"' | '\'' => GValue.GString(str())
        case '[' =>
          eat('['); val xs = Seq.newBuilder[GValue]
          if (!opt(']')) {
            xs += value(); while (opt(',')) xs += value(); eat(']')
          }
          GValue.GArray(xs.result())
        case '{' =>
          eat('{'); val fs = Seq.newBuilder[(String, GValue)]
          if (!opt('}')) {
            def field(): Unit = {
              ws()
              val k = if (peek == '"' || peek == '\'') str() else ident()
              eat(':'); fs += (k -> value())
            }
            field(); while (opt(',')) field(); eat('}')
          }
          GValue.GObj(fs.result())
        case c if c.isDigit || c == '-' => number()
        case _ =>
          ident() match {
            case "true" => GValue.GBool(true)
            case "false" => GValue.GBool(false)
            case "null" => GValue.GNull
            case other => err(s"unexpected bare word '$other'")
          }
      }
    }

    private def stringArgs(): Seq[String] = {
      eat('(')
      val xs = Seq.newBuilder[String]
      ws()
      // builder process() accepts a single list argument interchangeably
      // with varargs — `both(["a","b"])` == `both("a","b")` (gripql.js:1-10)
      if (peek == '[') {
        eat('[')
        if (!opt(']')) { xs += str(); while (opt(',')) xs += str(); eat(']') }
        eat(')')
      } else if (!opt(')')) { xs += str(); while (opt(',')) xs += str(); eat(')') }
      xs.result()
    }

    private def longArg(): Long = {
      eat('(')
      val v = number() match {
        case GValue.GInt(n) => n
        case other => err(s"expected integer, got $other")
      }
      eat(')'); v
    }

    private def asNum(g: GValue): Double = g match {
      case GValue.GInt(n) => n.toDouble
      case GValue.GNum(d) => d
      case other => err(s"expected number, got $other")
    }

    /** Predicate expression: and/or/not/leaf builders, optional `gripql.` */
    private def predicate(): HasExpr = {
      ws()
      var name = ident()
      if (name == "gripql") { eat('.'); name = ident() }
      eat('(')
      def more(): Seq[GValue] = {
        val xs = Seq.newBuilder[GValue]
        while (opt(',')) xs += value()
        xs.result()
      }
      val e: HasExpr = name match {
        case "and" | "and_" =>
          val es = Seq.newBuilder[HasExpr]
          es += predicate(); while (opt(',')) es += predicate()
          HasExpr.And(es.result())
        case "or" | "or_" =>
          val es = Seq.newBuilder[HasExpr]
          es += predicate(); while (opt(',')) es += predicate()
          HasExpr.Or(es.result())
        case "not" | "not_" => HasExpr.Not(predicate())
        case op =>
          val key = str()
          val rest = more()
          def one = rest match {
            case Seq(v) => v
            case _ => err(s"$op expects one value")
          }
          def two = rest match {
            // validate both are numeric but KEEP the written numeric type —
            // the JS/python builders pass ints through unwidened
            case Seq(a, b) => asNum(a); asNum(b); GValue.GArray(Seq(a, b))
            case Seq(GValue.GArray(Seq(a, b))) => asNum(a); asNum(b); GValue.GArray(Seq(a, b))
            case _ => err(s"$op expects two numbers")
          }
          def many = rest match {
            // builder `process()` semantics (gripql/javascript/gripql.js:
            // 1-10, python client identical): a FALSY scalar coerces to
            // the empty set — `within("x", 0)` matches nothing
            case Seq(GValue.GInt(0)) | Seq(GValue.GNum(0.0)) |
                 Seq(GValue.GString("")) | Seq(GValue.GBool(false)) |
                 Seq(GValue.GNull) => GValue.GArray(Nil)
            case Seq(GValue.GArray(vs)) => GValue.GArray(vs)
            case vs => GValue.GArray(vs)
          }
          op match {
            case "eq" | "eq_" => HasExpr.Cond(key, one, CondOp.EQ)
            case "neq" => HasExpr.Cond(key, one, CondOp.NEQ)
            case "gt" => HasExpr.Cond(key, one, CondOp.GT)
            case "gte" => HasExpr.Cond(key, one, CondOp.GTE)
            case "lt" => HasExpr.Cond(key, one, CondOp.LT)
            case "lte" => HasExpr.Cond(key, one, CondOp.LTE)
            case "inside" => HasExpr.Cond(key, two, CondOp.INSIDE)
            case "outside" => HasExpr.Cond(key, two, CondOp.OUTSIDE)
            case "between" => HasExpr.Cond(key, two, CondOp.BETWEEN)
            case "within" => HasExpr.Cond(key, many, CondOp.WITHIN)
            case "without" => HasExpr.Cond(key, many, CondOp.WITHOUT)
            case "contains" => HasExpr.Cond(key, one, CondOp.CONTAINS)
            case other => err(s"unknown predicate '$other'")
          }
      }
      eat(')')
      e
    }

    /** Aggregation builder: term/histogram/percentile/field/type/count. */
    private def aggregation(): Agg = {
      ws()
      var name = ident()
      if (name == "gripql") { eat('.'); name = ident() }
      eat('(')
      val agg = name match {
        case "term" =>
          val n = str(); eat(','); val f = str()
          val size = if (opt(',')) asNum(number()).toInt else 0
          Agg.Term(n, f, size)
        case "histogram" =>
          val n = str(); eat(','); val f = str(); eat(',')
          Agg.Histogram(n, f, asNum(value()))
        case "percentile" =>
          val n = str(); eat(','); val f = str()
          val ps = Seq.newBuilder[Double]
          while (opt(',')) value() match {
            case GValue.GArray(vs) => ps ++= vs.map(asNum)
            case v => ps += asNum(v)
          }
          Agg.Percentile(n, f, ps.result())
        case "field" =>
          val n = str(); eat(','); val f = str(); Agg.FieldAgg(n, f)
        case "type" =>
          val n = str(); eat(','); val f = str(); Agg.TypeAgg(n, f)
        case "count" => Agg.CountAgg(str())
        case other => err(s"unknown aggregation '$other'")
      }
      eat(')')
      agg
    }

    def full(): Query = {
      var q = ident() match {
        case "V" => Query(Vector(Stmt.V(stringArgs())))
        case "E" => Query(Vector(Stmt.E(stringArgs())))
        case other => err(s"query must start with V(...) or E(...), got '$other'")
      }
      while (opt('.')) q = step(q, ident())
      end()
      q
    }

    /** A seedless statement chain — the job-resume extension form
      * (reference: gripql/gripql.proto:416 ExtendQuery): `.out().count()`
      * or `out().count()`, no V()/E() start. */
    def extension(): Query = {
      ws(); opt('.')
      var q = step(Query(Vector.empty), ident())
      while (opt('.')) q = step(q, ident())
      end()
      q
    }

    private def end(): Unit = {
      ws()
      if (i < s.length) err(s"trailing input '${s.substring(i)}'")
    }

    private def step(q: Query, m: String): Query =
      m match {
          case "out" => q.out(stringArgs(): _*)
          case "outNull" => q.outNull(stringArgs(): _*)
          case "in" | "in_" => q.in(stringArgs(): _*)
          case "inNull" => q.inNull(stringArgs(): _*)
          case "both" => q.both(stringArgs(): _*)
          case "outE" => q.outE(stringArgs(): _*)
          case "outENull" => q.outENull(stringArgs(): _*)
          case "inE" => q.inE(stringArgs(): _*)
          case "inENull" => q.inENull(stringArgs(): _*)
          case "bothE" => q.bothE(stringArgs(): _*)
          case "hasLabel" => q.hasLabel(stringArgs(): _*)
          case "hasId" => q.hasId(stringArgs(): _*)
          case "hasKey" => q.hasKey(stringArgs(): _*)
          case "has" => { eat('('); val e = predicate(); eat(')'); q.has(e) }
          case "limit" => q.limit(longArg())
          case "skip" => q.skip(longArg())
          case "range" =>
            eat('('); val a = asNum(number()).toLong; eat(',')
            val b = asNum(number()).toLong; eat(')'); q.range(a, b)
          case "distinct" => q.distinct(stringArgs(): _*)
          case "as" | "as_" => q.as(stringArgs() match {
            case Seq(n) => n; case _ => err("as() expects one name")
          })
          case "mark" => q.mark(stringArgs() match {
            case Seq(n) => n; case _ => err("mark() expects one name")
          })
          case "select" => q.select(stringArgs(): _*)
          case "fields" => q.fields(stringArgs(): _*)
          case "render" => { eat('('); val t = value(); eat(')'); q.render(t) }
          case "path" => { eat('('); eat(')'); q.path() }
          case "unwind" => q.unwind(stringArgs() match {
            case Seq(f) => f; case _ => err("unwind() expects one field")
          })
          case "set" | "setField" =>
            eat('('); val k = str(); eat(','); val v = value(); eat(')'); q.set(k, v)
          case "increment" =>
            eat('('); val k = str()
            val d = if (opt(',')) asNum(number()).toLong else 1L
            eat(')'); q.increment(k, d)
          case "jump" =>
            eat('('); val mark = str(); eat(',')
            ws()
            val cond = if (peek == 'n' && s.startsWith("null", i)) { i += 4; None }
                       else Some(predicate())
            eat(','); val emit = value() match {
              case GValue.GBool(b) => b; case other => err(s"jump emit must be boolean, got $other")
            }
            eat(')'); q.jump(mark, cond, emit)
          case "count" => { eat('('); eat(')'); q.count() }
          case "aggregate" =>
            eat('(')
            val as = Seq.newBuilder[Agg]
            as += aggregation(); while (opt(',')) as += aggregation()
            eat(')'); q.aggregate(as.result(): _*)
          case other => err(s"unknown method '$other'")
      }
  }
}
