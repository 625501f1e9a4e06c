package graft.server

import scala.util.matching.Regex

/** A casbin-compatible policy engine — model-conf + CSV-policy access
  * control, the same configuration surface the reference wires in via the
  * casbin library (reference: accounts/casbin.go:25-36 `Enforce(user,
  * graph, operation)` against user-supplied Model/Policy files; the
  * model/policy grammar is casbin's public PERM format). Supported:
  *
  *  - `[request_definition]` / `[policy_definition]` — named args, any
  *    arity; `p.eft` as an optional trailing policy arg (default allow).
  *  - `[role_definition]` — `g = _, _` (role links, transitive) and
  *    `g = _, _, _` (domain-scoped role links), any number of g-types
  *    (`g`, `g2`, ...).
  *  - `[matchers]` — boolean expressions over `r.*`/`p.*` with `&&`,
  *    `||`, `!`, `==`, `!=`, parens, string literals, and the casbin
  *    builtins `g(...)`, `keyMatch`, `keyMatch2`, `regexMatch`,
  *    `globMatch`.
  *  - `[policy_effect]` — the four canonical effects: allow-any,
  *    deny-override, allow-and-deny, priority.
  *
  * Scale note: enforcement is a per-request driver-side loop over policy
  * rows (exactly the reference's shape — policies are config-sized, not
  * data-sized). Nothing here touches Spark. */
object Casbin {

  // ---------------------------------------------------------------- model

  final case class Model(requestArgs: Seq[String],
                         policyArgs: Seq[String],
                         roleArities: Map[String, Int],
                         effect: String,
                         matcher: Expr)

  /** Parse a casbin model conf (INI-ish: `[section]` then `key = value`). */
  def parseModel(conf: String): Model = {
    var section = ""
    val entries = scala.collection.mutable.Map.empty[(String, String), String]
    conf.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach { l =>
      if (l.startsWith("[") && l.endsWith("]")) section = l.substring(1, l.length - 1)
      else l.split("=", 2) match {
        case Array(k, v) => entries((section, k.trim)) = v.trim
        case _ => throw new IllegalArgumentException(s"bad model line: $l")
      }
    }
    def args(section: String, key: String): Seq[String] =
      entries.get((section, key))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(throw new IllegalArgumentException(s"model missing [$section] $key"))
    val roleArities = entries.collect {
      case ((s, k), v) if s == "role_definition" => k -> v.split(",").length
    }.toMap
    val matcherText = entries.getOrElse(("matchers", "m"),
      throw new IllegalArgumentException("model missing [matchers] m"))
    Model(args("request_definition", "r"), args("policy_definition", "p"),
      roleArities, entries.getOrElse(("policy_effect", "e"), "some(where (p.eft == allow))"),
      ExprParser.parse(matcherText))
  }

  // ----------------------------------------------------------- expressions

  sealed trait Expr
  final case class Lit(v: String) extends Expr
  final case class Ref(name: String) extends Expr // r.sub / p.obj
  final case class Not(e: Expr) extends Expr
  final case class And(a: Expr, b: Expr) extends Expr
  final case class Or(a: Expr, b: Expr) extends Expr
  final case class Cmp(a: Expr, b: Expr, eq: Boolean) extends Expr
  final case class Call(fn: String, args: Seq[Expr]) extends Expr

  /** Recursive-descent parser for the matcher grammar (precedence:
    * `!` > `==`/`!=` > `&&` > `||`). */
  private object ExprParser {
    def parse(s: String): Expr = {
      val p = new P(tokenize(s))
      val e = p.or()
      require(p.eof, s"trailing tokens in matcher: $s")
      e
    }

    private def tokenize(s: String): List[String] = {
      val out = List.newBuilder[String]
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '\'' || c == '"') {
          val j = s.indexOf(c, i + 1)
          require(j > 0, s"unterminated string in matcher: $s")
          out += ("\u0000" + s.substring(i + 1, j)) // NUL-prefix marks a string literal
          i = j + 1
        } else if (s.startsWith("&&", i) || s.startsWith("||", i) ||
                   s.startsWith("==", i) || s.startsWith("!=", i)) {
          out += s.substring(i, i + 2); i += 2
        } else if ("()!,".indexOf(c) >= 0) { out += c.toString; i += 1 }
        else {
          var j = i
          while (j < s.length && (s.charAt(j).isLetterOrDigit ||
                 ".:_/*-".indexOf(s.charAt(j)) >= 0)) j += 1
          require(j > i, s"unexpected char '$c' in matcher: $s")
          out += s.substring(i, j); i = j
        }
      }
      out.result()
    }

    private final class P(var ts: List[String]) {
      def eof: Boolean = ts.isEmpty
      private def peek: String = ts.headOption.getOrElse("")
      private def next(): String = { val h = ts.head; ts = ts.tail; h }
      private def expect(t: String): Unit =
        require(next() == t, s"expected '$t' in matcher")

      def or(): Expr = {
        var e = and()
        while (peek == "||") { next(); e = Or(e, and()) }
        e
      }
      def and(): Expr = {
        var e = cmp()
        while (peek == "&&") { next(); e = And(e, cmp()) }
        e
      }
      def cmp(): Expr = {
        val e = unary()
        peek match {
          case "==" => next(); Cmp(e, unary(), eq = true)
          case "!=" => next(); Cmp(e, unary(), eq = false)
          case _ => e
        }
      }
      def unary(): Expr = peek match {
        case "!" => next(); Not(unary())
        case "(" => next(); val e = or(); expect(")"); e
        case _ =>
          val t = next()
          if (t.startsWith("\u0000")) Lit(t.substring(1))
          else if (peek == "(") { // function call
            next()
            val args = List.newBuilder[Expr]
            if (peek != ")") {
              args += or()
              while (peek == ",") { next(); args += or() }
            }
            expect(")")
            Call(t, args.result())
          }
          else if (t.contains(".")) Ref(t)
          else Lit(t) // bare words (allow, deny, root) compare as strings
      }
    }
  }

  // ------------------------------------------------------------- builtins

  /** casbin keyMatch: a `*` in the pattern matches any suffix — pattern
    * "/foo/" + star matches "/foo/bar/baz"; a bare star matches
    * everything. */
  def keyMatch(key: String, pattern: String): Boolean = {
    val i = pattern.indexOf('*')
    if (i < 0) key == pattern
    else if (key.length >= i) key.substring(0, i) == pattern.substring(0, i)
    else key == pattern.substring(0, i)
  }

  /** casbin keyMatch2: `:param` matches one path segment, `*` any tail. */
  def keyMatch2(key: String, pattern: String): Boolean = {
    val rx = pattern
      .replace("/*", "/.*")
      .replaceAll(""":[^/]+""", "[^/]+")
    regexMatch(key, "^" + rx + "$")
  }

  /** casbin regexMatch is Go's `regexp.MatchString` — an unanchored find. */
  def regexMatch(key: String, pattern: String): Boolean =
    new Regex(pattern).findFirstIn(key).isDefined

  /** glob `*` (non-separator-crossing) — close enough to casbin's
    * path.Match-backed globMatch for the RBAC configs in scope. */
  def globMatch(key: String, pattern: String): Boolean = {
    val rx = "^" + Regex.quote(pattern).replace("*", """\E[^/]*\Q""") + "$"
    key.matches(rx)
  }

  // ------------------------------------------------------------- enforcer

  /** RFC-4180-ish CSV split for one policy line: commas inside
    * double-quoted fields don't split (a regexMatch pattern like
    * `"a{1,3}"` stays one field), a doubled quote inside a quoted field
    * is a literal quote, and whitespace outside quotes is trimmed —
    * the dialect casbin's Go file-adapter reads via encoding/csv. */
  private[server] def splitCsvLine(line: String): Seq[String] = {
    val fields = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var quoted = false    // currently inside a quoted region
    var wasQuoted = false // this field had a quoted region
    var outsideTail = 0   // chars appended since the last close-quote (outside quotes)
    def finish(): Unit = {
      val raw = cur.toString
      val v =
        if (!wasQuoted) raw.trim
        else { // trim only whitespace that sits outside the quoted region
          var end = raw.length
          var budget = outsideTail
          while (budget > 0 && end > 0 && raw.charAt(end - 1).isWhitespace) { end -= 1; budget -= 1 }
          raw.substring(0, end)
        }
      fields += v
      cur.clear(); wasQuoted = false; outsideTail = 0
    }
    while (i < line.length) {
      val c = line.charAt(i)
      if (quoted) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else { quoted = false; outsideTail = 0 }
        } else cur += c
      } else c match {
        case '"' =>
          // an opening quote is only legal at field start (after optional
          // whitespace) — Go's encoding/csv, the dialect casbin reads,
          // errors with ErrBareQuote on 'a"b'; consuming it as an open
          // quote would silently swallow the next comma into this field
          require(cur.forall(_.isWhitespace),
            s"bare '\"' in unquoted field of policy line: $line")
          cur.clear() // leading ws before open quote
          quoted = true; wasQuoted = true
        case ',' => finish()
        case other => cur += other; outsideTail += 1
      }
      i += 1
    }
    require(!quoted, s"unterminated quote in policy line: $line")
    finish()
    fields.result()
  }

  /** Policy store + matcher evaluation. `policyCsv` is casbin's CSV form:
    * one `p, v0, v1, ...` or `g, member, role[, domain]` per line.
    * Rows whose arity doesn't match the model's definition are rejected
    * loudly — a silently mangled deny rule would fail open. */
  final class Enforcer(val model: Model, policyCsv: String) {
    private val (pRows, gRows) = {
      val ps = Vector.newBuilder[Seq[String]]
      val gs = scala.collection.mutable.Map.empty[String, Vector[Seq[String]]]
      val pArity = model.policyArgs.length
      // `eft`, when declared as the trailing policy arg, may be omitted
      // per row (casbin defaults it to allow)
      val pMinArity = if (model.policyArgs.lastOption.contains("eft")) pArity - 1 else pArity
      policyCsv.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach { l =>
        val parts = splitCsvLine(l)
        parts.head match {
          case "p" =>
            require(parts.tail.length >= pMinArity && parts.tail.length <= pArity,
              s"policy row arity ${parts.tail.length} does not match " +
                s"policy_definition (${model.policyArgs.mkString(", ")}): $l")
            ps += parts.tail
          case g if g.startsWith("g") =>
            require(model.roleArities.contains(g), s"policy uses undefined role type: $g")
            require(parts.tail.length == model.roleArities(g),
              s"role row arity ${parts.tail.length} does not match $g definition: $l")
            gs(g) = gs.getOrElse(g, Vector.empty) :+ parts.tail
          case other => throw new IllegalArgumentException(s"unknown policy type: $other")
        }
      }
      (ps.result(), gs.toMap)
    }

    /** Transitive role closure per g-type: direct links plus inherited
      * ones (alice -> admin -> superadmin). Domain-scoped (3-arg) links
      * close within a single domain only. */
    private val closures: Map[String, Set[Seq[String]]] = gRows.map { case (g, rows) =>
      var links = rows.map(_.toList).toSet
      var grew = true
      while (grew) {
        val more = for {
          a <- links; b <- links
          joined <- (a, b) match {
            case (x :: y :: Nil, y2 :: z :: Nil) if y == y2 => Some(List(x, z))
            case (x :: y :: d :: Nil, y2 :: z :: d2 :: Nil) if y == y2 && d == d2 =>
              Some(List(x, z, d))
            case _ => None
          }
        } yield joined
        val next = links ++ more
        grew = next.size > links.size
        links = next
      }
      g -> links.map(_.toSeq)
    }

    private def hasRole(g: String, args: Seq[String]): Boolean =
      args(0) == args(1) || // reflexive: HasLink(x, x) always holds
        closures.getOrElse(g, Set.empty).contains(args)

    private def eval(e: Expr, env: Map[String, String]): Either[String, Boolean] = e match {
      case Lit(v) => Left(v)
      case Ref(n) => Left(env.getOrElse(n,
        throw new IllegalArgumentException(s"unbound matcher variable: $n")))
      case Not(x) => Right(!bool(x, env))
      case And(a, b) => Right(bool(a, env) && bool(b, env))
      case Or(a, b) => Right(bool(a, env) || bool(b, env))
      case Cmp(a, b, eq) =>
        val l = str(a, env); val r = str(b, env)
        Right(if (eq) l == r else l != r)
      case Call(fn, args) =>
        val vs = args.map(str(_, env))
        Right(fn match {
          case g if model.roleArities.contains(g) => hasRole(g, vs)
          case "keyMatch" => keyMatch(vs(0), vs(1))
          case "keyMatch2" => keyMatch2(vs(0), vs(1))
          case "regexMatch" => regexMatch(vs(0), vs(1))
          case "globMatch" => globMatch(vs(0), vs(1))
          case other => throw new IllegalArgumentException(s"unknown matcher function: $other")
        })
    }
    private def bool(e: Expr, env: Map[String, String]): Boolean =
      eval(e, env).getOrElse(throw new IllegalArgumentException("string where boolean expected"))
    private def str(e: Expr, env: Map[String, String]): String = eval(e, env) match {
      case Left(s) => s
      case Right(b) => b.toString
    }

    /** casbin Enforce: bind request args, evaluate the matcher against
      * each policy row, combine per the model's policy_effect. With an
      * empty policy set the matcher runs once with empty p-values
      * (casbin's own behavior — lets `|| r.sub == "root"` superuser
      * matchers work with no policies at all). */
    def enforce(rvals: String*): Boolean = {
      require(rvals.length == model.requestArgs.length,
        s"expected ${model.requestArgs.length} request args, got ${rvals.length}")
      val rEnv = model.requestArgs.zip(rvals).map { case (k, v) => s"r.$k" -> v }.toMap
      val hasEft = model.policyArgs.contains("eft")
      def env(row: Seq[String]): Map[String, String] = {
        val padded = row.padTo(model.policyArgs.length, "")
        val pEnv = model.policyArgs.zip(padded).map { case (k, v) => s"p.$k" -> v }.toMap
        val eft = if (hasEft && pEnv.getOrElse("p.eft", "").nonEmpty) pEnv("p.eft") else "allow"
        rEnv ++ pEnv + ("p.eft" -> eft)
      }
      val verdicts: Seq[(Boolean, String)] =
        if (pRows.isEmpty) Seq(bool(model.matcher, env(Seq.empty)) -> "allow")
        else pRows.map { row =>
          val e = env(row)
          bool(model.matcher, e) -> e("p.eft")
        }
      model.effect.replaceAll("\\s+", "") match {
        case "some(where(p.eft==allow))" =>
          verdicts.exists { case (m, eft) => m && eft == "allow" }
        case "!some(where(p.eft==deny))" =>
          !verdicts.exists { case (m, eft) => m && eft == "deny" }
        case "some(where(p.eft==allow))&&!some(where(p.eft==deny))" =>
          verdicts.exists { case (m, eft) => m && eft == "allow" } &&
            !verdicts.exists { case (m, eft) => m && eft == "deny" }
        case "priority(p.eft)||deny" =>
          verdicts.collectFirst { case (true, eft) => eft == "allow" }.getOrElse(false)
        case other => throw new IllegalArgumentException(s"unsupported policy_effect: $other")
      }
    }
  }

  def enforcer(modelConf: String, policyCsv: String): Enforcer =
    new Enforcer(parseModel(modelConf), policyCsv)
}
