package graft.server

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{EdgeType, GraphFrame}

/** GraphQL read endpoint over a property graph — the reference exposes the
  * sampled schema as a GraphQL type system and resolves each nested field
  * with its own traversal (reference: endpoints/graphqlv2/builder.go:236-472,
  * one resolver per edge field). Spark-first re-expression: the whole
  * selection TREE compiles into ONE DataFrame plan — each nesting level is
  * an edge join plus a `collect_list` aggregation rolling children up into
  * their parent row — so a 3-level query is 3 joins in one Catalyst plan,
  * not N+1 per-object resolver calls.
  *
  * Supported subset (the shape the reference's endpoint serves):
  *   { Label (gid: "x", ids: [...], first: N, offset: N, filter: {...},
  *            field: value ...)? { scalarField edgeLabel { ... } } }
  * Root arguments follow graphqlv2's resolver contract
  * (builder.go:260-268 ARG_*, filter_build.go): `id`/`gid` point-select,
  * `ids` multi-select, any scalar field name is an equality shorthand,
  * `filter` is the {eq|gt|lt: {field: value}} object (id → gid), and
  * `first`/`offset` page AFTER an explicit gid sort — deterministic
  * pagination, where the reference pages in engine-arrival order. No
  * default `first` cap: rows stream, they aren't materialized per
  * resolver. A field is an edge hop iff the graph's EdgeType topology has
  * a triple (Label, field, _); otherwise it reads `data.field` (with
  * `gid`/`label` reserved). Child lists are sorted by child gid —
  * deterministic output.
  */
object GraphQL {
  /** GraphQL argument value: string, number, boolean, list, or object. */
  sealed trait Av
  final case class AvStr(v: String) extends Av
  final case class AvNum(v: Double) extends Av
  final case class AvBool(v: Boolean) extends Av
  final case class AvList(vs: Seq[Av]) extends Av
  final case class AvObj(fields: Seq[(String, Av)]) extends Av

  case class Sel(name: String, args: Seq[(String, Av)], subs: Seq[Sel]) {
    /** Legacy point-select accessor (gid for data queries, name for
      * __type introspection). */
    def gid: Option[String] = args.collectFirst {
      case (k, AvStr(v)) if k == "gid" || k == "name" || k == "id" => v
    }
  }

  // ---- tiny recursive-descent parser for the supported subset
  def parse(q: String): Sel = {
    val p = new P(q)
    val root = p.document()
    root
  }

  private final class P(s: String) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at offset $i in graphql query")
    private def ws(): Unit =
      while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
    private def peek: Char = { ws(); if (i < s.length) s(i) else ' ' }
    private def eat(c: Char): Unit = { if (peek != c) err(s"expected '$c'"); i += 1 }
    private def name(): String = {
      ws(); val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (i == start) err("expected name")
      s.substring(start, i)
    }
    private def str(): String = {
      if (peek != '"') err("expected string"); i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) { i += 1; sb.append(s(i)) } else sb.append(s(i))
        i += 1
      }
      if (i >= s.length) err("unterminated string"); i += 1
      sb.toString
    }
    private def value(): Av = peek match {
      case '"' => AvStr(str())
      case '[' =>
        eat('[')
        val vs = Seq.newBuilder[Av]
        while (peek != ']') vs += value()
        eat(']')
        AvList(vs.result())
      case '{' =>
        eat('{')
        val fs = Seq.newBuilder[(String, Av)]
        while (peek != '}') { val k = name(); eat(':'); fs += (k -> value()) }
        eat('}')
        AvObj(fs.result())
      case c if c.isDigit || c == '-' =>
        val start = i
        if (peek == '-') i += 1
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
          s(i) == 'E' || ((s(i) == '+' || s(i) == '-') &&
            (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        AvNum(s.substring(start, i).toDouble)
      case _ => name() match {
        case "true" => AvBool(true)
        case "false" => AvBool(false)
        case other => err(s"unexpected argument value '$other'")
      }
    }
    def document(): Sel = {
      eat('{')
      val root = field()
      if (peek != '}') err("exactly one root field is supported")
      eat('}'); ws()
      if (i < s.length) err("trailing input")
      root
    }
    private def field(): Sel = {
      val n = name()
      val args = if (peek == '(') {
        eat('(')
        val as = Seq.newBuilder[(String, Av)]
        while (peek != ')') { val k = name(); eat(':'); as += (k -> value()) }
        eat(')')
        as.result()
      } else Nil
      val subs = if (peek == '{') {
        eat('{')
        val fs = Seq.newBuilder[Sel]
        while (peek != '}') fs += field()
        eat('}')
        fs.result()
      } else Nil
      Sel(n, args, subs)
    }
  }

  // ---- compilation to one DataFrame plan
  def run(spark: SparkSession, g: GraphFrame, query: String): DataFrame =
    run(spark, g, query, None)

  /** Root-argument predicate on the base vertex frame (columns gid/label/
    * data) — pushed below the nested joins so a point lookup prunes the
    * scan (reference: filter_build.go ExtendGrip, id → gid). */
  private def argPredicate(args: Seq[(String, Av)]): Option[Column] = {
    def fieldCol(f: String): Column =
      if (f == "id" || f == "gid" || f == "_gid") col("gid")
      else get_json_object(col("data"), "$." + f)
    def cmp(f: String, v: Av, op: (Column, Column) => Column): Column = v match {
      case AvStr(s) => op(fieldCol(f), lit(s))
      case AvNum(n) => op(fieldCol(f).cast("double"), lit(n))
      case AvBool(b) => op(fieldCol(f), lit(b.toString))
      case other => throw new IllegalArgumentException(
        s"unsupported filter value for '$f': $other")
    }
    val preds = args.flatMap {
      case ("gid" | "id", AvStr(v)) => Seq(col("gid") === v)
      case ("ids", AvList(vs)) =>
        Seq(col("gid").isin(vs.collect { case AvStr(s) => s }: _*))
      case ("first" | "offset", AvNum(_)) => Nil // paging, handled after compile
      case ("after", AvStr(_)) => Nil // keyset cursor, handled after compile
      case (k @ ("first" | "offset" | "after"), v) =>
        throw new IllegalArgumentException(
          s"paging argument '$k' must be ${if (k == "after") "a string gid" else "an integer"}, got: $v")
      case ("filter", AvObj(ops)) => ops.map {
        case ("eq" | "=" | "EQ", AvObj(kvs)) =>
          kvs.map { case (f, v) => cmp(f, v, _ === _) }.reduce(_ && _)
        case ("gt" | ">" | "GT", AvObj(kvs)) =>
          kvs.map { case (f, v) => cmp(f, v, _ > _) }.reduce(_ && _)
        case ("lt" | "<" | "LT", AvObj(kvs)) =>
          kvs.map { case (f, v) => cmp(f, v, _ < _) }.reduce(_ && _)
        case (op, _) => throw new IllegalArgumentException(
          s"unsupported filter operator '$op' (eq/gt/lt)")
      }
      case (field, v @ (AvStr(_) | AvNum(_) | AvBool(_))) => // scalar shorthand
        Seq(cmp(field, v, _ === _))
      case (k, v) => throw new IllegalArgumentException(
        s"unsupported argument $k: $v")
    }
    preds.reduceOption(_ && _)
  }

  private def intArg(args: Seq[(String, Av)], k: String): Option[Int] =
    args.collectFirst { case (`k`, AvNum(n)) => n.toInt }

  /** `<Label>Aggregation` root fields (reference: builder.go:373-447
    * buildAggregationField): `_totalCount` plus one term histogram per
    * selected field, an optional `filter` argument, resolved through the
    * SAME gripql aggregate compiler the query endpoints use — one scan,
    * one shuffle for all selected fields. Buckets sort (count desc, key
    * asc) for deterministic JSON. */
  private def runAggregation(spark: SparkSession, g: GraphFrame, root: Sel): DataFrame = {
    import graft.gripql.{Agg, P, Query => GQuery}
    val label = root.name.stripSuffix("Aggregation")
    var q = GQuery().V().hasLabel(label)
    def av(v: Av): Any = v match {
      case AvStr(s) => s
      case AvNum(n) => n
      case AvBool(b) => b
      case other => throw new IllegalArgumentException(s"unsupported filter value: $other")
    }
    def fm(f: String) = if (f == "id") "_gid" else f
    root.args.foreach {
      case ("filter", AvObj(ops)) => ops.foreach {
        case ("eq" | "=" | "EQ", AvObj(kvs)) =>
          kvs.foreach { case (f, v) => q = q.has(P.eq_(fm(f), av(v))) }
        case ("gt" | ">" | "GT", AvObj(kvs)) =>
          kvs.foreach { case (f, v) => q = q.has(P.gt(fm(f), av(v))) }
        case ("lt" | "<" | "LT", AvObj(kvs)) =>
          kvs.foreach { case (f, v) => q = q.has(P.lt(fm(f), av(v))) }
        case (op, _) => throw new IllegalArgumentException(
          s"unsupported filter operator '$op' (eq/gt/lt)")
      }
      case (k, v) => throw new IllegalArgumentException(
        s"unsupported aggregation argument $k: $v")
    }
    val termFields = root.subs.filter(_.name != "_totalCount").map(_.name)
    q = q.aggregate(Agg.CountAgg("_totalCount") +:
      termFields.map(f => Agg.Term(f, f)): _*)
    // (name, key, value) buckets → one nested row, all 1-row broadcasts
    val rows = graft.compiler.Traversal.run(spark, g, q)
      .localCheckpoint(true) // one scan feeds every selected field
    val parts: Seq[DataFrame] = root.subs.map { s =>
      if (s.name == "_totalCount")
        rows.filter(col("name") === "_totalCount")
          .agg(coalesce(first(col("value")), lit(0.0)).cast("long").as("_totalCount"))
      else
        rows.filter(col("name") === s.name)
          .select(struct((-col("value")).as("_s"), col("key"),
            col("value").cast("long").as("count")).as("b"))
          .agg(sort_array(collect_list(col("b"))).as("bs"))
          .select(struct(transform(col("bs"), b =>
            struct(b.getField("key").as("key"), b.getField("count").as("count")))
            .as("histogram")).as(s.name))
    }
    val one = parts.reduce((a, b) => a.crossJoin(broadcast(b)))
    one.select(to_json(struct(root.subs.map(s => col(s.name)): _*)).as(root.name))
  }

  /** `triplesOverride` lets a caller that already knows the topology (e.g.
    * the server, which caches per-graph derived triples across requests)
    * skip the derive joins. */
  def run(spark: SparkSession, g: GraphFrame, query: String,
          triplesOverride: Option[Seq[EdgeType]]): DataFrame = {
    val root = parse(query)
    require(root.subs.nonEmpty, s"root selection '${root.name}' needs a selection set")
    if (root.name.endsWith("Aggregation") && root.name != "Aggregation")
      return runAggregation(spark, g, root)
    val triples: Seq[EdgeType] =
      triplesOverride.orElse(g.topology).getOrElse(deriveTriples(g))
    // keyset cursor (`after: gid`) compiles into the base filter itself, so
    // the page predicate rides the scan rather than sorting the full set
    val cursor = root.args.collectFirst { case ("after", AvStr(v)) => v }
    // the two paging models don't compose: an offset within the
    // post-cursor set muddles the contract AND forfeits the TakeOrdered
    // fast path — reject loudly like the other malformed-paging cases
    if (cursor.isDefined && intArg(root.args, "offset").isDefined)
      throw new IllegalArgumentException(
        "'after' (keyset) and 'offset' paging cannot be combined — page with 'after'+'first'")
    val pred0 = argPredicate(root.args)
    val pred = cursor match {
      case Some(c) => Some(pred0.fold(col("gid") > c)(_ && col("gid") > c))
      case None => pred0
    }
    val df = nodeDf(g, triples, root.name, pred, root.subs)
    // Paging, deterministic on the root gid; no paging args → no sort in
    // the plan at all. `after`+`first` is the scale-safe form: the cursor
    // predicate + orderBy+limit collapse to TakeOrdered (no full
    // sort+exchange). `offset`+`first` still works but pays a global sort
    // per page — keyset pagination is the 100-TB path.
    val paged = (intArg(root.args, "first"), intArg(root.args, "offset")) match {
      case (None, None) if cursor.isEmpty => df
      case (None, None) => df.orderBy(col("__gid")) // cursor alone: stable page order
      case (first, offset) =>
        val sorted = df.orderBy(col("__gid"))
        val skipped = offset.fold(sorted)(sorted.offset)
        first.fold(skipped)(skipped.limit)
    }
    paged.select(to_json(struct(root.subs.map(s => col(s.name)): _*)).as(root.name))
  }

  /** (from-label, edge-label, to-label) triples observed in the graph —
    * used when no topology/schema is declared; one small distinct query. */
  def deriveTriples(g: GraphFrame): Seq[EdgeType] = GraphFrame.deriveTriples(g)

  // ---- type system from the sampled schema (reference:
  // endpoints/graphqlv2/builder.go buildObjectMap/buildObject — sampled
  // FieldType names become GraphQL scalars, edge triples become list
  // fields, colliding (from, label) pairs disambiguate as label_to_To)

  /** `tpe` is a scalar name (String/Float/Boolean/JSON) or an object type
    * name; `list` wraps it in a GraphQL list. */
  final case class GqlField(name: String, tpe: String, list: Boolean)
  final case class GqlType(name: String, fields: Seq[GqlField])

  private val scalarNames = Set("String", "Float", "Boolean", "Int", "JSON")

  /** FieldType name → GraphQL scalar (builder.go:70-82; MAP/ARRAY/UNKNOWN
    * ride the endpoint's JSON catch-all scalar, ARRAY as a list of it). */
  private def scalarOf(t: String): (String, Boolean) = t match {
    case "STRING" => ("String", false)
    case "NUMERIC" => ("Float", false)
    case "BOOL" => ("Boolean", false)
    case "ARRAY" => ("JSON", true)
    case _ => ("JSON", false)
  }

  /** Build the GraphQL object types for a SAMPLED SCHEMA graph (the
    * [[graft.model.SchemaSampler]] layout: one vertex per label with
    * data = field→FieldType JSON; one edge per (from, label, to) triple).
    * Schema graphs are label-count-sized, so the collects are bounded. */
  def typeSystem(schema: GraphFrame): Seq[GqlType] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val vRows = schema.vertices.select(col("label"), col("data")).collect()
    val labels = vRows.map(_.getString(0)).toSet
    val triples = schema.edges.select(col("from"), col("label"), col("to"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filter(t => labels.contains(t._1) && labels.contains(t._3))
      .distinct.sortBy(t => (t._1, t._2, t._3)).toSeq
    vRows.sortBy(_.getString(0)).toSeq.map { r =>
      val label = r.getString(0)
      val props = Option(r.getString(1)).filter(_.nonEmpty).map(mapper.readTree).toSeq
        .flatMap { n =>
          import scala.jdk.CollectionConverters._
          n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq
        }.sortBy(_._1)
      val scalarFields = GqlField("id", "String", list = false) +:
        props.filter(_._1 != "id").map { case (f, t) =>
          val (s, l) = scalarOf(t); GqlField(f, s, l)
        }
      val mine = triples.filter(_._1 == label)
      val edgeFields = mine.map { case (_, el, to) =>
        // a label leaving this vertex toward 2+ targets splits per-target
        val fname = if (mine.count(_._2 == el) > 1) s"${el}_to_$to" else el
        GqlField(fname, to, list = true)
      }
      GqlType(label, scalarFields ++ edgeFields)
    }
  }

  /** The `<Label>Aggregation` companion types (builder.go:373-383:
    * BucketsForString/Histogram plus one aggregation object per label —
    * `_totalCount` and a term histogram per String-typed field). */
  private def aggregationTypes(types: Seq[GqlType]): Seq[GqlType] =
    Seq(
      GqlType("BucketsForString", Seq(
        GqlField("key", "String", list = false),
        GqlField("count", "Int", list = false))),
      GqlType("Histogram", Seq(
        GqlField("histogram", "BucketsForString", list = true)))) ++
      types.map(t => GqlType(t.name + "Aggregation",
        GqlField("_totalCount", "Int", list = false) +:
          t.fields.filter(f => f.tpe == "String" && !f.list)
            .map(f => GqlField(f.name, "Histogram", list = false))))

  /** SDL rendering of the type system — `scalar JSON`, one object type per
    * label plus its Aggregation companion, and the Query root the
    * reference's endpoint exposes (args id/ids/first/offset/filter per
    * label, builder.go:15-20). */
  def sdl(types: Seq[GqlType]): String = {
    val sb = new StringBuilder("scalar JSON\n\n")
    (types ++ aggregationTypes(types)).foreach { t =>
      sb.append(s"type ${t.name} {\n")
      t.fields.foreach { f =>
        val tn = if (f.list) s"[${f.tpe}]" else f.tpe
        sb.append(s"  ${f.name}: $tn\n")
      }
      sb.append("}\n\n")
    }
    sb.append("type Query {\n")
    types.foreach(t => sb.append(
      s"  ${t.name}(id: String, ids: [String], first: Int, offset: Int, filter: JSON): [${t.name}]\n"))
    types.foreach(t => sb.append(
      s"  ${t.name}Aggregation(filter: JSON): ${t.name}Aggregation\n"))
    sb.append("}\n")
    sb.toString
  }

  /** Answer `__schema` / `__type` introspection queries from the type
    * system; None when `query`'s root is not an introspection field (run
    * it as a data query instead). The response honors the request's
    * selection sets (no fragments — the fluent subset this endpoint
    * parses). */
  def introspection(types: Seq[GqlType], query: String): Option[String] = {
    val root = parse(query)
    if (root.name != "__schema" && root.name != "__type") return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

    def scalarRef(name: String): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("kind", "SCALAR"); o.put("name", name); o.putNull("ofType"); o
    }
    def objectRef(name: String): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("kind", "OBJECT"); o.put("name", name); o.putNull("ofType"); o
    }
    def listOf(inner: ObjectNode): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("kind", "LIST"); o.putNull("name"); o.set[ObjectNode]("ofType", inner); o
    }
    def ref(f: GqlField): ObjectNode = {
      val inner = if (scalarNames.contains(f.tpe)) scalarRef(f.tpe) else objectRef(f.tpe)
      if (f.list) listOf(inner) else inner
    }
    def fieldNode(name: String, tpe: ObjectNode, args: Seq[(String, ObjectNode)]): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("name", name); o.putNull("description")
      val argArr = o.putArray("args")
      args.foreach { case (an, at) =>
        val a = mapper.createObjectNode()
        a.put("name", an); a.putNull("description")
        a.set[ObjectNode]("type", at); a.putNull("defaultValue")
        argArr.add(a)
      }
      o.set[ObjectNode]("type", tpe)
      o.put("isDeprecated", false); o.putNull("deprecationReason")
      o
    }
    def typeNode(t: GqlType): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("kind", "OBJECT"); o.put("name", t.name); o.putNull("description")
      val fs = o.putArray("fields")
      t.fields.foreach(f => fs.add(fieldNode(f.name, ref(f), Nil)))
      o.putNull("inputFields"); o.putArray("interfaces")
      o.putNull("enumValues"); o.putNull("possibleTypes")
      o
    }
    def scalarTypeNode(name: String): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("kind", "SCALAR"); o.put("name", name); o.putNull("description")
      o.putNull("fields"); o.putNull("inputFields"); o.putArray("interfaces")
      o.putNull("enumValues"); o.putNull("possibleTypes")
      o
    }
    val queryArgs = Seq(
      "id" -> scalarRef("String"), "ids" -> listOf(scalarRef("String")),
      "first" -> scalarRef("Int"), "offset" -> scalarRef("Int"),
      "filter" -> scalarRef("JSON"))
    val queryType: ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("kind", "OBJECT"); o.put("name", "Query"); o.putNull("description")
      val fs = o.putArray("fields")
      types.foreach(t => fs.add(fieldNode(t.name, listOf(objectRef(t.name)), queryArgs)))
      types.foreach(t => fs.add(fieldNode(t.name + "Aggregation",
        objectRef(t.name + "Aggregation"), Seq("filter" -> scalarRef("JSON")))))
      o.putNull("inputFields"); o.putArray("interfaces")
      o.putNull("enumValues"); o.putNull("possibleTypes")
      o
    }
    val allTypes: Seq[ObjectNode] =
      (queryType +: (types ++ aggregationTypes(types)).map(typeNode)) ++
        scalarNames.toSeq.sorted.map(scalarTypeNode)

    /** Keep only the selected keys; recurse into sub-selections (arrays
      * prune element-wise; selecting into a null leaves the null). */
    def prune(node: JsonNode, sels: Seq[Sel]): JsonNode =
      if (sels.isEmpty || node == null || node.isNull) node
      else node match {
        case arr: ArrayNode =>
          val out = mapper.createArrayNode()
          arr.forEach(e => { out.add(prune(e, sels)); () })
          out
        case obj: ObjectNode =>
          val out = mapper.createObjectNode()
          sels.foreach { s =>
            if (!obj.has(s.name))
              throw new IllegalArgumentException(
                s"unknown introspection field '${s.name}'")
            out.set[JsonNode](s.name, prune(obj.get(s.name), s.subs))
          }
          out
        case other => other
      }

    val value: JsonNode = root.name match {
      case "__schema" =>
        val o = mapper.createObjectNode()
        o.set[ObjectNode]("queryType", {
          val q = mapper.createObjectNode(); q.put("name", "Query"); q
        })
        o.putNull("mutationType"); o.putNull("subscriptionType")
        val ts = o.putArray("types"); allTypes.foreach(ts.add)
        o.putArray("directives")
        prune(o, root.subs)
      case "__type" =>
        val wanted = root.gid.getOrElse(
          throw new IllegalArgumentException("__type needs a name argument"))
        allTypes.find(_.get("name").asText() == wanted)
          .map(prune(_, root.subs))
          .getOrElse(mapper.nullNode())
    }
    val resp = mapper.createObjectNode()
    resp.putObject("data").set[JsonNode](root.name, value)
    Some(mapper.writeValueAsString(resp))
  }

  /** Rows of `label` vertices with one column per selection: scalars from
    * the data document, edge fields as sorted arrays of child structs. */
  private def nodeDf(g: GraphFrame, triples: Seq[EdgeType], label: String,
                     baseFilter: Option[Column], sels: Seq[Sel]): DataFrame = {
    val base0 = g.vertices.filter(col("label") === label)
    val base = baseFilter.fold(base0)(base0.filter)
    var out = base.select(col("gid").as("__gid"), col("data").as("__data"))
    for (s <- sels) {
      // nested-field arguments are not implemented — reject loudly rather
      // than silently returning the unfiltered/unpaged children
      if (s.args.nonEmpty)
        throw new IllegalArgumentException(
          s"arguments on nested field '${s.name}' are not supported (only the root selection takes arguments)")
      val triple = triples.find(t => t.from == label && t.label == s.name)
      (triple, s.subs) match {
        case (None, Nil) =>
          val value = s.name match {
            case "gid" => col("__gid")
            case "label" => lit(label)
            case f => get_json_object(col("__data"), "$." + f)
          }
          out = out.withColumn(s.name, value)
        case (None, _) =>
          throw new IllegalArgumentException(
            s"'${s.name}' has a selection set but is not an edge label leaving '$label'")
        case (Some(t), _) =>
          require(s.subs.nonEmpty, s"edge field '${s.name}' needs a selection set")
          val child = nodeDf(g, triples, t.to, None, s.subs)
          val payload = struct(s.subs.map(x => col(x.name)): _*)
          val e = g.edges.filter(col("label") === t.label)
            .select(col("from").as("__pgid"), col("to").as("__cgid"))
          val joined = e.join(child, col("__cgid") === child("__gid"))
            .select(col("__pgid"), struct(col("__cgid"), payload.as("p")).as("__cp"))
          val agg = joined.groupBy("__pgid")
            .agg(transform(sort_array(collect_list(col("__cp"))), x => x.getField("p")).as(s.name))
          out = out.join(agg, out("__gid") === agg("__pgid"), "left_outer")
            .drop("__pgid")
            .withColumn(s.name, coalesce(col(s.name), array().cast(agg.schema(s.name).dataType)))
      }
    }
    out
  }
}
