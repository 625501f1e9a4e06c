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
  *   { Label (gid: "x")? { scalarField edgeLabel { ... } } }
  * A field is an edge hop iff the graph's EdgeType topology has a triple
  * (Label, field, _); otherwise it reads `data.field` (with `gid`/`label`
  * reserved). Child lists are sorted by child gid — deterministic output.
  */
object GraphQL {
  case class Sel(name: String, gid: Option[String], subs: Seq[Sel])

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
      val gid = if (peek == '(') {
        eat('(')
        val k = name()
        if (k != "gid") err(s"only the gid argument is supported, got '$k'")
        eat(':'); val v = str(); eat(')')
        Some(v)
      } else None
      val subs = if (peek == '{') {
        eat('{')
        val fs = Seq.newBuilder[Sel]
        while (peek != '}') fs += field()
        eat('}')
        fs.result()
      } else Nil
      Sel(n, gid, subs)
    }
  }

  // ---- compilation to one DataFrame plan
  def run(spark: SparkSession, g: GraphFrame, query: String): DataFrame =
    run(spark, g, query, None)

  /** `triplesOverride` lets a caller that already knows the topology (e.g.
    * the server, which caches per-graph derived triples across requests)
    * skip the derive joins. */
  def run(spark: SparkSession, g: GraphFrame, query: String,
          triplesOverride: Option[Seq[EdgeType]]): DataFrame = {
    val root = parse(query)
    require(root.subs.nonEmpty, s"root selection '${root.name}' needs a selection set")
    val triples: Seq[EdgeType] =
      triplesOverride.orElse(g.topology).getOrElse(deriveTriples(g))
    val df = nodeDf(g, triples, root.name, root.gid, root.subs)
    df.select(to_json(struct(root.subs.map(s => col(s.name)): _*)).as(root.name))
  }

  /** (from-label, edge-label, to-label) triples observed in the graph —
    * used when no topology/schema is declared; one small distinct query. */
  def deriveTriples(g: GraphFrame): Seq[EdgeType] = GraphFrame.deriveTriples(g)

  /** Rows of `label` vertices with one column per selection: scalars from
    * the data document, edge fields as sorted arrays of child structs. */
  private def nodeDf(g: GraphFrame, triples: Seq[EdgeType], label: String,
                     gid: Option[String], sels: Seq[Sel]): DataFrame = {
    val base0 = g.vertices.filter(col("label") === label)
    val base = gid.fold(base0)(id => base0.filter(col("gid") === id))
    var out = base.select(col("gid").as("__gid"), col("data").as("__data"))
    for (s <- sels) {
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
