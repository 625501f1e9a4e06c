package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.{DataFrame, Row}
import graft.gripql.Stmt

import scala.jdk.CollectionConverters._

/** The reference's QueryResult wire format (gripql/gripql.proto:208-218):
  * every ND-JSON line a protojson `oneof` — `{"vertex":{...}}`,
  * `{"edge":{...}}`, `{"count":n}`, `{"aggregations":{...}}`,
  * `{"render":...}`, `{"path":[...]}`, `{"selections":{...}}` — with the
  * property bag embedded as a JSON OBJECT, not text. This is what the
  * reference's generated gRPC-gateway emits and therefore what every
  * shipped gripql client (python/JS/R iterate-and-unwrap, e.g.
  * gripql/python/gripql/query.py:390-420) parses; emitting it makes the
  * HTTP surface drop-in for those clients.
  *
  * Formatting runs on the driver over `toLocalIterator` — the same place
  * the old raw `toJSON` serialization happened, so streaming memory stays
  * one-partition-bounded either way. */
object Wire {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  private def dataNode(text: String) =
    if (text == null || text.isEmpty) nf.objectNode()
    else mapper.readTree(text)

  /** protojson Vertex/Edge: a vertex has NULL from/to by construction
    * (compiler/Traversal.scala vertexStruct), an edge never does. */
  private def element(gid: String, label: String, from: String, to: String,
                      data: String): (String, String) = {
    val o = nf.objectNode()
    o.put("gid", gid)
    o.put("label", label)
    if (from != null) { o.put("from", from); o.put("to", to) }
    o.set("data", dataNode(data))
    (if (from == null) "vertex" else "edge", mapper.writeValueAsString(o))
  }

  private def elementLine(r: Row): String = {
    val (kind, json) = element(r.getString(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getString(2),
      if (r.isNullAt(3)) null else r.getString(3), r.getString(4))
    s"""{"$kind":$json}"""
  }

  /** Term keys keep their JSON type when the text is unambiguously a
    * number/bool (protobuf Value key, gripql.proto:124); field/type/count
    * keys are always strings. */
  private def keyJson(s: String, numericHint: Boolean): String =
    if (s == null) "null"
    else if (numericHint && s.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?")) s
    else if (s == "true" || s == "false") s
    else mapper.writeValueAsString(nf.textNode(s))

  private def numJson(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** QueryResult lines for a finished traversal whose LAST statement is
    * `last` (None = a spooled-job view: full elements). */
  def lines(df: DataFrame, last: Option[Stmt]): Iterator[String] = last match {
    case Some(_: Stmt.Count) =>
      df.toLocalIterator().asScala.map(r => s"""{"count":${r.getLong(0)}}""")

    case Some(Stmt.Aggregate(aggs)) =>
      // numeric-typed keys only where the aggregation family produces them
      val numericKeyed = aggs.collect {
        case a: graft.gripql.Agg.Term => a.name
        case a: graft.gripql.Agg.Histogram => a.name
        case a: graft.gripql.Agg.Percentile => a.name
      }.toSet
      df.toLocalIterator().asScala.map { r =>
        val name = r.getString(0)
        val key = keyJson(if (r.isNullAt(1)) null else r.getString(1), numericKeyed(name))
        s"""{"aggregations":{"name":${mapper.writeValueAsString(nf.textNode(name))},"key":$key,"value":${numJson(r.getDouble(2))}}}"""
      }

    case Some(_: Stmt.Render) =>
      // the render column is already a JSON fragment (compiler/Render.scala)
      df.toLocalIterator().asScala.map { r =>
        s"""{"render":${if (r.isNullAt(0)) "null" else r.getString(0)}}"""
      }

    case Some(_: Stmt.Path) =>
      df.toLocalIterator().asScala.map { r =>
        val entries = r.getSeq[Row](0).map { e =>
          if (!e.isNullAt(0)) s"""{"vertex":${mapper.writeValueAsString(nf.textNode(e.getString(0)))}}"""
          else s"""{"edge":${mapper.writeValueAsString(nf.textNode(e.getString(1)))}}"""
        }
        s"""{"path":[${entries.mkString(",")}]}"""
      }

    case Some(Stmt.SelectMany(names)) =>
      df.toLocalIterator().asScala.map { r =>
        val sels = names.zipWithIndex.map { case (n, i) =>
          val e = r.getStruct(i)
          val (kind, json) = element(e.getString(0), e.getString(1),
            if (e.isNullAt(2)) null else e.getString(2),
            if (e.isNullAt(3)) null else e.getString(3), e.getString(4))
          s"""${mapper.writeValueAsString(nf.textNode(n))}:{"$kind":$json}"""
        }
        s"""{"selections":{"selections":{${sels.mkString(",")}}}}"""
      }

    case _ => df.toLocalIterator().asScala.map(elementLine)
  }
}
