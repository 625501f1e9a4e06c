package graft.model

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native analogue of the reference's GRIPPER federated source:
  * external tabular "collections" exposed as a property graph through a
  * declarative mapping config (reference: gripper/gripper.proto:45-56 the
  * plugin RPC surface, gripper/config.go:14-45 the mapping config,
  * gripper/graph.go:50-160 NewTabularGraph validation + edge flipping).
  *
  * Architecture shift: the reference reaches each collection through a gRPC
  * plugin that streams rows and answers point lookups (GetRows /
  * GetRowsByField), and re-implements every traversal as batched channel
  * lookups against those RPCs (gripper/graph.go:509-764). On Spark the
  * plugin boundary becomes a [[Gripper.SourceProvider]] that yields each
  * collection as a DataFrame — a thin facade over `spark.read` (or, on a
  * real deployment, any DataSource V2 connector: JDBC, Delta, Iceberg...).
  * The mapping then *declares* a lazy union view; traversals stay ordinary
  * Catalyst joins against it, point lookups become pushed-down `gid`
  * filters, and the per-step RPC machinery (channel mux, row queues,
  * driver cache) has no equivalent because the cluster IS the parallelism.
  *
  * Semantics preserved from the reference:
  *   - vertex gid = config prefix + row id (graph.go:348 `c.prefix+row.Id`)
  *   - edge endpoints come from fields OF THE EDGE COLLECTION's rows;
  *     rows whose from/to field is missing or empty yield no edge
  *     (graph.go:377-390 skips them)
  *   - edge gid = from + "-" + label + "-" + to (sources.go:16-21 GenID)
  *   - element data = the full row document (graph.go:349,383 row.Data)
  *   - config validation errors mirror NewTabularGraph: unknown edge
  *     endpoint configs, missing edge source info, from/to fields absent
  *     from the edge collection (graph.go:73-101)
  *
  * Bonus over the reference: the mapping's (fromVertex, label, toVertex)
  * triples are exactly a [[EdgeType]] topology, so a Gripper graph plans
  * hop joins against only the reachable union branches for free.
  */
object Gripper {

  /** Where an element's rows live (reference: gripper/config.go:26-31). */
  case class ElementConfig(source: String = "", collection: String = "",
                           fromField: String = "", toField: String = "")

  /** One vertex class; `prefix` is the gid prefix (the reference keys its
    * vertex map by it, gripper/config.go:33-36 + swapi.yaml's `gid:`). */
  case class VertexConfig(prefix: String, label: String, data: ElementConfig)

  /** One edge class; `from`/`to` name vertex prefixes
    * (reference: gripper/config.go:38-43). */
  case class EdgeConfig(prefix: String, from: String, to: String,
                        label: String, data: ElementConfig)

  case class GraphConfig(vertices: Seq[VertexConfig], edges: Seq[EdgeConfig])

  /** The plugin boundary: a named source serving tabular collections.
    * Contract: every collection DataFrame carries a string-castable `id`
    * column (the reference's Row.Id) plus arbitrary data columns; `id` is
    * also a data field, as in the reference's table server (swapi.yaml maps
    * the homeworld edge over collection=Character with fromField=id). */
  trait SourceProvider {
    def collections: Seq[String]
    def collection(name: String): DataFrame
  }

  /** In-memory provider — collections are pre-built DataFrames. */
  final case class FrameSource(tables: Map[String, DataFrame]) extends SourceProvider {
    def collections: Seq[String] = tables.keys.toSeq.sorted
    def collection(name: String): DataFrame =
      tables.getOrElse(name, throw new IllegalArgumentException(s"Unable to get collection information: $name"))
  }

  /** Directory provider: each parquet table under `dir` is a collection
    * named by its basename (`<dir>/<name>.parquet`). The Spark twin of the
    * reference's example TSV table server (gripper/test-graph). `idCols`
    * designates which column serves as the reference's Row.Id for
    * collections that don't already carry an `id` column — the row keeps
    * all its original fields, as the table server's rows do. */
  final case class DirSource(spark: SparkSession, dir: String,
                             idCols: Map[String, String] = Map.empty) extends SourceProvider {
    def collections: Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).map(_.getPath.getName).filter(_.endsWith(".parquet"))
        .map(_.stripSuffix(".parquet")).toSeq.sorted
    }
    def collection(name: String): DataFrame = {
      val t = spark.read.parquet(s"$dir/$name.parquet")
      idCols.get(name).fold(t)(k => t.withColumn("id", col(k)))
    }
  }

  /** Parse a mapping config from YAML or JSON text (the reference accepts
    * both — sigs.k8s.io/yaml, gripper/config.go:60-66). Two layouts are
    * accepted, matching the reference's fixtures: a LIST of elements whose
    * `gid` is the prefix (test-graph/swapi.yaml) or a MAP keyed by prefix
    * (config.go GraphConfig). */
  def parse(text: String): GraphConfig = {
    val root = asScalaTree(new org.yaml.snakeyaml.Yaml().load[Object](text)) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(s"gripper config: expected a mapping at top level, got $other")
    }
    def elem(m: Map[String, Any]): ElementConfig = ElementConfig(
      source = str(m, "source"), collection = str(m, "collection"),
      fromField = str(m, "fromField"), toField = str(m, "toField"))
    def str(m: Map[String, Any], k: String): String =
      m.get(k).map(_.toString).getOrElse("")
    def entries(key: String): Seq[(String, Map[String, Any])] = root.get(key) match {
      case None => Nil
      case Some(xs: Seq[_]) => xs.map { x =>
        val m = x.asInstanceOf[Map[String, Any]]
        (str(m, "gid"), m)
      }
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).map {
          case (k, v) => (k, v.asInstanceOf[Map[String, Any]])
        }
      case Some(other) => throw new IllegalArgumentException(s"gripper config: $key must be a list or map, got $other")
    }
    val vs = entries("vertices").map { case (prefix, m) =>
      VertexConfig(prefix, str(m, "label"),
        m.get("data").map(d => elem(d.asInstanceOf[Map[String, Any]])).getOrElse(ElementConfig()))
    }
    val es = entries("edges").map { case (prefix, m) =>
      EdgeConfig(prefix, from = str(m, "from"), to = str(m, "to"), label = str(m, "label"),
        data = m.get("data").map(d => elem(d.asInstanceOf[Map[String, Any]])).getOrElse(ElementConfig()))
    }
    GraphConfig(vs, es)
  }

  private def asScalaTree(o: Object): Any = o match {
    case m: java.util.Map[_, _] =>
      m.asInstanceOf[java.util.Map[Object, Object]].asScala.toMap.map {
        case (k, v) => (String.valueOf(k), asScalaTree(v))
      }
    case l: java.util.List[_] =>
      l.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(asScalaTree)
    case other => other
  }

  /** Build the graph view. Validation mirrors NewTabularGraph
    * (gripper/graph.go:64-101); everything after it is lazy. */
  def graph(conf: GraphConfig, sources: Map[String, SourceProvider],
            idCol: String = "id"): GraphFrame = {
    require(conf.vertices.nonEmpty, "gripper mapping needs at least one vertex config")
    val byPrefix = conf.vertices.map(v => v.prefix -> v).toMap

    def table(e: ElementConfig, what: String): DataFrame = {
      val src = sources.getOrElse(e.source,
        throw new IllegalArgumentException(s"$what: unknown source '${e.source}'"))
      if (!src.collections.contains(e.collection))
        throw new IllegalArgumentException(s"Unable to get collection information ${e.source} : ${e.collection}")
      src.collection(e.collection)
    }

    conf.vertices.foreach(v => table(v.data, s"vertex ${v.prefix}"))
    conf.edges.foreach { e =>
      if (!byPrefix.contains(e.to) || !byPrefix.contains(e.from))
        throw new IllegalArgumentException(s"Edge ToVertex not found: ${e.prefix}")
      val d = e.data
      if (d.collection.isEmpty || d.source.isEmpty || d.fromField.isEmpty || d.toField.isEmpty)
        throw new IllegalArgumentException(s"Edge missing config info: ${e.prefix}")
      val cols = table(d, s"edge ${e.prefix}").columns.toSet
      if (!cols.contains(d.toField))
        throw new IllegalArgumentException(s"Edge 'To' Field not indexed: ${d.collection} ${d.toField}")
      if (!cols.contains(d.fromField))
        throw new IllegalArgumentException(s"Edge 'From' Field not indexed: ${d.collection} ${d.fromField}")
    }

    def rowJson(df: DataFrame): Column =
      to_json(struct(df.columns.map(col).toIndexedSeq: _*))

    val vertices = conf.vertices.map { v =>
      val t = table(v.data, v.prefix)
      t.select(
        concat(lit(v.prefix), col(idCol).cast("string")).as("gid"),
        lit(v.label).as("label"),
        rowJson(t).as("data"))
    }.reduce(_ unionByName _)

    val edges =
      if (conf.edges.isEmpty)
        vertices.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), GraphFrame.edgeSchema)
      else conf.edges.map { e =>
        val t = table(e.data, e.prefix)
        // the reference's typed tables carry string keys (getFieldString,
        // graph.go:40-48); on Spark we stringify so integer-keyed tables
        // map too, and preserve the skip-on-missing/empty contract
        val fromId = col(e.data.fromField).cast("string")
        val toId = col(e.data.toField).cast("string")
        val from = concat(lit(e.from), fromId)
        val to = concat(lit(e.to), toId)
        t.filter(fromId.isNotNull && toId.isNotNull && fromId =!= "" && toId =!= "")
          .select(
            concat(from, lit("-"), lit(e.label), lit("-"), to).as("gid"),
            lit(e.label).as("label"),
            from.as("from"),
            to.as("to"),
            rowJson(t).as("data"))
      }.reduce(_ unionByName _)

    val topology = conf.edges.map(e =>
      EdgeType(byPrefix(e.from).label, e.label, byPrefix(e.to).label)).distinct

    GraphFrame(vertices, edges,
      topology = if (topology.nonEmpty) Some(topology) else None)
  }

  /** Parse + build in one step. */
  def graph(configText: String, sources: Map[String, SourceProvider]): GraphFrame =
    graph(parse(configText), sources)
}
