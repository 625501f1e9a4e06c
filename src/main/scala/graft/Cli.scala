package graft

import org.apache.spark.sql.SparkSession
import graft.model.{Catalog, GraphFrame, Gripper, Jobs, MutableGraph, Rdf}
import graft.gripql.Parser
import graft.compiler.Traversal

/** Command-line surface mirroring the reference CLI (reference: cmd/ —
  * create, drop, list, load, dump, info, query, schema, rdf, mapping,
  * job, server). The graph store is a Catalog directory of
  * label-partitioned parquet graphs (default `./graft-graphs`, override
  * with GRAFT_HOME).
  *
  *   graft create <graph>
  *   graft drop <graph>
  *   graft list
  *   graft info <graph>
  *   graft load <graph> --vertices f.jsonl --edges f.jsonl | --rdf f.nt
  *     [--merge]  → upsert into an existing graph, rewriting only the
  *                  touched label partitions (reference: cmd/load BulkAdds
  *                  into the live graph rather than replacing it)
  *   graft dump <graph> [--vertices|--edges]           → ND-JSON on stdout
  *   graft query <graph> "V().hasLabel('x').count()"   → ND-JSON on stdout
  *   graft schema <graph> [--sample-n N]               → sampled schema JSON
  *   graft index add|drop <graph> <label> <field> | list <graph>
  *   graft manifest enable <graph>
  *   graft mapping <graph> <config.yaml> <sourcesDir> [--id coll=col ...]
  *   graft job submit <graph> <query> | list <graph> | view <graph> <id>
  *             | resume <graph> <id> <extension> | drop <graph> <id>
  *   graft server [port]                               → HTTP server over the store
  */
object Cli {
  private def usage(): Nothing = {
    System.err.println(
      """usage: graft <create|drop|list|info|load|dump|query|schema|index|manifest|mapping|gripper-serve|gripper-plugin|job|server> ...
        |see Cli.scala scaladoc for per-command arguments""".stripMargin)
    sys.exit(2)
  }

  private lazy val spark: SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Test seam: set BEFORE the first command runs to point the store at a
    * scratch directory (the env var can't be mutated in-JVM). */
  private[graft] var homeOverride: Option[String] = None
  // re-resolved per access (not lazy) so an override set between commands —
  // or by a test suite after another suite already ran a command — takes
  // effect instead of silently pointing at the first-resolved store
  private def home: String =
    homeOverride.getOrElse(sys.env.getOrElse("GRAFT_HOME", "graft-graphs"))
  private var catalogCache: Option[(String, Catalog)] = None
  private def catalog: Catalog = synchronized {
    val h = home
    catalogCache match {
      case Some((ch, c)) if ch == h => c
      case _ => val c = new Catalog(spark, h); catalogCache = Some((h, c)); c
    }
  }
  private def jobsDir(g: String) = s"$home/$g/.jobs"

  private def opt(args: Seq[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  private def printNdjson(df: org.apache.spark.sql.DataFrame): Unit = {
    val it = df.toJSON.toLocalIterator()
    while (it.hasNext) println(it.next())
  }

  private def printLines(it: Iterator[String]): Unit = it.foreach(println)

  def main(args: Array[String]): Unit = args.toList match {
    case "create" :: g :: Nil =>
      catalog.createGraph(g, graft.model.MutableGraph.empty(spark).graph)
      println(s"created $g")

    case "drop" :: g :: Nil =>
      catalog.dropGraph(g); println(s"dropped $g")

    case "list" :: Nil =>
      catalog.listGraphs().foreach(println)

    case "info" :: g :: Nil =>
      val gf = catalog.graph(g)
      val (vl, el) = catalog.listLabels(g)
      println(s"""{"graph":"$g","vertices":${gf.vertices.count()},"edges":${gf.edges.count()},""" +
        s""""vertexLabels":${vl.mkString("[\"", "\",\"", "\"]")},""" +
        s""""edgeLabels":${el.mkString("[\"", "\",\"", "\"]")}}""")

    case "load" :: g :: rest =>
      val gf = opt(rest, "--rdf") match {
        case Some(nt) => Rdf.load(spark, nt)
        case None => GraphFrame.fromJsonLines(spark,
          opt(rest, "--vertices").getOrElse(usage()),
          opt(rest, "--edges").getOrElse(usage()))
      }
      if (rest.contains("--merge") && catalog.listGraphs().contains(g)) {
        val mg = MutableGraph(spark, catalog.graph(g))
        val errs = mg.bulkAddFrames(gf.vertices, gf.edges)
        catalog.upsertGraph(g, mg)
        println(s"merged into $g ($errs invalid elements skipped)")
      } else {
        catalog.createGraph(g, gf)
        println(s"loaded $g")
      }

    case "dump" :: g :: rest =>
      val gf = catalog.graph(g)
      if (!rest.contains("--edges")) printNdjson(gf.vertices)
      if (!rest.contains("--vertices")) printNdjson(gf.edges)

    case "query" :: g :: q :: Nil =>
      // the reference CLI evaluates the query text as JavaScript
      // (cmd/query/main.go:29-62); a plain fluent chain is valid JS, so
      // JsQuery handles both — the fluent parser stays as the fallback
      // for non-JS input, but a script that IS JS and merely uses an
      // out-of-subset construct surfaces the JS boundary error (which
      // names the construct) instead of the fluent parser's confusion
      val pq = try graft.gripql.JsQuery.eval(q)
        catch {
          case e: graft.gripql.JsQuery.UnsupportedJsConstruct => throw e
          case scala.util.control.NonFatal(_) => Parser.parse(q)
        }
      printLines(graft.server.Wire.lines(
        Traversal.run(spark, catalog.graph(g), pq), pq.stmts.lastOption))

    case "schema" :: g :: rest =>
      val n = opt(rest, "--sample-n").map(_.toInt).getOrElse(50)
      val sg = catalog.getSchema(g, n)
      printNdjson(sg.vertices); printNdjson(sg.edges)

    // field index surface (reference: cmd/index — AddIndex/DeleteIndex/
    // ListIndices): `add` also runs the physical re-layout (Catalog doc).
    // `--edges` targets the edge-side index (value-add; the reference
    // indexes vertices only).
    case "index" :: "add" :: g :: label :: field :: Nil =>
      catalog.addIndex(g, label, field)
      println(s"indexed ($label, $field) on $g")
    case "index" :: "add" :: "--edges" :: g :: label :: field :: Nil =>
      catalog.addEdgeIndex(g, label, field)
      println(s"indexed edges ($label, $field) on $g")
    case "index" :: "drop" :: g :: label :: field :: Nil =>
      catalog.deleteIndex(g, label, field)
      println(s"dropped index ($label, $field) on $g")
    case "index" :: "drop" :: "--edges" :: g :: label :: field :: Nil =>
      catalog.deleteEdgeIndex(g, label, field)
      println(s"dropped edge index ($label, $field) on $g")
    case "index" :: "list" :: g :: Nil =>
      catalog.listIndices(g).foreach { case (l, f) => println(s"V\t$l\t$f") }
      catalog.listEdgeIndices(g).foreach { case (l, f) => println(s"E\t$l\t$f") }
    // pointer-commit storage mode: incremental saves / index builds commit
    // by replacing one manifest file instead of renaming live directories
    // — the safe protocol for object stores (see graft.model.Manifest)
    case "manifest" :: "enable" :: g :: Nil =>
      catalog.enableManifestCommit(g)
      println(s"pointer-commit enabled on $g")

    case "mapping" :: g :: conf :: sources :: rest =>
      val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(conf)), "UTF-8")
      val cfg = Gripper.parse(text)
      val srcNames = (cfg.vertices.map(_.data.source) ++ cfg.edges.map(_.data.source)).distinct
      // --id collection=column designates the Row.Id column for
      // collections that don't already carry an `id` column
      val idCols = rest.sliding(2, 2).collect {
        case Seq("--id", kv) => kv.split("=", 2) match {
          case Array(c, k) => c -> k
          case _ => usage()
        }
      }.toMap
      // sources is a parquet dir, or grpc://host:port for a live
      // GRIPSource plugin (the reference's gripper deployment shape)
      val provider: Gripper.SourceProvider = sources match {
        case s if s.startsWith("grpc://") =>
          val hp = s.stripPrefix("grpc://").split(":", 2)
          graft.server.GripperWire.grpcSource(spark,
            new graft.server.GripperClient(hp(0), hp(1).toInt))
        case dir => Gripper.DirSource(spark, dir, idCols)
      }
      catalog.createGraph(g,
        Gripper.graph(cfg, srcNames.map(_ -> provider).toMap))
      println(s"created $g from mapping $conf")

    // plugin-harness entrypoint (the exec driver's child contract,
    // reference gripper/plugins.go:41-69): argv is one conf.json path
    // holding the StartPlugin config map ({"path": <parquet dir>,
    // "id.<coll>": <col>, "port"?: n}); requires the handshake cookie
    // env (go-plugin refuses to run outside a plugin harness the same
    // way), serves GRIPSource on an ephemeral port, and announces it
    // with a go-plugin-style handshake line on stdout
    case "gripper-plugin" :: confPath :: Nil =>
      if (sys.env.get("GRIP_PLUGIN_EXTERNAL_RESOURCE") != Some("gripper")) {
        System.err.println(
          "this command is a gripper plugin entrypoint — it must be launched " +
            "by a plugin harness (missing handshake cookie), not run directly")
        sys.exit(1)
      }
      val conf = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(confPath)))
      val path = Option(conf.get("path")).orElse(Option(conf.get("dir")))
        .map(_.asText()).getOrElse {
          System.err.println(s"conf $confPath needs {\"path\": <parquet dir>}")
          sys.exit(1)
        }
      val port = Option(conf.get("port")).map(_.asText().toInt).getOrElse(0)
      val ids = {
        import scala.jdk.CollectionConverters._
        conf.properties().asScala.collect {
          case e if e.getKey.startsWith("id.") =>
            e.getKey.stripPrefix("id.") -> e.getValue.asText()
        }.toMap
      }
      val psrv = new graft.server.GripperTableServer(
        Gripper.DirSource(spark, path, ids), port)
      psrv.start()
      // the handshake line (go-plugin wire shape: CORE|APP|NETWORK|ADDR|PROTOCOL)
      println(s"1|1|tcp|127.0.0.1:${psrv.boundPort}|grpc")
      Console.out.flush()
      // serve until the harness goes away: stdin is the launcher's pipe,
      // so EOF means the parent exited (or killed us softly) — exit rather
      // than orphan a JVM (go-plugin children do the same)
      try { while (System.in.read() != -1) () } catch { case _: Exception => () }
      psrv.stop()
      sys.exit(0)

    // serve a parquet dir as a gripper.proto GRIPSource plugin — the
    // other side of the wire: any GRIP-compatible engine (including this
    // one via grpc:// above) can federate over it
    case "gripper-serve" :: dir :: rest =>
      val port = opt(rest, "--port").map(_.toInt).getOrElse(8203)
      val idCols = rest.sliding(2, 2).collect {
        case Seq("--id", kv) => kv.split("=", 2) match {
          case Array(c, k) => c -> k
          case _ => usage()
        }
      }.toMap
      val srv = new graft.server.GripperTableServer(
        Gripper.DirSource(spark, dir, idCols), port)
      srv.start()
      println(s"gripper source serving $dir on :${srv.boundPort}")
      Thread.currentThread().join()

    case "job" :: "submit" :: g :: q :: Nil =>
      println(Jobs.submit(spark, catalog.graph(g), Parser.parse(q), jobsDir(g)))
    case "job" :: "list" :: g :: Nil =>
      Jobs.listJobs(jobsDir(g)).foreach(println)
    case "job" :: "view" :: g :: id :: Nil =>
      printLines(graft.server.Wire.lines(
        Jobs.view(spark, catalog.graph(g), jobsDir(g), id), None))
    case "job" :: "resume" :: g :: id :: ext :: Nil =>
      val pext = Parser.parseExtension(ext)
      printLines(graft.server.Wire.lines(
        Jobs.resume(spark, catalog.graph(g), jobsDir(g), id, pext), pext.stmts.lastOption))
    case "job" :: "drop" :: g :: id :: Nil =>
      if (Jobs.deleteJob(jobsDir(g), id)) println(s"dropped $id") else usage()

    case "server" :: rest =>
      val port = rest.headOption.map(_.toInt).getOrElse(8201)
      val srv = new graft.server.GraftServer(spark, port)
      catalog.listGraphs().foreach(g => srv.addGraph(g, catalog.graph(g)))
      srv.start()
      println(s"graft server listening on :$port (graphs: ${catalog.listGraphs().mkString(", ")})")
      Thread.currentThread().join()

    case _ => usage()
  }
}
