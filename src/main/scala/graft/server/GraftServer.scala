package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession
import graft.gripql.{Json, Parser, Query}
import graft.model.{GraphFrame, Gripper, Jobs, MutableGraph}
import graft.compiler.Traversal

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Minimal HTTP server surface over the engine — the Spark-first analogue
  * of the reference's REST gateway around its Traversal/Edit RPCs
  * (reference: server/api.go:20-45, gripql/gripql.proto:313-319 Query,
  * :425-503 Edit). Uses only the JDK's built-in HTTP server — no new
  * dependencies — and streams query results as JSON-lines through
  * `toLocalIterator`, so a large result never materializes on the server.
  *
  * Routes (all bodies JSON; traversal streams emit the reference
  * QueryResult wire format — see [[Wire]] — so shipped gripql clients
  * parse them unchanged):
  *   GET    /v1/graph                         → {"graphs":[...]}
  *   POST   /v1/graph                         → BulkAdd: ND-JSON lines
  *                                              {"graph",("vertex"|"edge")}
  *                                              ⇒ {insertCount, errorCount}
  *   POST   /v1/graph/{g}                     → create graph
  *   DELETE /v1/graph/{g}                     → drop graph
  *   POST   /v1/graph/{g}/query               → {"query":"V().count()"}
  *                                              or protojson {"query":[...]}
  *                                              ⇒ ND-JSON QueryResult lines
  *   POST   /v1/graph/{g}/graphql             → {"query":"{ Label { f ... } }"}
  *   POST   /v1/graph/{g}/cypher              → {"query":"MATCH (a:L)-[:T]->(b) RETURN a"}
  *                                              ⇒ ND-JSON QueryResult lines
  *   POST   /v1/graph/{g}/vertex              → {"gid","label","data"?}
  *   POST   /v1/graph/{g}/edge                → {"from","to","label","gid"?,"data"?}
  *   GET    /v1/graph/{g}/vertex/{gid}        → the element, 404 if absent
  *   GET    /v1/graph/{g}/edge/{gid}          → the element, 404 if absent
  *   DELETE /v1/graph/{g}/vertex/{gid}        → delete, 404 if absent
  *   DELETE /v1/graph/{g}/edge/{gid}          → delete, 404 if absent
  *   POST   /v1/graph/{g}/mapping             → {"mapping": <GRIPPER config>,
  *                                               "sources"?: {name: dir}}
  *                                              opens g as the mapped view;
  *                                              source names not bound
  *                                              inline resolve against
  *                                              started plugins
  *   GET    /v1/graph/{g}/mapping             → the stored mapping as a
  *                                              Graph message (GetMapping)
  *   POST   /v1/plugin/{name}                 → {"driver","config"} start a
  *                                              gripper plugin (see Plugins)
  *   GET    /v1/plugin                        → {"plugins":[...]}
  *   GET    /v1/driver                        → {"drivers":[...]}
  *   GET    /v1/table                         → ND-JSON TableInfo lines
  *   GET    /v1/graph/{g}/label               → {vertexLabels, edgeLabels}
  *   GET    /v1/graph/{g}/schema              → posted schema if any, else
  *                                              sampled; one Graph object
  *   POST   /v1/graph/{g}/schema              → store schema (AddSchema)
  *   GET    /v1/graph/{g}/schema-sample       → always-sampled Graph object
  *   POST   /v1/graph/{g}/index/{label}       → {"field"} advisory AddIndex
  *   GET    /v1/graph/{g}/index               → {"indices":[{graph,label,field}]}
  *   POST   /v1/graph/{g}/job                 → {"query": ...} async spool,
  *                                              returns {"id": jobId}
  *   GET    /v1/graph/{g}/job                 → ND-JSON, one {id,graph,state}
  *                                              QueryJob object per line
  *   POST   /v1/graph/{g}/job-search          → {"query": ...} → ND-JSON
  *                                              JobStatus lines (prefix match)
  *   GET    /v1/graph/{g}/job/{id}            → {id, state, error?}
  *   DELETE /v1/graph/{g}/job/{id}            → drop the spool
  *   GET    /v1/graph/{g}/job/{id}/view       → spooled results, ND-JSON
  *   POST   /v1/graph/{g}/job/{id}            → same stream (ViewJob's proto
  *                                              REST binding, gripql.proto:409)
  *   POST   /v1/graph/{g}/job/{id}/resume     → {"query": ".out()..."}
  *                                              extend the spooled stream
  *   POST   /v1/graph/{g}/job-resume          → {query, srcId} (ResumeJob's
  *                                              proto binding, gripql.proto:417)
  *
  * Error bodies nest the message: {"error": {"message", "code"}} — the
  * shape the stock python client unwraps.
  */
class GraftServer(spark: SparkSession, port: Int,
                  auth: Option[GraftServer.Auth] = None,
                  pluginDir: Option[String] = None) {
  private val mapper = new ObjectMapper()
  private val graphs = new java.util.concurrent.ConcurrentHashMap[String, MutableGraph]()
  private val mappings = new java.util.concurrent.ConcurrentHashMap[String, Gripper.GraphConfig]()
  // posted schemas (AddSchema) and advisory indices (AddIndex) — the
  // reference persists both in its KV store (schema/schema.go,
  // kvindex/index.go); the HTTP facade keeps them per-server like graphs
  private val postedSchemas = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val indices =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[(String, String)]]()
  // (graph, jobId) → (state, error); spools live under jobsRoot/<graph>
  private val jobStates =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()
  private val jobsRoot =
    java.nio.file.Files.createTempDirectory("graft-jobs").toString
  private def jobsDir(g: String) = s"$jobsRoot/$g"

  private def jobState(g: String, id: String): Option[(String, String)] =
    Option(jobStates.get(g -> id)).orElse(
      if (Jobs.listJobs(jobsDir(g)).contains(id)) Some("COMPLETE" -> null) else None)

  private def requireComplete(g: String, id: String): Unit = jobState(g, id) match {
    case None => throw new IllegalArgumentException(s"no job '$id'")
    case Some(("COMPLETE", _)) => ()
    case Some((st, e)) => throw new IllegalArgumentException(
      s"job '$id' is $st${if (e != null) s": $e" else ""}")
  }

  /** Pre-register an existing graph (e.g. a loaded parquet graph). */
  def addGraph(name: String, g: GraphFrame): Unit =
    graphs.put(name, MutableGraph(spark, g))

  /** The live graph registry — hand this to a [[GrpcServer]] so both
    * transports serve the same graphs (the reference's server exposes one
    * GraphDB through gRPC and its REST gateway alike, server/server.go). */
  private[server] def graphRegistry:
      java.util.concurrent.ConcurrentHashMap[String, MutableGraph] = graphs

  /** Started gripper plugins (the Configure service's registry); shared
    * with the gRPC transport the same way [[graphRegistry]] is. A
    * configured pluginDir (the reference's Server.PluginDir) additionally
    * exposes `gripper-*` executables there as exec drivers. */
  private[server] val plugins = new Plugins(spark, pluginDir)

  /** Stored mapping configs — shared with the gRPC transport so an
    * AddMapping over either transport is visible to GetMapping on the
    * other (the reference persists mappings in the graph store, one store
    * behind both transports: server/api.go:478-488). */
  private[server] def mappingRegistry:
      java.util.concurrent.ConcurrentHashMap[String, Gripper.GraphConfig] = mappings

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/v1/graph", (ex: HttpExchange) => handle(ex))
  // the plugin-system surface lives under its own roots (gripql.proto:
  // /v1/plugin StartPlugin+ListPlugins, /v1/driver ListDrivers,
  // /v1/table ListTables)
  server.createContext("/v1/plugin", (ex: HttpExchange) => handleAux(ex))
  server.createContext("/v1/driver", (ex: HttpExchange) => handleAux(ex))
  server.createContext("/v1/table", (ex: HttpExchange) => handleAux(ex))
  // Concurrent handler pool — the reference's gRPC server dispatches every
  // RPC on its own goroutine (server/server.go), and a serial executor
  // wedges the whole REST surface behind one slow traversal stream or a
  // hung plugin launch. Safety relies on: every registry being a
  // ConcurrentHashMap; every MutableGraph mutation synchronizing on the
  // instance; and `mg.graph` taking an immutable DataFrame SNAPSHOT under
  // that lock — a concurrent edit reassigns the graph's frames, it never
  // mutates what a running stream is reading (per-query snapshot
  // isolation, the same contract the job-submit route already documents).
  // Cached (unbounded) pool: handlers are dominated by Spark job waits,
  // and a bounded pool could fill up with long streams and reintroduce
  // the wedge; Spark's own scheduler bounds actual CPU concurrency.
  private val handlerThreads = new java.util.concurrent.atomic.AtomicLong()
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, s"graft-http-${handlerThreads.incrementAndGet()}")
    t.setDaemon(true)
    t
  }))

  def start(): Unit = server.start()
  def stop(): Unit = {
    server.stop(0)
    // this server owns its plugin registry (it constructed it): shut down
    // started plugins — in particular exec-driver child processes, which
    // would otherwise outlive the server (the reference's ClosePlugins,
    // server/plugins.go:22-24)
    plugins.close()
  }
  def boundPort: Int = server.getAddress.getPort

  private def send(ex: HttpExchange, code: Int, body: String,
                   contentType: String = "application/json"): Unit =
    try {
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    } catch {
      // headers already committed (a streaming route failed mid-body and
      // the outer catch re-entered here): nothing more can be said on
      // this exchange — close it rather than throw out of the handler
      case _: Exception => try ex.close() catch { case _: Exception => () }
    }

  /** Error body nests message under "error" the way the reference's REST
    * gateway does — the stock client reads result['error']['message'] on
    * both non-2xx bodies and in-stream error lines
    * (gripql/python/gripql/query.py:419, graph.py:239). */
  private def errBody(code: Int, msg: String): String = {
    val node = mapper.createObjectNode()
    node.putObject("error").put("message", msg).put("code", code)
    node.toString
  }

  private def err(ex: HttpExchange, code: Int, msg: String): Unit =
    send(ex, code, errBody(code, msg))

  /** Basic-auth + per-graph policy gate. False = a 401/403 was sent
    * (reference: accounts/basic.go Validate → "authorization failed";
    * casbin Enforce failure → "permission denied", the commented HTTP
    * status pair in server/server.go:256-273). The graph-list route needs
    * only valid credentials, like the reference's ListGraphs. */
  private def authorized(ex: HttpExchange, method: String, parts: List[String]): Boolean =
    auth match {
      case None => true
      case Some(a) =>
        a.validate(Option(ex.getRequestHeaders.getFirst("Authorization"))) match {
          case None =>
            ex.getResponseHeaders.set("WWW-Authenticate", "Basic")
            err(ex, 401, "authorization failed"); false
          case Some(user) =>
            val ok = (method, parts) match {
              // BulkAdd (POST /v1/graph) enforces write PER ELEMENT in the
              // handler — the reference's BulkWriteFilter skips denied
              // lines rather than rejecting the request
              case ("POST", Nil) => true
              // graph-less GET (the graph list) enforces the "*"
              // pseudo-graph like the reference's ListGraphs
              // (accounts/util.go:169) — enumeration needs a *-scoped policy
              case _ => a.enforce(user, parts.headOption.getOrElse("*"),
                GraftServer.operation(method, parts))
            }
            if (!ok) err(ex, 403, "permission denied")
            ok
        }
    }

  /** Stream ND-JSON rows. Once the 200 is committed a mid-stream Spark
    * failure can't change the status — it is reported IN-BAND as a final
    * `{"error": ...}` line so clients can distinguish a failed stream
    * from a short result. */
  private def streamNdjson(ex: HttpExchange, lines: Iterator[String]): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
    ex.sendResponseHeaders(200, 0)
    val out = ex.getResponseBody
    try {
      while (lines.hasNext) { out.write(lines.next().getBytes(UTF_8)); out.write('\n') }
    } catch {
      case e: Exception =>
        try {
          out.write(errBody(500, String.valueOf(e.getMessage)).getBytes(UTF_8))
          out.write('\n')
        } catch { case _: Exception => () }
    } finally ex.close()
  }

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath.stripPrefix("/v1/graph").stripPrefix("/")
    val parts = if (path.isEmpty) Array.empty[String] else path.split("/")
    val method = ex.getRequestMethod
    if (!authorized(ex, method, parts.toList)) return
    (method, parts.toList) match {
      case ("GET", Nil) =>
        val node = mapper.createObjectNode()
        val arr = node.putArray("graphs")
        graphs.keySet().asScala.toSeq.sorted.foreach(arr.add)
        send(ex, 200, node.toString)

      case ("POST", g :: Nil) =>
        if (graphs.putIfAbsent(g, MutableGraph.empty(spark)) != null)
          err(ex, 409, s"graph '$g' exists")
        else send(ex, 200, "{}")

      case ("DELETE", g :: Nil) =>
        // idempotent like the reference's KV drivers (kvgraph DeleteGraph
        // removes key ranges, absent graph = no-op) — the conformance auth
        // runner delete-then-creates graphs unconditionally
        // (conformance/run_util.py:267-269)
        graphs.remove(g)
        mappings.remove(g); postedSchemas.remove(g); indices.remove(g)
        send(ex, 200, "{}")

      // BulkAdd (reference: gripql/gripql.proto:455 BulkAdd streaming RPC;
      // python client graph.py:246-285 posts ND-JSON GraphElement lines to
      // /v1/graph): each line {"graph": g, "vertex": {...}} or
      // {"graph": g, "edge": {...}}; response BulkEditResult counts.
      case ("POST", Nil) =>
        val user = auth.flatMap(_.validate(
          Option(ex.getRequestHeaders.getFirst("Authorization"))))
        var inserted = 0L
        var errors = 0L
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(ex.getRequestBody, UTF_8))
        var line = reader.readLine()
        while (line != null) {
          if (line.trim.nonEmpty) {
            try {
              val b = mapper.readTree(line)
              val g = Option(b.get("graph")).map(_.asText())
                .getOrElse(throw new IllegalArgumentException("missing 'graph'"))
              // per-line write enforcement: the upfront check has no graph
              if (auth.isDefined &&
                  !user.exists(u => auth.get.enforce(u, g, "write")))
                throw new IllegalArgumentException(s"permission denied on '$g'")
              val mg = Option(graphs.get(g))
                .getOrElse(throw new IllegalArgumentException(s"no graph '$g'"))
              (Option(b.get("vertex")), Option(b.get("edge"))) match {
                case (Some(v), _) =>
                  val (gid, label) = (textOf(v, "gid"), textOf(v, "label"))
                  if (gid == null || label == null)
                    throw new IllegalArgumentException("vertex needs gid and label")
                  mg.addVertex(gid, label, dataOf(v)); inserted += 1
                case (_, Some(e)) =>
                  val (from, to, label) = (textOf(e, "from"), textOf(e, "to"), textOf(e, "label"))
                  if (from == null || to == null || label == null)
                    throw new IllegalArgumentException("edge needs from, to, label")
                  mg.addEdge(from, to, label, dataOf(e), textOf(e, "gid")); inserted += 1
                case _ => throw new IllegalArgumentException("line has neither vertex nor edge")
              }
            } catch { case scala.util.control.NonFatal(_) => errors += 1 }
          }
          line = reader.readLine()
        }
        send(ex, 200, s"""{"insertCount":$inserted,"errorCount":$errors}""")

      // GRIPPER mapping surface (reference: gripql/gripql.proto:496
      // AddMapping, :345 GetMapping; instantiation = what the reference
      // does from its startup config, gripper/graphdb.go): POST stores the
      // mapping AND opens graph g as the mapped view over the named
      // parquet-directory sources.
      //   body: {"mapping": "<yaml|json GraphConfig>",
      //          "sources": {"<sourceName>": "<dir of <coll>.parquet>"}}
      case ("POST", g :: "mapping" :: Nil) =>
        if (graphs.containsKey(g)) err(ex, 409, s"graph '$g' exists")
        else {
          val body = mapper.readTree(ex.getRequestBody)
          // two accepted bodies: our {"mapping": <yaml|json text>,
          // "sources"?: {name: dir}} form, and the proto AddMapping form —
          // a Graph message whose elements ARE the config (what the stock
          // client's postMapping sends, connection.py:88-97; decoded per
          // gripper/config.go:68-100 GraphToConfig)
          val cfg = Option(body.get("mapping")).map(m => Gripper.parse(m.asText()))
            .getOrElse {
              if (!body.has("vertices") && !body.has("edges"))
                throw new IllegalArgumentException(
                  "missing 'mapping' (yaml/json text) or 'vertices'/'edges' (Graph message)")
              Plugins.configFromGraphNode(body)
            }
          // inline dir bindings win; any other source name the config
          // references resolves against the started-plugin registry — the
          // reference's shape, where AddMapping configs name sources
          // registered by StartPlugin (server/plugins.go:44-45 puts the
          // plugin client into server.sources under config.Name)
          val inline = Option(body.get("sources")).map(_.properties().asScala
            .map(e => e.getKey -> (Gripper.DirSource(spark, e.getValue.asText()): Gripper.SourceProvider))
            .toMap).getOrElse(Map.empty[String, Gripper.SourceProvider])
          val mapped = Gripper.graph(cfg, Plugins.resolveSources(cfg, plugins, inline))
          // atomic claim — two concurrent AddMappings must not both win
          if (graphs.putIfAbsent(g, MutableGraph(spark, mapped)) != null)
            err(ex, 409, s"graph '$g' exists")
          else {
            mappings.put(g, cfg)
            send(ex, 200, "{}")
          }
        }

      case ("GET", g :: "mapping" :: Nil) =>
        mappings.get(g) match {
          case null => err(ex, 404, s"no mapping for graph '$g'")
          case cfg => send(ex, 200,
            Plugins.configToGraphNode(mapper, g, cfg).toString)
        }

      // ListLabels (reference: gripql/gripql.proto ListLabels RPC) —
      // protojson camelCase field names, what the python client indexes
      // (conformance/tests/ot_labels.py: resp["vertexLabels"])
      case ("GET", g :: "label" :: Nil) => withGraph(ex, g) { mg =>
        val node = mapper.createObjectNode()
        val vArr = node.putArray("vertexLabels")
        val eArr = node.putArray("edgeLabels")
        mg.graph.vertices.select("label").distinct().collect()
          .map(_.getString(0)).sorted.foreach(vArr.add)
        mg.graph.edges.select("label").distinct().collect()
          .map(_.getString(0)).sorted.foreach(eArr.add)
        send(ex, 200, node.toString)
      }

      // GetSchema / AddSchema / SampleSchema (reference:
      // gripql/gripql.proto GetSchema :337, AddSchema :489, SampleSchema
      // :345; python client graph.py:24-58): one Graph-message JSON object
      // {"graph", "vertices", "edges"} — a posted schema wins over
      // sampling, exactly like the reference's stored schema
      case ("GET", g :: "schema" :: Nil) => withGraph(ex, g) { mg =>
        postedSchemas.get(g) match {
          case null => send(ex, 200, schemaJson(g,
            graft.model.SchemaSampler.sampleSchema(spark, mg.graph)))
          case posted => send(ex, 200, posted)
        }
      }

      case ("POST", g :: "schema" :: Nil) => withGraph(ex, g) { _ =>
        val body = mapper.readTree(ex.getRequestBody)
        if (body == null || !body.isObject) err(ex, 400, "schema body must be a JSON object")
        else {
          val o = body.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          o.put("graph", g)
          postedSchemas.put(g, mapper.writeValueAsString(o))
          send(ex, 200, "{}")
        }
      }

      case ("GET", g :: "schema-sample" :: Nil) => withGraph(ex, g) { mg =>
        send(ex, 200, schemaJson(g,
          graft.model.SchemaSampler.sampleSchema(spark, mg.graph)))
      }

      // AddIndex / ListIndices (reference: gripql/gripql.proto:477-487;
      // python client graph.py:133-150). Advisory, like model/Catalog —
      // Parquet+Catalyst serve point lookups without a secondary index.
      case ("POST", g :: "index" :: label :: Nil) => withGraph(ex, g) { _ =>
        val body = mapper.readTree(ex.getRequestBody)
        val field = Option(body).flatMap(b => Option(b.get("field"))).map(_.asText())
          .getOrElse(throw new IllegalArgumentException("missing 'field'"))
        indices.computeIfAbsent(g, _ => java.util.concurrent.ConcurrentHashMap.newKeySet())
          .add(label -> field)
        send(ex, 200, "{}")
      }

      case ("GET", g :: "index" :: Nil) => withGraph(ex, g) { _ =>
        val node = mapper.createObjectNode()
        val arr = node.putArray("indices")
        Option(indices.get(g)).foreach(_.asScala.toSeq.sorted.foreach { case (l, f) =>
          arr.addObject().put("graph", g).put("label", l).put("field", f)
        })
        send(ex, 200, node.toString)
      }

      // Job service (reference: gripql/gripql.proto:377-423 Submit /
      // ListJobs / GetJob / DeleteJob / ViewJob / ResumeJob;
      // server/job_manager.go): submit runs async, spooling the traveler
      // stream to parquet; view replays it; resume extends it with more
      // statements through the compiler's extension mode.
      // spooled-result reuse probe (reference: gripql.proto:390-395
      // SearchJobs → POST /v1/graph/{g}/job-search; job_manager.go finds a
      // finished spool whose query checksum matches the posted traversal)
      case ("POST", g :: "job-search" :: Nil) => withGraph(ex, g) { _ =>
        val body = mapper.readTree(ex.getRequestBody)
        val qNode = Option(body.get("query"))
          .getOrElse(throw new IllegalArgumentException("missing 'query'"))
        val query = if (qNode.isTextual) Parser.parse(qNode.asText())
                    else Json.parseQuery(qNode.toString)
        // one JobStatus JSON object per line — the stock client's
        // searchJobs() json-decodes each streamed line and reads ["id"]
        // directly (gripql/python/gripql/query.py:486-494)
        streamNdjson(ex, Jobs.searchJobs(jobsDir(g), query).iterator.map { id =>
          val st = jobState(g, id).map(_._1).getOrElse("COMPLETE")
          mapper.createObjectNode().put("id", id).put("graph", g).put("state", st).toString
        })
      }

      case ("POST", g :: "job" :: Nil) => withGraph(ex, g) { mg =>
        val body = mapper.readTree(ex.getRequestBody)
        val qNode = Option(body.get("query"))
          .getOrElse(throw new IllegalArgumentException("missing 'query'"))
        val query = if (qNode.isTextual) Parser.parse(qNode.asText())
                    else Json.parseQuery(qNode.toString)
        val jobId = "job-" + java.util.UUID.randomUUID().toString.take(12)
        jobStates.put(g -> jobId, "RUNNING" -> null)
        val graph = mg.graph // immutable snapshot: later edits reassign, never mutate
        new Thread(() => {
          try {
            Jobs.submitAs(spark, graph, query, jobsDir(g), jobId)
            jobStates.put(g -> jobId, "COMPLETE" -> null)
          } catch {
            case e: Throwable => jobStates.put(g -> jobId, "ERROR" -> String.valueOf(e.getMessage))
          }
        }, s"graft-job-$jobId").start()
        send(ex, 200, mapper.createObjectNode().put("id", jobId).toString)
      }

      case ("GET", g :: "job" :: Nil) => withGraph(ex, g) { _ =>
        val known = jobStates.asScala.collect { case ((`g`, id), (st, _)) => id -> st }.toMap
        // on-disk spools from previous sessions list as COMPLETE
        val all = known ++ Jobs.listJobs(jobsDir(g)).filterNot(known.contains).map(_ -> "COMPLETE")
        // ListJobs streams QueryJob messages (gripql.proto:384-389); the
        // stock client yields json.loads per line and the conformance
        // runner indexes j['id'] directly (conformance/tests/ot_job.py:13)
        streamNdjson(ex, all.toSeq.sortBy(_._1).iterator.map { case (id, st) =>
          mapper.createObjectNode().put("id", id).put("graph", g).put("state", st).toString
        })
      }

      case ("GET", g :: "job" :: id :: Nil) => withGraph(ex, g) { _ =>
        jobState(g, id) match {
          case None => err(ex, 404, s"no job '$id'")
          case Some((st, e)) =>
            val node = mapper.createObjectNode().put("id", id).put("state", st)
            if (e != null) node.put("error", e)
            // spooled jobs carry the rendered query text in their meta
            val meta = java.nio.file.Paths.get(s"${jobsDir(g)}/$id/meta.json")
            if (java.nio.file.Files.exists(meta)) {
              val m = mapper.readTree(java.nio.file.Files.readString(meta))
              Option(m.get("query")).foreach(qn => node.set[ObjectNode]("query", qn))
            }
            send(ex, 200, node.toString)
        }
      }

      case ("DELETE", g :: "job" :: id :: Nil) => withGraph(ex, g) { _ =>
        // a RUNNING job has no spool yet and its worker thread will re-put
        // state on completion — deleting now would 404 AND resurrect the job
        // with an orphaned spool; reject until it settles
        jobState(g, id) match {
          case Some(("RUNNING", _)) =>
            err(ex, 409, s"job '$id' is running; retry after it completes")
          case st =>
            val hadSpool = Jobs.deleteJob(jobsDir(g), id)
            if (hadSpool || st.isDefined) { jobStates.remove(g -> id); send(ex, 200, "{}") }
            else err(ex, 404, s"no job '$id'")
        }
      }

      case ("GET", g :: "job" :: id :: "view" :: Nil) => withGraph(ex, g) { mg =>
        requireComplete(g, id)
        streamNdjson(ex, Wire.lines(Jobs.view(spark, mg.graph, jobsDir(g), id), None))
      }

      // ViewJob's proto REST binding is POST /v1/graph/{g}/job/{id}
      // (gripql.proto:409-414) — the stock client's readJob posts there
      case ("POST", g :: "job" :: id :: Nil) => withGraph(ex, g) { mg =>
        requireComplete(g, id)
        streamNdjson(ex, Wire.lines(Jobs.view(spark, mg.graph, jobsDir(g), id), None))
      }

      // ResumeJob's proto REST binding is POST /v1/graph/{g}/job-resume with
      // body {query: [stmts], srcId: job} (gripql.proto:417-421,
      // ExtendQuery gripql.proto:225-228) — the stock client's resume()
      // builds exactly that (gripql/python/gripql/query.py:378-380)
      case ("POST", g :: "job-resume" :: Nil) => withGraph(ex, g) { mg =>
        val body = mapper.readTree(ex.getRequestBody)
        val id = Option(body.get("srcId")).map(_.asText())
          .getOrElse(throw new IllegalArgumentException("missing 'srcId'"))
        requireComplete(g, id)
        val qNode = Option(body.get("query"))
          .getOrElse(throw new IllegalArgumentException("missing 'query'"))
        val ext = if (qNode.isTextual) Parser.parseExtension(qNode.asText())
                  else Json.parseQuery(qNode.toString)
        streamNdjson(ex, Wire.lines(Jobs.resume(spark, mg.graph, jobsDir(g), id, ext),
          ext.stmts.lastOption))
      }

      case ("POST", g :: "job" :: id :: "resume" :: Nil) => withGraph(ex, g) { mg =>
        requireComplete(g, id)
        val body = mapper.readTree(ex.getRequestBody)
        val qNode = Option(body.get("query"))
          .getOrElse(throw new IllegalArgumentException("missing 'query'"))
        val ext = if (qNode.isTextual) Parser.parseExtension(qNode.asText())
                  else Json.parseQuery(qNode.toString)
        streamNdjson(ex, Wire.lines(Jobs.resume(spark, mg.graph, jobsDir(g), id, ext),
          ext.stmts.lastOption))
      }

      case ("POST", g :: "query" :: Nil) => withGraph(ex, g) { mg =>
        val body = mapper.readTree(ex.getRequestBody)
        val qNode = body.get("query")
        val query: Query =
          if (qNode == null) throw new IllegalArgumentException("missing 'query'")
          else if (qNode.isTextual) Parser.parse(qNode.asText())
          else Json.parseQuery(qNode.toString) // protojson statement array
        val result = Traversal.run(spark, mg.graph, query)
        // ND-JSON streaming in the reference QueryResult wire format: one
        // protojson line per row, bounded server memory (see Wire)
        streamNdjson(ex, Wire.lines(result, query.stmts.lastOption))
      }

      // read-only openCypher MATCH subset (the reference's POC endpoint
      // made to work — see graft.cypher.Cypher for the supported surface);
      // same result contract as /query: one rendered row per ND-JSON line
      case ("POST", g :: "cypher" :: Nil) => withGraph(ex, g) { mg =>
        val body = mapper.readTree(ex.getRequestBody)
        val qNode = body.get("query")
        if (qNode == null || !qNode.isTextual) err(ex, 400, "missing 'query' text")
        else {
          val cq = graft.cypher.Cypher.parse(qNode.asText())
          val result = Traversal.run(spark, mg.graph, cq)
          streamNdjson(ex, Wire.lines(result, cq.stmts.lastOption))
        }
      }

      case ("POST", g :: "graphql" :: Nil) => withGraph(ex, g) { mg =>
        val body = mapper.readTree(ex.getRequestBody)
        val qNode = body.get("query")
        if (qNode == null || !qNode.isTextual) err(ex, 400, "missing 'query' text")
        else {
          // __schema/__type introspection answers from the sampled type
          // system (reference: graphqlv2 publishes the schema as GraphQL
          // types); everything else compiles to one traversal plan
          val q = qNode.asText()
          GraphQL.introspection(graphqlTypes(g, mg), q) match {
            case Some(json) => send(ex, 200, json)
            case None =>
              val result = GraphQL.run(spark, mg.graph, q, Some(mg.derivedTopology))
              streamNdjson(ex, result.toLocalIterator().asScala.map(_.getString(0)))
          }
        }
      }

      // SDL view of the same type system (GET — tooling convenience)
      case ("GET", g :: "graphql" :: Nil) => withGraph(ex, g) { mg =>
        send(ex, 200, GraphQL.sdl(graphqlTypes(g, mg)))
      }

      case ("POST", g :: "vertex" :: Nil) => withGraph(ex, g) { mg =>
        val b = mapper.readTree(ex.getRequestBody)
        val (gid, label) = (textOf(b, "gid"), textOf(b, "label"))
        if (gid == null || label == null) err(ex, 400, "vertex needs gid and label")
        else {
          mg.addVertex(gid, label, dataOf(b))
          send(ex, 200, "{}")
        }
      }

      case ("POST", g :: "edge" :: Nil) => withGraph(ex, g) { mg =>
        val b = mapper.readTree(ex.getRequestBody)
        val (from, to, label) = (textOf(b, "from"), textOf(b, "to"), textOf(b, "label"))
        if (from == null || to == null || label == null) err(ex, 400, "edge needs from, to, label")
        else {
          mg.addEdge(from, to, label, dataOf(b), textOf(b, "gid"))
          send(ex, 200, "{}")
        }
      }

      case ("GET", g :: "vertex" :: gid :: Nil) => withGraph(ex, g) { mg =>
        mg.getVertex(gid) match {
          case Some(r) => send(ex, 200, elementJson(r.getString(0), r.getString(1), r.getString(2), null, null))
          case None => err(ex, 404, s"no vertex '$gid'")
        }
      }

      case ("GET", g :: "edge" :: gid :: Nil) => withGraph(ex, g) { mg =>
        mg.getEdge(gid) match {
          case Some(r) => send(ex, 200, elementJson(r.getString(0), r.getString(1), r.getString(4), r.getString(2), r.getString(3)))
          case None => err(ex, 404, s"no edge '$gid'")
        }
      }

      // DeleteVertex / DeleteEdge (reference: gripql/gripql.proto:461-469;
      // python client graph.py:67-77,108-118)
      case ("DELETE", g :: "vertex" :: gid :: Nil) => withGraph(ex, g) { mg =>
        if (mg.getVertex(gid).isEmpty) err(ex, 404, s"no vertex '$gid'")
        else { mg.deleteVertex(gid); send(ex, 200, "{}") }
      }

      case ("DELETE", g :: "edge" :: gid :: Nil) => withGraph(ex, g) { mg =>
        if (mg.getEdge(gid).isEmpty) err(ex, 404, s"no edge '$gid'")
        else { mg.deleteEdge(gid); send(ex, 200, "{}") }
      }

      case _ => err(ex, 404, s"no route $method /v1/graph/${parts.mkString("/")}")
    }
  } catch {
    case e: IllegalArgumentException => err(ex, 400, e.getMessage)
    case e: Exception => err(ex, 500, String.valueOf(e.getMessage))
  }

  /** The plugin-system routes (reference: gripql.proto Configure service
    * :526-541 + Query.ListTables :369; python client connection.py:106-143):
    *   GET  /v1/table         → ND-JSON TableInfo lines
    *   GET  /v1/driver        → {"drivers":[...]}
    *   GET  /v1/plugin        → {"plugins":[...]}
    *   POST /v1/plugin/{name} → {"driver","config"} ⇒ {"name"}
    * Auth mirrors the reference's MethodMap: Configure ops are `admin` on
    * the "*" pseudo-graph (plugins affect every graph, accounts/
    * interface.go:48-50 + util.go:193), ListTables is `read` on "*"
    * (util.go:169). */
  private def handleAux(ex: HttpExchange): Unit = try {
    val parts = ex.getRequestURI.getPath.stripPrefix("/v1/").stripSuffix("/")
      .split("/").toList.filter(_.nonEmpty)
    val method = ex.getRequestMethod
    val op = if (parts.headOption.contains("table")) "read" else "admin"
    auth match {
      case Some(a) =>
        a.validate(Option(ex.getRequestHeaders.getFirst("Authorization"))) match {
          case None =>
            ex.getResponseHeaders.set("WWW-Authenticate", "Basic")
            err(ex, 401, "authorization failed"); return
          case Some(user) =>
            if (!a.enforce(user, "*", op)) { err(ex, 403, "permission denied"); return }
        }
      case None => ()
    }
    (method, parts) match {
      case ("GET", "table" :: Nil) =>
        streamNdjson(ex, plugins.tables(mapper).map(_.toString))

      case ("GET", "driver" :: Nil) =>
        val node = mapper.createObjectNode()
        val arr = node.putArray("drivers")
        plugins.drivers.foreach(arr.add)
        send(ex, 200, node.toString)

      case ("GET", "plugin" :: Nil) =>
        val node = mapper.createObjectNode()
        val arr = node.putArray("plugins")
        plugins.list.foreach(arr.add)
        send(ex, 200, node.toString)

      case ("POST", "plugin" :: name :: Nil) =>
        val body = mapper.readTree(ex.getRequestBody)
        val driver = Option(body.get("driver")).map(_.asText()).getOrElse(
          throw new IllegalArgumentException("missing 'driver'"))
        val config = Option(body.get("config")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
        plugins.start(name, driver, config)
        send(ex, 200, mapper.createObjectNode().put("name", name).toString)

      case _ => err(ex, 404, s"no route $method /v1/${parts.mkString("/")}")
    }
  } catch {
    case e: IllegalArgumentException => err(ex, 400, e.getMessage)
    case e: Exception => err(ex, 500, String.valueOf(e.getMessage))
  }

  private def withGraph(ex: HttpExchange, name: String)(f: MutableGraph => Unit): Unit =
    graphs.get(name) match {
      case null => err(ex, 404, s"no graph '$name'")
      case mg => f(mg)
    }

  private def textOf(n: com.fasterxml.jackson.databind.JsonNode, k: String): String = {
    val v = n.get(k)
    if (v == null || v.isNull) null else v.asText()
  }

  /** `data` may be a JSON object (protojson style) or a pre-encoded string. */
  private def dataOf(n: com.fasterxml.jackson.databind.JsonNode): String = {
    val v = n.get("data")
    if (v == null || v.isNull) "{}" else if (v.isTextual) v.asText() else v.toString
  }

  private def elementJson(gid: String, label: String, data: String,
                          from: String, to: String): String = {
    val node = mapper.createObjectNode().put("gid", gid).put("label", label)
    if (from != null) node.put("from", from).put("to", to)
    node.set("data", if (data == null || data.isEmpty) mapper.createObjectNode() else mapper.readTree(data))
    node.toString
  }

  /** GraphQL type system per graph, cached against the graph's current
    * frame identity (same invalidation rule as derivedTopology): sampling
    * scans the vertex set, so an introspection-heavy client must not pay
    * it per request. */
  private val gqlTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (GraphFrame, Seq[GraphQL.GqlType])]()
  private def graphqlTypes(g: String, mg: graft.model.MutableGraph): Seq[GraphQL.GqlType] = {
    val cur = mg.graph
    val cached = gqlTypeCache.get(g)
    if (cached != null && (cached._1.vertices eq cur.vertices) &&
        (cached._1.edges eq cur.edges)) cached._2
    else {
      val ts = GraphQL.typeSystem(graft.model.SchemaSampler.sampleSchema(spark, cur))
      gqlTypeCache.put(g, (cur, ts))
      ts
    }
  }

  /** One Graph-message JSON object for a (small) schema graph — the
    * GetSchema / SampleSchema response shape the python client json()s. */
  private def schemaJson(g: String, sg: GraphFrame): String = {
    val node = mapper.createObjectNode().put("graph", g)
    val vArr = node.putArray("vertices")
    sg.vertices.collect().foreach(r =>
      vArr.add(mapper.readTree(elementJson(r.getString(0), r.getString(1), r.getString(2), null, null))))
    val eArr = node.putArray("edges")
    sg.edges.collect().foreach(r =>
      eArr.add(mapper.readTree(elementJson(r.getString(0), r.getString(1), r.getString(4), r.getString(2), r.getString(3)))))
    node.toString
  }
}

/** Standalone entry: `runmain graft.server.GraftServer <port> [graphDir]` —
  * optionally pre-loads a saved graph as "main". */
object GraftServer {
  /** Basic-auth credentials + per-graph access policies — the reference's
    * accounts package re-expressed (reference: accounts/basic.go:9-39
    * BasicAuth.Validate, accounts/interface.go:6-15 the operation
    * taxonomy, accounts/casbin.go:25-36 Enforce(user, graph, op)). A
    * policy grants `user` the listed `actions` on `graph`; "*" wildcards
    * either side. Operations: query, read, write, exec. */
  case class Credential(user: String, password: String)
  case class Policy(user: String, graph: String, actions: Set[String])
  /** `access`, when set, replaces the flat `policies` list with a
    * [[Casbin]] enforcer — the reference's AccessConfig{Null|Casbin}
    * choice (accounts/interface.go:69-72): same (user, graph, operation)
    * request triple, model-driven decision. */
  case class Auth(credentials: Seq[Credential], policies: Seq[Policy],
                  access: Option[Casbin.Enforcer] = None) {
    // compare fixed-length digests with MessageDigest.isEqual so a probe
    // can't time how many leading characters of the password matched
    private def sha(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    private val credDigests: Seq[(String, Array[Byte])] =
      credentials.map(c => c.user -> sha(c.password))
    /** Authorization header → authenticated user (None = 401). With NO
      * credentials configured (a Casbin-only Accounts block) every caller
      * authenticates as the anonymous user "" and the policy decides —
      * the reference's NullAuth fallback (accounts/util.go init): without
      * this, a policy-only config would reject every request. */
    def validate(header: Option[String]): Option[String] =
      if (credentials.isEmpty) Some("") else validateBasic(header)

    private def validateBasic(header: Option[String]): Option[String] = header.flatMap { h =>
      if (!h.startsWith("Basic ")) None
      else {
        val decoded = try new String(
          java.util.Base64.getDecoder.decode(h.stripPrefix("Basic ").trim),
          java.nio.charset.StandardCharsets.UTF_8) catch { case _: Exception => "" }
        decoded.split(":", 2) match {
          case Array(u, p) =>
            val supplied = sha(p)
            val uDigest = sha(u)
            // fold over ALL credentials accumulating the match bit — no
            // early exit on the username, so response timing is independent
            // of whether the username exists (username compared by digest
            // so its check is length-independent too)
            val matched = credDigests.foldLeft(false) { case (acc, (cu, cd)) =>
              val userOk = java.security.MessageDigest.isEqual(sha(cu), uDigest)
              val passOk = java.security.MessageDigest.isEqual(cd, supplied)
              acc | (userOk & passOk)
            }
            if (matched) Some(u) else None
          case _ => None
        }
      }
    }
    def enforce(user: String, graph: String, op: String): Boolean = access match {
      case Some(e) => e.enforce(user, graph, op)
      case None => policies.exists(p => (p.user == user || p.user == "*") &&
        (p.graph == graph || p.graph == "*") &&
        (p.actions.contains(op) || p.actions.contains("*")))
    }
  }

  /** Route → operation, mirroring the reference's MethodMap
    * (accounts/interface.go:17-51): traversal endpoints are `query`, job
    * submit/resume are `exec`, GETs are `read`, mutations are `write`. */
  private[server] def operation(method: String, parts: List[String]): String =
    (method, parts) match {
      case ("POST", _ :: tail) if Set("query", "cypher", "graphql").exists(tail.headOption.contains) => "query"
      case ("POST", _ :: "job" :: Nil) => "exec"
      case ("POST", _ :: "job" :: _ :: "resume" :: Nil) => "exec"
      case ("POST", _ :: "job-resume" :: Nil) => "exec"
      case ("POST", _ :: "job" :: _ :: Nil) => "read" // ViewJob binding (interface.go:33)
      case ("POST", _ :: "job-search" :: Nil) => "read"
      case ("GET", _) => "read"
      case _ => "write"
    }
  /** Serves REST on `port` and gRPC on `port`+1 over the SAME graph
    * registry — the reference's dual-transport shape (server/server.go
    * runs the gRPC service and its REST gateway on sibling ports). */
  /** Parse the grip-style server config YAML's Accounts block
    * (reference: config/server_config.go:22, accounts shape as in
    * test/badger-auth.yml — Server.Accounts.Auth.Basic user list +
    * Server.Accounts.Access.Casbin Model/Policy file paths). */
  def authFromConfig(path: String): Option[Auth] = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val root = new org.yaml.snakeyaml.Yaml().load[Object](text)
    def dig(node: Object, keys: String*): Option[Object] =
      keys.foldLeft(Option(node)) {
        case (Some(m: java.util.Map[_, _]), k) =>
          Option(m.asInstanceOf[java.util.Map[String, Object]].get(k))
        case _ => None
      }
    dig(root, "Server", "Accounts").map { acct =>
      val creds = dig(acct, "Auth", "Basic").toSeq.flatMap {
        case l: java.util.List[_] => l.asScala.collect {
          case m: java.util.Map[_, _] =>
            val mm = m.asInstanceOf[java.util.Map[String, Object]]
            Credential(String.valueOf(mm.get("User")), String.valueOf(mm.get("Password")))
        }
        case _ => Nil
      }
      val enforcer = dig(acct, "Access", "Casbin").map { cb =>
        val mm = cb.asInstanceOf[java.util.Map[String, Object]]
        Casbin.enforcer(
          java.nio.file.Files.readString(java.nio.file.Paths.get(String.valueOf(mm.get("Model")))),
          java.nio.file.Files.readString(java.nio.file.Paths.get(String.valueOf(mm.get("Policy")))))
      }
      // an Accounts block that yields NOTHING enforceable is a config
      // mistake (wrong key case, list-vs-map nesting): refuse to start
      // rather than silently serve the policy-protected graphs open
      require(creds.nonEmpty || enforcer.isDefined,
        s"config $path has a Server.Accounts block but no parsable " +
          "Auth.Basic credentials or Access.Casbin policy — refusing to start unauthenticated")
      Auth(creds, Nil, enforcer)
    }
  }

  /** `Server.PluginDir` from a grip-style server YAML (config/config.go
    * — where the reference discovers gripper-* plugin executables). */
  def pluginDirFromConfig(path: String): Option[String] = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val root = new org.yaml.snakeyaml.Yaml().load[Object](text)
    Option(root).collect { case m: java.util.Map[_, _] =>
      m.asInstanceOf[java.util.Map[String, Object]].get("Server") }
      .collect { case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]].get("PluginDir") }
      .flatMap(Option(_)).map(String.valueOf)
  }

  def main(args: Array[String]): Unit = {
    val (confPath, rest) = args.toList match {
      case a if a.contains("--config") =>
        val i = a.indexOf("--config")
        require(i + 1 < a.length && !a(i + 1).startsWith("--"),
          "--config requires a path argument (grip-style server YAML)")
        (Some(a(i + 1)), a.patch(i, Nil, 2))
      case a => (None, a)
    }
    val port = rest.headOption.map(_.toInt).getOrElse(8201)
    val spark = SparkSession.builder().master("local[*]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    val theAuth = confPath.flatMap(authFromConfig)
    val srv = new GraftServer(spark, port, theAuth,
      confPath.flatMap(pluginDirFromConfig))
    rest.drop(1).headOption.foreach(dir => srv.addGraph("main", GraphFrame.load(spark, dir)))
    srv.start()
    // the SAME auth gates both transports — the reference wires its
    // accounts interceptors into the gRPC service too (server/server.go),
    // an unauthenticated sibling port would bypass every policy
    val grpc = new GrpcServer(spark, port + 1, srv.graphRegistry, theAuth,
      Some(srv.plugins), Some(srv.mappingRegistry))
    grpc.start()
    println(s"graft server listening on :$port (REST), :${port + 1} (gRPC)")
    Thread.currentThread().join()
  }
}
