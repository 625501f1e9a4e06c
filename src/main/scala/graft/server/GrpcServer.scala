package graft.server

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.ByteBuf
import io.netty.channel._
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2._
import io.netty.util.ReferenceCountUtil
import org.apache.spark.sql.SparkSession
import graft.compiler.Traversal
import graft.gripql.Json
import graft.model.{GraphFrame, MutableGraph}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** The reference's primary API surface — gRPC `gripql.Query` /
  * `gripql.Edit` (reference: gripql/gripql.proto:313-319 Traversal,
  * :425-503 Edit; server/api.go:20-45) — served over Netty's HTTP/2 frame
  * codec with [[Pbuf]]/[[GripqlProto]] as the message marshaller. No
  * generated stubs and no grpc-java: the gRPC wire protocol is just
  * HTTP/2 + 5-byte-prefixed protobuf frames + `grpc-status` trailers, all
  * of which the hand-rolled codec and netty-codec-http2 (shipped with
  * Spark) already cover.
  *
  * Protocol notes:
  *  - h2c prior-knowledge only (cleartext; clients send the HTTP/2 preface
  *    directly — what `grpc.insecure_channel` does).
  *  - Unary, server-streaming (Traversal/ViewJob: one DATA frame per
  *    QueryResult, with writability backpressure against slow clients)
  *    and client-streaming (BulkAdd: each element applies on arrival
  *    through MutableGraph's bounded chunking — an arbitrarily large
  *    ingest never buffers server-side) are all supported.
  *  - Spark work runs on a dispatch pool, never on the event loop; results
  *    stream through `toLocalIterator` (via [[Wire]]) so a large traversal
  *    never materializes server-side. Outbound DATA respects HTTP/2 flow
  *    control via netty's remote flow controller queue.
  *  - Statuses: 0 OK, 3 INVALID_ARGUMENT (bad query/message), 5 NOT_FOUND,
  *    9 FAILED_PRECONDITION (job not settled), 12 UNIMPLEMENTED (unknown
  *    method), 2 UNKNOWN.
  *
  * Served methods (gripql.proto Query + Edit + Job + Configure services):
  * Traversal, GetVertex, GetEdge, GetTimestamp, GetSchema, SampleSchema,
  * ListGraphs, ListLabels, ListIndices, ListTables, GetMapping, Submit,
  * ListJobs, SearchJobs, GetJob, DeleteJob, ViewJob, ResumeJob; AddVertex,
  * AddEdge, BulkAdd, AddGraph, DeleteGraph, DeleteVertex, DeleteEdge,
  * AddIndex, DeleteIndex, AddSchema, AddMapping; StartPlugin, ListPlugins,
  * ListDrivers. AddMapping resolves source names against the plugin
  * registry (start sources with Configure/StartPlugin first — the
  * reference's order, server/plugins.go:44-45 then AddMapping).
  */
class GrpcServer(spark: SparkSession, port: Int,
                 graphs: java.util.concurrent.ConcurrentHashMap[String, MutableGraph],
                 auth: Option[GraftServer.Auth],
                 pluginsOpt: Option[Plugins] = None,
                 mappingsOpt: Option[java.util.concurrent.ConcurrentHashMap[
                   String, graft.model.Gripper.GraphConfig]] = None) {
  def this(spark: SparkSession, port: Int) =
    this(spark, port, new java.util.concurrent.ConcurrentHashMap[String, MutableGraph](), None)
  def this(spark: SparkSession, port: Int,
           graphs: java.util.concurrent.ConcurrentHashMap[String, MutableGraph]) =
    this(spark, port, graphs, None)

  // the plugin registry — shared with the REST transport when both serve
  // one process (GraftServer.main), standalone otherwise
  private val plugins: Plugins = pluginsOpt.getOrElse(new Plugins(spark))

  private val mapper = new ObjectMapper()
  private val reg = GripqlProto.registry
  // job spools + advisory indices + per-graph edit timestamps are
  // transport-local (the reference keeps them in its KV store; the REST
  // facade keeps them per-server the same way — GraftServer.scala)
  private val jobStates =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()
  private val jobsRoot =
    java.nio.file.Files.createTempDirectory("graft-grpc-jobs").toString
  private def jobsDir(g: String) = s"$jobsRoot/$g"
  private val indices =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[(String, String)]]()
  private val timestamps = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // stored mapping configs (AddMapping/GetMapping) — shared with the REST
  // transport when both serve one process (GraftServer.main), like the
  // graph and plugin registries: the reference keeps mappings in the one
  // graph store behind both transports (server/api.go:478-488)
  private val mappings = mappingsOpt.getOrElse(
    new java.util.concurrent.ConcurrentHashMap[String, graft.model.Gripper.GraphConfig]())
  // posted schemas (AddSchema) win over sampling, like the reference's
  // stored schema (schema/schema.go) and the REST facade
  private val postedSchemas =
    new java.util.concurrent.ConcurrentHashMap[String, ObjectNode]()
  private def touch(g: String): Unit =
    timestamps.put(g, System.currentTimeMillis().toString)
  private val boss = new NioEventLoopGroup(1)
  private val workers = new NioEventLoopGroup(2)
  // Spark jobs must not run on the netty event loop: dispatch pool
  private val pool = java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-grpc-dispatch"); t.setDaemon(true); t
  })
  private var channel: Channel = _

  def addGraph(name: String, g: GraphFrame): Unit =
    graphs.put(name, MutableGraph(spark, g))

  def start(): Unit = {
    val b = new ServerBootstrap()
      .group(boss, workers)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          ch.pipeline().addLast(Http2FrameCodecBuilder.forServer().build())
          ch.pipeline().addLast(new Http2MultiplexHandler(new ChannelInitializer[Channel] {
            override def initChannel(stream: Channel): Unit =
              stream.pipeline().addLast(new StreamHandler)
          }))
        }
      })
    channel = b.bind(new InetSocketAddress(port)).sync().channel()
  }

  def boundPort: Int = channel.localAddress().asInstanceOf[InetSocketAddress].getPort

  def stop(): Unit = {
    if (channel != null) channel.close().sync()
    boss.shutdownGracefully(0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
    workers.shutdownGracefully(0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
    pool.shutdown()
    // close started plugins (exec child processes!) only when this server
    // owns the registry; a shared registry belongs to the REST facade
    if (pluginsOpt.isEmpty) plugins.close()
  }

  /** One gRPC call = one HTTP/2 stream. Complete gRPC frames are drained
    * INCREMENTALLY as DATA arrives — BulkAdd's client stream applies each
    * element on arrival (staged through MutableGraph.bulkAdd's bounded
    * chunking), so an arbitrarily large ingest never buffers server-side;
    * unary/server-streaming methods see at most their one small request
    * message. Dispatch runs off-loop once END_STREAM lands. */
  private final class StreamHandler extends ChannelInboundHandlerAdapter {
    private var path: String = ""
    private var authHeader: Option[String] = None
    private val pending = io.netty.buffer.Unpooled.compositeBuffer()
    private val frames = Vector.newBuilder[Array[Byte]]
    private var bulk: BulkState = null
    private var failure: Throwable = null
    // outbound backpressure: the dispatch thread parks between DATA writes
    // whenever the channel's write buffer is over its high-water mark
    private val writability = new Object

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
      case h: Http2HeadersFrame =>
        path = canonicalPath(String.valueOf(h.headers().path()))
        authHeader = Option(h.headers().get("authorization")).map(_.toString)
        if (path == "/gripql.Edit/BulkAdd") {
          // client-streaming: credentials must be resolved before any
          // element lands; per-element graphs are gated inside add()
          try bulk = new BulkState(authUser(authHeader))
          catch { case e: Throwable if failure == null => failure = e }
        }
        if (h.isEndStream) finish(ctx)
      case d: Http2DataFrame =>
        // HTTP/2 flow control is manual in netty's frame API: return the
        // consumed bytes to the peer or a >64 KB client stream stalls at
        // the initial window
        val consumed = d.initialFlowControlledBytes()
        if (failure == null) {
          pending.addComponent(true, d.content())
          try drain()
          catch { case e: Throwable if failure == null => failure = e }
        } else {
          // the stream is already doomed (e.g. BulkAdd auth failure):
          // discard instead of buffering, or a client that keeps pushing
          // after the failure grows `pending` without bound
          d.release()
        }
        if (consumed > 0 && !d.isEndStream)
          ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(consumed))
        if (d.isEndStream) finish(ctx)
      case other => ReferenceCountUtil.release(other)
    }

    /** Extract every COMPLETE gRPC frame ([flag][4-byte BE len][payload])
      * from the pending buffer; a partial frame tail stays pending. */
    private def drain(): Unit = {
      var more = true
      while (more && failure == null) {
        if (pending.readableBytes() < 5) more = false
        else {
          pending.markReaderIndex()
          val flag = pending.readByte()
          require(flag == 0, "compressed gRPC frames unsupported")
          val len = pending.readInt()
          require(len >= 0, "negative gRPC frame length")
          if (pending.readableBytes() < len) { pending.resetReaderIndex(); more = false }
          else {
            val arr = new Array[Byte](len)
            pending.readBytes(arr)
            if (bulk != null) bulk.add(arr) else frames += arr
          }
        }
      }
      pending.discardReadComponents()
    }

    override def channelWritabilityChanged(ctx: ChannelHandlerContext): Unit = {
      writability.synchronized(writability.notifyAll())
      ctx.fireChannelWritabilityChanged()
    }

    private[GrpcServer] def awaitWritable(ch: Channel): Unit =
      while (!ch.isWritable && ch.isActive)
        writability.synchronized(writability.wait(100))

    override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit = {
      ReferenceCountUtil.release(pending)
      ctx.close()
    }

    private def finish(ctx: ChannelHandlerContext): Unit = {
      require(pending.readableBytes() == 0 || failure != null, "truncated gRPC frame header")
      ReferenceCountUtil.release(pending)
      val messages = frames.result()
      val (b, err) = (bulk, failure)
      val hdr = authHeader
      pool.execute(() => respond(ctx, this, path, messages, Option(b), Option(err), hdr))
    }
  }

  /** Incremental BulkAdd state: decoded elements stage straight into the
    * target graph through bulkAdd's chunked seal (one open chunk of driver
    * memory), counters mirror the REST route's per-line error semantics. */
  private final class BulkState(user: Option[String]) {
    var inserted = 0L
    var errors = 0L
    var denied = 0L // policy-denied subset of errors (logged separately)
    private val written = scala.collection.mutable.Set.empty[String]
    def add(bytes: Array[Byte]): Unit =
      try {
        val m = Pbuf.decode(reg, "GraphElement", bytes)
        val gname = Option(text(m, "graph"))
        // a policy-denied element is SKIPPED and the stream continues —
        // the reference's BulkWriteFilter RecvMsg-loops past denied
        // elements (accounts/bulk_write_filter.go) rather than failing
        // the RPC; counted under errors so the denial is visible
        gname.foreach(gate(user, _, "write"))
        val g = gname.flatMap(n => Option(graphs.get(n)))
          .getOrElse(throw new IllegalArgumentException("unknown graph"))
        (Option(m.get("vertex")), Option(m.get("edge"))) match {
          case (Some(v), _) if !v.isNull =>
            val (gid, label) = (text(v, "gid"), text(v, "label"))
            if (gid == null || label == null)
              throw new IllegalArgumentException("vertex needs gid and label")
            g.addVertex(gid, label, dataText(v)); inserted += 1
          case (_, Some(e)) if !e.isNull =>
            val (from, to, label) = (text(e, "from"), text(e, "to"), text(e, "label"))
            if (from == null || to == null || label == null)
              throw new IllegalArgumentException("edge needs from, to, label")
            g.addEdge(from, to, label, dataText(e), text(e, "gid")); inserted += 1
          case _ => throw new IllegalArgumentException("element has neither vertex nor edge")
        }
        written ++= gname // only graphs that actually took an insert
      } catch {
        // count both as errors (the result message has one counter), but
        // log denials distinctly so an operator can tell a policy problem
        // from bad data — the reference logs each BulkWriteFilter skip
        // (accounts/bulk_write_filter.go)
        case GrpcError(7, _) => errors += 1; denied += 1
        case scala.util.control.NonFatal(_) => errors += 1
      }
    def result(): Array[Byte] = {
      written.foreach(touch)
      if (denied > 0) System.err.println(
        s"[graft-grpc] BulkAdd: $denied of $errors errored element(s) were policy-denied" +
          user.fold("")(u => s" for user '$u'"))
      val o = mapper.createObjectNode()
      o.put("insert_count", inserted)
      o.put("error_count", errors)
      Pbuf.encode(reg, "BulkEditResult", o)
    }
  }

  private final case class GrpcError(code: Int, msg: String)
    extends RuntimeException(msg)

  // ---- auth (mirrors the reference's gRPC interceptors: server/server.go
  // wires accounts auth into the gRPC service too, not just the REST
  // gateway; operations per accounts/interface.go:17-51 MethodMap) -------

  /** The proto declares the job RPCs in `service Job` and SampleSchema in
    * `service Edit` (gripql.proto:376-423,490) — stock gRPC clients call
    * those paths; this server historically grouped them under Query.
    * Normalize at ingress so BOTH spellings reach the same handler and
    * the same auth row. */
  private def canonicalPath(p: String): String =
    if (p.startsWith("/gripql.Job/")) "/gripql.Query/" + p.stripPrefix("/gripql.Job/")
    else if (p == "/gripql.Edit/SampleSchema") "/gripql.Query/SampleSchema"
    else p

  /** path → (request message type, operation class). Used to pull the
    * graph name out of the request for per-graph policy enforcement. */
  private val methodMeta: Map[String, (String, String)] = Map(
    "/gripql.Query/Traversal" -> ("GraphQuery", "query"),
    "/gripql.Query/GetVertex" -> ("ElementID", "read"),
    "/gripql.Query/GetEdge" -> ("ElementID", "read"),
    "/gripql.Query/ListLabels" -> ("GraphID", "read"),
    "/gripql.Query/GetSchema" -> ("GraphID", "read"),
    "/gripql.Query/SampleSchema" -> ("GraphID", "write"),
    "/gripql.Edit/AddSchema" -> ("Graph", "write"),
    "/gripql.Query/GetTimestamp" -> ("GraphID", "read"),
    "/gripql.Query/ListIndices" -> ("GraphID", "read"),
    "/gripql.Edit/AddIndex" -> ("IndexID", "write"),
    "/gripql.Edit/DeleteIndex" -> ("IndexID", "write"),
    "/gripql.Query/Submit" -> ("GraphQuery", "exec"),
    "/gripql.Query/ListJobs" -> ("GraphID", "read"),
    "/gripql.Query/SearchJobs" -> ("GraphQuery", "read"),
    "/gripql.Query/GetJob" -> ("QueryJob", "read"),
    "/gripql.Query/DeleteJob" -> ("QueryJob", "write"),
    "/gripql.Query/ViewJob" -> ("QueryJob", "read"),
    "/gripql.Query/ResumeJob" -> ("ExtendQuery", "exec"),
    "/gripql.Query/GetMapping" -> ("GraphID", "read"),
    "/gripql.Edit/AddMapping" -> ("Graph", "write"),
    "/gripql.Edit/AddGraph" -> ("GraphID", "write"),
    "/gripql.Edit/DeleteGraph" -> ("GraphID", "write"),
    "/gripql.Edit/AddVertex" -> ("GraphElement", "write"),
    "/gripql.Edit/AddEdge" -> ("GraphElement", "write"),
    "/gripql.Edit/DeleteVertex" -> ("ElementID", "write"),
    "/gripql.Edit/DeleteEdge" -> ("ElementID", "write"))

  /** Resolve the authenticated user, or throw UNAUTHENTICATED (16) when
    * auth is configured and the header doesn't validate. None = no auth
    * configured (open server). */
  private def authUser(header: Option[String]): Option[String] = auth.map { a =>
    a.validate(header).getOrElse(throw GrpcError(16, "authorization failed"))
  }

  /** Per-graph policy check; PERMISSION_DENIED (7) on refusal. No-op on
    * an open server. */
  private def gate(user: Option[String], graph: String, op: String): Unit =
    (auth, user) match {
      case (Some(a), Some(u)) =>
        if (!a.enforce(u, graph, op)) throw GrpcError(7, "permission denied")
      case _ => ()
    }

  /** Unary/server-streaming enforcement: validate credentials, then
    * enforce (user, graph, operation). ListGraphs enforces against the
    * "*" pseudo-graph like the reference (accounts/util.go:169 — a user
    * without a *-scoped read policy may NOT enumerate graph names); a
    * mapped method whose request yields no graph fails LOUD (util.go:76
    * "Unable to get graph") — failing open there would silently disable
    * policy enforcement if this map ever drifted from dispatch. */
  private def authorize(path: String, header: Option[String],
                        messages: Vector[Array[Byte]]): Unit = {
    val user = authUser(header)
    if (user.isDefined) {
      // graph-less methods enforce the "*" pseudo-graph: ListGraphs and
      // ListTables are reads, the Configure service is `admin` — plugins
      // affect every graph (accounts/interface.go:48-50, util.go:169,193)
      if (path == "/gripql.Query/ListGraphs" || path == "/gripql.Query/ListTables")
        gate(user, "*", "read")
      else if (path.startsWith("/gripql.Configure/")) gate(user, "*", "admin")
      else methodMeta.get(path).foreach { case (reqType, op) =>
        val g = messages.headOption.flatMap { m =>
          try Option(text(Pbuf.decode(reg, reqType, m), "graph"))
          catch { case scala.util.control.NonFatal(_) => None }
        }
        gate(user, g.getOrElse(throw GrpcError(3, "unable to get graph from request")), op)
      }
    }
  }

  private def respond(ctx: ChannelHandlerContext, handler: StreamHandler, path: String,
                      messages: Vector[Array[Byte]], bulk: Option[BulkState],
                      readFailure: Option[Throwable],
                      authHeader: Option[String] = None): Unit = {
    var headersSent = false
    def sendHeaders(): Unit = {
      val h = new DefaultHttp2Headers().status("200")
      h.set("content-type", "application/grpc")
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(h))
      headersSent = true
    }
    def sendTrailers(code: Int, msg: String): Unit = {
      val t = new DefaultHttp2Headers()
      if (!headersSent) { t.status("200"); t.set("content-type", "application/grpc") }
      t.set("grpc-status", code.toString)
      if (msg != null) t.set("grpc-message", percentEncode(msg))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(t, true))
    }
    try {
      readFailure.foreach(e => throw e)
      val out = bulk match {
        case Some(b) => Iterator.single(b.result())
        case None =>
          authorize(path, authHeader, messages)
          dispatch(path, messages)
      }
      sendHeaders()
      out.foreach { m =>
        // HTTP/2 flow control feedback: a slow client drains the write
        // buffer below the high-water mark before the next frame is queued,
        // so a huge Traversal stream can't grow server memory unboundedly
        handler.awaitWritable(ctx.channel())
        val b = ctx.alloc().buffer(5 + m.length)
        b.writeByte(0); b.writeInt(m.length); b.writeBytes(m)
        ctx.writeAndFlush(new DefaultHttp2DataFrame(b))
      }
      sendTrailers(0, null)
    } catch {
      case GrpcError(code, msg) => sendTrailers(code, msg)
      case e: IllegalArgumentException => sendTrailers(3, String.valueOf(e.getMessage))
      case e: Throwable => sendTrailers(2, String.valueOf(e.getMessage))
    }
  }

  /** grpc-message is percent-encoded UTF-8 (spaces and ASCII printables
    * except '%' pass through). */
  private def percentEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = b & 0xff
      if (c >= 0x20 && c <= 0x7e && c != '%') sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  // ---- method dispatch ----------------------------------------------------

  private def mg(name: String): MutableGraph = graphs.get(name) match {
    case null => throw GrpcError(5, s"no graph '$name'")
    case g => g
  }

  private def jobState(g: String, id: String): Option[(String, String)] =
    Option(jobStates.get(g -> id)).orElse(
      if (graft.model.Jobs.listJobs(jobsDir(g)).contains(id)) Some("COMPLETE" -> null)
      else None)

  private def requireComplete(g: String, id: String): Unit = jobState(g, id) match {
    case None => throw GrpcError(5, s"no job '$id'")
    case Some(("COMPLETE", _)) => ()
    case Some((st, e)) => throw GrpcError(9,
      s"job '$id' is $st${if (e != null) s": $e" else ""}")
  }

  /** One Graph-message node for the (small) sampled schema graph. */
  private def sampledSchemaNode(name: String): ObjectNode = {
    val sg = graft.model.SchemaSampler.sampleSchema(spark, mg(name).graph)
    val o = mapper.createObjectNode().put("graph", name)
    val vArr = o.putArray("vertices")
    sg.vertices.collect().foreach(r =>
      vArr.add(vertexNode(r.getString(0), r.getString(1), r.getString(2))))
    val eArr = o.putArray("edges")
    sg.edges.collect().foreach(r =>
      eArr.add(edgeNode(r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))))
    o
  }

  /** JobStatus message body (gripql.proto:239-246 — no error-text field;
    * an ERROR state's message travels in grpc-status instead). */
  private def jobStatusNode(g: String, id: String): ObjectNode = jobState(g, id) match {
    case None => throw GrpcError(5, s"no job '$id'")
    case Some((st, _)) =>
      mapper.createObjectNode().put("id", id).put("graph", g).put("state", st)
  }

  private def one(msgs: Vector[Array[Byte]], msgName: String): ObjectNode = {
    if (msgs.size != 1) throw GrpcError(3, s"expected one $msgName message, got ${msgs.size}")
    Pbuf.decode(reg, msgName, msgs.head)
  }

  private def text(n: JsonNode, k: String): String = {
    val v = n.get(k)
    if (v == null || v.isNull) null else v.asText()
  }

  private def dataText(n: JsonNode): String = {
    val v = n.get("data")
    if (v == null || v.isNull) "{}" else v.toString
  }

  private def editResult(id: String): Array[Byte] = {
    val o = mapper.createObjectNode()
    if (id != null) o.put("id", id)
    Pbuf.encode(reg, "EditResult", o)
  }

  private def vertexNode(gid: String, label: String, data: String): ObjectNode = {
    val o = mapper.createObjectNode().put("gid", gid).put("label", label)
    o.set[ObjectNode]("data",
      if (data == null || data.isEmpty) mapper.createObjectNode() else mapper.readTree(data))
    o
  }

  private def edgeNode(gid: String, label: String, from: String, to: String,
                       data: String): ObjectNode =
    vertexNode(gid, label, data).put("from", from).put("to", to)

  private def dispatch(path: String, msgs: Vector[Array[Byte]]): Iterator[Array[Byte]] =
    path match {
      case "/gripql.Query/Traversal" =>
        val q = one(msgs, "GraphQuery")
        val g = mg(Option(text(q, "graph")).getOrElse(throw GrpcError(3, "missing graph")))
        val qArr = Option(q.get("query")).filter(_.isArray)
          .getOrElse(throw GrpcError(3, "missing query statements"))
        val query = Json.parseQuery(qArr.toString)
        val result = Traversal.run(spark, g.graph, query)
        Wire.lines(result, query.stmts.lastOption)
          .map(line => Pbuf.encode(reg, "QueryResult", mapper.readTree(line)))

      case "/gripql.Query/GetVertex" =>
        val m = one(msgs, "ElementID")
        val g = mg(text(m, "graph"))
        g.getVertex(text(m, "id")) match {
          case Some(r) => Iterator.single(Pbuf.encode(reg, "Vertex",
            vertexNode(r.getString(0), r.getString(1), r.getString(2))))
          case None => throw GrpcError(5, s"no vertex '${text(m, "id")}'")
        }

      case "/gripql.Query/GetEdge" =>
        val m = one(msgs, "ElementID")
        val g = mg(text(m, "graph"))
        g.getEdge(text(m, "id")) match {
          case Some(r) => Iterator.single(Pbuf.encode(reg, "Edge",
            edgeNode(r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))))
          case None => throw GrpcError(5, s"no edge '${text(m, "id")}'")
        }

      case "/gripql.Query/ListGraphs" =>
        val o = mapper.createObjectNode()
        val arr = o.putArray("graphs")
        graphs.keySet().asScala.toSeq.sorted.foreach(arr.add)
        Iterator.single(Pbuf.encode(reg, "ListGraphsResponse", o))

      case "/gripql.Query/ListLabels" =>
        val m = one(msgs, "GraphID")
        val g = mg(text(m, "graph"))
        val o = mapper.createObjectNode()
        val vArr = o.putArray("vertex_labels")
        val eArr = o.putArray("edge_labels")
        g.graph.vertices.select("label").distinct().collect()
          .map(_.getString(0)).sorted.foreach(vArr.add)
        g.graph.edges.select("label").distinct().collect()
          .map(_.getString(0)).sorted.foreach(eArr.add)
        Iterator.single(Pbuf.encode(reg, "ListLabelsResponse", o))

      case "/gripql.Query/GetSchema" =>
        val m = one(msgs, "GraphID")
        val name = text(m, "graph")
        mg(name)
        val o = postedSchemas.getOrDefault(name, sampledSchemaNode(name))
        Iterator.single(Pbuf.encode(reg, "Graph", o))

      case "/gripql.Query/SampleSchema" =>
        val m = one(msgs, "GraphID")
        val name = text(m, "graph")
        mg(name)
        Iterator.single(Pbuf.encode(reg, "Graph", sampledSchemaNode(name)))

      case "/gripql.Edit/AddSchema" =>
        val m = one(msgs, "Graph")
        val name = Option(text(m, "graph")).getOrElse(throw GrpcError(3, "missing graph"))
        mg(name)
        postedSchemas.put(name, m)
        Iterator.single(editResult(name))

      case "/gripql.Query/GetTimestamp" =>
        val m = one(msgs, "GraphID")
        val name = text(m, "graph")
        mg(name) // 5 when absent
        val o = mapper.createObjectNode()
          .put("timestamp", timestamps.getOrDefault(name, "0"))
        Iterator.single(Pbuf.encode(reg, "Timestamp", o))

      case "/gripql.Query/ListIndices" =>
        val m = one(msgs, "GraphID")
        val name = text(m, "graph")
        mg(name)
        Option(indices.get(name)).map(_.asScala.toSeq.sorted).getOrElse(Nil)
          .iterator.map { case (label, field) =>
            Pbuf.encode(reg, "IndexID", mapper.createObjectNode()
              .put("graph", name).put("label", label).put("field", field))
          }

      case "/gripql.Edit/AddIndex" =>
        val m = one(msgs, "IndexID")
        val name = text(m, "graph")
        mg(name)
        val (label, field) = (text(m, "label"), text(m, "field"))
        if (label == null || field == null) throw GrpcError(3, "index needs label and field")
        indices.computeIfAbsent(name,
          _ => java.util.concurrent.ConcurrentHashMap.newKeySet()).add(label -> field)
        Iterator.single(editResult(s"$label.$field"))

      case "/gripql.Edit/DeleteIndex" =>
        val m = one(msgs, "IndexID")
        val name = text(m, "graph")
        mg(name)
        val removed = Option(indices.get(name))
          .exists(_.remove(text(m, "label") -> text(m, "field")))
        if (!removed) throw GrpcError(5, "no such index")
        Iterator.single(editResult(s"${text(m, "label")}.${text(m, "field")}"))

      // ---- job service (reference: gripql.proto:377-423; the spool
      // lifecycle mirrors the REST facade's routes in GraftServer) ----

      case "/gripql.Query/Submit" =>
        val q = one(msgs, "GraphQuery")
        val name = Option(text(q, "graph")).getOrElse(throw GrpcError(3, "missing graph"))
        val g = mg(name)
        val qArr = Option(q.get("query")).filter(_.isArray)
          .getOrElse(throw GrpcError(3, "missing query statements"))
        val query = Json.parseQuery(qArr.toString)
        val jobId = "job-" + java.util.UUID.randomUUID().toString.take(12)
        jobStates.put(name -> jobId, "RUNNING" -> null)
        val graph = g.graph
        new Thread(() => {
          try {
            graft.model.Jobs.submitAs(spark, graph, query, jobsDir(name), jobId)
            jobStates.put(name -> jobId, "COMPLETE" -> null)
          } catch {
            case e: Throwable =>
              jobStates.put(name -> jobId, "ERROR" -> String.valueOf(e.getMessage))
          }
        }, s"graft-grpc-job-$jobId").start()
        Iterator.single(Pbuf.encode(reg, "QueryJob",
          mapper.createObjectNode().put("id", jobId).put("graph", name)))

      case "/gripql.Query/ListJobs" =>
        val m = one(msgs, "GraphID")
        val name = text(m, "graph")
        mg(name)
        val known = jobStates.asScala.collect { case ((`name`, id), _) => id }.toSet
        val all = known ++ graft.model.Jobs.listJobs(jobsDir(name))
        all.toSeq.sorted.iterator.map(id => Pbuf.encode(reg, "QueryJob",
          mapper.createObjectNode().put("id", id).put("graph", name)))

      // spooled-result reuse probe (reference: job_manager.go — find a
      // finished job whose query checksum matches the posted traversal)
      case "/gripql.Query/SearchJobs" =>
        val q = one(msgs, "GraphQuery")
        val name = Option(text(q, "graph")).getOrElse(throw GrpcError(3, "missing graph"))
        mg(name)
        val qArr = Option(q.get("query")).filter(_.isArray)
          .getOrElse(throw GrpcError(3, "missing query statements"))
        val query = Json.parseQuery(qArr.toString)
        graft.model.Jobs.searchJobs(jobsDir(name), query).iterator
          .map(id => Pbuf.encode(reg, "JobStatus", jobStatusNode(name, id)))

      case "/gripql.Query/GetJob" =>
        val m = one(msgs, "QueryJob")
        val (name, id) = (text(m, "graph"), text(m, "id"))
        mg(name)
        Iterator.single(Pbuf.encode(reg, "JobStatus", jobStatusNode(name, id)))

      case "/gripql.Query/DeleteJob" =>
        val m = one(msgs, "QueryJob")
        val (name, id) = (text(m, "graph"), text(m, "id"))
        mg(name)
        jobState(name, id) match {
          case Some(("RUNNING", _)) =>
            throw GrpcError(9, s"job '$id' is running; retry after it completes")
          case st =>
            val hadSpool = graft.model.Jobs.deleteJob(jobsDir(name), id)
            if (!hadSpool && st.isEmpty) throw GrpcError(5, s"no job '$id'")
            jobStates.remove(name -> id)
            Iterator.single(Pbuf.encode(reg, "JobStatus", mapper.createObjectNode()
              .put("id", id).put("graph", name).put("state", "DELETED")))
        }

      case "/gripql.Query/ViewJob" =>
        val m = one(msgs, "QueryJob")
        val (name, id) = (text(m, "graph"), text(m, "id"))
        val g = mg(name)
        requireComplete(name, id)
        Wire.lines(graft.model.Jobs.view(spark, g.graph, jobsDir(name), id), None)
          .map(line => Pbuf.encode(reg, "QueryResult", mapper.readTree(line)))

      case "/gripql.Query/ResumeJob" =>
        val m = one(msgs, "ExtendQuery")
        val (name, id) = (text(m, "graph"), text(m, "src_id"))
        val g = mg(name)
        requireComplete(name, id)
        val qArr = Option(m.get("query")).filter(_.isArray)
          .getOrElse(throw GrpcError(3, "missing query statements"))
        val ext = Json.parseQuery(qArr.toString)
        Wire.lines(graft.model.Jobs.resume(spark, g.graph, jobsDir(name), id, ext),
            ext.stmts.lastOption)
          .map(line => Pbuf.encode(reg, "QueryResult", mapper.readTree(line)))

      case "/gripql.Edit/AddGraph" =>
        val m = one(msgs, "GraphID")
        val name = Option(text(m, "graph")).getOrElse(throw GrpcError(3, "missing graph"))
        if (graphs.putIfAbsent(name, MutableGraph.empty(spark)) != null)
          throw GrpcError(3, s"graph '$name' exists")
        touch(name)
        Iterator.single(editResult(name))

      case "/gripql.Edit/DeleteGraph" =>
        val m = one(msgs, "GraphID")
        val name = text(m, "graph")
        if (graphs.remove(name) == null) throw GrpcError(5, s"no graph '$name'")
        indices.remove(name); timestamps.remove(name); postedSchemas.remove(name)
        mappings.remove(name)
        Iterator.single(editResult(name))

      case "/gripql.Edit/AddVertex" =>
        val m = one(msgs, "GraphElement")
        val g = mg(text(m, "graph"))
        val v = Option(m.get("vertex")).getOrElse(throw GrpcError(3, "missing vertex"))
        val (gid, label) = (text(v, "gid"), text(v, "label"))
        if (gid == null || label == null) throw GrpcError(3, "vertex needs gid and label")
        g.addVertex(gid, label, dataText(v))
        touch(text(m, "graph"))
        Iterator.single(editResult(gid))

      case "/gripql.Edit/AddEdge" =>
        val m = one(msgs, "GraphElement")
        val g = mg(text(m, "graph"))
        val e = Option(m.get("edge")).getOrElse(throw GrpcError(3, "missing edge"))
        val (from, to, label) = (text(e, "from"), text(e, "to"), text(e, "label"))
        if (from == null || to == null || label == null)
          throw GrpcError(3, "edge needs from, to, label")
        g.addEdge(from, to, label, dataText(e), text(e, "gid"))
        touch(text(m, "graph"))
        Iterator.single(editResult(text(e, "gid")))

      case "/gripql.Edit/DeleteVertex" =>
        val m = one(msgs, "ElementID")
        val g = mg(text(m, "graph"))
        val id = text(m, "id")
        if (g.getVertex(id).isEmpty) throw GrpcError(5, s"no vertex '$id'")
        g.deleteVertex(id)
        touch(text(m, "graph"))
        Iterator.single(editResult(id))

      case "/gripql.Edit/DeleteEdge" =>
        val m = one(msgs, "ElementID")
        val g = mg(text(m, "graph"))
        val id = text(m, "id")
        if (g.getEdge(id).isEmpty) throw GrpcError(5, s"no edge '$id'")
        g.deleteEdge(id)
        touch(text(m, "graph"))
        Iterator.single(editResult(id))

      // (client-streaming /gripql.Edit/BulkAdd never reaches dispatch —
      // its frames apply incrementally in BulkState as they arrive)

      // GRIPPER mappings over started plugins (gripql.proto:496 AddMapping,
      // :345 GetMapping; the Graph message's elements ARE the config,
      // gripper/config.go:68-100 GraphToConfig)
      case "/gripql.Edit/AddMapping" =>
        val m = one(msgs, "Graph")
        val name = Option(text(m, "graph")).getOrElse(throw GrpcError(3, "missing graph"))
        if (graphs.containsKey(name)) throw GrpcError(3, s"graph '$name' exists")
        val conf = Plugins.configFromGraphNode(m)
        val mapped = graft.model.Gripper.graph(conf, Plugins.resolveSources(conf, plugins))
        graphs.put(name, MutableGraph(spark, mapped))
        mappings.put(name, conf)
        touch(name)
        Iterator.single(editResult(name))

      case "/gripql.Query/GetMapping" =>
        val m = one(msgs, "GraphID")
        val name = text(m, "graph")
        mappings.get(name) match {
          case null => throw GrpcError(5, s"no mapping for graph '$name'")
          case conf => Iterator.single(Pbuf.encode(reg, "Graph",
            Plugins.configToGraphNode(mapper, name, conf)))
        }

      // --- plugin system (gripql.proto Query.ListTables :369, Configure
      // service :526-541; semantics per server/plugins.go, api.go:57-67) ---
      case "/gripql.Query/ListTables" =>
        plugins.tables(mapper, camel = false)
          .map(o => Pbuf.encode(reg, "TableInfo", o))

      case "/gripql.Configure/StartPlugin" =>
        val m = one(msgs, "PluginConfig")
        val name = Option(text(m, "name")).getOrElse(throw GrpcError(3, "missing plugin name"))
        val driver = Option(text(m, "driver")).getOrElse(throw GrpcError(3, "missing driver"))
        val config = Option(m.get("config")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty[String, String])
        plugins.start(name, driver, config)
        Iterator.single(Pbuf.encode(reg, "PluginStatus",
          mapper.createObjectNode().put("name", name)))

      case "/gripql.Configure/ListPlugins" =>
        val o = mapper.createObjectNode()
        val arr = o.putArray("plugins")
        plugins.list.foreach(arr.add)
        Iterator.single(Pbuf.encode(reg, "ListPluginsResponse", o))

      case "/gripql.Configure/ListDrivers" =>
        val o = mapper.createObjectNode()
        val arr = o.putArray("drivers")
        plugins.drivers.foreach(arr.add)
        Iterator.single(Pbuf.encode(reg, "ListDriversResponse", o))

      case other => throw GrpcError(12, s"unimplemented method $other")
    }
}

/** Standalone entry: `runMain graft.server.GrpcServer <port> [graphDir]`. */
object GrpcServer {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8202)
    val spark = SparkSession.builder().master("local[*]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    val srv = new GrpcServer(spark, port)
    args.drop(1).headOption.foreach(dir => srv.addGraph("main", GraphFrame.load(spark, dir)))
    srv.start()
    println(s"graft gRPC server listening on :$port")
    Thread.currentThread().join()
  }
}
