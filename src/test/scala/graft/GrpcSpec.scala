package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel._
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._
import io.netty.util.ReferenceCountUtil
import graft.server.{GripqlProto, GrpcServer, Pbuf, TestRegistry}

import java.util.concurrent.{CompletableFuture, TimeUnit}

/** End-to-end gRPC: a real h2c client (netty frame codec, the same wire
  * any stock gRPC client speaks with prior knowledge) driving
  * [[GrpcServer]] — Traversal server-streaming, Edit unary methods, and
  * BulkAdd client-streaming, plus status-code semantics for unknown
  * methods and missing elements. Request/response bytes go through
  * [[Pbuf]], whose wire format PbufSpec pins against hand-computed golden
  * vectors — so this suite exercises the full marshal → HTTP/2 → dispatch
  * → stream → trailers loop. */
class GrpcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val mapper = new ObjectMapper()
  private val reg = GripqlProto.registry

  private case class Resp(grpcStatus: Int, message: String, payloads: Vector[Array[Byte]])

  /** Minimal h2c prior-knowledge gRPC client over netty's frame codec. */
  private final class Client(host: String, port: Int) {
    private val group = new NioEventLoopGroup(1)
    private val ch: Channel = new Bootstrap()
      .group(group)
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(c: SocketChannel): Unit = {
          c.pipeline().addLast(Http2FrameCodecBuilder.forClient().build())
          c.pipeline().addLast(new Http2MultiplexHandler(new ChannelInitializer[Channel] {
            override def initChannel(s: Channel): Unit = ()
          }))
        }
      })
      .connect(host, port).sync().channel()

    def call(path: String, reqs: Seq[Array[Byte]], authHeader: Option[String] = None): Resp = {
      val done = new CompletableFuture[Resp]()
      val bs = new Http2StreamChannelBootstrap(ch)
      bs.handler(new ChannelInitializer[Channel] {
        override def initChannel(s: Channel): Unit =
          s.pipeline().addLast(new ChannelInboundHandlerAdapter {
            private val buf = Unpooled.compositeBuffer()
            private var status = -1
            private var msg = ""
            override def channelRead(ctx: ChannelHandlerContext, m: AnyRef): Unit = m match {
              case h: Http2HeadersFrame =>
                val gs = h.headers().get("grpc-status")
                if (gs != null) {
                  status = gs.toString.toInt
                  val gm = h.headers().get("grpc-message")
                  if (gm != null) msg = gm.toString
                }
                if (h.isEndStream) complete()
              case d: Http2DataFrame =>
                // manual flow control in netty's frame API: hand the
                // consumed bytes back or big server streams stall at 64 KB
                val consumed = d.initialFlowControlledBytes()
                buf.addComponent(true, d.content())
                if (consumed > 0 && !d.isEndStream)
                  ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(consumed))
                if (d.isEndStream) complete()
              case other => ReferenceCountUtil.release(other)
            }
            override def exceptionCaught(ctx: ChannelHandlerContext, e: Throwable): Unit =
              done.completeExceptionally(e)
            private def complete(): Unit = {
              val out = Vector.newBuilder[Array[Byte]]
              while (buf.readableBytes() >= 5) {
                buf.readByte()
                val len = buf.readInt()
                val a = new Array[Byte](len)
                buf.readBytes(a)
                out += a
              }
              ReferenceCountUtil.release(buf)
              done.complete(Resp(status, msg, out.result()))
            }
          })
      })
      val stream = bs.open().sync().get()
      val headers = new DefaultHttp2Headers()
      headers.method("POST").scheme("http").path(path)
        .authority(s"$host:$port")
      headers.set("content-type", "application/grpc")
      headers.set("te", "trailers")
      authHeader.foreach(h => headers.set("authorization", h))
      stream.write(new DefaultHttp2HeadersFrame(headers))
      val body = Unpooled.buffer()
      reqs.foreach { r => body.writeByte(0); body.writeInt(r.length); body.writeBytes(r) }
      stream.writeAndFlush(new DefaultHttp2DataFrame(body, true))
      // liveness bound, not a perf assertion: a call that takes minutes
      // under concurrent test groups + host steal is still a pass; only a
      // genuine hang should fail
      done.get(300, TimeUnit.SECONDS)
    }

    def close(): Unit = {
      ch.close().sync()
      group.shutdownGracefully(0, 100, TimeUnit.MILLISECONDS)
    }
  }

  private def enc(msg: String, json: String): Array[Byte] =
    Pbuf.encode(reg, msg, mapper.readTree(json))

  private def dec(msg: String, bytes: Array[Byte]) = Pbuf.decode(reg, msg, bytes)

  private def withServer(f: Client => Unit): Unit = {
    val srv = new GrpcServer(spark, 0)
    srv.start()
    val client = new Client("127.0.0.1", srv.boundPort)
    try f(client)
    finally { client.close(); srv.stop() }
  }

  test("edit + traversal + point reads over real gRPC streams") {
    withServer { c =>
      // AddGraph
      assert(c.call("/gripql.Edit/AddGraph",
        Seq(enc("GraphID", """{"graph":"g"}"""))).grpcStatus == 0)
      // duplicate → INVALID_ARGUMENT
      assert(c.call("/gripql.Edit/AddGraph",
        Seq(enc("GraphID", """{"graph":"g"}"""))).grpcStatus == 3)

      // vertices + edge through unary Edit calls
      for ((gid, age) <- Seq(("v1", 29), ("v2", 27), ("v3", 32)))
        assert(c.call("/gripql.Edit/AddVertex", Seq(enc("GraphElement",
          s"""{"graph":"g","vertex":{"gid":"$gid","label":"Person","data":{"age":$age}}}"""))).grpcStatus == 0)
      assert(c.call("/gripql.Edit/AddEdge", Seq(enc("GraphElement",
        """{"graph":"g","edge":{"gid":"e1","from":"v1","to":"v2","label":"knows"}}"""))).grpcStatus == 0)

      // server-streaming traversal: every Person vertex
      val all = c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"g","query":[{"v":[]},{"has_label":["Person"]}]}""")))
      assert(all.grpcStatus == 0)
      assert(all.payloads.size == 3)
      val gids = all.payloads.map(p => dec("QueryResult", p).get("vertex").get("gid").asText()).toSet
      assert(gids == Set("v1", "v2", "v3"))

      // count statement → one QueryResult{count}
      val cnt = c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"g","query":[{"v":["v1"]},{"out":["knows"]},{"count":""}]}""")))
      assert(cnt.grpcStatus == 0)
      assert(dec("QueryResult", cnt.payloads.head).get("count").asLong() == 1L)

      // GetVertex round-trips the Struct data
      val gv = c.call("/gripql.Query/GetVertex",
        Seq(enc("ElementID", """{"graph":"g","id":"v1"}""")))
      assert(gv.grpcStatus == 0)
      val v1 = dec("Vertex", gv.payloads.head)
      assert(v1.get("label").asText() == "Person" && v1.get("data").get("age").asLong() == 29L)

      // ListLabels (snake_case protojson fields per the proto)
      val ll = c.call("/gripql.Query/ListLabels",
        Seq(enc("GraphID", """{"graph":"g"}""")))
      val labels = dec("ListLabelsResponse", ll.payloads.head)
      assert(labels.get("vertex_labels").get(0).asText() == "Person")
      assert(labels.get("edge_labels").get(0).asText() == "knows")

      // delete then NOT_FOUND
      assert(c.call("/gripql.Edit/DeleteEdge",
        Seq(enc("ElementID", """{"graph":"g","id":"e1"}"""))).grpcStatus == 0)
      assert(c.call("/gripql.Query/GetEdge",
        Seq(enc("ElementID", """{"graph":"g","id":"e1"}"""))).grpcStatus == 5)
    }
  }

  test("BulkAdd client-streaming counts inserts and errors") {
    withServer { c =>
      assert(c.call("/gripql.Edit/AddGraph",
        Seq(enc("GraphID", """{"graph":"b"}"""))).grpcStatus == 0)
      val frames = Seq(
        enc("GraphElement", """{"graph":"b","vertex":{"gid":"x1","label":"L"}}"""),
        enc("GraphElement", """{"graph":"b","vertex":{"gid":"x2","label":"L"}}"""),
        enc("GraphElement", """{"graph":"b","edge":{"gid":"e","from":"x1","to":"x2","label":"t"}}"""),
        enc("GraphElement", """{"graph":"b","vertex":{"gid":"broken"}}"""), // no label
        enc("GraphElement", """{"graph":"nope","vertex":{"gid":"y","label":"L"}}"""))
      val r = c.call("/gripql.Edit/BulkAdd", frames)
      assert(r.grpcStatus == 0)
      val res = dec("BulkEditResult", r.payloads.head)
      assert(res.get("insert_count").asLong() == 3L)
      assert(res.get("error_count").asLong() == 2L)

      val cnt = c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"b","query":[{"v":[]},{"count":""}]}""")))
      assert(dec("QueryResult", cnt.payloads.head).get("count").asLong() == 2L)
    }
  }

  test("REST and gRPC serve the same graph registry") {
    val rest = new graft.server.GraftServer(spark, 0)
    rest.start()
    val grpc = new GrpcServer(spark, 0, TestRegistry.of(rest))
    grpc.start()
    val client = new Client("127.0.0.1", grpc.boundPort)
    try {
      // create + populate over HTTP ...
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${rest.boundPort}$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(post("/v1/graph/shared", "").statusCode() == 200)
      assert(post("/v1/graph/shared/vertex",
        """{"gid":"s1","label":"Node"}""").statusCode() == 200)
      // ... and see it over gRPC
      val lg = client.call("/gripql.Query/ListGraphs", Seq(enc("Empty", "{}")))
      assert(dec("ListGraphsResponse", lg.payloads.head).get("graphs").get(0).asText() == "shared")
      val cnt = client.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"shared","query":[{"v":[]},{"count":""}]}""")))
      assert(dec("QueryResult", cnt.payloads.head).get("count").asLong() == 1L)
      // and the reverse: a gRPC edit visible over REST
      assert(client.call("/gripql.Edit/AddVertex", Seq(enc("GraphElement",
        """{"graph":"shared","vertex":{"gid":"s2","label":"Node"}}"""))).grpcStatus == 0)
      val got = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${rest.boundPort}/v1/graph/shared/vertex/s2"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(got.statusCode() == 200 && got.body().contains("\"s2\""))
    } finally { client.close(); grpc.stop(); rest.stop() }
  }

  test("REST and gRPC share one mapping registry (AddMapping visible cross-transport)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xmap").toString
    Seq(("1", "ada", "2"), ("2", "lin", "")).toDF("id", "name", "boss")
      .write.mode("overwrite").parquet(s"$dir/people.parquet")
    val rest = new graft.server.GraftServer(spark, 0)
    rest.start()
    val grpc = new GrpcServer(spark, 0, TestRegistry.of(rest), None,
      Some(TestRegistry.pluginsOf(rest)), Some(TestRegistry.mappingsOf(rest)))
    grpc.start()
    val client = new Client("127.0.0.1", grpc.boundPort)
    try {
      // start the source plugin + AddMapping over gRPC
      assert(client.call("/gripql.Configure/StartPlugin", Seq(enc("PluginConfig",
        s"""{"name":"hr","driver":"dir","config":{"path":"$dir"}}"""))).grpcStatus == 0)
      val mapping =
        s"""{"graph":"fed",
           | "vertices":[{"gid":"P:","label":"Person",
           |   "data":{"source":"hr","collection":"people"}}],
           | "edges":[]}""".stripMargin
      assert(client.call("/gripql.Edit/AddMapping", Seq(enc("Graph", mapping))).grpcStatus == 0)
      // ... and read the stored mapping over REST
      val http = java.net.http.HttpClient.newHttpClient()
      def get(path: String) = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${rest.boundPort}$path"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val got = get("/v1/graph/fed/mapping")
      assert(got.statusCode() == 200 && got.body().contains("\"P:\""))
      // DeleteGraph over gRPC clears the shared mapping too
      assert(client.call("/gripql.Edit/DeleteGraph",
        Seq(enc("GraphID", """{"graph":"fed"}"""))).grpcStatus == 0)
      assert(get("/v1/graph/fed/mapping").statusCode() == 404)
    } finally { client.close(); grpc.stop(); rest.stop() }
  }

  test("job service: submit, poll, view, resume, list, delete") {
    withServer { c =>
      assert(c.call("/gripql.Edit/AddGraph",
        Seq(enc("GraphID", """{"graph":"j"}"""))).grpcStatus == 0)
      for (gid <- Seq("a", "b", "c"))
        assert(c.call("/gripql.Edit/AddVertex", Seq(enc("GraphElement",
          s"""{"graph":"j","vertex":{"gid":"$gid","label":"N"}}"""))).grpcStatus == 0)
      assert(c.call("/gripql.Edit/AddEdge", Seq(enc("GraphElement",
        """{"graph":"j","edge":{"from":"a","to":"b","label":"t"}}"""))).grpcStatus == 0)

      val sub = c.call("/gripql.Query/Submit", Seq(enc("GraphQuery",
        """{"graph":"j","query":[{"v":[]}]}""")))
      assert(sub.grpcStatus == 0)
      val jobId = dec("QueryJob", sub.payloads.head).get("id").asText()

      // poll until the spool completes
      var state = ""
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (state != "COMPLETE" && System.nanoTime() < deadline) {
        val st = c.call("/gripql.Query/GetJob", Seq(enc("QueryJob",
          s"""{"graph":"j","id":"$jobId"}""")))
        state = dec("JobStatus", st.payloads.head).get("state").asText()
        if (state == "ERROR") fail("job errored")
        if (state != "COMPLETE") Thread.sleep(200)
      }
      assert(state == "COMPLETE")

      // view streams the spooled vertices
      val view = c.call("/gripql.Query/ViewJob", Seq(enc("QueryJob",
        s"""{"graph":"j","id":"$jobId"}""")))
      assert(view.grpcStatus == 0)
      assert(view.payloads.map(p =>
        dec("QueryResult", p).get("vertex").get("gid").asText()).toSet == Set("a", "b", "c"))

      // resume extends the spooled stream with more statements
      val res = c.call("/gripql.Query/ResumeJob", Seq(enc("ExtendQuery",
        s"""{"graph":"j","src_id":"$jobId","query":[{"out":["t"]},{"count":""}]}""")))
      assert(res.grpcStatus == 0)
      assert(dec("QueryResult", res.payloads.head).get("count").asLong() == 1L)

      val ls = c.call("/gripql.Query/ListJobs", Seq(enc("GraphID", """{"graph":"j"}""")))
      assert(ls.payloads.map(p => dec("QueryJob", p).get("id").asText()).contains(jobId))

      // SearchJobs matches jobs whose per-statement checksums are a PREFIX
      // of the posted query, with the reference's >1-statement floor
      // (jobstorage/query_checksum.go:28-39): the 1-statement job above can
      // never match, so spool a 2-statement job and probe with extensions
      val sub2 = c.call("/gripql.Query/Submit", Seq(enc("GraphQuery",
        """{"graph":"j","query":[{"v":[]},{"has_label":["N"]}]}""")))
      val jobId2 = dec("QueryJob", sub2.payloads.head).get("id").asText()
      var state2 = ""
      val deadline2 = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (state2 != "COMPLETE" && System.nanoTime() < deadline2) {
        val st = c.call("/gripql.Query/GetJob", Seq(enc("QueryJob",
          s"""{"graph":"j","id":"$jobId2"}""")))
        state2 = dec("JobStatus", st.payloads.head).get("state").asText()
        if (state2 != "COMPLETE") Thread.sleep(200)
      }
      val found = c.call("/gripql.Query/SearchJobs", Seq(enc("GraphQuery",
        """{"graph":"j","query":[{"v":[]},{"has_label":["N"]},{"count":""}]}""")))
      assert(found.grpcStatus == 0)
      assert(found.payloads.map(p => dec("JobStatus", p).get("id").asText()) == Seq(jobId2))
      // shorter than the job, wrong head statement, or the 1-stmt job: no match
      assert(c.call("/gripql.Query/SearchJobs", Seq(enc("GraphQuery",
        """{"graph":"j","query":[{"v":[]}]}"""))).payloads.isEmpty)
      assert(c.call("/gripql.Query/SearchJobs", Seq(enc("GraphQuery",
        """{"graph":"j","query":[{"e":[]},{"has_label":["N"]}]}"""))).payloads.isEmpty)
      assert(c.call("/gripql.Query/DeleteJob", Seq(enc("QueryJob",
        s"""{"graph":"j","id":"$jobId2"}"""))).grpcStatus == 0)

      val del = c.call("/gripql.Query/DeleteJob", Seq(enc("QueryJob",
        s"""{"graph":"j","id":"$jobId"}""")))
      assert(del.grpcStatus == 0)
      assert(dec("JobStatus", del.payloads.head).get("state").asText() == "DELETED")
      assert(c.call("/gripql.Query/GetJob", Seq(enc("QueryJob",
        s"""{"graph":"j","id":"$jobId"}"""))).grpcStatus == 5)
    }
  }

  test("schema: posted wins over sampled; SampleSchema always samples") {
    withServer { c =>
      assert(c.call("/gripql.Edit/AddGraph",
        Seq(enc("GraphID", """{"graph":"s"}"""))).grpcStatus == 0)
      assert(c.call("/gripql.Edit/AddVertex", Seq(enc("GraphElement",
        """{"graph":"s","vertex":{"gid":"v1","label":"Person","data":{"age":1}}}"""))).grpcStatus == 0)
      // sampled schema first
      val sampled = dec("Graph",
        c.call("/gripql.Query/GetSchema", Seq(enc("GraphID", """{"graph":"s"}"""))).payloads.head)
      assert(sampled.get("vertices").get(0).get("label").asText() == "Person")
      // posted schema wins afterwards
      assert(c.call("/gripql.Edit/AddSchema", Seq(enc("Graph",
        """{"graph":"s","vertices":[{"gid":"Posted","label":"Posted","data":{"age":"NUMERIC"}}],"edges":[]}"""))).grpcStatus == 0)
      val posted = dec("Graph",
        c.call("/gripql.Query/GetSchema", Seq(enc("GraphID", """{"graph":"s"}"""))).payloads.head)
      assert(posted.get("vertices").get(0).get("label").asText() == "Posted")
      // SampleSchema bypasses the posted copy
      val resampled = dec("Graph",
        c.call("/gripql.Query/SampleSchema", Seq(enc("GraphID", """{"graph":"s"}"""))).payloads.head)
      assert(resampled.get("vertices").get(0).get("label").asText() == "Person")
    }
  }

  test("indices and timestamps") {
    withServer { c =>
      assert(c.call("/gripql.Edit/AddGraph",
        Seq(enc("GraphID", """{"graph":"i"}"""))).grpcStatus == 0)
      // fresh graph: a timestamp exists (AddGraph touches it)
      val t0 = c.call("/gripql.Query/GetTimestamp", Seq(enc("GraphID", """{"graph":"i"}""")))
      val ts0 = dec("Timestamp", t0.payloads.head).get("timestamp").asText()
      assert(ts0 != "0")

      assert(c.call("/gripql.Edit/AddIndex", Seq(enc("IndexID",
        """{"graph":"i","label":"Person","field":"name"}"""))).grpcStatus == 0)
      val li = c.call("/gripql.Query/ListIndices", Seq(enc("GraphID", """{"graph":"i"}""")))
      val idx = dec("IndexID", li.payloads.head)
      assert(idx.get("label").asText() == "Person" && idx.get("field").asText() == "name")
      assert(c.call("/gripql.Edit/DeleteIndex", Seq(enc("IndexID",
        """{"graph":"i","label":"Person","field":"name"}"""))).grpcStatus == 0)
      assert(c.call("/gripql.Query/ListIndices",
        Seq(enc("GraphID", """{"graph":"i"}"""))).payloads.isEmpty)
      assert(c.call("/gripql.Edit/DeleteIndex", Seq(enc("IndexID",
        """{"graph":"i","label":"Person","field":"name"}"""))).grpcStatus == 5)
    }
  }

  test("large streams both ways: fragmented BulkAdd in, >64KB Traversal out") {
    withServer { c =>
      assert(c.call("/gripql.Edit/AddGraph",
        Seq(enc("GraphID", """{"graph":"big"}"""))).grpcStatus == 0)
      // 5000 elements ≈ 350 KB: far past the 64 KB initial flow-control
      // window and netty's 16 KB max frame size, so the request arrives as
      // many DATA frames with gRPC frames split across them — exercising
      // the incremental drain and the server's window updates
      val frames = (1 to 5000).map(i => enc("GraphElement",
        s"""{"graph":"big","vertex":{"gid":"v$i","label":"L","data":{"pad":"x$i-abcdefghijklmnop"}}}"""))
      val r = c.call("/gripql.Edit/BulkAdd", frames)
      assert(r.grpcStatus == 0)
      assert(dec("BulkEditResult", r.payloads.head).get("insert_count").asLong() == 5000L)

      // and stream them all back: the response is also >64 KB, exercising
      // the client's window updates and the server's writability parking
      val all = c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"big","query":[{"v":[]}]}""")))
      assert(all.grpcStatus == 0)
      assert(all.payloads.size == 5000)
      assert(dec("QueryResult", all.payloads.head).get("vertex").get("data").has("pad"))
    }
  }

  test("auth gates the gRPC transport: UNAUTHENTICATED, per-graph policy, BulkAdd stream denial") {
    import graft.server.GraftServer.{Auth, Credential, Policy}
    val auth = Auth(
      credentials = Seq(Credential("admin", "secret"), Credential("bob", "pw")),
      policies = Seq(
        Policy("admin", "*", Set("*")),
        Policy("bob", "g1", Set("query", "read")))) // bob: no write, no g2
    val srv = new GrpcServer(spark, 0,
      new java.util.concurrent.ConcurrentHashMap[String, graft.model.MutableGraph](), Some(auth))
    srv.start()
    val c = new Client("127.0.0.1", srv.boundPort)
    def basic(u: String, p: String) =
      "Basic " + java.util.Base64.getEncoder.encodeToString(s"$u:$p".getBytes("UTF-8"))
    try {
      // anonymous and wrong-password → UNAUTHENTICATED (16), even ListGraphs
      assert(c.call("/gripql.Query/ListGraphs", Seq(enc("Empty", "{}"))).grpcStatus == 16)
      assert(c.call("/gripql.Query/ListGraphs", Seq(enc("Empty", "{}")),
        Some(basic("bob", "nope"))).grpcStatus == 16)
      // admin creates g1 and g2; bob may query g1 but not write it nor touch g2
      assert(c.call("/gripql.Edit/AddGraph", Seq(enc("GraphID", """{"graph":"g1"}""")),
        Some(basic("admin", "secret"))).grpcStatus == 0)
      assert(c.call("/gripql.Edit/AddGraph", Seq(enc("GraphID", """{"graph":"g2"}""")),
        Some(basic("admin", "secret"))).grpcStatus == 0)
      // ListGraphs enforces the "*" pseudo-graph (reference
      // accounts/util.go:169): admin's *-policy allows it, bob's
      // g1-scoped policy does not
      assert(c.call("/gripql.Query/ListGraphs", Seq(enc("Empty", "{}")),
        Some(basic("admin", "secret"))).grpcStatus == 0)
      assert(c.call("/gripql.Query/ListGraphs", Seq(enc("Empty", "{}")),
        Some(basic("bob", "pw"))).grpcStatus == 7)
      assert(c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"g1","query":[{"v":[]}]}""")), Some(basic("bob", "pw"))).grpcStatus == 0)
      // the proto's own service names reach the same handlers + auth rows
      assert(c.call("/gripql.Job/ListJobs", Seq(enc("GraphID", """{"graph":"g1"}""")),
        Some(basic("bob", "pw"))).grpcStatus == 0)
      assert(c.call("/gripql.Edit/SampleSchema", Seq(enc("GraphID", """{"graph":"g1"}""")),
        Some(basic("bob", "pw"))).grpcStatus == 7) // write-class, bob lacks it
      assert(c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"g2","query":[{"v":[]}]}""")), Some(basic("bob", "pw"))).grpcStatus == 7)
      assert(c.call("/gripql.Edit/AddVertex", Seq(enc("GraphElement",
        """{"graph":"g1","vertex":{"gid":"x","label":"N"}}""")),
        Some(basic("bob", "pw"))).grpcStatus == 7)
      // client-streaming BulkAdd: denied elements are SKIPPED and the
      // stream continues (reference BulkWriteFilter RecvMsg-loops past
      // them, accounts/bulk_write_filter.go) — visible as error_count here
      val denied = c.call("/gripql.Edit/BulkAdd", Seq(enc("GraphElement",
        """{"graph":"g1","vertex":{"gid":"y","label":"N"}}""")),
        Some(basic("bob", "pw")))
      assert(denied.grpcStatus == 0)
      val dr = dec("BulkEditResult", denied.payloads.head)
      assert(dr.get("insert_count").asLong() == 0 && dr.get("error_count").asLong() == 1, dr)
      assert(c.call("/gripql.Edit/BulkAdd", Seq(enc("GraphElement",
        """{"graph":"g1","vertex":{"gid":"y","label":"N"}}"""))).grpcStatus == 16)
      val ok = c.call("/gripql.Edit/BulkAdd", Seq(enc("GraphElement",
        """{"graph":"g1","vertex":{"gid":"y","label":"N"}}""")),
        Some(basic("admin", "secret")))
      assert(ok.grpcStatus == 0 &&
        dec("BulkEditResult", ok.payloads.head).get("insert_count").asLong() == 1)
    } finally { c.close(); srv.stop() }
  }

  test("status codes: unknown method, unknown graph, bad query") {
    withServer { c =>
      assert(c.call("/gripql.Query/NoSuchMethod", Seq(enc("Empty", "{}"))).grpcStatus == 12)
      assert(c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"missing","query":[{"v":[]}]}"""))).grpcStatus == 5)
      // malformed traversal (doesn't start with V/E) → INVALID_ARGUMENT
      val bad = c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"missing2","query":[{"out":[]}]}""")))
      assert(bad.grpcStatus == 5 || bad.grpcStatus == 3)
    }
  }

  test("plugin system: Configure service, ListTables, AddMapping/GetMapping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-grpc-plugin").toString
    Seq(("1", "ada", "2"), ("2", "lin", "")).toDF("id", "name", "boss")
      .write.mode("overwrite").parquet(s"$dir/people.parquet")
    withServer { c =>
      // ListDrivers names the built-in source constructors
      val drv = c.call("/gripql.Configure/ListDrivers", Seq(enc("Empty", "{}")))
      assert(drv.grpcStatus == 0)
      assert(dec("ListDriversResponse", drv.payloads.head)
        .get("drivers").toString.contains("\"dir\""))

      // StartPlugin registers a source; duplicates are INVALID_ARGUMENT
      val cfg = s"""{"name":"hr","driver":"dir","config":{"path":"$dir"}}"""
      val st = c.call("/gripql.Configure/StartPlugin", Seq(enc("PluginConfig", cfg)))
      assert(st.grpcStatus == 0)
      assert(dec("PluginStatus", st.payloads.head).get("name").asText() == "hr")
      assert(c.call("/gripql.Configure/StartPlugin",
        Seq(enc("PluginConfig", cfg))).grpcStatus == 3)
      val lp = c.call("/gripql.Configure/ListPlugins", Seq(enc("Empty", "{}")))
      assert(dec("ListPluginsResponse", lp.payloads.head)
        .get("plugins").get(0).asText() == "hr")

      // ListTables streams one TableInfo per collection
      val lt = c.call("/gripql.Query/ListTables", Seq(enc("Empty", "{}")))
      assert(lt.grpcStatus == 0 && lt.payloads.size == 1)
      val ti = dec("TableInfo", lt.payloads.head)
      assert(ti.get("source").asText() == "hr" && ti.get("name").asText() == "people")
      assert(ti.get("fields").toString.contains("$.name"))

      // AddMapping: the Graph message's elements ARE the config; the
      // source name resolves against the started plugin
      val mapping =
        s"""{"graph":"fed",
           | "vertices":[{"gid":"P:","label":"Person",
           |   "data":{"source":"hr","collection":"people"}}],
           | "edges":[{"gid":"boss","label":"boss","from":"P:","to":"P:",
           |   "data":{"source":"hr","collection":"people",
           |            "fromField":"id","toField":"boss"}}]}""".stripMargin
      assert(c.call("/gripql.Edit/AddMapping", Seq(enc("Graph", mapping))).grpcStatus == 0)
      // GetMapping round-trips the stored config as a Graph message
      val gm = c.call("/gripql.Query/GetMapping", Seq(enc("GraphID", """{"graph":"fed"}""")))
      assert(gm.grpcStatus == 0)
      val back = dec("Graph", gm.payloads.head)
      assert(back.get("vertices").get(0).get("gid").asText() == "P:")
      assert(back.get("edges").get(0).get("data").get("fromField").asText() == "id")
      assert(c.call("/gripql.Query/GetMapping",
        Seq(enc("GraphID", """{"graph":"nope"}"""))).grpcStatus == 5)

      // the mapped graph traverses through the normal Traversal path
      val tr = c.call("/gripql.Query/Traversal", Seq(enc("GraphQuery",
        """{"graph":"fed","query":[{"v":["P:1"]},{"out":["boss"]}]}""")))
      assert(tr.grpcStatus == 0 && tr.payloads.size == 1)
      assert(dec("QueryResult", tr.payloads.head).get("vertex").get("gid").asText() == "P:2")

      // an unresolvable source fails loud
      val badMap = mapping.replace("\"hr\"", "\"ghost\"").replace("\"fed\"", "\"fed2\"")
      assert(c.call("/gripql.Edit/AddMapping", Seq(enc("Graph", badMap))).grpcStatus == 3)
    }
  }
}
