package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.GraftServer

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** End-to-end over real HTTP: create a graph, mutate it through the Edit
  * routes, query it through text AND protojson bodies — the reference's
  * client→server loop (server/api.go) against the JDK-http surface. */
class ServerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withServer(f: (HttpClient, Int) => Unit): Unit = {
    val srv = new GraftServer(spark, 0) // ephemeral port
    srv.start()
    try f(HttpClient.newHttpClient(), srv.boundPort)
    finally srv.stop()
  }

  private def req(c: HttpClient, port: Int, method: String, path: String,
                  body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    val r = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
    }
    c.send(r.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("graph lifecycle, edits, and queries over HTTP") {
    withServer { (c, p) =>
      assert(req(c, p, "POST", "/v1/graph/test").statusCode() == 200)
      assert(req(c, p, "POST", "/v1/graph/test").statusCode() == 409)
      assert(req(c, p, "GET", "/v1/graph").body().contains("\"test\""))

      // edits
      assert(req(c, p, "POST", "/v1/graph/test/vertex",
        """{"gid":"v1","label":"Person","data":{"name":"marko","age":29}}""").statusCode() == 200)
      assert(req(c, p, "POST", "/v1/graph/test/vertex",
        """{"gid":"v2","label":"Person","data":{"name":"vadas"}}""").statusCode() == 200)
      assert(req(c, p, "POST", "/v1/graph/test/edge",
        """{"gid":"e1","from":"v1","to":"v2","label":"knows"}""").statusCode() == 200)
      assert(req(c, p, "POST", "/v1/graph/test/vertex", """{"label":"x"}""").statusCode() == 400)

      // point reads
      val v1 = req(c, p, "GET", "/v1/graph/test/vertex/v1")
      assert(v1.statusCode() == 200 && v1.body().contains("\"marko\""))
      assert(req(c, p, "GET", "/v1/graph/test/vertex/nope").statusCode() == 404)

      // text query → ND-JSON rows
      val q1 = req(c, p, "POST", "/v1/graph/test/query", """{"query":"V().hasLabel('Person')"}""")
      assert(q1.statusCode() == 200)
      assert(q1.body().linesIterator.size == 2)

      // traversal + count through the full compiler
      val q2 = req(c, p, "POST", "/v1/graph/test/query", """{"query":"V('v1').out('knows').count()"}""")
      assert(q2.body().trim == """{"count":1}""")

      // protojson statement-array body (the RPC wire form)
      val q3 = req(c, p, "POST", "/v1/graph/test/query",
        """{"query":[{"v":[]},{"hasLabel":["Person"]},{"count":""}]}""")
      assert(q3.body().trim == """{"count":2}""")

      // GraphQL route: nested read rolled up in one plan
      val gq = req(c, p, "POST", "/v1/graph/test/graphql",
        """{"query": "{ Person { name } }"}""")
      assert(gq.statusCode() == 200)
      assert(gq.body().linesIterator.toSeq.map(_.trim).sorted ==
        Seq("""{"name":"marko"}""", """{"name":"vadas"}"""))

      // GraphQL introspection: __schema types from the sampled schema,
      // SDL on GET (graphqlv2's published-type-system behavior)
      val intro = req(c, p, "POST", "/v1/graph/test/graphql",
        """{"query": "{ __schema { queryType { name } types { name } } }"}""")
      assert(intro.statusCode() == 200)
      assert(intro.body().contains("\"Query\"") && intro.body().contains("\"Person\""))
      val tq = req(c, p, "POST", "/v1/graph/test/graphql",
        """{"query": "{ __type(name: \"Person\") { name fields { name } } }"}""")
      assert(tq.statusCode() == 200 && tq.body().contains("\"knows\""))
      val sdl = req(c, p, "GET", "/v1/graph/test/graphql")
      assert(sdl.statusCode() == 200 && sdl.body().contains("type Person {") &&
        sdl.body().contains("knows: [Person]"))

      // Cypher route: pattern + WHERE + projection over the same graph
      val cy = req(c, p, "POST", "/v1/graph/test/cypher",
        """{"query": "MATCH (a:Person)-[:knows]->(b) WHERE a.age > 21 RETURN b.name AS friend"}""")
      assert(cy.statusCode() == 200)
      // render rows stream as QueryResult protojson: the rendered value is
      // an embedded JSON object, not quoted text (gripql.proto:214)
      assert(cy.body().trim == """{"render":{"friend":"vadas"}}""")

      // labels and sampled schema (ListLabels / SampleSchema shapes)
      val lbl = req(c, p, "GET", "/v1/graph/test/label")
      assert(lbl.statusCode() == 200 &&
        lbl.body().contains("\"Person\"") && lbl.body().contains("\"knows\""))
      val sch = req(c, p, "GET", "/v1/graph/test/schema")
      assert(sch.statusCode() == 200 && sch.body().contains("Person"))

      // malformed query → 400 with a message, not a 500
      val bad = req(c, p, "POST", "/v1/graph/test/query", """{"query":"V().frobnicate()"}""")
      assert(bad.statusCode() == 400 && bad.body().contains("unknown method"))

      assert(req(c, p, "DELETE", "/v1/graph/test").statusCode() == 200)
      assert(req(c, p, "GET", "/v1/graph/test/vertex/v1").statusCode() == 404)
    }
  }

  test("QueryResult wire format matches what gripql clients unwrap") {
    // the shapes the python client's __stream switches on
    // (gripql/python/gripql/query.py:390-420)
    withServer { (c, p) =>
      req(c, p, "POST", "/v1/graph/wf")
      req(c, p, "POST", "/v1/graph/wf/vertex",
        """{"gid":"v1","label":"Person","data":{"name":"marko","age":29}}""")
      req(c, p, "POST", "/v1/graph/wf/vertex",
        """{"gid":"v2","label":"Person","data":{"name":"vadas","age":27}}""")
      req(c, p, "POST", "/v1/graph/wf/edge",
        """{"gid":"e1","from":"v1","to":"v2","label":"knows","data":{"weight":0.5}}""")

      def q(body: String) =
        req(c, p, "POST", "/v1/graph/wf/query", body).body().trim.linesIterator.toSeq

      // vertex lines: data embedded as an OBJECT
      val vs = q("""{"query":"V('v1')"}""")
      assert(vs == Seq("""{"vertex":{"gid":"v1","label":"Person","data":{"name":"marko","age":29}}}"""))
      // edge lines keep from/to
      val es = q("""{"query":"V('v1').outE('knows')"}""")
      assert(es.head.startsWith("""{"edge":{"gid":"e1","label":"knows","from":"v1","to":"v2""""))
      // count / render(raw value) / path / selections / aggregations
      assert(q("""{"query":"V().count()"}""") == Seq("""{"count":2}"""))
      val sel = q("""{"query":"V('v1').as('a').out('knows').as('b').select('a','b')"}""").head
      assert(sel.startsWith("""{"selections":{"selections":{"a":{"vertex":{"gid":"v1""""))
      assert(sel.contains(""""b":{"vertex":{"gid":"v2""""))
      val path = q("""{"query":"V('v1').out('knows').path()"}""").head
      assert(path == """{"path":[{"vertex":"v1"},{"vertex":"v2"}]}""")
      val aggs = q("""{"query":"V().aggregate(term('ages','age'))"}""")
      assert(aggs.forall(_.startsWith("""{"aggregations":{"name":"ages","key":""")))
      // numeric term keys stay numbers on the wire (protobuf Value key)
      assert(aggs.exists(_.contains(""""key":29,"value":1""")))
    }
  }

  test("client surface routes: schema post/get/sample, index, deletes, bulk") {
    withServer { (c, p) =>
      req(c, p, "POST", "/v1/graph/cs")
      // bulk add in the python BulkAdd wire shape (graph.py:246-285)
      val bulk = req(c, p, "POST", "/v1/graph",
        Seq(
          """{"graph":"cs","vertex":{"gid":"v1","label":"A","data":{"x":1}}}""",
          """{"graph":"cs","vertex":{"gid":"v2","label":"B"}}""",
          """{"graph":"cs","edge":{"from":"v1","to":"v2","label":"ab"}}""",
          """{"graph":"nope","vertex":{"gid":"v3","label":"A"}}""",
          """{"graph":"cs","vertex":{"label":"missing-gid"}}"""
        ).mkString("\n"))
      assert(bulk.statusCode() == 200)
      assert(bulk.body() == """{"insertCount":3,"errorCount":2}""")
      assert(req(c, p, "POST", "/v1/graph/cs/query", """{"query":"V().count()"}""")
        .body().trim == """{"count":2}""")

      // sampled schema: one Graph-message object
      val sample = req(c, p, "GET", "/v1/graph/cs/schema-sample")
      assert(sample.statusCode() == 200 && sample.body().startsWith("""{"graph":"cs","vertices":["""))
      // posted schema wins over sampling on GET /schema
      assert(req(c, p, "POST", "/v1/graph/cs/schema",
        """{"vertices":[{"gid":"A","label":"A","data":{"x":"NUMERIC"}}],"edges":[]}""").statusCode() == 200)
      val got = req(c, p, "GET", "/v1/graph/cs/schema")
      assert(got.body().contains(""""graph":"cs"""") && got.body().contains(""""x":"NUMERIC""""))

      // advisory index bookkeeping
      assert(req(c, p, "POST", "/v1/graph/cs/index/A", """{"field":"x"}""").statusCode() == 200)
      val idx = req(c, p, "GET", "/v1/graph/cs/index")
      assert(idx.body() == """{"indices":[{"graph":"cs","label":"A","field":"x"}]}""")

      // element deletes
      assert(req(c, p, "DELETE", "/v1/graph/cs/edge/nope").statusCode() == 404)
      val eid = req(c, p, "POST", "/v1/graph/cs/query", """{"query":"E()"}""")
        .body().trim
      // pull the edge gid out of the wire line
      val gid = eid.split("\"gid\":\"")(1).split("\"")(0)
      assert(req(c, p, "DELETE", s"/v1/graph/cs/edge/$gid").statusCode() == 200)
      assert(req(c, p, "DELETE", "/v1/graph/cs/vertex/v2").statusCode() == 200)
      assert(req(c, p, "POST", "/v1/graph/cs/query", """{"query":"V().count()"}""")
        .body().trim == """{"count":1}""")
    }
  }

  test("job routes: async submit, poll, view, resume, delete") {
    withServer { (c, p) =>
      assert(req(c, p, "POST", "/v1/graph/jg").statusCode() == 200)
      for (i <- 1 to 3)
        req(c, p, "POST", "/v1/graph/jg/vertex",
          s"""{"gid":"v$i","label":"Person","data":{"age":${20 + i}}}""")
      req(c, p, "POST", "/v1/graph/jg/edge", """{"from":"v1","to":"v2","label":"knows"}""")
      req(c, p, "POST", "/v1/graph/jg/edge", """{"from":"v1","to":"v3","label":"knows"}""")

      val sub = req(c, p, "POST", "/v1/graph/jg/job", """{"query":"V().hasLabel('Person')"}""")
      assert(sub.statusCode() == 200)
      val id = sub.body().split("\"")(3)
      assert(id.startsWith("job-"))
      // poll to COMPLETE (async spool)
      var state = ""
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (state != "COMPLETE" && System.nanoTime() < deadline) {
        val st = req(c, p, "GET", s"/v1/graph/jg/job/$id")
        assert(st.statusCode() == 200)
        state = if (st.body().contains("COMPLETE")) "COMPLETE"
                else { assert(!st.body().contains("ERROR"), st.body()); Thread.sleep(100); "" }
      }
      assert(state == "COMPLETE")
      // ListJobs streams ND-JSON QueryJob lines — one standalone JSON
      // object per line, each with an 'id' the stock client indexes
      // directly (gripql.proto:384-389, client graph.py:171-178)
      val listBody = req(c, p, "GET", "/v1/graph/jg/job").body()
      assert(listBody.contains(id))
      listBody.linesIterator.filter(_.nonEmpty).foreach { line =>
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
        assert(n.has("id") && n.has("state"), line)
      }
      // view: the spooled travelers as FULL elements (ViewJob streams whole
      // elements incl. data — reference server/job_manager.go:90)
      val view = req(c, p, "GET", s"/v1/graph/jg/job/$id/view").body()
      assert(view.linesIterator.size == 3)
      assert(view.contains("age"), s"view must carry element data: $view")
      // ViewJob's proto REST binding: POST /v1/graph/{g}/job/{id}
      // (gripql.proto:409-414) serves the same stream
      assert(req(c, p, "POST", s"/v1/graph/jg/job/$id", "{}").body() == view)
      // resume: extend the spooled stream with more statements
      val res = req(c, p, "POST", s"/v1/graph/jg/job/$id/resume",
        """{"query":".out('knows').count()"}""")
      assert(res.statusCode() == 200 && res.body().trim == """{"count":2}""")
      // ResumeJob's proto REST binding: POST job-resume {query, srcId}
      // (gripql.proto:417-421; client query.py:378-380)
      val res2 = req(c, p, "POST", "/v1/graph/jg/job-resume",
        s"""{"query":".out('knows').count()","srcId":"$id"}""")
      assert(res2.statusCode() == 200 && res2.body().trim == """{"count":2}""", res2.body())
      // error bodies nest message under 'error' the way the reference's
      // REST gateway does — result['error']['message'] (query.py:419)
      val errBody = req(c, p, "GET", "/v1/graph/nope/job").body()
      val en = new com.fasterxml.jackson.databind.ObjectMapper().readTree(errBody)
      assert(en.get("error") != null && en.get("error").has("message"), errBody)
      // job-search finds the spool by query checksum; a different query
      // finds nothing (reference SearchJobs, gripql.proto:390-395)
      val hit = req(c, p, "POST", "/v1/graph/jg/job-search",
        """{"query":"V().hasLabel('Person')"}""")
      assert(hit.statusCode() == 200 && hit.body().contains(id), hit.body())
      val miss = req(c, p, "POST", "/v1/graph/jg/job-search",
        """{"query":"E()"}""")
      assert(miss.statusCode() == 200 && !miss.body().contains("job-"), miss.body())
      // resuming an unknown job is a 400, delete works once
      assert(req(c, p, "POST", "/v1/graph/jg/job/job-nope/resume",
        """{"query":".count()"}""").statusCode() == 400)
      assert(req(c, p, "DELETE", s"/v1/graph/jg/job/$id").statusCode() == 200)
      assert(req(c, p, "DELETE", s"/v1/graph/jg/job/$id").statusCode() == 404)
    }
  }

  test("basic auth + per-graph policies gate every route (auth_basic shape)") {
    import graft.server.GraftServer.{Auth, Credential, Policy}
    val auth = Auth(
      credentials = Seq(Credential("admin", "secret"), Credential("bob", "pw")),
      policies = Seq(
        Policy("admin", "*", Set("*")),
        Policy("bob", "g1", Set("query", "read")))) // bob: no write, no g2
    val srv = new graft.server.GraftServer(spark, 0, Some(auth))
    srv.start()
    try {
      val c = HttpClient.newHttpClient()
      val p = srv.boundPort
      def basic(u: String, pw: String) =
        "Basic " + java.util.Base64.getEncoder.encodeToString(s"$u:$pw".getBytes)
      def reqAuth(method: String, path: String, hdr: Option[String], body: String = "") = {
        val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p$path"))
        hdr.foreach(h => b.header("Authorization", h))
        val r = method match {
          case "GET" => b.GET()
          case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
        }
        c.send(r.build(), HttpResponse.BodyHandlers.ofString())
      }
      // no/bad credentials → 401 with the WWW-Authenticate challenge
      val anon = reqAuth("GET", "/v1/graph", None)
      assert(anon.statusCode() == 401 &&
        anon.headers().firstValue("WWW-Authenticate").orElse("") == "Basic")
      assert(reqAuth("GET", "/v1/graph", Some(basic("bob", "wrong"))).statusCode() == 401)
      // admin can create and write
      assert(reqAuth("POST", "/v1/graph/g1", Some(basic("admin", "secret"))).statusCode() == 200)
      assert(reqAuth("POST", "/v1/graph/g1/vertex", Some(basic("admin", "secret")),
        """{"gid":"v1","label":"X"}""").statusCode() == 200)
      // bob can query g1 but not write it, and cannot touch g2
      assert(reqAuth("POST", "/v1/graph/g1/query", Some(basic("bob", "pw")),
        """{"query":"V().count()"}""").statusCode() == 200)
      assert(reqAuth("POST", "/v1/graph/g1/vertex", Some(basic("bob", "pw")),
        """{"gid":"v2","label":"X"}""").statusCode() == 403)
      assert(reqAuth("POST", "/v1/graph/g2", Some(basic("bob", "pw"))).statusCode() == 403)
      assert(reqAuth("GET", "/v1/graph/g2/vertex/v1", Some(basic("bob", "pw"))).statusCode() == 403)
    } finally srv.stop()
  }

  test("mapping routes open a GRIPPER view over parquet sources") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-map-src").toString
    Seq(("1", "ada", "2"), ("2", "lin", "")).toDF("id", "name", "boss")
      .write.mode("overwrite").parquet(s"$dir/people.parquet")
    val mapping =
      """{"vertices": {"P:": {"label": "Person",
        |   "data": {"source": "hr", "collection": "people"}}},
        | "edges": {"boss": {"from": "P:", "to": "P:", "label": "boss",
        |   "data": {"source": "hr", "collection": "people",
        |            "fromField": "id", "toField": "boss"}}}}""".stripMargin
    withServer { (c, p) =>
      val body = new com.fasterxml.jackson.databind.ObjectMapper().createObjectNode()
      body.put("mapping", mapping)
      body.putObject("sources").put("hr", dir)
      assert(req(c, p, "POST", "/v1/graph/hr/mapping", body.toString).statusCode() == 200)
      // stored mapping is readable back (GetMapping)
      val got = req(c, p, "GET", "/v1/graph/hr/mapping")
      assert(got.statusCode() == 200 && got.body().contains("fromField"))
      // the mapped view answers traversals; the empty boss field made no edge
      val q = req(c, p, "POST", "/v1/graph/hr/query", """{"query":"V('P:1').out('boss')"}""")
      assert(q.statusCode() == 200 && q.body().contains("\"P:2\""))
      val q2 = req(c, p, "POST", "/v1/graph/hr/query", """{"query":"V('P:2').out('boss').count()"}""")
      assert(q2.body().trim == """{"count":0}""")
      // a second mapping under the same name conflicts; unknown source errors as 400
      assert(req(c, p, "POST", "/v1/graph/hr/mapping", body.toString).statusCode() == 409)
      assert(req(c, p, "GET", "/v1/graph/other/mapping").statusCode() == 404)
    }
  }
}
