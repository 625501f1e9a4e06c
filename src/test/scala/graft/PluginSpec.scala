package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.{GraftServer, GripperTableServer}
import graft.model.Gripper

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The plugin-system surface end-to-end over real HTTP (reference:
  * gripql.proto Configure service :526-541 + Query.ListTables :369,
  * server/plugins.go): start plugins, list drivers/plugins/tables, and
  * open mappings whose sources resolve against started plugins — incl. a
  * live gripper.proto plugin behind the `grpc` driver. */
class PluginSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def withServer(auth: Option[GraftServer.Auth] = None,
                         pluginDir: Option[String] = None)
                        (f: (HttpClient, Int) => Unit): Unit = {
    val srv = new GraftServer(spark, 0, auth, pluginDir)
    srv.start()
    try f(HttpClient.newHttpClient(), srv.boundPort)
    finally srv.stop()
  }

  private def req(c: HttpClient, port: Int, method: String, path: String,
                  body: String = "", hdr: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    hdr.foreach(h => b.header("Authorization", h))
    val r = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
    }
    c.send(r.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def peopleDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-plugin-src").toString
    Seq(("1", "ada", "2"), ("2", "lin", "")).toDF("id", "name", "boss")
      .write.mode("overwrite").parquet(s"$dir/people.parquet")
    dir
  }

  // the Graph-message mapping body the stock client's postMapping sends
  // (connection.py:88-97): elements ARE the config (gripper/config.go:68)
  private def mappingGraphBody(source: String): String =
    s"""{"vertices": [{"gid": "P:", "label": "Person",
       |   "data": {"source": "$source", "collection": "people"}}],
       | "edges": [{"gid": "boss", "label": "boss", "from": "P:", "to": "P:",
       |   "data": {"source": "$source", "collection": "people",
       |            "fromField": "id", "toField": "boss"}}]}""".stripMargin

  test("plugin lifecycle: start, list, tables, errors") {
    val dir = peopleDir()
    withServer() { (c, p) =>
      // drivers are the built-in source constructors
      val drv = req(c, p, "GET", "/v1/driver")
      assert(drv.statusCode() == 200)
      assert(mapper.readTree(drv.body()).get("drivers").toString.contains("\"dir\""))

      // start a dir plugin; duplicate name mirrors the reference's error
      assert(req(c, p, "POST", "/v1/plugin/hr",
        s"""{"driver":"dir","config":{"path":"$dir"}}""").statusCode() == 200)
      val dup = req(c, p, "POST", "/v1/plugin/hr",
        s"""{"driver":"dir","config":{"path":"$dir"}}""")
      assert(dup.statusCode() == 400 && dup.body().contains("already running"))
      // bad driver / bad path fail loud at start, not first use
      assert(req(c, p, "POST", "/v1/plugin/x",
        """{"driver":"nope","config":{}}""").statusCode() == 400)
      assert(req(c, p, "POST", "/v1/plugin/y",
        """{"driver":"dir","config":{"path":"/no/such/dir"}}""").statusCode() == 400)

      val lst = req(c, p, "GET", "/v1/plugin")
      assert(lst.statusCode() == 200 &&
        mapper.readTree(lst.body()).get("plugins").toString == """["hr"]""")

      // ListTables streams one TableInfo line per collection, with the
      // same $.col field paths a wire-served source lists
      val tbl = req(c, p, "GET", "/v1/table")
      assert(tbl.statusCode() == 200)
      val lines = tbl.body().linesIterator.toSeq
      assert(lines.size == 1)
      val info = mapper.readTree(lines.head)
      assert(info.get("source").asText() == "hr" && info.get("name").asText() == "people")
      assert(info.get("fields").toString.contains("$.name"))
    }
  }

  test("mapping resolves sources from started plugins; Graph-message body and GetMapping") {
    val dir = peopleDir()
    withServer() { (c, p) =>
      assert(req(c, p, "POST", "/v1/plugin/hr",
        s"""{"driver":"dir","config":{"path":"$dir"}}""").statusCode() == 200)
      // postMapping shape, no inline sources — the plugin registry binds 'hr'
      assert(req(c, p, "POST", "/v1/graph/mapped/mapping",
        mappingGraphBody("hr")).statusCode() == 200)
      // GetMapping returns the stored config as a Graph message
      val got = req(c, p, "GET", "/v1/graph/mapped/mapping")
      assert(got.statusCode() == 200)
      val g = mapper.readTree(got.body())
      assert(g.get("graph").asText() == "mapped")
      assert(g.get("vertices").get(0).get("gid").asText() == "P:")
      assert(g.get("edges").get(0).get("data").get("fromField").asText() == "id")
      // the mapped view answers traversals
      val q = req(c, p, "POST", "/v1/graph/mapped/query",
        """{"query":"V('P:1').out('boss')"}""")
      assert(q.statusCode() == 200 && q.body().contains("\"P:2\""))
      // a mapping naming an unstarted source fails loud
      val bad = req(c, p, "POST", "/v1/graph/m2/mapping", mappingGraphBody("ghost"))
      assert(bad.statusCode() == 400 && bad.body().contains("ghost"))
    }
  }

  test("grpc driver federates a live gripper.proto plugin") {
    val dir = peopleDir()
    val table = new GripperTableServer(Gripper.DirSource(spark, dir), 0)
    table.start()
    try withServer() { (c, p) =>
      // connectivity is proven at start — a dead address is a 400
      assert(req(c, p, "POST", "/v1/plugin/dead",
        """{"driver":"grpc","config":{"address":"127.0.0.1:1"}}""").statusCode() == 400)
      assert(req(c, p, "POST", "/v1/plugin/remote",
        s"""{"driver":"grpc","config":{"address":"127.0.0.1:${table.boundPort}"}}""")
        .statusCode() == 200)
      // tables come from the wire's GetCollectionInfo
      val tbl = req(c, p, "GET", "/v1/table")
      val info = mapper.readTree(tbl.body().linesIterator.next())
      assert(info.get("source").asText() == "remote" &&
        info.get("name").asText() == "people" &&
        info.get("fields").toString.contains("$.name"))
      // and the mapped view traverses identically to a local dir source
      assert(req(c, p, "POST", "/v1/graph/fed/mapping",
        mappingGraphBody("remote")).statusCode() == 200)
      val q = req(c, p, "POST", "/v1/graph/fed/query",
        """{"query":"V('P:1').out('boss')"}""")
      assert(q.statusCode() == 200 && q.body().contains("\"P:2\""))
    } finally table.stop()
  }

  /** A plugin-dir with one executable `gripper-parquet`: a shell wrapper
    * that launches THIS build's CLI (`graft gripper-plugin <conf.json>`)
    * in a fresh JVM — a real child process, the reference's deployment
    * shape (gripper/plugins.go:41-69 LaunchPluginClient). */
  private def writePluginDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-plugin-bin")
    val cp = System.getProperty("java.class.path")
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val script = dir.resolve("gripper-parquet")
    java.nio.file.Files.writeString(script,
      s"""#!/bin/sh
         |export SPARK_GRAFT_CPUS=4
         |exec java -cp '$cp' $opens -Xmx2g \\
         |  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \\
         |  graft.Cli gripper-plugin "$$1"
         |""".stripMargin)
    script.toFile.setExecutable(true)
    dir.toString
  }

  test("exec driver launches a gripper-* executable as a supervised child process") {
    val data = peopleDir()
    val bin = writePluginDir()
    withServer(pluginDir = Some(bin)) { (c, p) =>
      // discovery: the executable shows up as a driver next to built-ins
      val drv = req(c, p, "GET", "/v1/driver")
      assert(drv.statusCode() == 200)
      val names = mapper.readTree(drv.body()).get("drivers").toString
      assert(names.contains("\"parquet\"") && names.contains("\"dir\""))

      // StartPlugin spawns the child, waits for its handshake line, and
      // health-checks ListCollections before registering
      assert(req(c, p, "POST", "/v1/plugin/hr",
        s"""{"driver":"parquet","config":{"path":"$data"}}""").statusCode() == 200)
      val tbl = req(c, p, "GET", "/v1/table")
      val info = mapper.readTree(tbl.body().linesIterator.next())
      assert(info.get("source").asText() == "hr" &&
        info.get("name").asText() == "people")

      // traverse a graph mapped over the child-served source
      assert(req(c, p, "POST", "/v1/graph/fed/mapping",
        mappingGraphBody("hr")).statusCode() == 200)
      val q = req(c, p, "POST", "/v1/graph/fed/query",
        """{"query":"V('P:1').out('boss')"}""")
      assert(q.statusCode() == 200 && q.body().contains("\"P:2\""))

      // a bad config fails at launch, not first use (child exits — no
      // handshake line — and the error says so)
      val bad = req(c, p, "POST", "/v1/plugin/broken",
        """{"driver":"parquet","config":{}}""")
      assert(bad.statusCode() == 400)
    }
  }

  test("pluginDirFromConfig reads Server.PluginDir from grip-style YAML") {
    val conf = java.nio.file.Files.createTempFile("srv", ".yml")
    java.nio.file.Files.writeString(conf,
      """Server:
        |  HTTPPort: 8201
        |  PluginDir: /opt/grip-plugins
        |""".stripMargin)
    assert(GraftServer.pluginDirFromConfig(conf.toString) == Some("/opt/grip-plugins"))
    // absent key, absent Server block, non-map root: all None, no throw
    java.nio.file.Files.writeString(conf, "Server:\n  HTTPPort: 8201\n")
    assert(GraftServer.pluginDirFromConfig(conf.toString).isEmpty)
    java.nio.file.Files.writeString(conf, "Other: 1\n")
    assert(GraftServer.pluginDirFromConfig(conf.toString).isEmpty)
    java.nio.file.Files.writeString(conf, "- just\n- a list\n")
    assert(GraftServer.pluginDirFromConfig(conf.toString).isEmpty)
  }

  test("gripper-plugin entrypoint refuses to run outside a plugin harness") {
    val bin = writePluginDir()
    val conf = java.nio.file.Files.createTempFile("conf", ".json")
    java.nio.file.Files.writeString(conf, "{}")
    // run the executable directly WITHOUT the handshake cookie env
    val proc = new ProcessBuilder(s"$bin/gripper-parquet", conf.toString)
      .redirectErrorStream(true).start()
    assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(proc.exitValue() == 1)
    val out = new String(proc.getInputStream.readAllBytes())
    assert(out.contains("plugin harness"))
  }

  test("plugin routes are admin-gated; ListTables needs *-scoped read") {
    import graft.server.GraftServer.{Auth, Credential, Policy}
    val dir = peopleDir()
    val auth = Auth(
      credentials = Seq(Credential("root", "secret"), Credential("bob", "pw")),
      policies = Seq(
        Policy("root", "*", Set("*")),
        Policy("bob", "g1", Set("query", "read")))) // no admin, no *-scope
    def basic(u: String, pw: String) =
      "Basic " + java.util.Base64.getEncoder.encodeToString(s"$u:$pw".getBytes)
    withServer(Some(auth)) { (c, p) =>
      // unauthenticated → 401; non-admin → 403 (Configure ops are `admin`
      // on "*", accounts/interface.go:48-50)
      assert(req(c, p, "GET", "/v1/driver").statusCode() == 401)
      assert(req(c, p, "GET", "/v1/driver",
        hdr = Some(basic("bob", "pw"))).statusCode() == 403)
      assert(req(c, p, "POST", "/v1/plugin/hr",
        s"""{"driver":"dir","config":{"path":"$dir"}}""",
        Some(basic("bob", "pw"))).statusCode() == 403)
      // ListTables is read on "*" (util.go:169) — bob's g1-only read fails
      assert(req(c, p, "GET", "/v1/table",
        hdr = Some(basic("bob", "pw"))).statusCode() == 403)
      // the *-scoped root passes everywhere
      assert(req(c, p, "POST", "/v1/plugin/hr",
        s"""{"driver":"dir","config":{"path":"$dir"}}""",
        Some(basic("root", "secret"))).statusCode() == 200)
      assert(req(c, p, "GET", "/v1/table",
        hdr = Some(basic("root", "secret"))).statusCode() == 200)
    }
  }
}
