package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CLI surface end-to-end against a scratch store: the same command
  * sequence a reference user runs (create/load/info/query/schema/job/
  * dump/drop), asserted on captured stdout. */
class CliSpec extends AnyFunSuite {
  // force the shared test session FIRST so Cli's lazy getOrCreate joins it
  lazy val spark = SparkTestSession.spark

  private def run(args: String*): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.main(args.toArray)
    }
    out.toString("UTF-8")
  }

  test("create/load/info/query/schema/job/dump/drop command flow") {
    spark // init session
    Cli.homeOverride = Some(java.nio.file.Files.createTempDirectory("graft-cli").toString)
    try {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent

    assert(run("create", "empty").contains("created empty"))
    assert(run("list").linesIterator.toSeq.contains("empty"))

    assert(run("load", "sw", "--vertices", s"$dir/swapi.vertices",
      "--edges", s"$dir/swapi.edges").contains("loaded sw"))
    val info = run("info", "sw")
    assert(info.contains("\"graph\":\"sw\"") && info.contains("\"vertexLabels\""))

    val q = run("query", "sw", "V().hasLabel('Film').count()")
    assert(q.trim == """{"count":1}""", q)

    // a query that IS JS but uses an out-of-subset construct surfaces the
    // JS boundary error naming the construct — it must NOT be masked by
    // the fluent parser's fallback confusion
    val js = intercept[IllegalArgumentException](
      run("query", "sw", "while (true) { V() }"))
    assert(js.getMessage.contains("unsupported JS construct 'while'"), js.getMessage)

    val schema = run("schema", "sw", "--sample-n", "10")
    assert(schema.contains("Film") && schema.contains("Character"))

    // async surface, synchronously through the library: submit → list →
    // view (full elements) → resume (extension) → drop
    val id = run("job", "submit", "sw", "V().hasLabel('Planet')").trim
    assert(id.startsWith("job-"))
    assert(run("job", "list", "sw").linesIterator.toSeq.contains(id))
    val view = run("job", "view", "sw", id)
    assert(view.linesIterator.size == 3 && view.contains("Tatooine"))
    val resumed = run("job", "resume", "sw", id, ".in('homeworld').count()")
    assert(resumed.contains("\"count\":"))
    assert(run("job", "drop", "sw", id).contains(s"dropped $id"))

    val dump = run("dump", "sw", "--vertices")
    assert(dump.linesIterator.size > 30 && dump.contains("\"gid\""))
    val nV = dump.linesIterator.size

    // incremental merge: upsert one new Planet + overwrite one, touching
    // only that label's partition; the graph keeps every other row
    val extra = java.nio.file.Files.createTempFile("cli-merge", ".jsonl")
    java.nio.file.Files.writeString(extra,
      """{"gid":"Planet:99","label":"Planet","data":{"name":"Arrakis"}}""" + "\n" +
      """{"gid":"Planet:1","label":"Planet","data":{"name":"Tatooine","terrain":"desert"}}""" + "\n")
    val none = java.nio.file.Files.createTempFile("cli-merge-e", ".jsonl")
    assert(run("load", "sw", "--vertices", extra.toString,
      "--edges", none.toString, "--merge").contains("merged into sw"))
    assert(run("dump", "sw", "--vertices").linesIterator.size == nV + 1)
    val merged = run("query", "sw", "V().hasLabel('Planet').has(gripql.eq('name', 'Arrakis'))")
    assert(merged.contains("Planet:99"), merged)

    // field index surface: add runs the physical re-layout; the indexed
    // query answers identically; list/drop round-trip the metadata
    val pre = run("query", "sw", "V().hasLabel('Planet').has(gripql.eq('name', 'Tatooine'))")
    assert(run("index", "add", "sw", "Planet", "name").contains("indexed (Planet, name)"))
    assert(run("index", "list", "sw").trim == "V\tPlanet\tname")
    val post = run("query", "sw", "V().hasLabel('Planet').has(gripql.eq('name', 'Tatooine'))")
    assert(post == pre && post.contains("Tatooine"))
    // edge-side index (value-add): same round-trip through --edges
    assert(run("index", "add", "--edges", "sw", "residents", "x")
      .contains("indexed edges (residents, x)"))
    assert(run("index", "list", "sw").trim.linesIterator.toSeq.sorted ==
      Seq("E\tresidents\tx", "V\tPlanet\tname"))
    assert(run("index", "drop", "--edges", "sw", "residents", "x").contains("dropped edge index"))
    assert(run("index", "drop", "sw", "Planet", "name").contains("dropped index"))
    assert(run("index", "list", "sw").trim.isEmpty)

    assert(run("drop", "sw").contains("dropped sw"))
    assert(!run("list").linesIterator.toSeq.contains("sw"))
    } finally Cli.homeOverride = None // don't leak the scratch store to later suites
  }

  test("mapping over a live grpc:// GRIPSource plugin") {
    import org.apache.spark.sql.SparkSession
    implicit val s: SparkSession = spark
    import s.implicits._
    Cli.homeOverride = Some(java.nio.file.Files.createTempDirectory("graft-cli-grpc").toString)
    val source = graft.model.Gripper.FrameSource(Map(
      "Person" -> Seq(("p1", "ada"), ("p2", "lin")).toDF("id", "name"),
      "knows" -> Seq(("k1", "p1", "p2")).toDF("id", "src", "dst")))
    val srv = new graft.server.GripperTableServer(source, port = 0)
    srv.start()
    try {
      val conf = java.nio.file.Files.createTempFile("wire-map", ".yaml")
      java.nio.file.Files.writeString(conf,
        """vertices:
          |  - gid: "P:"
          |    label: Person
          |    data: {source: s, collection: Person}
          |edges:
          |  - gid: knows
          |    from: "P:"
          |    to: "P:"
          |    label: knows
          |    data:
          |      source: s
          |      collection: knows
          |      fromField: src
          |      toField: dst
          |""".stripMargin)
      assert(run("mapping", "wired", conf.toString,
        s"grpc://127.0.0.1:${srv.boundPort}").contains("created wired"))
      val q = run("query", "wired", "V('P:p1').out('knows').count()")
      assert(q.trim == """{"count":1}""", q)
    } finally {
      srv.stop()
      Cli.homeOverride = None
    }
  }
}
