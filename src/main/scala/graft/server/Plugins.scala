package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession
import graft.model.Gripper

import scala.jdk.CollectionConverters._

/** Plugin registry — the engine side of the reference's `gripql.Configure`
  * service (reference: gripql/gripql.proto:526-541 StartPlugin/ListPlugins/
  * ListDrivers, server/plugins.go:26-69, and Query.ListTables
  * server/api.go:57-67). The reference discovers `gripper-*` executables in
  * a plugin directory, launches the chosen one as a supervised subprocess
  * speaking gripper.proto, and registers it as a named source that
  * AddMapping configs reference by name. Here a **driver is a built-in
  * [[Gripper.SourceProvider]] constructor** instead of a subprocess binary —
  * the collections land behind the same facade either way, and a real
  * deployment can add drivers that wrap any DataSource V2 connector:
  *
  *   - `dir`  — config `{"path": <dir of <name>.parquet>}` plus optional
  *     `id.<collection> -> <column>` entries naming the Row.Id column; the
  *     local twin of the reference's example TSV table server.
  *   - `grpc` — config `{"address": "host:port"}`: a live gripper.proto
  *     GRIPSource plugin served by anything speaking the wire (including
  *     [[GripperTableServer]]) — the reference's deployment shape, minus
  *     subprocess supervision.
  *
  * When a `pluginDir` is configured (the reference's `Server.PluginDir`),
  * any OTHER driver name resolves to an executable `gripper-<driver>` in
  * that directory, launched as a supervised subprocess — the reference's
  * actual deployment shape (gripper/plugins.go:41-69 LaunchPluginClient).
  * The child is handed one argv: the path of a `conf.json` holding the
  * request's config map; it must print a go-plugin-style handshake line
  * (`CORE|APP|tcp|host:port|grpc`) on stdout, then serve gripper.proto on
  * that address. The parent sets the reference's handshake magic cookie
  * (`GRIP_PLUGIN_EXTERNAL_RESOURCE=gripper`, gripper/plugins.go:17-21) so
  * a child can refuse to run outside a plugin harness.
  *
  * Started plugins are validated eagerly (the reference's LaunchPluginClient
  * fails at launch, not first use): `dir` requires the path to exist, `grpc`
  * and `exec` prove connectivity with a ListCollections round-trip.
  */
final class Plugins(spark: SparkSession, pluginDir: Option[String] = None) {

  /** One started plugin: the provider plus whatever needs closing. */
  final case class Entry(name: String, driver: String,
                         provider: Gripper.SourceProvider,
                         closer: () => Unit)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Driver names: the built-in constructors plus `plugin.Discover
    * ("gripper-*", dir)` over the configured plugin directory
    * (server/plugins.go:57-68). */
  def drivers: Seq[String] = Plugins.drivers ++ discovered

  /** Executable `gripper-*` files in pluginDir, prefix stripped. */
  private def discovered: Seq[String] = pluginDir.toSeq.flatMap { d =>
    val dir = new java.io.File(d)
    if (!dir.isDirectory) Nil
    else dir.listFiles((_, n) => n.startsWith("gripper-"))
      .filter(f => f.isFile && f.canExecute)
      .map(_.getName.stripPrefix("gripper-")).toSeq.sorted
  }

  def list: Seq[String] = registry.keySet().asScala.toSeq.sorted

  def get(name: String): Option[Gripper.SourceProvider] =
    Option(registry.get(name)).map(_.provider)

  /** Snapshot of all started plugins as a mapping-ready source map —
    * what the reference's `server.sources` hands to NewGripperGraph. */
  def sources: Map[String, Gripper.SourceProvider] =
    registry.asScala.map { case (k, e) => k -> e.provider }.toMap

  /** Start (register) a plugin. Mirrors StartPlugin (server/plugins.go:26-47):
    * duplicate names are an error, the driver must exist, and the source
    * must come up before it is registered. */
  def start(name: String, driver: String, config: Map[String, String]): Unit = {
    require(name.nonEmpty, "plugin name must not be empty")
    if (registry.containsKey(name))
      throw new IllegalArgumentException(s"Plugin named $name already running")
    val entry = driver match {
      case "dir" =>
        val path = config.get("path").orElse(config.get("dir")).getOrElse(
          throw new IllegalArgumentException("driver 'dir' needs config {\"path\": <parquet dir>}"))
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p))
          throw new IllegalArgumentException(s"driver 'dir': path '$path' does not exist")
        val idCols = config.collect { case (k, v) if k.startsWith("id.") =>
          k.stripPrefix("id.") -> v }
        Entry(name, driver, Gripper.DirSource(spark, path, idCols), () => ())
      case "grpc" =>
        val addr = config.getOrElse("address",
          throw new IllegalArgumentException("driver 'grpc' needs config {\"address\": \"host:port\"}"))
        val hp = addr.stripPrefix("grpc://").split(":", 2)
        if (hp.length != 2 || hp(1).isEmpty || !hp(1).forall(_.isDigit))
          throw new IllegalArgumentException(s"driver 'grpc': bad address '$addr' (want host:port)")
        // the client connects in its constructor; prove a full
        // ListCollections round-trip before registering — either failure
        // is a start-time config error, like LaunchPluginClient's
        var client: GripperClient = null
        try { client = new GripperClient(hp(0), hp(1).toInt); client.collections() }
        catch { case scala.util.control.NonFatal(e) =>
          if (client != null) { try client.close() catch { case _: Exception => () } }
          throw new IllegalArgumentException(
            s"driver 'grpc': cannot reach GRIPSource at $addr: ${e.getMessage}")
        }
        Entry(name, driver, GripperWire.grpcSource(spark, client), () => client.close())
      case other if discovered.contains(other) =>
        launchExec(name, other, config)
      case other =>
        throw new IllegalArgumentException(
          s"unknown driver '$other' (available: ${drivers.mkString(", ")})")
    }
    if (registry.putIfAbsent(name, entry) != null) {
      entry.closer()
      throw new IllegalArgumentException(s"Plugin named $name already running")
    }
  }

  /** Launch `pluginDir/gripper-<driver> <conf.json>` as a supervised
    * subprocess and connect to the gripper.proto address it announces —
    * the reference's LaunchPluginClient (gripper/plugins.go:41-69): the
    * config map is serialized to a conf.json in a scratch workdir, the
    * handshake cookie env is set, and the child's stdout is scanned for
    * the go-plugin handshake line `CORE|APP|NETWORK|ADDR|PROTOCOL`. Any
    * failure (no handshake within the timeout, child exit, unreachable
    * gRPC, failed ListCollections) kills the child and raises — launch-
    * time validation, not first-use. */
  private def launchExec(name: String, driver: String,
                         config: Map[String, String]): Entry = {
    val exe = new java.io.File(pluginDir.get, s"gripper-$driver").getAbsoluteFile
    val workdir = java.nio.file.Files.createTempDirectory(s"gripper-$name-")
    val confPath = workdir.resolve("conf.json")
    val confJson = config.map { case (k, v) =>
      s"${Plugins.jsonQuote(k)}:${Plugins.jsonQuote(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(confPath, confJson)
    val pb = new ProcessBuilder(exe.getPath, confPath.toString)
      .redirectErrorStream(false)
    pb.environment().put("GRIP_PLUGIN_EXTERNAL_RESOURCE", "gripper")
    pb.redirectError(ProcessBuilder.Redirect.INHERIT) // child logs stay visible
    val proc = pb.start()
    def kill(): Unit = {
      proc.destroy()
      if (!proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
    }
    // scan stdout for the handshake line; a Spark-backed child can take
    // tens of seconds to come up, so the deadline is generous but finite
    val deadline = System.nanoTime() + Plugins.launchTimeoutSec * 1000L * 1000 * 1000
    val stdout = proc.getInputStream
    var addr: Option[(String, Int)] = None
    try {
      // poll-read with MANUAL line assembly so a silent or dribbling
      // child still hits the deadline: readLine() after ready() would
      // block forever on a partial line without a newline (ready() is
      // true from the first buffered char), and GraftServer's serial
      // handler executor would wedge the whole REST surface behind it
      var eof = false
      // accumulate BYTES and split on '\n' before decoding: a multi-byte
      // UTF-8 character split across read chunks must not be decoded
      // mid-sequence (per-chunk `new String` turns it into replacement
      // chars — harmless for the ASCII handshake, corrupting for logged
      // child chatter)
      var acc = Array.emptyByteArray
      val chunk = new Array[Byte](8192)
      def scanLine(line: String): Unit = line.split('|') match {
        case Array(_, _, "tcp", hp, "grpc", _*) =>
          val i = hp.lastIndexOf(':')
          if (i > 0 && hp.drop(i + 1).forall(_.isDigit))
            addr = Some((hp.take(i), hp.drop(i + 1).toInt))
        case _ => () // child chatter before the handshake — ignore
      }
      while (addr.isEmpty && !eof && System.nanoTime() < deadline) {
        if (stdout.available() > 0) {
          val n = stdout.read(chunk, 0, math.min(stdout.available(), chunk.length))
          if (n < 0) eof = true
          else {
            acc = acc ++ chunk.take(n)
            var nl = acc.indexOf('\n'.toByte)
            while (addr.isEmpty && nl >= 0) {
              scanLine(new String(acc, 0, nl,
                java.nio.charset.StandardCharsets.UTF_8).stripSuffix("\r"))
              acc = acc.drop(nl + 1)
              nl = acc.indexOf('\n'.toByte)
            }
          }
        } else if (!proc.isAlive) eof = true
        else Thread.sleep(50)
      }
      val (host, port) = addr.getOrElse {
        kill()
        throw new IllegalArgumentException(
          s"driver '$driver': $exe did not print a grpc handshake line" +
            (if (proc.isAlive) s" within ${Plugins.launchTimeoutSec}s" else
              s" (exited with ${proc.exitValue()})"))
      }
      // drain the rest of the child's stdout in the background so the
      // child never blocks on a full pipe
      val drainer = new Thread(() => {
        val b = new Array[Byte](8192)
        try { while (stdout.read(b) >= 0) () } catch { case _: Exception => () }
      }, s"gripper-$name-stdout")
      drainer.setDaemon(true); drainer.start()
      var client: GripperClient = null
      try { client = new GripperClient(host, port); client.collections() }
      catch { case scala.util.control.NonFatal(e) =>
        if (client != null) { try client.close() catch { case _: Exception => () } }
        kill()
        throw new IllegalArgumentException(
          s"driver '$driver': launched $exe but cannot reach GRIPSource at $host:$port: ${e.getMessage}")
      }
      Entry(name, driver, GripperWire.grpcSource(spark, client), () => {
        try client.close() catch { case _: Exception => () }
        kill()
      })
    } catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(e) => kill(); throw e
    }
  }

  /** All collections of all started plugins as TableInfo nodes
    * (gripql.proto:305-310), one per collection — ListTables' stream.
    * `camel` picks the protojson (REST) vs proto (Pbuf.encode) spelling of
    * the link-map field. Field paths use the `$.col` spelling
    * [[GripperTableServer]] serves as search_fields, so a local `dir`
    * plugin and the same data behind the wire list identically. */
  def tables(mapper: ObjectMapper, camel: Boolean = true): Iterator[ObjectNode] =
    list.iterator.flatMap { src =>
      val e = registry.get(src)
      if (e == null) Iterator.empty
      else e.provider.collections.iterator.map { coll =>
        val o = mapper.createObjectNode()
        o.put("source", src).put("name", coll)
        val fArr = o.putArray("fields")
        val lm = o.putObject(if (camel) "linkMap" else "link_map")
        e.provider match {
          case g: GripperWire.GrpcSource =>
            val (fields, links) = g.client.collectionInfo(coll)
            fields.foreach(fArr.add)
            links.foreach { case (k, v) => lm.put(k, v) }
          case p =>
            p.collection(coll).columns.foreach(c => fArr.add(s"$$.$c"))
        }
        o
      }
    }

  def close(): Unit = {
    registry.asScala.values.foreach(e =>
      try e.closer() catch { case _: Exception => () })
    registry.clear()
  }
}

object Plugins {
  /** Built-in driver kinds (see class doc). */
  val drivers: Seq[String] = Seq("dir", "grpc")

  /** How long a launched plugin gets to print its handshake (a JVM+Spark
    * child needs tens of seconds on a cold box). */
  private[server] var launchTimeoutSec: Long = 120

  private[server] def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  import com.fasterxml.jackson.databind.JsonNode

  /** Bind every source a mapping config references: inline bindings win,
    * anything else must be a started plugin — the reference's AddMapping
    * shape, where configs name sources StartPlugin registered
    * (server/plugins.go:44-45 `server.sources[config.Name] = cli`). */
  def resolveSources(conf: Gripper.GraphConfig, plugins: Plugins,
                     inline: Map[String, Gripper.SourceProvider] = Map.empty)
      : Map[String, Gripper.SourceProvider] = {
    val wanted = (conf.vertices.map(_.data.source) ++
      conf.edges.map(_.data.source)).filter(_.nonEmpty).distinct
    wanted.map { s =>
      s -> inline.getOrElse(s, plugins.get(s).getOrElse(
        throw new IllegalArgumentException(
          s"unknown source '$s': not in the request's 'sources' and no started plugin by that name")))
    }.toMap
  }

  /** Graph message → mapping config (reference: gripper/config.go:68-100
    * GraphToConfig): each vertex IS a VertexConfig — its gid is the
    * prefix, its data struct carries the ElementConfig fields — and each
    * edge an EdgeConfig whose from/to name vertex prefixes. */
  def configFromGraphNode(node: JsonNode): Gripper.GraphConfig = {
    def s(n: JsonNode, k: String): String =
      Option(n).flatMap(x => Option(x.get(k))).filterNot(_.isNull).map(_.asText()).getOrElse("")
    def elem(d: JsonNode): Gripper.ElementConfig = Gripper.ElementConfig(
      source = s(d, "source"), collection = s(d, "collection"),
      fromField = s(d, "fromField"), toField = s(d, "toField"))
    def arr(k: String): Seq[JsonNode] = Option(node.get(k)).filter(_.isArray)
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    Gripper.GraphConfig(
      vertices = arr("vertices").map(v =>
        Gripper.VertexConfig(s(v, "gid"), s(v, "label"), elem(v.get("data")))),
      edges = arr("edges").map(e =>
        Gripper.EdgeConfig(s(e, "gid"), from = s(e, "from"), to = s(e, "to"),
          label = s(e, "label"), data = elem(e.get("data")))))
  }

  /** Mapping config → Graph message (protojson node) — what GetMapping
    * serves (reference: server/api.go:478-488 returns the stored mapping
    * graph). Empty ElementConfig fields are omitted, matching protojson
    * zero-value elision. */
  def configToGraphNode(mapper: ObjectMapper, graph: String,
                        conf: Gripper.GraphConfig): ObjectNode = {
    val o = mapper.createObjectNode().put("graph", graph)
    def dataNode(e: Gripper.ElementConfig): ObjectNode = {
      val d = mapper.createObjectNode()
      if (e.source.nonEmpty) d.put("source", e.source)
      if (e.collection.nonEmpty) d.put("collection", e.collection)
      if (e.fromField.nonEmpty) d.put("fromField", e.fromField)
      if (e.toField.nonEmpty) d.put("toField", e.toField)
      d
    }
    val vArr = o.putArray("vertices")
    conf.vertices.foreach { v =>
      val n = mapper.createObjectNode().put("gid", v.prefix).put("label", v.label)
      n.set[ObjectNode]("data", dataNode(v.data)); vArr.add(n)
    }
    val eArr = o.putArray("edges")
    conf.edges.foreach { e =>
      val n = mapper.createObjectNode().put("gid", e.prefix).put("label", e.label)
        .put("from", e.from).put("to", e.to)
      n.set[ObjectNode]("data", dataNode(e.data)); eArr.add(n)
    }
    o
  }
}
