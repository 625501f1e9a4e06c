ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gripspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked output goes RAW to this process's stdout/stderr instead of
// through sbt's logger: the logger prefixes every stdout line with
// "[info] " (and relays the fork's stderr as "[error] " lines ON
// stdout), which breaks any line-oriented JSON consumer of `runMain
// graft.Bench` — the bench's one-line JSON contract has been emitted as
// `[info] {...}` since round 5 (BENCH_r*.json: parsed=null every
// round). With StdoutOutput the bench's two JSON lines are the only
// unprefixed stdout of the run and its [bench] diagnostics stay on real
// stderr. Timing/methodology unchanged — output routing only.
outputStrategy := Some(StdoutOutput)
// ScalaTest per-test durations in the report (-oD): per-suite wall is
// what the test-grouping weights below are balanced against.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// The suite is Spark-heavy and runs sequentially in ONE forked JVM by
// default: 21 min wall measured on an idle box, with each suite's
// local[4] session leaving 28 of 32 cores idle — long enough that a
// host-throttled run overruns the harness's capture window (r13's
// tests_ok gate died mid-run at ServerSpec with zero failing tests).
// Split the suites into forked JVMs run concurrently: same tests, same
// assertions, each group builds its own SparkTestSession (suites never
// shared state beyond that lazy session — the only cross-suite resource
// is the default warehouse dir, used by exactly one suite). Four groups,
// not more: a 6-way run measured 3-4× per-test inflation from the
// groups contending for cores, and the latency-sensitive server/RPC
// suites started missing their deadlock budgets. Weights are measured
// per-suite wall seconds (4-over-provisioned box, this round — only the
// RATIO matters for balance); unknown new suites default to 15 s and
// land in the lightest bin. The wall-clock latency-sensitive suites
// (real HTTP/gRPC servers, deadlock budgets, a live python subprocess)
// are PINNED into one group so they serialize against each other and
// only ever compete with ordinary Spark work, never with one another.
val testGroupCount = 4
Test / testGrouping := {
  val opts = (Test / forkOptions).value
  val pinned = Set("graft.ServerConcurrencySpec", "graft.GrpcSpec",
    "graft.ServerSpec", "graft.PythonClientSpec")
  val weight: Map[String, Int] = Map(
    "graft.PipelineSpec" -> 875, "graft.GraphAlgosSpec" -> 603,
    "graft.DedupPropertySpec" -> 530, "graft.StreamingSpec" -> 372,
    "graft.GripperSpec" -> 359, "graft.ServerConcurrencySpec" -> 347,
    "graft.SwapiConformanceSpec" -> 301, "graft.PythonClientSpec" -> 275,
    "graft.GrpcSpec" -> 268, "graft.LoopSpec" -> 218,
    "graft.EditSpec" -> 128, "graft.ManifestCommitSpec" -> 118,
    "graft.BucketedGraphSpec" -> 83, "graft.server.CasbinSpec" -> 15,
    "graft.PluginSpec" -> 32, "graft.SmtestSpec" -> 29,
    "graft.PlanShapeSpec" -> 24, "graft.ConditionPropertySpec" -> 16,
    "graft.GraphPropertySpec" -> 15, "graft.ServerSpec" -> 13,
    "graft.JobsSpec" -> 12, "graft.GJsonParitySpec" -> 12)
  // greedy LPT bin-packing: heaviest suite first into the lightest bin;
  // bin 0 starts with the pinned latency-sensitive set
  val all = (Test / definedTests).value
  val bins = Array.fill(testGroupCount)(
    (scala.collection.mutable.ListBuffer.empty[TestDefinition], Array(0)))
  for (t <- all.filter(t => pinned(t.name)).sortBy(_.name)) {
    bins(0)._1 += t; bins(0)._2(0) += weight.getOrElse(t.name, 15)
  }
  val rest = all.filterNot(t => pinned(t.name))
    .sortBy(t => (-weight.getOrElse(t.name, 15), t.name))
  for (t <- rest) {
    val (buf, w) = bins.minBy(_._2(0))
    buf += t; w(0) += weight.getOrElse(t.name, 15)
  }
  bins.toSeq.zipWithIndex.collect { case ((buf, _), i) if buf.nonEmpty =>
    Tests.Group(s"g$i", buf.toVector, Tests.SubProcess(opts))
  }
}
// default restrictions cap ForkedTestGroup at 1 — raise it so the
// groups actually run concurrently (4 × local[4] ≤ 32 cores)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(32), Tags.limit(Tags.ForkedTestGroup, testGroupCount))
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
