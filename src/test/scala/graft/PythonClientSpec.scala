package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.GraftServer

/** Stock-client validation (reference: gripql/python — the client the
  * reference actually ships): starts GraftServer, then runs
  * tools/client_smoke.py, which drives the server exclusively through the
  * reference's python builder (BulkAdd, edits, traversals, has-operators,
  * term aggregations, paging, distinct, labels) and checks golden SWAPI
  * conformance counts. Proves the REST surface is drop-in for shipped
  * clients, not merely protojson-shaped.
  *
  * Cancels (rather than fails) when python3/requests or the reference
  * client tree is unavailable. */
class PythonClientSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pythonReady: Boolean =
    new java.io.File("/root/reference/gripql/python/gripql/__init__.py").exists() && {
      val p = new ProcessBuilder("python3", "-c", "import requests").start()
      p.waitFor() == 0
    }

  test("reference python client runs the conformance smoke against graft") {
    assume(pythonReady, "python3+requests or reference client tree unavailable")
    val fixtureDir =
      new java.io.File(getClass.getResource("/swapi/swapi.vertices").getPath).getParent
    val srv = new GraftServer(spark, 0)
    srv.start()
    try {
      val pb = new ProcessBuilder("python3", "tools/client_smoke.py",
        srv.boundPort.toString, fixtureDir)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val code = p.waitFor()
      withClue(out) { assert(code == 0) }
      assert(out.contains("ALL client-smoke CHECKS PASSED"))
    } finally srv.stop()
  }
}
