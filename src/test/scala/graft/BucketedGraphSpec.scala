package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.{BucketedGraph, GraphFrame}
import graft.compiler.Traversal

/** Bucketed storage: hop joins against the stored side must read the
  * bucket layout (no edge-side shuffle) and the in-direction must pick
  * the to-keyed copy — results identical to the plain graph. */
class BucketedGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def plain: GraphFrame = {
    import spark.implicits._
    GraphFrame(
      (1 to 40).map(i => (s"v$i", "node", s"""{"x":$i}""")).toDF("gid", "label", "data"),
      (1 to 39).map(i => (s"e$i", "next", s"v$i", s"v${i + 1}", "{}"))
        .toDF("gid", "label", "from", "to", "data"))
  }

  test("bucketed save/load answers hops identically and reads bucket layouts") {
    val name = "bg_test"
    BucketedGraph.drop(spark, name)
    BucketedGraph.save(spark, plain, name, buckets = 8)
    try {
      val bg = BucketedGraph.load(spark, name)
      def Q = Query()
      def run(g: GraphFrame, q: Query) = Traversal.run(spark, g, q)
      // identical results in all three directions
      for (q <- Seq(
          Q.V("v5").out("next"), Q.V("v5").in("next"), Q.V("v5").both(),
          Q.V().hasLabel("node").out().out())) {
        val a = run(plain, q).select("gid").collect().map(_.getString(0)).sorted.toSeq
        val b = run(bg, q).select("gid").collect().map(_.getString(0)).sorted.toSeq
        assert(a == b, s"mismatch for $q")
      }
      // the hop reads the bucketed table of the matching direction; tiny
      // tables broadcast (which rightly disables bucketed reading), so
      // force shuffle joins for the layout assertion — the regime where
      // bucketing matters at scale
      def planOf(q: Query) = {
        val out = new java.io.ByteArrayOutputStream()
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try Console.withOut(new java.io.PrintStream(out)) {
          run(bg, q).explain("formatted")
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        out.toString
      }
      val outPlan = planOf(Q.V().hasLabel("node").out("next"))
      assert(outPlan.contains(s"${name}_eout") && outPlan.contains("Bucketed: true"), outPlan)
      val inPlan = planOf(Q.V().hasLabel("node").in("next"))
      assert(inPlan.contains(s"${name}_ein") && inPlan.contains("Bucketed: true"), inPlan)
    } finally BucketedGraph.drop(spark, name)
  }
}
