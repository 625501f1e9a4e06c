package graft

import org.apache.spark.sql.SparkSession
import graft.gripql._
import graft.model.GraphFrame
import graft.compiler.Traversal

/** Tiny driveable surface: loads the SWAPI fixture and runs a few
  * traversals through the public API. `sbt "runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "src/test/resources/swapi"
    val g = GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")

    val flagship = Traversal.run(spark, g,
      Query().V().hasLabel("Character").has(P.eq_("eye_color", "blue")).out("homeworld"))
    println("=== blue-eyed characters' homeworlds ===")
    flagship.show(20, truncate = false)

    val hops = Traversal.run(spark, g, Query().V("Film:1").out().out().out().count())
      .collect()(0).getLong(0)
    println(s"V(Film:1).out.out.out count = $hops (expect 1814)")

    try Traversal.run(spark, g, Query().V().jump("nope", None, emit = true)).count()
    catch { case e: IllegalArgumentException => println(s"probe unknown mark -> ${e.getMessage}") }
    try Traversal.run(spark, g, Query().out().count()).count()
    catch { case e: IllegalArgumentException => println(s"probe bad start -> ${e.getMessage}") }
    spark.stop()
  }
}
