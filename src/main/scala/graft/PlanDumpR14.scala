package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries into
  * plans/r14/<query>_<tag>.txt — the judge-checkable plan evidence for
  * this round's touched operators.
  * Usage: tools/runmain.sh graft.PlanDumpR14 <tag> <q1,q2,...> [sfDir]
  */
object PlanDumpR14 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File("plans/r14"); dir.mkdirs()
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      val df = fn(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val out = new java.io.File(dir, s"${n}_$tag.txt")
      java.nio.file.Files.write(out.toPath,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${out.getPath} (${plan.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
