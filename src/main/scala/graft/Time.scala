package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-repetition wall clock for one driver entry in a warm
  * session, to split a bench number into first-run (plan + codegen +
  * footer reads) vs steady-state execution.
  *
  *   sbt "runMain graft.Time q53_unwind_term /root/testdata/sf0.1 3"
  */
object Time {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      for ((id, rdd) <- spark.sparkContext.getPersistentRDDs if !before.contains(id))
        rdd.unpersist(false)
    }
    spark.stop()
  }
}
