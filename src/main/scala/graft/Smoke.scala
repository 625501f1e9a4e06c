package graft
import org.apache.spark.sql.SparkSession

/** Preflight smoke: build a session, run the flagship entry query on the
  * given SF dir, demand rows > 0, print SMOKE OK. Exists so
  * `tools/preflight.sh` can gate end-of-session snapshots on "the committed
  * tree actually compiles AND executes one end-to-end query" (round-10
  * post-mortem: a truncated file shipped because nothing ran after the
  * final edit). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n =
        if (sfDir == "/root/testdata/sf0.001") SparkEntry.entry(spark).count()
        else SparkEntry.queries("q01_v_count")(spark, sfDir).count()
      require(n > 0, s"entry() returned $n rows")
      println(s"SMOKE OK ($n rows)")
    } finally spark.stop()
  }
}
