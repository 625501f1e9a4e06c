package graft
import org.apache.spark.sql.SparkSession
object DebugCurate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c50 = Baseline.corpus(spark, 50000)
    graft.pipeline.Curation.curate(c50, "doc_id", "text").count() // warm
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.pipeline.Curation.curate(c50, "doc_id", "text").count()
      println(f"[curate50k] rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
