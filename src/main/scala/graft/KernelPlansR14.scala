package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the LAZY candidate-kernel plans the entry-level dumps cannot show
  * (the entries return eagerly checkpointed frames, so their executed
  * plans are single `Scan ExistingRDD` leaves): the simhash chunk
  * self-join behind p03 and the inverted-index self-join behind p04/p47/
  * p48 — the VERDICT item-7 "narrow-the-shuffle" audit evidence. Written
  * to plans/r14/kernel_*.txt.
  * Usage: tools/runmain.sh graft.KernelPlansR14 [sfDir]
  */
object KernelPlansR14 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val out = new java.io.File(dir, s"kernel_$name.txt")
      java.nio.file.Files.write(out.toPath,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[kernelplan] wrote ${out.getPath} (${plan.linesIterator.size} lines)")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    // p03's candidate kernel: fingerprints -> chunk buckets -> self-join
    val sims = graft.pipeline.Dedup.simhashes(
      docs.select(col("doc_id").as("__id"), col("text").as("__text")), "__id", "__text")
    write("simhash_candidates", graft.pipeline.Dedup.simhashCandidates(sims, maxHamming = 13))
    // p04/p47/p48's shared-shingle kernel: inverted index self-join
    val sh = docs.select(col("doc_id").as("__id"),
      graft.pipeline.Dedup.shingles(col("text"), 3).as("__sh"))
    write("shared_shingle_counts",
      graft.pipeline.Dedup.sharedShingleCountsForAudit(sh, 1000L))
    spark.stop()
  }
}
