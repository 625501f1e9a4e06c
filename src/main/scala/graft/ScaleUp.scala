package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver-generated test tables: replicate
  * every fact table `reps`× with per-replica key offsets, preserving the
  * statistical shape every workload's COST depends on — row counts per
  * group, string/token length distributions, duplicate and near-duplicate
  * cluster structure, per-user event cadence — while keeping replicas
  * disjoint where cross-replica collisions would CHANGE that shape:
  *
  *  - keys/foreign keys shift by a per-table stride (joins stay intact
  *    inside a replica, never match across replicas);
  *  - document TEXT gets a per-replica alphanumeric substitution cipher
  *    (`translate`): token lengths, whitespace, punctuation and n_chars
  *    are preserved exactly, so within-replica shingle equality — the
  *    dedup families' candidate structure — is invariant, while
  *    cross-replica shingles are disjoint (no artificial 10×-sized
  *    near-dup clusters that would quadratically inflate bucket joins);
  *  - embeddings get a per-replica SIGNED DIMENSION PERMUTATION — an
  *    orthogonal transform, so norms and all within-replica inner
  *    products (the ANN/SemDeDup geometry) are bit-preserved while
  *    cross-replica cosines decorrelate to background level;
  *  - dimension tables (region, nation) stay fixed, as TPC-H does across
  *    scale factors.
  *
  * Usage: ScaleUp <srcDir> <dstDir> [reps=10]. sf0.1 × 10 ≈ sf1 — the
  * decade-scaling probe's input (VERDICT r12 task 1).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      System.err.println(s"[scaleup] wrote $t")
    }

    // replicate with per-replica column rewrites; r=0 is the identity so
    // the original rows appear verbatim in the output
    def replicate(df: DataFrame)(rewrite: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(r => rewrite(df, r)).reduce(_ unionByName _)

    // key strides: clean powers of ten above each id space's max
    val KEY = 10000000L // custkey/suppkey/partkey/orderkey/doc/vec/user/event

    def shift(df: DataFrame, r: Int, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(r * KEY)))

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("customer"))((d, r) => shift(d, r, "c_custkey")), "customer")
    write(replicate(read("supplier"))((d, r) => shift(d, r, "s_suppkey")), "supplier")
    write(replicate(read("part"))((d, r) => shift(d, r, "p_partkey")), "part")
    write(replicate(read("orders"))((d, r) =>
      shift(d, r, "o_orderkey", "o_custkey")), "orders")
    write(replicate(read("lineitem"))((d, r) =>
      shift(d, r, "l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    // 10× events over the same time range = 10× the event rate with the
    // same per-user cadence (new distinct users per replica)
    write(replicate(read("events"))((d, r) =>
      shift(d, r, "event_id", "user_id")), "events")

    // per-replica substitution cipher over [a-zA-Z0-9]; seeded, r=0 identity
    val alphabet = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString
    def cipher(r: Int): String =
      if (r == 0) alphabet
      else {
        val rnd = new scala.util.Random(42L * 1000003L + r)
        rnd.shuffle(alphabet.toSeq).mkString
      }
    write(replicate(read("documents"))((d, r) =>
      shift(d, r, "doc_id")
        .withColumn("text", translate(col("text"), alphabet, cipher(r)))), "documents")

    // per-replica signed dimension permutation (orthogonal); r=0 identity
    val dim = read("embeddings").select(size(col("embedding"))).head().getInt(0)
    def signedPerm(r: Int): (Vector[Int], Vector[Float]) =
      if (r == 0) ((0 until dim).toVector, Vector.fill(dim)(1f))
      else {
        val rnd = new scala.util.Random(42L * 2000003L + r)
        (rnd.shuffle((0 until dim).toVector),
         Vector.fill(dim)(if (rnd.nextBoolean()) 1f else -1f))
      }
    write(replicate(read("embeddings")) { (d, r) =>
      val (perm, sign) = signedPerm(r)
      shift(d, r, "vec_id").withColumn("embedding",
        array((0 until dim).map(i =>
          element_at(col("embedding"), perm(i) + 1) * lit(sign(i))): _*))
    }, "embeddings")

    spark.stop()
  }
}
