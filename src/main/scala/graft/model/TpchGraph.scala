package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A property-graph VIEW over the driver's TPC-H-ish parquet tables
  * (TESTDATA.md) so every GripQL operator has an exact relational (DuckDB)
  * oracle — the same "collections as graph" idea as the reference's GRIPPER
  * federated source (reference: gripper/graph.go, gripper/gripper.proto),
  * re-expressed as lazy DataFrame unions.
  *
  * Vertices (gid prefix → label):
  *   c:<custkey>   customer  {c_name, c_nationkey, c_acctbal, c_mktsegment, big_balance?}
  *   o:<orderkey>  orders    {o_orderstatus, o_totalprice, o_orderpriority}
  *   p:<partkey>   part      {p_name, p_brand, p_type, p_size, p_retailprice, words:[...]}
  *   s:<suppkey>   supplier  {s_name, s_nationkey, s_acctbal}
  *   n:<nationkey> nation    {n_name}
  *   r:<regionkey> region    {r_name}
  *
  * Edges (from → to, label):
  *   oc:<okey>        orders   → customer  "customer"
  *   cn:<custkey>     customer → nation    "nation"
  *   sn:<suppkey>     supplier → nation    "nation"
  *   nr:<nationkey>   nation   → region    "region"
  *   li:<okey>:<ln>   orders   → part      "item" {l_quantity, l_extendedprice, l_discount, l_returnflag}
  *   ps:<pkey>:<skey> part     → supplier  "supplier" (distinct pairs from lineitem)
  *
  * Everything is lazily composed; at scale the unions stay partition-local
  * (no shuffle) and label filters prune to a single branch via Catalyst's
  * union pushdown + parquet column pruning.
  */
object TpchGraph {
  // Memoized per (session, dir): the view is an immutable plan over
  // immutable files, and a long-lived session keeps its graph handle open
  // (the reference holds graph handles in its server for the same reason)
  // — re-listing 7 parquet directories and re-synthesizing the 11-branch
  // union per query is pure fixed overhead.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), GraphFrame]()

  def apply(spark: SparkSession, dir: String): GraphFrame = {
    // drop entries whose session has stopped so a long-lived JVM that
    // churns sessions doesn't pin their plans (the map stays tiny: one
    // entry per live (session, dataset) pair)
    memo.keySet.removeIf { case (s, _) => s.sparkContext.isStopped }
    memo.computeIfAbsent((spark, dir), { case (s, d) => build(s, d) })
  }

  private def build(spark: SparkSession, dir: String): GraphFrame = {
    def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
    val customer = t("customer"); val orders = t("orders"); val part = t("part")
    val supplier = t("supplier"); val nation = t("nation"); val region = t("region")
    val lineitem = t("lineitem")

    def v(df: DataFrame, prefix: String, key: String, label: String, data: org.apache.spark.sql.Column): DataFrame =
      df.select(concat(lit(prefix), col(key).cast("string")).as("gid"), lit(label).as("label"), data.as("data"))

    val vertices =
      v(customer, "c:", "c_custkey", "customer", to_json(struct(
          col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"),
          when(col("c_acctbal") > 5000, lit("y")).as("big_balance")))) ::
      v(orders, "o:", "o_orderkey", "orders", to_json(struct(
          col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority")))) ::
      v(part, "p:", "p_partkey", "part", to_json(struct(
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"),
          split(col("p_name"), " ").as("words")))) ::
      v(supplier, "s:", "s_suppkey", "supplier", to_json(struct(
          col("s_name"), col("s_nationkey"), col("s_acctbal")))) ::
      v(nation, "n:", "n_nationkey", "nation", to_json(struct(col("n_name")))) ::
      v(region, "r:", "r_regionkey", "region", to_json(struct(col("r_name")))) :: Nil

    def e(df: DataFrame, gid: org.apache.spark.sql.Column, label: String,
          from: org.apache.spark.sql.Column, to: org.apache.spark.sql.Column,
          data: org.apache.spark.sql.Column): DataFrame =
      df.select(gid.as("gid"), lit(label).as("label"),
        from.as("from"), to.as("to"), data.as("data"))

    val edges =
      e(orders, concat(lit("oc:"), col("o_orderkey")), "customer",
        concat(lit("o:"), col("o_orderkey")), concat(lit("c:"), col("o_custkey")), lit("{}")) ::
      e(customer, concat(lit("cn:"), col("c_custkey")), "nation",
        concat(lit("c:"), col("c_custkey")), concat(lit("n:"), col("c_nationkey")), lit("{}")) ::
      e(supplier, concat(lit("sn:"), col("s_suppkey")), "nation",
        concat(lit("s:"), col("s_suppkey")), concat(lit("n:"), col("s_nationkey")), lit("{}")) ::
      e(nation, concat(lit("nr:"), col("n_nationkey")), "region",
        concat(lit("n:"), col("n_nationkey")), concat(lit("r:"), col("n_regionkey")), lit("{}")) ::
      e(lineitem, concat(lit("li:"), col("l_orderkey"), lit(":"), col("l_linenumber")), "item",
        concat(lit("o:"), col("l_orderkey")), concat(lit("p:"), col("l_partkey")),
        to_json(struct(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_returnflag")))) ::
      e(lineitem.select("l_partkey", "l_suppkey").distinct(),
        concat(lit("ps:"), col("l_partkey"), lit(":"), col("l_suppkey")), "supplier",
        concat(lit("p:"), col("l_partkey")), concat(lit("s:"), col("l_suppkey")), lit("{}")) :: Nil

    // the static schema doubles as the compiler's pruning contract: an
    // adjacency step over a labeled edge only joins the reachable vertex
    // branches instead of the whole 6-table union
    val topology = Seq(
      EdgeType("orders", "customer", "customer"),
      EdgeType("customer", "nation", "nation"),
      EdgeType("supplier", "nation", "nation"),
      EdgeType("nation", "region", "region"),
      EdgeType("orders", "item", "part"),
      EdgeType("part", "supplier", "supplier"))
    GraphFrame(vertices.reduce(_ unionByName _), edges.reduce(_ unionByName _), Some(topology))
  }
}
