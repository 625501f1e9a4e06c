package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r13 optimization round): split the one-shot DDL entries
  * (q88–q93) into their phases — save, index build, catalog re-load,
  * seek — so the optimization targets the real term, not the headline.
  * Usage: tools/runmain.sh graft.ProbeR13 [q89|q92|p51] [sfDir]
  */
object ProbeR13 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q89")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    var last = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"[probe] $tag%-28s ${(now - last) / 1e9}%6.2f s")
      last = now
    }
    val reps = 2
    for (rep <- 1 to reps) {
      println(s"== $which rep $rep ==")
      last = System.nanoTime()
      which match {
        case "q89" =>
          val root = java.nio.file.Files.createTempDirectory("graft-probe89").toString
          val cat = new graft.model.Catalog(spark, root)
          val cust = spark.read.parquet(s"$d/customer.parquet").select(
            concat(lit("c:"), col("c_custkey")).as("gid"),
            lit("customer").as("label"), lit("{}").as("data"))
          val ord = spark.read.parquet(s"$d/orders.parquet")
          val ov = ord.select(concat(lit("o:"), col("o_orderkey")).as("gid"),
            lit("order").as("label"), lit("{}").as("data"))
          val e = ord.select(concat(lit("pl:"), col("o_orderkey")).as("gid"),
            lit("placed").as("label"),
            concat(lit("c:"), col("o_custkey")).as("from"),
            concat(lit("o:"), col("o_orderkey")).as("to"),
            to_json(struct(col("o_totalprice"))).as("data"))
          lap("frames")
          cat.createGraph("q89", graft.model.GraphFrame(cust.unionByName(ov), e))
          lap("createGraph(save)")
          cat.addEdgeIndex("q89", "placed", "o_totalprice")
          lap("addEdgeIndex(relayout)")
          val g = cat.graph("q89")
          lap("cat.graph(load)")
          val n = graft.compiler.Traversal.run(spark, g,
            gripql.Query().E().hasLabel("placed")
              .has(gripql.P.between("o_totalprice", 1000, 20000))).count()
          lap(s"seek count=$n")
        case "q92" =>
          val root = java.nio.file.Files.createTempDirectory("graft-probe92").toString
          val cat = new graft.model.Catalog(spark, root)
          val cust = spark.read.parquet(s"$d/customer.parquet").select(
            concat(lit("c:"), col("c_custkey")).as("gid"),
            lit("customer").as("label"),
            to_json(struct(col("c_acctbal"))).as("data"))
          val ord = spark.read.parquet(s"$d/orders.parquet")
          val ov = ord.select(concat(lit("o:"), col("o_orderkey")).as("gid"),
            lit("order").as("label"),
            to_json(struct(col("o_totalprice"))).as("data"))
          val e = ord.select(concat(lit("pl:"), col("o_orderkey")).as("gid"),
            lit("placed").as("label"),
            concat(lit("c:"), col("o_custkey")).as("from"),
            concat(lit("o:"), col("o_orderkey")).as("to"),
            lit("{}").as("data"))
          lap("frames")
          cat.createGraph("q92", graft.model.GraphFrame(cust.unionByName(ov), e,
            topology = Some(Seq(graft.model.EdgeType("customer", "placed", "order")))))
          lap("createGraph(save)")
          cat.shredGraph("q92")
          lap("shredGraph")
          val g = cat.graph("q92")
          lap("cat.graph(load)")
          val n = graft.compiler.Traversal.run(spark, g,
            gripql.Query().V().hasLabel("order")
              .has(gripql.P.gt("o_totalprice", 100000))
              .in().has(gripql.P.between("c_acctbal", 1000, 5000))).count()
          lap(s"seek count=$n")
        case "relayout" =>
          // fine-grained: the exact work Catalog.relayout does for q89's
          // 150k-row edge label, step by step
          val root = java.nio.file.Files.createTempDirectory("graft-probeRl").toString
          val ord = spark.read.parquet(s"$d/orders.parquet")
          val e = ord.select(concat(lit("pl:"), col("o_orderkey")).as("gid"),
            lit("placed").as("label"),
            concat(lit("c:"), col("o_custkey")).as("from"),
            concat(lit("o:"), col("o_orderkey")).as("to"),
            to_json(struct(col("o_totalprice"))).as("data"))
          e.write.partitionBy("label").mode("overwrite").parquet(s"$root/edges")
          lap("write plain")
          val part = s"$root/edges/label=placed"
          val base = spark.read.parquet(part)
            .select(Seq("gid", "from", "to", "data").map(col): _*)
          base.write.format("noop").mode("overwrite").save()
          lap("base scan (noop)")
          val withIdx = graft.model.Catalog.withIdxColumns(base, Seq("o_totalprice"))
          withIdx.write.format("noop").mode("overwrite").save()
          lap("withIdx (noop)")
          withIdx.orderBy(col("__idxn_o_totalprice"), col("__idx_o_totalprice"))
            .write.format("noop").mode("overwrite").save()
          lap("withIdx+orderBy (noop)")
          withIdx.orderBy(col("__idxn_o_totalprice"), col("__idx_o_totalprice"))
            .write.mode("overwrite").parquet(s"$root/stage")
          lap("withIdx+orderBy+write")
          val cached = withIdx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cached.orderBy(col("__idxn_o_totalprice"), col("__idx_o_totalprice"))
            .write.mode("overwrite").parquet(s"$root/stage2")
          cached.unpersist(false)
          lap("persist+orderBy+write")
        case "p51" =>
          import graft.pipeline.Similarity
          val e = spark.read.parquet(s"$d/embeddings.parquet")
          val qs = e.filter(col("vec_id") < 10).select(
            (col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x.cast("double") +
                (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / 1000.0 - 0.5) * 0.02
            ).as("embedding"))
          lap("frames")
          val ivf = Similarity.buildIvf(e, "vec_id", "embedding", 16, 42L)
          ivf.assigned.write.format("noop").mode("overwrite").save()
          lap("buildIvf+materialize")
          val cb = Similarity.buildPqCodebook(e, "embedding", 64, 4, 16, 42L, 3)
          lap("buildPqCodebook")
          val n = Similarity.annIvfPq(e, "vec_id", "embedding", qs, "vec_id", "embedding",
            k = 1, dim = 64).count()
          lap(s"full annIvfPq count=$n")
        case "q90" =>
          val root = java.nio.file.Files.createTempDirectory("graft-probe90").toString
          val cat = new graft.model.Catalog(spark, root)
          val cust = spark.read.parquet(s"$d/customer.parquet").select(
            concat(lit("c:"), col("c_custkey")).as("gid"),
            lit("customer").as("label"),
            to_json(struct(col("c_acctbal"))).as("data"),
            col("c_custkey"))
          val e = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            graft.model.GraphFrame.edgeSchema)
          lap("frames")
          cat.createGraph("q90", graft.model.GraphFrame(
            cust.filter(col("c_custkey") % 2 === 0).drop("c_custkey"), e))
          lap("createGraph")
          cat.addIndex("q90", "customer", "c_acctbal")
          lap("addIndex")
          val mg = graft.model.MutableGraph(spark, cat.graph("q90"))
          mg.bulkAddFrames(vertices = cust.filter(col("c_custkey") % 2 =!= 0)
            .drop("c_custkey"))
          lap("bulkAddFrames")
          cat.upsertGraph("q90", mg)
          lap("upsertGraph")
          val n = graft.compiler.Traversal.run(spark, cat.graph("q90"),
            gripql.Query().V().hasLabel("customer")
              .has(gripql.P.between("c_acctbal", 1000, 3000))).count()
          lap(s"seek count=$n")
        case "minhash" =>
          import graft.pipeline.Dedup
          val dd = spark.read.parquet(s"$d/documents.parquet")
          lap("read")
          val sh = dd.select(col("doc_id").as("__id"),
            Dedup.shingles(col("text"), 3).as("__sh"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          sh.count()
          lap("shingles materialize")
          val sig = Dedup.minhashSignatures(sh, "__id", "__sh", 64)
          sig.write.format("noop").mode("overwrite").save()
          lap("signatures (noop)")
          val pairs = Dedup.nearDupMinhashScored(dd, "doc_id", "text")
          lap("nearDupMinhashScored full")
          println(s"[probe] pairs=${pairs.count()}")
          lap("count")
          sh.unpersist()
        case "minhash2" =>
          // finer split of nearDupMinhashScored: candidates vs the verify
          // join's two halves (per-doc hash+sort projection, pair join)
          import graft.pipeline.Dedup
          val dd = spark.read.parquet(s"$d/documents.parquet")
          val sh = dd.select(col("doc_id").as("__id"),
            Dedup.shingles(col("text"), 3).as("__sh"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          sh.count()
          lap("shingles materialize")
          val sig = Dedup.minhashSignatures(sh, "__id", "__sh", 64)
          sig.write.format("noop").mode("overwrite").save()
          lap("signatures (noop)")
          val cands = Dedup.lshCandidates(sig, "__id", "__sig", 32, 2)
          lap("lshCandidates (eager)")
          val hashed = sh.select(col("__id"),
            sort_array(array_distinct(
              graft.functions.VectorExprs.hashArray(col("__sh")))).as("__shh"))
          hashed.write.format("noop").mode("overwrite").save()
          lap("hashed projection (noop)")
          val hp = hashed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          hp.count()
          lap("hashed persist+count")
          val sa = hp.select(col("__id").as("a_id"), col("__shh").as("__sha"))
          val sb = hp.select(col("__id").as("b_id"), col("__shh").as("__shb"))
          val verified = cands.join(sa, "a_id").join(sb, "b_id")
            .withColumn("__i", graft.functions.VectorExprs
              .sortedIntersectCount(col("__sha"), col("__shb")).cast("double"))
            .withColumn("jaccard", col("__i") / (size(col("__sha")) + size(col("__shb")) - col("__i")))
            .filter(col("jaccard") >= 0.5)
            .select(col("a_id"), col("b_id")).localCheckpoint(true)
          lap(s"verify join (pairs=${verified.count()})")
          hp.unpersist(false); sh.unpersist(false)
        case "q58x" =>
          // is q58's cost the single-task JSON serialize+parse pass?
          val g = graft.model.TpchGraph(spark, d)
          val ord = g.vertices.filter(col("label") === "orders")
          println(s"[probe] scan partitions = ${ord.rdd.getNumPartitions}")
          val narrow = ord.select(
            get_json_object(col("data"), "$.o_totalprice").try_cast("double").as("x"))
          narrow.write.format("noop").mode("overwrite").save()
          lap("narrow (1-task?) noop")
          ord.repartition(32).select(
            get_json_object(col("data"), "$.o_totalprice").try_cast("double").as("x"))
            .write.format("noop").mode("overwrite").save()
          lap("narrow spread(32) noop")
          val n = SparkEntry.queries("q58_multi_agg_mixed")(spark, d).count()
          lap(s"full q58 count=$n")
        case "q58y" =>
          // decompose q58's aggregation: persist materialize, histogram
          // subtree, exact percentile, union+checkpoint
          val g = graft.model.TpchGraph(spark, d)
          val ord = g.vertices.filter(col("label") === "orders")
          val narrow = ord.select(
            get_json_object(col("data"), "$.o_totalprice").try_cast("double").as("x0"),
            get_json_object(col("data"), "$.o_totalprice").try_cast("double").as("x1"))
          val cached = narrow.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cached.count()
          lap("persist+count")
          val interval = 100000.0
          val bucketed = cached.select((floor(col("x0") / interval) * interval).as("bucket"))
            .filter(col("bucket").isNotNull)
            .groupBy("bucket").agg(count(lit(1)).cast("double").as("value"))
          val bounds = bucketed.agg(min("bucket").as("lo"), max("bucket").as("hi"))
          val dense = bounds.select(col("lo"),
              explode(sequence(lit(0L), ((col("hi") - col("lo")) / interval).cast("long"))).as("i"))
            .select((col("lo") + col("i") * interval).as("bucket"))
          val hist = dense.join(bucketed, Seq("bucket"), "left_outer")
            .select(lit("h").as("name"), col("bucket").cast("string").as("key"),
              coalesce(col("value"), lit(0d)).as("value"))
          hist.write.format("noop").mode("overwrite").save()
          lap("histogram noop")
          val vals = cached.select(col("x1").as("x")).filter(col("x").isNotNull)
          val pct = vals.agg(percentile(col("x"), lit(0.5)).as("q0"))
            .select(lit("p").as("name"), lit("50").as("key"), col("q0").as("value"))
          pct.write.format("noop").mode("overwrite").save()
          lap("percentile noop")
          val out = hist.unionByName(pct).localCheckpoint(true)
          lap(s"union+checkpoint rows=${out.count()}")
          cached.unpersist(false)
        case "explain" =>
          // print formatted plan for a named bench entry (plans/r13 deliverables)
          val qname = args(2)
          SparkEntry.queries(qname)(spark, d).explain("formatted")
          return
        case "exprcost" =>
          // which withIdxColumns term dominates per-row? single-task scan
          // over the 150k-row orders-as-edges label
          import org.apache.spark.sql.functions._
          val ord = spark.read.parquet(s"$d/orders.parquet")
            .select(to_json(struct(col("o_totalprice"))).as("data"))
          ord.write.mode("overwrite").parquet("/dev/shm/graft-probe-docs")
          val base = spark.read.parquet("/dev/shm/graft-probe-docs")
          def t(tag: String)(c: org.apache.spark.sql.Column): Unit = {
            val t0 = System.nanoTime()
            base.select(c.as("x")).write.format("noop").mode("overwrite").save()
            println(f"[probe] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          }
          t("baseline col")(col("data"))
          t("get_json_object")(get_json_object(col("data"), "$.o_totalprice"))
          t("gjo+try_cast")(get_json_object(col("data"), "$.o_totalprice").try_cast("double"))
          t("try_parse_json")(try_parse_json(col("data")).cast("string"))
          t("variant_get(parse)")(try_variant_get(try_parse_json(col("data")), "$.o_totalprice", "variant").cast("string"))
          t("schema_of_variant(get(parse))")(schema_of_variant(try_variant_get(try_parse_json(col("data")), "$.o_totalprice", "variant")))
          t("json_object_keys")(json_object_keys(col("data")))
          t("full withIdx trio")(struct(
            get_json_object(col("data"), "$.o_totalprice"),
            get_json_object(col("data"), "$.o_totalprice").try_cast("double"),
            schema_of_variant(try_variant_get(try_parse_json(col("data")), "$.o_totalprice", "variant"))))
        case "tageq" =>
          // Is when(present, typed) identical to when(sch.isNotNull, typed)?
          // i.e. does schema_of_variant(try_variant_get(...)) return NULL
          // exactly when the key is missing / doc malformed / parent absent,
          // and non-null (VOID for json null) whenever the key is present?
          import org.apache.spark.sql.functions._
          val docs = Seq(
            """{"a": 1}""", """{"a": null}""", """{"b": 2}""", """{}""",
            "", "not json", """[1,2]""", """"str"""", "null", "3",
            """{"a": {"b": 1}}""", """{"a": {"b": null}}""", """{"a": []}""",
            """{"a": {"c": 1}}""", """{"a": [1]}""", """{"a": "x"}""",
            """{"a": true}""", """{"a": 1.50}""", """{"a": {}}""",
            """{"a": {"b": {"c": null}}}""")
          val df = spark.createDataFrame(
            spark.sparkContext.parallelize(docs.map(org.apache.spark.sql.Row(_)), 2),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("data",
                org.apache.spark.sql.types.StringType))))
          for (field <- Seq("a", "a.b")) {
            val tmpVar = try_parse_json(col("data"))
            val parts = field.split('.').toSeq
            val keys =
              if (parts.length == 1) json_object_keys(col("data"))
              else json_object_keys(get_json_object(col("data"),
                "$." + parts.dropRight(1).mkString(".")))
            val present = coalesce(array_contains(keys, parts.last), lit(false))
            val sch = schema_of_variant(try_variant_get(tmpVar, "$." + field, "variant"))
            val out = df.select(col("data"), present.as("present"), sch.as("sch"))
              .collect()
            println(s"--- field=$field")
            out.foreach(r => println(f"${r.get(0).toString.take(26)}%-28s present=${r.get(1)}%-6s sch=${r.get(2)}"))
            val mism = out.filter(r => r.getBoolean(1) != (r.get(2) != null))
            println(s"MISMATCHES: ${mism.length}")
          }
        case other =>
          val fn = SparkEntry.queries(other)
          val n = fn(spark, d).count()
          lap(s"$other count=$n")
      }
    }
    spark.stop()
  }
}
