package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gripql.Query
import graft.compiler.{Traversal, VertexK, EdgeK, Kind}

/** Async job service: submit a traversal, spool its traveler stream to
  * parquet, later resume it with MORE statements (pipeline extension) —
  * the reference's Job service re-expressed as parquet spool + compiler
  * re-entry (reference: gripql/gripql.proto:376-423,
  * server/job_manager.go:14-140, jobstorage/storage.go:21-35,
  * query-checksum dedup jobstorage/query_checksum.go:10-26).
  *
  * Spool layout: `<dir>/<jobId>/travelers` (normalized traveler parquet:
  * cur, marks, vars, path) + `<dir>/<jobId>/meta.json` (kind + checksum).
  */
object Jobs {
  def checksum(q: Query): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(q.stmts.mkString(";").getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** One structural hash PER statement (the reference's TraversalChecksum,
    * jobstorage/query_checksum.go:16-26) — prefix matching over these is
    * what lets a longer query reuse a shorter job's spool. */
  def stepChecksums(q: Query): Seq[String] = q.stmts.map { s =>
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  private def kindName(k: Kind): String = if (k == VertexK) "vertex" else "edge"

  /** Run the traversal, spool travelers, return the job id. */
  def submit(spark: SparkSession, g: GraphFrame, q: Query, dir: String): String =
    submitAs(spark, g, q, dir, "job-" + java.util.UUID.randomUUID().toString.take(12))

  /** [[submit]] with a caller-chosen id — async callers (the server's job
    * routes) allocate the id up front so status polls work while the spool
    * job is still running. */
  def submitAs(spark: SparkSession, g: GraphFrame, q: Query, dir: String,
               jobId: String): String = {
    val (travelers, kind, markKinds) =
      new Traversal(g, q.stmts.toIndexedSeq, spark, extensionMode = true).spool()
    travelers.write.mode("overwrite").parquet(s"$dir/$jobId/travelers")
    val marksJson = markKinds.toSeq.sortBy(_._1)
      .map { case (n, k) => s""""$n":"${kindName(k)}"""" }.mkString("{", ",", "}")
    // the rendered text form rides along for human inspection (job
    // status/list); the checksum stays the structural one
    val queryJson = graft.gripql.GValue.toJson(
      graft.gripql.GValue.GString(graft.gripql.Parser.render(q)))
    val steps = stepChecksums(q).map(s => s""""$s"""").mkString("[", ",", "]")
    val meta = s"""{"kind":"${kindName(kind)}","checksum":"${checksum(q)}",""" +
      s""""stepChecksums":$steps,"query":$queryJson,"marks":$marksJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$jobId/meta.json"), meta)
    jobId
  }

  def listJobs(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("job-")).map(_.getName).toSeq.sorted
  }

  /** Find every spooled job whose per-statement checksum list is a PREFIX
    * of the posted query's — i.e. jobs the query could resume from — with
    * the reference's >1-statement floor (jobstorage/query_checksum.go:28-39
    * JobMatch; storage.go:102-118 streams all matches). */
  def searchJobs(dir: String, q: Query): Seq[String] = {
    val want = stepChecksums(q)
    val wantWhole = checksum(q)
    listJobs(dir).filter { id =>
      val meta = java.nio.file.Paths.get(s"$dir/$id/meta.json")
      java.nio.file.Files.exists(meta) && {
        import scala.jdk.CollectionConverters._
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(meta))
        Option(node.get("stepChecksums")).filter(_.isArray) match {
          case Some(arr) =>
            val jobSteps = arr.elements().asScala.map(_.asText()).toSeq
            jobSteps.length > 1 && jobSteps.length <= want.length &&
              want.take(jobSteps.length) == jobSteps
          case None =>
            // legacy spool (pre-stepChecksums meta.json): only the whole-
            // query checksum exists, so only an exact-query match is safe
            Option(node.get("checksum")).exists(c =>
              q.stmts.length > 1 && c.asText() == wantWhole)
        }
      }
    }
  }

  /** Spooled results in the standard element output shape (the reference's
    * ViewJob, server/job_manager.go:90 streams full elements via
    * pipeline.Convert) — a resume with NO extension statements, so the
    * finisher emits the complete element. A `Fields(Nil)` extension would
    * instead compile to `data: {}` (fields semantics), stripping properties. */
  def view(spark: SparkSession, g: GraphFrame, dir: String, jobId: String): DataFrame =
    resume(spark, g, dir, jobId, Query(Vector.empty))

  /** Drop a spooled job (the reference's DeleteJob). */
  def deleteJob(dir: String, jobId: String): Boolean = {
    val d = new java.io.File(s"$dir/$jobId")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (!d.isDirectory || !jobId.startsWith("job-")) false
    else { rm(d); true }
  }

  /** Resume a spooled job with additional statements. */
  def resume(spark: SparkSession, g: GraphFrame, dir: String, jobId: String,
             extension: Query): DataFrame = {
    val metaText = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/$jobId/meta.json"))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(metaText)
    val kind: Kind = if (meta.get("kind").asText() == "edge") EdgeK else VertexK
    val extMarks = Option(meta.get("marks")).map { m =>
      import scala.jdk.CollectionConverters._
      m.fields().asScala.map { e =>
        val k: Kind = if (e.getValue.asText() == "edge") EdgeK else VertexK
        e.getKey -> k
      }.toMap
    }.getOrElse(Map.empty[String, Kind])
    val travelers = spark.read.parquet(s"$dir/$jobId/travelers")
    new Traversal(g, extension.stmts.toIndexedSeq, spark, extensionMode = true)
      .runExtension(travelers, kind, extMarks)
  }
}
