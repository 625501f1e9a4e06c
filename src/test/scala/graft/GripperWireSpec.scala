package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.Gripper
import graft.model.Gripper.FrameSource
import graft.compiler.Traversal
import graft.server.{GripperClient, GripperTableServer, GripperWire}

/** The `gripper.proto` wire protocol end-to-end: a [[GripperTableServer]]
  * serving a [[FrameSource]] over real h2c gRPC, a [[GripperClient]]
  * consuming it, and [[GripperWire.grpcSource]] feeding the same mapping
  * the in-memory [[GripperSpec]] uses — so a live plugin and a local
  * frame provider are interchangeable behind [[Gripper.graph]]
  * (reference: gripper/gripper.proto:45-56, gripper/client.go,
  * gripper/test-graph/main.py table server). */
class GripperWireSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val source = FrameSource(Map(
    "Character" -> Seq(
      ("1", "Luke Skywalker", "blue", "1"),
      ("2", "C-3PO", "yellow", "1"),
      ("5", "Leia Organa", "brown", "2"),
      ("22", "Boba Fett", "brown", ""))
      .toDF("id", "name", "eye_color", "homeworld"),
    "Planet" -> Seq(("1", "Tatooine"), ("2", "Alderaan")).toDF("id", "name"),
    "Film" -> Seq(("1", "A New Hope")).toDF("id", "title"),
    "filmCharacters" -> Seq(("1", "1", "1"), ("2", "1", "5"), ("3", "1", "9"))
      .toDF("id", "from", "to")))

  private val mappingYaml =
    """
vertices:
  - gid: "Character:"
    label: Character
    data: {source: tableServer, collection: Character}
  - gid: "Planet:"
    label: Planet
    data: {source: tableServer, collection: Planet}
  - gid: "Film:"
    label: Film
    data: {source: tableServer, collection: Film}
edges:
  - gid: homeworld
    from: "Character:"
    to: "Planet:"
    label: homeworld
    data:
      source: tableServer
      collection: Character
      fromField: id
      toField: homeworld
  - gid: characters
    from: "Film:"
    to: "Character:"
    label: characters
    data:
      source: tableServer
      collection: filmCharacters
      fromField: from
      toField: to
"""

  private def withWire[A](f: GripperClient => A): A = {
    // force the lazy Spark session BEFORE the server starts: FrameSource
    // tables are driver-side frames and rowIter plans against them
    spark
    val server = new GripperTableServer(source, port = 0)
    server.start()
    val client = new GripperClient("127.0.0.1", server.boundPort)
    try f(client)
    finally { client.close(); server.stop() }
  }

  test("GetCollections / GetCollectionInfo list the provider's surface") {
    withWire { c =>
      assert(c.collections() == Seq("Character", "Film", "Planet", "filmCharacters"))
      val (searchFields, linkMap) = c.collectionInfo("Character")
      assert(searchFields.toSet ==
        Set("$.id", "$.name", "$.eye_color", "$.homeworld"))
      assert(linkMap.isEmpty)
    }
  }

  test("GetIDs and GetRows stream every row with the full document as data") {
    withWire { c =>
      assert(c.ids("Planet").toSet == Set("1", "2"))
      val rows = c.rows("Character")
      assert(rows.map(_._1).toSet == Set("1", "2", "5", "22"))
      val luke = rows.toMap.apply("1")
      assert(luke.contains("\"name\":\"Luke Skywalker\""))
      assert(luke.contains("\"id\":\"1\"")) // id included in data, as the reference emits
    }
  }

  test("GetRowsByID answers the client stream in order, dropping missing ids") {
    withWire { c =>
      val got = c.rowsById("Character", Seq("5", "404", "1", "1"))
      // missing id yields no Row; duplicates answer per-request
      assert(got.map(_._1) == Seq("5", "1", "1"))
      assert(got.head._2.contains("Leia"))
    }
  }

  test("GetRowsByField filters on the $.field form with pushdown semantics") {
    withWire { c =>
      val brown = c.rowsByField("Character", "$.eye_color", "brown")
      assert(brown.map(_._1).toSet == Set("5", "22"))
      // unindexed field → INVALID_ARGUMENT, not a hang
      val e = intercept[IllegalArgumentException](
        c.rowsByField("Character", "$.shoe_size", "11"))
      assert(e.getMessage.contains("not indexed"))
    }
  }

  test("unknown collection and unknown method map to grpc-status 3") {
    withWire { c =>
      val e = intercept[IllegalArgumentException](c.rows("Starship"))
      assert(e.getMessage.contains("unknown collection"))
      val r = c.call("/gripper.GRIPSource/SelfDestruct", Seq(Array.emptyByteArray))
      assert(r.grpcStatus == 3 && r.message.contains("unknown method"))
    }
  }

  test("grpcSource behind Gripper.graph matches the in-memory mapping") {
    withWire { c =>
      val wired = GripperWire.grpcSource(spark, c)
      val graph = Gripper.graph(Gripper.parse(mappingYaml),
        Map("tableServer" -> wired))
      val Q = Query()
      assert(Traversal.run(spark, graph, Q.V().count()).collect()(0).getLong(0) == 7)
      assert(Traversal.run(spark, graph,
        Q.V("Planet:1").in("homeworld").count()).collect()(0).getLong(0) == 2)
      assert(Traversal.run(spark, graph,
        Q.V("Film:1").out("characters").count()).collect()(0).getLong(0) == 2)
      val luke = Traversal.run(spark, graph,
        Q.V().hasLabel("Character").has(P.eq_("eye_color", "blue"))).collect()
      assert(luke.length == 1 &&
        luke(0).getAs[String]("data").contains("\"name\":\"Luke Skywalker\""))
    }
  }
}
