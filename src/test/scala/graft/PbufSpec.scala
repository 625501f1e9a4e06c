package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.server.{GripqlProto, Pbuf}

/** Wire-format fidelity for the hand-rolled proto3 codec ([[Pbuf]] +
  * [[GripqlProto]]) against hand-computed golden byte vectors built from
  * the encoding spec and the reference schema
  * (/root/reference/gripql/gripql.proto). Covers: nested messages, packed
  * doubles, Struct/Value nesting, Selections maps, oneof last-wins,
  * uint64 past Long.MaxValue, and rejection of truncated / hostile bytes
  * (the decode loop must terminate with an error, never read garbage).
  */
class PbufSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private val reg = GripqlProto.registry

  private def hex(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(b => Integer.parseInt(b, 16).toByte)

  private def json(s: String) = mapper.readTree(s)

  /** Jackson numeric nodes of different widths (IntNode vs LongNode) are
    * not `equals` even at the same value — compare serialized forms. */
  private def assertJson(a: com.fasterxml.jackson.databind.JsonNode,
                         b: com.fasterxml.jackson.databind.JsonNode): Unit =
    assert(a.toString == b.toString)

  test("GraphQuery golden bytes round-trip (hasLabel)") {
    // Value{string_value:"Person"}: tag 1A, len 6, bytes
    val value = "1A 06 50 65 72 73 6F 6E"
    // ListValue{values:[Value]}: tag 0A, len 8
    val listValue = s"0A 08 $value"
    // GraphStatement{has_label(31): ListValue}: tag FA 01, len 10
    val stmt = s"FA 01 0A $listValue"
    // GraphQuery{graph(1):"test", query(2): stmt}
    val gold = hex(s"0A 04 74 65 73 74 12 0D $stmt")

    val decoded = Pbuf.decode(reg, "GraphQuery", gold)
    assertJson(decoded, json("""{"graph":"test","query":[{"has_label":["Person"]}]}"""))
    assert(Pbuf.encode(reg, "GraphQuery", decoded).sameElements(gold))
  }

  test("QueryResult count golden") {
    val gold = hex("30 2A") // field 6 (count) varint 42
    val decoded = Pbuf.decode(reg, "QueryResult", gold)
    assertJson(decoded, json("""{"count":42}"""))
    assert(Pbuf.encode(reg, "QueryResult", decoded).sameElements(gold))
  }

  test("QueryResult vertex with Struct data golden") {
    // Value{number_value: 1.0}: tag 11 + LE double 1.0
    val value = "11 00 00 00 00 00 00 F0 3F"
    // Struct entry {key:"a", value: Value}: 0A 01 61 12 09 <value>
    val entry = s"0A 01 61 12 09 $value"
    // Struct{fields(1): entry}: 0A 0E <entry(14)>
    val struct = s"0A 0E $entry"
    // Vertex{gid:"1", label:"L", data: Struct(16)}
    val vertex = s"0A 01 31 12 01 4C 1A 10 $struct"
    // QueryResult{vertex(1): Vertex(24)}
    val gold = hex(s"0A 18 $vertex")

    val decoded = Pbuf.decode(reg, "QueryResult", gold)
    // integral double decodes to JSON integer (protojson prints 1 not 1.0)
    assertJson(decoded, json("""{"vertex":{"gid":"1","label":"L","data":{"a":1}}}"""))
    assert(Pbuf.encode(reg, "QueryResult", decoded).sameElements(gold))
  }

  test("Selections map golden") {
    // Vertex{gid:"1", label:"L"}: 0A 01 31 12 01 4C (6 bytes)
    val vertex = "0A 01 31 12 01 4C"
    // Selection{vertex(1)}: 0A 06 <vertex>
    val selection = s"0A 06 $vertex"
    // map entry {key(1):"x", value(2): Selection(8)}: 0A 01 78 12 08 <selection>
    val entry = s"0A 01 78 12 08 $selection"
    // Selections{selections(1): entry(13)}: 0A 0D <entry>
    val selections = s"0A 0D $entry"
    // QueryResult{selections(4): Selections(15)}: 22 0F
    val gold = hex(s"22 0F $selections")

    val decoded = Pbuf.decode(reg, "QueryResult", gold)
    assertJson(decoded, json(
      """{"selections":{"selections":{"x":{"vertex":{"gid":"1","label":"L"}}}}}"""))
    assert(Pbuf.encode(reg, "QueryResult", decoded).sameElements(gold))
  }

  test("packed percents golden (PercentileAggregation)") {
    // field(2) "age"; percents(3) packed [25.0, 75.0]
    val gold = hex(
      "12 03 61 67 65 " +
        "1A 10 00 00 00 00 00 00 39 40 00 00 00 00 00 C0 52 40")
    val decoded = Pbuf.decode(reg, "PercentileAggregation", gold)
    assertJson(decoded, json("""{"field":"age","percents":[25,75]}"""))
    assert(Pbuf.encode(reg, "PercentileAggregation", decoded).sameElements(gold))
  }

  test("oneof last-wins: GraphStatement with two members keeps the last") {
    // v(1): empty ListValue, then out(11): empty ListValue
    val bytes = hex("0A 00 5A 00")
    val decoded = Pbuf.decode(reg, "GraphStatement", bytes)
    assertJson(decoded, json("""{"out":[]}"""))
    assert(!decoded.has("v"))
  }

  test("uint64 count past Long.MaxValue decodes to unsigned string and re-encodes") {
    // JobStatus{count(4): 2^64-1}: tag 20, ten-byte varint
    val gold = hex("20 FF FF FF FF FF FF FF FF FF 01")
    val decoded = Pbuf.decode(reg, "JobStatus", gold)
    assert(decoded.get("count").asText() == "18446744073709551615")
    assert(Pbuf.encode(reg, "JobStatus", decoded).sameElements(gold))
  }

  test("truncated nested message raises instead of reading sibling bytes") {
    val value = "1A 06 50 65 72 73 6F 6E"
    val stmt = s"FA 01 0A 0A 08 $value"
    val gold = hex(s"0A 04 74 65 73 74 12 0D $stmt")
    // cut the final byte: the innermost string now overruns its slice
    val truncated = gold.dropRight(1)
    intercept[IllegalArgumentException](Pbuf.decode(reg, "GraphQuery", truncated))
  }

  test("hostile skip length terminates with an error (no infinite loop)") {
    // unknown field 99 wire type 2 with length 2^63 (negative as Long.toInt)
    val hostile = hex("9A 31 80 80 80 80 80 80 80 80 80 01")
    intercept[IllegalArgumentException](Pbuf.decode(reg, "GraphQuery", hostile))
    // and a merely-overlong length must also raise, not read past end
    val overlong = hex("9A 31 7F 00")
    intercept[IllegalArgumentException](Pbuf.decode(reg, "GraphQuery", overlong))
  }

  test("truncated varint raises") {
    intercept[IllegalArgumentException](Pbuf.decode(reg, "QueryResult", hex("30 80")))
  }

  test("query JSON → bytes → JSON round-trip over a representative traversal") {
    val q = json(
      """{"graph":"g","query":[
        |{"v":["1","2"]},
        |{"has":{"and":{"expressions":[
        |  {"condition":{"key":"age","value":30,"condition":"GT"}},
        |  {"not":{"condition":{"key":"name","value":"x","condition":"EQ"}}}]}}},
        |{"as":"a"},
        |{"out":["knows"]},
        |{"aggregate":{"aggregations":[
        |  {"name":"t","term":{"field":"name","size":10}},
        |  {"name":"p","percentile":{"field":"age","percents":[25,50,75]}}]}}
        |]}""".stripMargin)
    val bytes = Pbuf.encode(reg, "GraphQuery", q)
    val back = Pbuf.decode(reg, "GraphQuery", bytes)
    assertJson(back, q)
    // canonical encode is deterministic
    assert(Pbuf.encode(reg, "GraphQuery", back).sameElements(bytes))
  }

  test("render Value round-trip: nested struct/list/null/bool") {
    val q = json(
      """{"render":{"a":[1,2.5,"s",true,null],"b":{"c":{}}}}""")
    val bytes = Pbuf.encode(reg, "QueryResult", q)
    assertJson(Pbuf.decode(reg, "QueryResult", bytes), q)
  }
}
