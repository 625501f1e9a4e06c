package graft.server

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Minimal schema-driven protobuf (proto3) wire codec: binary message ↔
  * Jackson JSON tree, driven by hand-authored message tables (see
  * [[GripqlProto]] for the gripql set, mirrored from
  * /root/reference/gripql/gripql.proto). Only the encoding spec's public
  * wire format is implemented — varints, 64-bit fixed, length-delimited —
  * which is all the gripql surface uses (no sint/sfixed/groups).
  *
  * JSON mapping matches protojson with `preserving_proto_field_name`
  * (snake_case keys — the dialect [[graft.gripql.Json]] parses):
  * `google.protobuf.Value`/`Struct`/`ListValue` map to raw JSON, enums to
  * their name strings, maps to JSON objects, oneofs to at most one present
  * key. Integral doubles decode to JSON integers so downstream numeric
  * handling matches the reference's protojson output.
  */
object Pbuf {
  sealed trait PType
  case object TString extends PType
  case object TBool extends PType
  case object TDouble extends PType
  /** int32/int64: signed varint (sign-extended 64-bit on the wire). */
  case object TInt extends PType
  /** uint32/uint64: plain varint. */
  case object TUInt extends PType
  final case class TEnum(names: Vector[String]) extends PType
  /** Nested message, by registry name (lazy so schemas can be recursive). */
  final case class TMsg(name: String) extends PType
  case object TValue extends PType
  case object TStruct extends PType
  case object TListValue extends PType
  /** map<string, V> — entry messages {1: key, 2: value}. */
  final case class TMap(value: PType) extends PType

  final case class FieldDef(num: Int, name: String, tpe: PType, repeated: Boolean = false)
  /** `oneof` names the message's oneof group members (gripql messages have
    * at most one group): proto3 wire semantics are last-member-wins, so
    * decode drops earlier siblings when a later member appears. Attach a
    * group with a second application: `MsgDef("M", f1, f2)(Set("f1","f2"))`. */
  final class MsgDef(val name: String, val fields: Seq[FieldDef], val oneof: Set[String]) {
    val byNum: Map[Int, FieldDef] = fields.map(f => f.num -> f).toMap
    val byName: Map[String, FieldDef] = fields.map(f => f.name -> f).toMap
    def apply(oneofNames: Set[String]): MsgDef = new MsgDef(name, fields, oneofNames)
  }
  object MsgDef {
    def apply(name: String, fields: FieldDef*): MsgDef = new MsgDef(name, fields, Set.empty)
  }

  type Registry = Map[String, MsgDef]
  private val nf = JsonNodeFactory.instance

  // ---- wire primitives ----------------------------------------------------

  /** Every read is bounds-checked against `end` (not the backing array), so
    * a truncated nested field raises instead of silently reading sibling
    * bytes from the parent buffer, and crafted lengths can't move `pos`
    * backwards — decode of untrusted client bytes always terminates. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        require(pos < end, "varint overruns buffer")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed64(): Long = {
      require(pos + 8 <= end, "fixed64 overruns buffer")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "fixed32 overruns buffer")
      var v = 0
      var i = 0
      while (i < 4) { v |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    private def delimLen(): Int = {
      val raw = varint()
      require(raw >= 0 && raw <= (end - pos).toLong,
        "length-delimited field overruns buffer")
      raw.toInt
    }
    def slice(): Reader = {
      val len = delimLen()
      val r = new Reader(buf, pos, pos + len); pos += len; r
    }
    def utf8(): String = {
      val r = slice()
      new String(buf, r.pos, r.end - r.pos, UTF_8)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => require(pos + 8 <= end, "skip overruns buffer"); pos += 8
      case 2 => pos += delimLen()
      case 5 => require(pos + 4 <= end, "skip overruns buffer"); pos += 4
      case wt => throw new IllegalArgumentException(s"unsupported wire type $wt")
    }
  }

  private final class Writer {
    val out = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(num: Int, wt: Int): Unit = varint((num.toLong << 3) | wt)
    def fixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def bytes(b: Array[Byte]): Unit = { varint(b.length); out.write(b) }
    def str(s: String): Unit = bytes(s.getBytes(UTF_8))
  }

  // ---- decode -------------------------------------------------------------

  def decode(reg: Registry, msg: String, bytes: Array[Byte]): ObjectNode =
    decodeMsg(reg, reg(msg), new Reader(bytes, 0, bytes.length))

  private def decodeMsg(reg: Registry, m: MsgDef, r: Reader): ObjectNode = {
    val o = nf.objectNode()
    while (r.hasMore) {
      val key = r.varint()
      val num = (key >>> 3).toInt
      val wt = (key & 7).toInt
      m.byNum.get(num) match {
        case None => r.skip(wt)
        case Some(f) =>
          if (f.repeated) {
            val arr = o.get(f.name) match {
              case a: ArrayNode => a
              case _ => val a = nf.arrayNode(); o.set[ObjectNode](f.name, a); a
            }
            f.tpe match {
              // packed numeric (proto3 default): one length-delimited blob
              case TDouble if wt == 2 =>
                val s = r.slice()
                while (s.hasMore) arr.add(numNode(java.lang.Double.longBitsToDouble(s.fixed64())))
              case (TInt | TUInt) if wt == 2 =>
                val s = r.slice()
                while (s.hasMore) arr.add(s.varint())
              case t => arr.add(decodeField(reg, t, wt, r))
            }
          } else if (f.tpe.isInstanceOf[TMap]) {
            val TMap(vt) = f.tpe: @unchecked
            val entry = r.slice()
            var k = ""
            var v: JsonNode = nf.nullNode()
            while (entry.hasMore) {
              val ek = entry.varint()
              ((ek >>> 3).toInt: @unchecked) match {
                case 1 => k = entry.utf8()
                case 2 => v = decodeField(reg, vt, (ek & 7).toInt, entry)
                case _ => entry.skip((ek & 7).toInt)
              }
            }
            val mapNode = o.get(f.name) match {
              case m: ObjectNode => m
              case _ => val m = nf.objectNode(); o.set[ObjectNode](f.name, m); m
            }
            mapNode.set[ObjectNode](k, v)
          } else {
            // oneof: last member seen on the wire wins (proto3) — drop any
            // previously-decoded sibling so the JSON stays a one-key oneof
            if (m.oneof.contains(f.name))
              m.oneof.foreach(sib => if (sib != f.name) o.remove(sib))
            o.set[ObjectNode](f.name, decodeField(reg, f.tpe, wt, r))
          }
      }
    }
    o
  }

  private def decodeField(reg: Registry, t: PType, wt: Int, r: Reader): JsonNode = t match {
    case TString => nf.textNode(r.utf8())
    case TBool => nf.booleanNode(r.varint() != 0)
    case TDouble => numNode(java.lang.Double.longBitsToDouble(r.fixed64()))
    case TInt => nf.numberNode(r.varint())
    case TUInt =>
      // uint32/uint64 share TUInt; a value with bit 63 set is a uint64 past
      // Long.MaxValue — protojson represents 64-bit ints as strings, so emit
      // the unsigned decimal string rather than a negative number
      val v = r.varint()
      if (v >= 0) nf.numberNode(v) else nf.textNode(java.lang.Long.toUnsignedString(v))
    case TEnum(names) =>
      val i = r.varint().toInt
      if (i >= 0 && i < names.length) nf.textNode(names(i)) else nf.numberNode(i)
    case TMsg(name) => decodeMsg(reg, reg(name), r.slice())
    case TValue => decodeValue(r.slice())
    case TStruct => decodeStruct(r.slice())
    case TListValue => decodeListValue(r.slice())
    case TMap(_) => throw new IllegalArgumentException("map decoded at entry level")
  }

  /** Integral doubles come back as JSON integers (protojson prints 5 not
    * 5.0), so gripql numeric round-trips keep their type. */
  private def numNode(d: Double): JsonNode =
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < (1L << 53).toDouble)
      nf.numberNode(d.toLong)
    else nf.numberNode(d)

  // google.protobuf.Value — oneof {1 null, 2 number, 3 string, 4 bool,
  // 5 struct, 6 list}
  private def decodeValue(r: Reader): JsonNode = {
    var out: JsonNode = nf.nullNode()
    while (r.hasMore) {
      val key = r.varint()
      ((key >>> 3).toInt: @unchecked) match {
        case 1 => r.varint(); out = nf.nullNode()
        case 2 => out = numNode(java.lang.Double.longBitsToDouble(r.fixed64()))
        case 3 => out = nf.textNode(r.utf8())
        case 4 => out = nf.booleanNode(r.varint() != 0)
        case 5 => out = decodeStruct(r.slice())
        case 6 => out = decodeListValue(r.slice())
        case _ => r.skip((key & 7).toInt)
      }
    }
    out
  }

  // google.protobuf.Struct — {1: repeated map entry {1 key, 2 Value}}
  private def decodeStruct(r: Reader): ObjectNode = {
    val o = nf.objectNode()
    while (r.hasMore) {
      val key = r.varint()
      if ((key >>> 3).toInt == 1 && (key & 7).toInt == 2) {
        val entry = r.slice()
        var k = ""
        var v: JsonNode = nf.nullNode()
        while (entry.hasMore) {
          val ek = entry.varint()
          ((ek >>> 3).toInt: @unchecked) match {
            case 1 => k = entry.utf8()
            case 2 => v = decodeValue(entry.slice())
            case _ => entry.skip((ek & 7).toInt)
          }
        }
        o.set[ObjectNode](k, v)
      } else r.skip((key & 7).toInt)
    }
    o
  }

  // google.protobuf.ListValue — {1: repeated Value}
  private def decodeListValue(r: Reader): ArrayNode = {
    val a = nf.arrayNode()
    while (r.hasMore) {
      val key = r.varint()
      if ((key >>> 3).toInt == 1 && (key & 7).toInt == 2) a.add(decodeValue(r.slice()))
      else r.skip((key & 7).toInt)
    }
    a
  }

  // ---- encode -------------------------------------------------------------

  def encode(reg: Registry, msg: String, node: JsonNode): Array[Byte] = {
    val w = new Writer
    encodeMsg(reg, reg(msg), node, w)
    w.out.toByteArray
  }

  private def encodeMsg(reg: Registry, m: MsgDef, node: JsonNode, w: Writer): Unit = {
    if (node == null || node.isNull) return
    require(node.isObject, s"${m.name} body must be a JSON object, got: $node")
    // iterate the schema (not the JSON) so unknown JSON keys are ignored
    // and field order is canonical
    m.fields.foreach { f =>
      val v = node.get(f.name)
      if (v != null && !v.isNull) encodeField(reg, f, v, w)
      // proto3 oneof members need explicit presence even at zero value, and
      // protojson `null` for a Value field means NullValue — encode it
      else if (v != null && v.isNull && f.tpe == TValue) encodeField(reg, f, v, w)
    }
  }

  private def encodeField(reg: Registry, f: FieldDef, v: JsonNode, w: Writer): Unit = {
    if (f.repeated) {
      require(v.isArray, s"${f.name} must be a JSON array")
      f.tpe match {
        case TDouble => // packed, proto3 default
          w.tag(f.num, 2)
          val inner = new Writer
          v.elements().asScala.foreach(e => inner.fixed64(java.lang.Double.doubleToLongBits(e.asDouble())))
          w.bytes(inner.out.toByteArray)
        case TInt | TUInt =>
          w.tag(f.num, 2)
          val inner = new Writer
          v.elements().asScala.foreach(e => inner.varint(longOf(e)))
          w.bytes(inner.out.toByteArray)
        case t => v.elements().asScala.foreach(e => encodeSingle(reg, f.num, t, e, w))
      }
    } else f.tpe match {
      case TMap(vt) =>
        require(v.isObject, s"${f.name} must be a JSON object")
        v.properties().asScala.foreach { e =>
          val entry = new Writer
          entry.tag(1, 2); entry.str(e.getKey)
          encodeSingle(reg, 2, vt, e.getValue, entry)
          w.tag(f.num, 2); w.bytes(entry.out.toByteArray)
        }
      case t => encodeSingle(reg, f.num, t, v, w)
    }
  }

  private def encodeSingle(reg: Registry, num: Int, t: PType, v: JsonNode, w: Writer): Unit = t match {
    case TString => w.tag(num, 2); w.str(v.asText())
    case TBool => w.tag(num, 0); w.varint(if (v.asBoolean()) 1 else 0)
    case TDouble => w.tag(num, 1); w.fixed64(java.lang.Double.doubleToLongBits(v.asDouble()))
    case TInt => w.tag(num, 0); w.varint(longOf(v))
    case TUInt => w.tag(num, 0); w.varint(longOf(v))
    case TEnum(names) =>
      val i = if (v.isTextual) names.indexOf(v.asText()) else v.asInt()
      require(i >= 0, s"unknown enum value ${v.asText()} (expected one of ${names.mkString(",")})")
      w.tag(num, 0); w.varint(i)
    case TMsg(name) =>
      val inner = new Writer
      encodeMsg(reg, reg(name), v, inner)
      w.tag(num, 2); w.bytes(inner.out.toByteArray)
    case TValue =>
      val inner = new Writer
      encodeValue(v, inner)
      w.tag(num, 2); w.bytes(inner.out.toByteArray)
    case TStruct =>
      val inner = new Writer
      encodeStruct(v, inner)
      w.tag(num, 2); w.bytes(inner.out.toByteArray)
    case TListValue =>
      val inner = new Writer
      encodeListValue(v, inner)
      w.tag(num, 2); w.bytes(inner.out.toByteArray)
    case TMap(_) => throw new IllegalArgumentException("map encoded at field level")
  }

  /** Integral JSON value as a Long; accepts the unsigned-decimal-string
    * form protojson uses for 64-bit integers (round-trips uint64 > 2^63). */
  private def longOf(v: JsonNode): Long =
    if (v.isTextual) {
      val s = v.asText()
      try java.lang.Long.parseLong(s)
      catch { case _: NumberFormatException => java.lang.Long.parseUnsignedLong(s) }
    } else v.asLong()

  private def encodeValue(v: JsonNode, w: Writer): Unit =
    if (v == null || v.isNull) { w.tag(1, 0); w.varint(0) }
    else if (v.isNumber) { w.tag(2, 1); w.fixed64(java.lang.Double.doubleToLongBits(v.asDouble())) }
    else if (v.isTextual) { w.tag(3, 2); w.str(v.asText()) }
    else if (v.isBoolean) { w.tag(4, 0); w.varint(if (v.asBoolean()) 1 else 0) }
    else if (v.isObject) {
      val inner = new Writer
      encodeStruct(v, inner)
      w.tag(5, 2); w.bytes(inner.out.toByteArray)
    } else if (v.isArray) {
      val inner = new Writer
      encodeListValue(v, inner)
      w.tag(6, 2); w.bytes(inner.out.toByteArray)
    } else throw new IllegalArgumentException(s"unencodable Value: $v")

  private def encodeStruct(v: JsonNode, w: Writer): Unit =
    v.properties().asScala.foreach { e =>
      val entry = new Writer
      entry.tag(1, 2); entry.str(e.getKey)
      val vw = new Writer
      encodeValue(e.getValue, vw)
      entry.tag(2, 2); entry.bytes(vw.out.toByteArray)
      w.tag(1, 2); w.bytes(entry.out.toByteArray)
    }

  private def encodeListValue(v: JsonNode, w: Writer): Unit =
    v.elements().asScala.foreach { e =>
      val vw = new Writer
      encodeValue(e, vw)
      w.tag(1, 2); w.bytes(vw.out.toByteArray)
    }
}
