package graft.catalog

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

/** Apache Thrift TBinaryProtocol codec, strict framing (the wire format
  * the Hive metastore speaks; reference:
  * plugin/trino-hive/.../metastore/thrift/ThriftHiveMetastore.java drives
  * exactly this protocol through the generated client). Implemented from
  * the public Thrift binary-protocol specification: strict message header
  * `0x8001 | version(1) | type` i32, method name string, seqid i32; struct
  * fields as (type byte, id i16, value), terminated by STOP; lists as
  * (elem-type byte, size i32, elems); maps as (ktype, vtype, size, pairs);
  * strings length-prefixed UTF-8. */
object ThriftProtocol {

  // thrift type ids (public spec)
  val STOP = 0: Byte
  val BOOL = 2: Byte
  val BYTE = 3: Byte
  val DOUBLE = 4: Byte
  val I16 = 6: Byte
  val I32 = 8: Byte
  val I64 = 10: Byte
  val STRING = 11: Byte
  val STRUCT = 12: Byte
  val MAP = 13: Byte
  val SET = 14: Byte
  val LIST = 15: Byte

  // message types
  val CALL = 1
  val REPLY = 2
  val EXCEPTION = 3

  private val VersionMask = 0xffff0000
  private val Version1 = 0x80010000

  final class Writer(out: DataOutputStream) {
    def messageBegin(name: String, msgType: Int, seqid: Int): Unit = {
      out.writeInt(Version1 | msgType)
      string(name)
      out.writeInt(seqid)
    }
    def fieldBegin(tpe: Byte, id: Int): Unit = { out.writeByte(tpe); out.writeShort(id) }
    def stop(): Unit = out.writeByte(STOP)
    def string(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    def bool(b: Boolean): Unit = out.writeByte(if (b) 1 else 0)
    /** thrift `binary` shares STRING's wire shape: i32 length + raw bytes. */
    def binary(b: Array[Byte]): Unit = { out.writeInt(b.length); out.write(b) }
    def i16(v: Int): Unit = out.writeShort(v)
    def i32(v: Int): Unit = out.writeInt(v)
    def i64(v: Long): Unit = out.writeLong(v)
    def double(v: Double): Unit = out.writeDouble(v)
    def listBegin(elemType: Byte, size: Int): Unit = { out.writeByte(elemType); out.writeInt(size) }
    def mapBegin(kType: Byte, vType: Byte, size: Int): Unit = {
      out.writeByte(kType); out.writeByte(vType); out.writeInt(size)
    }
    def stringField(id: Int, s: String): Unit = { fieldBegin(STRING, id); string(s) }
    def i32Field(id: Int, v: Int): Unit = { fieldBegin(I32, id); i32(v) }
    def boolField(id: Int, v: Boolean): Unit = { fieldBegin(BOOL, id); bool(v) }
    def stringListField(id: Int, items: Seq[String]): Unit = {
      fieldBegin(LIST, id); listBegin(STRING, items.size); items.foreach(string)
    }
    def emptyMapField(id: Int): Unit = { fieldBegin(MAP, id); mapBegin(STRING, STRING, 0) }
    def flush(): Unit = out.flush()
  }

  final class Reader(in: DataInputStream) {
    /** Read a strict message header → (name, messageType, seqid). */
    def messageBegin(): (String, Int, Int) = {
      val first = in.readInt()
      require((first & VersionMask) == Version1,
        f"thrift: not a strict binary-protocol message (0x$first%08x); " +
          "old-style unframed clients are not supported")
      (string(), first & 0xff, in.readInt())
    }
    def fieldBegin(): (Byte, Int) = {
      val t = in.readByte()
      if (t == STOP) (STOP, 0) else (t, in.readShort().toInt)
    }
    def string(): String = {
      val len = in.readInt()
      require(len >= 0 && len < (1 << 26), s"thrift string length $len out of range")
      val b = new Array[Byte](len); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    }
    /** thrift `binary` shares STRING's wire shape: i32 length + raw bytes. */
    def binary(): Array[Byte] = {
      val len = in.readInt()
      require(len >= 0 && len < (1 << 26), s"thrift binary length $len out of range")
      val b = new Array[Byte](len); in.readFully(b)
      b
    }
    def bool(): Boolean = in.readByte() != 0
    def i16(): Int = in.readShort().toInt
    def i32(): Int = in.readInt()
    def i64(): Long = in.readLong()
    def double(): Double = in.readDouble()
    def listBegin(): (Byte, Int) = (in.readByte(), in.readInt())
    def mapBegin(): (Byte, Byte, Int) = (in.readByte(), in.readByte(), in.readInt())

    /** Skip one value of `tpe` (forward compatibility: unknown fields). */
    def skip(tpe: Byte): Unit = tpe match {
      case BOOL | BYTE => in.readByte()
      case DOUBLE => in.readDouble()
      case I16 => in.readShort()
      case I32 => in.readInt()
      case I64 => in.readLong()
      case STRING => string()
      case STRUCT =>
        var t = in.readByte()
        while (t != STOP) { in.readShort(); skip(t); t = in.readByte() }
      case MAP =>
        val (kt, vt, n) = mapBegin()
        (0 until n).foreach { _ => skip(kt); skip(vt) }
      case LIST | SET =>
        val (et, n) = listBegin()
        (0 until n).foreach(_ => skip(et))
      case other => throw new IllegalArgumentException(
        s"thrift: cannot skip unknown type $other")
    }

    /** Iterate a struct's fields, calling `f(type, id)`; `f` must consume
      * the value (or call skip). */
    def readStruct(f: (Byte, Int) => Unit): Unit = {
      var (t, id) = fieldBegin()
      while (t != STOP) {
        f(t, id)
        val next = fieldBegin(); t = next._1; id = next._2
      }
    }
    def stringList(): Seq[String] = {
      val (et, n) = listBegin()
      require(et == STRING, s"expected list<string>, got elem type $et")
      (0 until n).map(_ => string())
    }
  }
}
