package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IPADDRESS type emulation (reference: core/trino-spi/.../type/IpAddressType
  * — a 16-byte value rendering v4-mapped addresses in dotted form — and
  * operator/scalar/IpAddressFunctions.java:40 `contains(network, address)`).
  *
  * The reference stores every address as 16 bytes (v4 becomes the v4-mapped
  * ::ffff:a.b.c.d block) and canonicalizes on render exactly as
  * InetAddress/RFC 5952 do: lowercase hex, longest zero run compressed
  * (first on ties, never a single group), v4-mapped rendered dotted. These
  * expressions reproduce that: ToIpAddress ≈ CAST(varchar AS IPADDRESS),
  * IpAddressFormat ≈ CAST(IPADDRESS AS varchar), IpContains ≈ contains().
  */
object IpCodec {
  /** Parse dotted v4 or RFC-4291 v6 (with ::, embedded v4 tail) → 16 bytes;
    * null for malformed input (the engine's TRY-friendly lax form of the
    * reference's INVALID_FUNCTION_ARGUMENT error). */
  def parse(s: String): Array[Byte] = {
    val str = s.trim
    if (str.isEmpty) return null
    if (!str.contains(':')) return parseV4Mapped(str)
    // IPv6: split on "::" (at most one)
    val parts = str.split("::", -1)
    if (parts.length > 2) return null
    def groups(part: String): Array[String] =
      if (part.isEmpty) Array.empty else part.split(":", -1)
    val head = groups(parts(0))
    val tail = if (parts.length == 2) groups(parts(1)) else Array.empty[String]
    // RFC 4291 §2.2: a dotted quad may appear only as the TERMINAL 32 bits
    // (the reference's InetAddresses-based cast rejects '1.2.3.4::' and
    // '::1.2.3.4:ffff' as malformed)
    def dottedMisplaced(gs: Array[String], terminalAllowed: Boolean): Boolean =
      gs.zipWithIndex.exists { case (g, i) =>
        g.contains('.') && !(terminalAllowed && i == gs.length - 1)
      }
    if (dottedMisplaced(head, terminalAllowed = parts.length == 1) ||
        dottedMisplaced(tail, terminalAllowed = true)) return null
    // an embedded dotted-v4 tail counts as two groups
    def expand(gs: Array[String]): Array[Int] = {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      for (g <- gs) {
        if (g.contains('.')) {
          val b = parseV4Mapped(g)
          if (b == null) return null
          out += ((b(12) & 0xff) << 8 | (b(13) & 0xff))
          out += ((b(14) & 0xff) << 8 | (b(15) & 0xff))
        } else {
          if (g.isEmpty || g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0)) return null
          out += Integer.parseInt(g, 16)
        }
      }
      out.toArray
    }
    val h = expand(head); if (h == null) return null
    val t = expand(tail); if (t == null) return null
    val total = h.length + t.length
    if (parts.length == 2) { if (total > 7 && !(total == 8 && h.isEmpty && t.isEmpty)) return null }
    else if (total != 8) return null
    val gs = h ++ Array.fill(8 - total)(0) ++ t
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = ((gs(i) >> 8) & 0xff).toByte
      out(2 * i + 1) = (gs(i) & 0xff).toByte
      i += 1
    }
    out
  }

  private def parseV4Mapped(s: String): Array[Byte] = {
    val ps = s.split("\\.", -1)
    if (ps.length != 4) return null
    val out = new Array[Byte](16)
    out(10) = 0xff.toByte; out(11) = 0xff.toByte
    var i = 0
    while (i < 4) {
      val p = ps(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
      val v = p.toInt
      if (v > 255 || (p.length > 1 && p.head == '0')) return null
      out(12 + i) = v.toByte
      i += 1
    }
    out
  }

  def isV4Mapped(b: Array[Byte]): Boolean =
    (0 until 10).forall(i => b(i) == 0) && b(10) == 0xff.toByte && b(11) == 0xff.toByte

  /** RFC 5952 canonical text (dotted form for v4-mapped, like the reference
    * type's render through Inet4Address). */
  def format(b: Array[Byte]): String = {
    if (b == null || b.length != 16) return null
    if (isV4Mapped(b))
      return s"${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    val gs = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    // longest zero run (first on ties); only runs of length >= 2 compress
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (gs(i) == 0) {
        var j = i
        while (j < 8 && gs(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    val sb = new StringBuilder
    if (bestLen >= 2) {
      for (k <- 0 until bestStart) { if (k > 0) sb += ':'; sb ++= Integer.toHexString(gs(k)) }
      sb ++= "::"
      for (k <- (bestStart + bestLen) until 8) {
        if (k > bestStart + bestLen) sb += ':'
        sb ++= Integer.toHexString(gs(k))
      }
    } else {
      for (k <- 0 until 8) { if (k > 0) sb += ':'; sb ++= Integer.toHexString(gs(k)) }
    }
    sb.toString
  }

  /** contains('net/prefix', addrBytes): prefix over the 16-byte form; a
    * dotted v4 network means a v4 prefix (offset 96 in the mapped layout),
    * matching the reference's family handling. */
  def contains(network: String, addr: Array[Byte]): java.lang.Boolean = {
    val slash = network.lastIndexOf('/')
    if (slash < 0) return null
    val netBytes = parse(network.substring(0, slash))
    if (netBytes == null || addr == null) return null
    val declared = try network.substring(slash + 1).toInt catch { case _: Exception => return null }
    // Family by VALUE, not by spelling: the reference (Guava InetAddresses)
    // normalizes a v4-mapped address written in v6 notation
    // ('::ffff:10.0.0.0') to Inet4Address, so its /prefix is a v4 prefix.
    val v4 = isV4Mapped(netBytes)
    if (declared < 0 || declared > (if (v4) 32 else 128)) return null
    // v4 networks can only contain v4-mapped addresses (and vice versa)
    if (v4 != isV4Mapped(addr)) return false
    val bits = if (v4) declared + 96 else declared
    var i = 0
    var remaining = bits
    while (remaining >= 8) {
      if (netBytes(i) != addr(i)) return false
      i += 1; remaining -= 8
    }
    if (remaining == 0) true
    else {
      val mask = (0xff00 >> remaining) & 0xff
      ((netBytes(i) & mask) == (addr(i) & mask))
    }
  }
}

/** CAST(varchar AS IPADDRESS): canonical 16-byte encoding, null on malformed. */
case class ToIpAddress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  // returns null for malformed input even when the child is non-null, so
  // both nullability facts the optimizer uses must be overridden (nullable
  // would otherwise inherit a non-nullable literal child's false)
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any = {
    val b = IpCodec.parse(input.asInstanceOf[UTF8String].toString)
    if (b == null) null else b
  }
  override protected def withNewChildInternal(c: Expression): ToIpAddress = copy(child = c)
}

/** CAST(IPADDRESS AS varchar): RFC 5952 canonical render. */
case class IpAddressFormat(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val s = IpCodec.format(input.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): IpAddressFormat = copy(child = c)
}

/** contains(network_cidr, ipaddress) — IpAddressFunctions.java:40. */
case class IpContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def nullSafeEval(net: Any, addr: Any): Any =
    IpCodec.contains(net.asInstanceOf[UTF8String].toString, addr.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IpContains =
    copy(left = l, right = r)
}
