package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** SpookyHash V2 (Bob Jenkins, public domain — burtleburtle.net/bob/hash/spooky.html),
  * the reference's spooky_hash_v2_32 / spooky_hash_v2_64
  * (reference: core/trino-main/src/main/java/io/trino/operator/scalar/VarbinaryFunctions.java:344,
  * delegating to airlift SpookyHashV2 with seed 0; result packed big-endian).
  * Verified against the reference's own test vectors
  * (TestVarbinaryFunctions.java:782): ''→232706FC6BF50919, 'hello'→3768826AD382E6CA.
  *
  * Inputs shorter than 192 bytes take the "short" path; longer inputs run the
  * 12-lane 96-byte-block mix. All reads are little-endian.
  */
object SpookyHash {
  private final val SC_CONST = 0xdeadbeefdeadbeefL

  private def rot(x: Long, k: Int): Long = java.lang.Long.rotateLeft(x, k)

  /** Little-endian long at off, reading up to 8 available bytes (zero-padded). */
  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }
  private def leInt(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def hash64(data: Array[Byte]): Long = hash128(data)._1
  def hash32(data: Array[Byte]): Int = hash64(data).toInt

  def hash128(data: Array[Byte], seed1: Long = 0L, seed2: Long = 0L): (Long, Long) =
    if (data.length < 192) shortHash(data, seed1, seed2)
    else longHash(data, seed1, seed2)

  // --------------------------------------------------------------- short

  private def shortMix(s: Array[Long]): Unit = {
    // s = [a, b, c, d]
    s(2) = rot(s(2), 50); s(2) += s(3); s(0) ^= s(2)
    s(3) = rot(s(3), 52); s(3) += s(0); s(1) ^= s(3)
    s(0) = rot(s(0), 30); s(0) += s(1); s(2) ^= s(0)
    s(1) = rot(s(1), 41); s(1) += s(2); s(3) ^= s(1)
    s(2) = rot(s(2), 54); s(2) += s(3); s(0) ^= s(2)
    s(3) = rot(s(3), 48); s(3) += s(0); s(1) ^= s(3)
    s(0) = rot(s(0), 38); s(0) += s(1); s(2) ^= s(0)
    s(1) = rot(s(1), 37); s(1) += s(2); s(3) ^= s(1)
    s(2) = rot(s(2), 62); s(2) += s(3); s(0) ^= s(2)
    s(3) = rot(s(3), 34); s(3) += s(0); s(1) ^= s(3)
    s(0) = rot(s(0), 5);  s(0) += s(1); s(2) ^= s(0)
    s(1) = rot(s(1), 36); s(1) += s(2); s(3) ^= s(1)
  }

  private def shortEnd(s: Array[Long]): Unit = {
    s(3) ^= s(2); s(2) = rot(s(2), 15); s(3) += s(2)
    s(0) ^= s(3); s(3) = rot(s(3), 52); s(0) += s(3)
    s(1) ^= s(0); s(0) = rot(s(0), 26); s(1) += s(0)
    s(2) ^= s(1); s(1) = rot(s(1), 51); s(2) += s(1)
    s(3) ^= s(2); s(2) = rot(s(2), 28); s(3) += s(2)
    s(0) ^= s(3); s(3) = rot(s(3), 9);  s(0) += s(3)
    s(1) ^= s(0); s(0) = rot(s(0), 47); s(1) += s(0)
    s(2) ^= s(1); s(1) = rot(s(1), 54); s(2) += s(1)
    s(3) ^= s(2); s(2) = rot(s(2), 32); s(3) += s(2)
    s(0) ^= s(3); s(3) = rot(s(3), 25); s(0) += s(3)
    s(1) ^= s(0); s(0) = rot(s(0), 63); s(1) += s(0)
  }

  private def shortHash(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val length = data.length
    var remainder = length % 32
    val s = Array(seed1, seed2, SC_CONST, SC_CONST)
    var off = 0
    if (length > 15) {
      val blocks = length / 32
      var i = 0
      while (i < blocks) {
        s(2) += leLong(data, off); s(3) += leLong(data, off + 8)
        shortMix(s)
        s(0) += leLong(data, off + 16); s(1) += leLong(data, off + 24)
        off += 32; i += 1
      }
      if (remainder >= 16) {
        s(2) += leLong(data, off); s(3) += leLong(data, off + 8)
        shortMix(s)
        off += 16; remainder -= 16
      }
    }
    s(3) += length.toLong << 56
    // fall-through remainder ladder (spooky.cpp SpookyHash::Short)
    if (remainder >= 15) s(3) += (data(off + 14) & 0xffL) << 48
    if (remainder >= 14) s(3) += (data(off + 13) & 0xffL) << 40
    if (remainder >= 13) s(3) += (data(off + 12) & 0xffL) << 32
    if (remainder >= 12) { s(3) += leInt(data, off + 8); s(2) += leLong(data, off) }
    else {
      if (remainder >= 11) s(3) += (data(off + 10) & 0xffL) << 16
      if (remainder >= 10) s(3) += (data(off + 9) & 0xffL) << 8
      if (remainder >= 9) s(3) += data(off + 8) & 0xffL
      if (remainder >= 8) s(2) += leLong(data, off)
      else {
        if (remainder >= 7) s(2) += (data(off + 6) & 0xffL) << 48
        if (remainder >= 6) s(2) += (data(off + 5) & 0xffL) << 40
        if (remainder >= 5) s(2) += (data(off + 4) & 0xffL) << 32
        if (remainder >= 4) s(2) += leInt(data, off)
        else {
          if (remainder >= 3) s(2) += (data(off + 2) & 0xffL) << 16
          if (remainder >= 2) s(2) += (data(off + 1) & 0xffL) << 8
          if (remainder >= 1) s(2) += data(off) & 0xffL
          else if (remainder == 0 && length <= 15) { s(2) += SC_CONST; s(3) += SC_CONST }
        }
      }
    }
    if (remainder == 0 && length > 15) { s(2) += SC_CONST; s(3) += SC_CONST }
    shortEnd(s)
    (s(0), s(1))
  }

  // --------------------------------------------------------------- long

  private def mix(d: Array[Long], h: Array[Long]): Unit = {
    h(0) += d(0);  h(2) ^= h(10); h(11) ^= h(0); h(0) = rot(h(0), 11);  h(11) += h(1)
    h(1) += d(1);  h(3) ^= h(11); h(0) ^= h(1);  h(1) = rot(h(1), 32);  h(0) += h(2)
    h(2) += d(2);  h(4) ^= h(0);  h(1) ^= h(2);  h(2) = rot(h(2), 43);  h(1) += h(3)
    h(3) += d(3);  h(5) ^= h(1);  h(2) ^= h(3);  h(3) = rot(h(3), 31);  h(2) += h(4)
    h(4) += d(4);  h(6) ^= h(2);  h(3) ^= h(4);  h(4) = rot(h(4), 17);  h(3) += h(5)
    h(5) += d(5);  h(7) ^= h(3);  h(4) ^= h(5);  h(5) = rot(h(5), 28);  h(4) += h(6)
    h(6) += d(6);  h(8) ^= h(4);  h(5) ^= h(6);  h(6) = rot(h(6), 39);  h(5) += h(7)
    h(7) += d(7);  h(9) ^= h(5);  h(6) ^= h(7);  h(7) = rot(h(7), 57);  h(6) += h(8)
    h(8) += d(8);  h(10) ^= h(6); h(7) ^= h(8);  h(8) = rot(h(8), 55);  h(7) += h(9)
    h(9) += d(9);  h(11) ^= h(7); h(8) ^= h(9);  h(9) = rot(h(9), 54);  h(8) += h(10)
    h(10) += d(10); h(0) ^= h(8); h(9) ^= h(10); h(10) = rot(h(10), 22); h(9) += h(11)
    h(11) += d(11); h(1) ^= h(9); h(10) ^= h(11); h(11) = rot(h(11), 46); h(10) += h(0)
  }

  private def endPartial(h: Array[Long]): Unit = {
    h(11) += h(1); h(2) ^= h(11); h(1) = rot(h(1), 44)
    h(0) += h(2);  h(3) ^= h(0);  h(2) = rot(h(2), 15)
    h(1) += h(3);  h(4) ^= h(1);  h(3) = rot(h(3), 34)
    h(2) += h(4);  h(5) ^= h(2);  h(4) = rot(h(4), 21)
    h(3) += h(5);  h(6) ^= h(3);  h(5) = rot(h(5), 38)
    h(4) += h(6);  h(7) ^= h(4);  h(6) = rot(h(6), 33)
    h(5) += h(7);  h(8) ^= h(5);  h(7) = rot(h(7), 10)
    h(6) += h(8);  h(9) ^= h(6);  h(8) = rot(h(8), 13)
    h(7) += h(9);  h(10) ^= h(7); h(9) = rot(h(9), 38)
    h(8) += h(10); h(11) ^= h(8); h(10) = rot(h(10), 53)
    h(9) += h(11); h(0) ^= h(9);  h(11) = rot(h(11), 42)
    h(10) += h(0); h(1) ^= h(10); h(0) = rot(h(0), 54)
  }

  private def longHash(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val h = new Array[Long](12)
    h(0) = seed1; h(3) = seed1; h(6) = seed1; h(9) = seed1
    h(1) = seed2; h(4) = seed2; h(7) = seed2; h(10) = seed2
    h(2) = SC_CONST; h(5) = SC_CONST; h(8) = SC_CONST; h(11) = SC_CONST
    val blockBytes = 96
    val nBlocks = data.length / blockBytes
    val d = new Array[Long](12)
    var off = 0
    var i = 0
    while (i < nBlocks) {
      var j = 0
      while (j < 12) { d(j) = leLong(data, off + 8 * j); j += 1 }
      mix(d, h)
      off += blockBytes; i += 1
    }
    // pad the tail to a full block; final byte carries the remainder length
    val remainder = data.length - off
    val buf = new Array[Byte](blockBytes)
    System.arraycopy(data, off, buf, 0, remainder)
    buf(blockBytes - 1) = remainder.toByte
    var j = 0
    while (j < 12) { d(j) = leLong(buf, 8 * j); j += 1 }
    // End: fold the last block in, then three partial end rounds
    j = 0
    while (j < 12) { h(j) += d(j); j += 1 }
    endPartial(h); endPartial(h); endPartial(h)
    (h(0), h(1))
  }
}

/** spooky_hash_v2_64 / spooky_hash_v2_32: varbinary → varbinary, big-endian
  * packing as the reference does (Long/Integer.reverseBytes of the
  * little-endian native result). */
case class SpookyHashV2(child: Expression, bits: Int) extends UnaryExpression {
  require(bits == 32 || bits == 64)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects varbinary")
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"spooky_hash_v2_$bits"
  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    if (bits == 64) BinaryCodecs.longToBe(SpookyHash.hash64(b))
    else BinaryCodecs.intToBe(SpookyHash.hash32(b))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (bits == 64) s"graft.ext.BinaryCodecs.longToBe(graft.ext.SpookyHash.hash64($c))"
      else s"graft.ext.BinaryCodecs.intToBe(graft.ext.SpookyHash.hash32($c))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
