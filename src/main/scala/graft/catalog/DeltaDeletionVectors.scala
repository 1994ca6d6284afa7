package graft.catalog

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.zip.CRC32

/** Delta Lake deletion-vector decoding over the open formats (reference:
  * plugin/trino-delta-lake/delete/DeletionVectors.java:47 and the public
  * delta-io PROTOCOL.md "Deletion Vector Format"; the bitmap payload is the
  * public 32-bit RoaringBitmap portable serialization wrapped in Delta's
  * 64-bit "portable" envelope, and file names/UUIDs use the ZeroMQ Z85
  * alphabet).
  *
  * On-disk DV file: `[u8 version=1][i32 BE size][data][i32 BE crc32(data)]`
  * (the descriptor's `offset` points at the size field; size and checksum
  * are verified, a mismatch fails loudly). `data` (LITTLE-endian):
  * `[i32 magic 1681511377][i64 bitmapCount]` then per bitmap
  * `[i32 key][32-bit roaring bitmap]`; a deleted row position is
  * `key << 32 | bitmapValue`.
  *
  * 32-bit roaring (RoaringFormatSpec): cookie 12346 (no runs: explicit
  * container count + offsets) or 12347 (runs: count packed in the cookie,
  * run-flag bitset, offsets only when count ≥ 4); containers in key order —
  * array (≤4096 u16 values), bitmap (1024 u64 words), or run
  * (u16 count × [start, length]) — read sequentially.
  *
  * Storage types: `u` (table-relative `deletion_vector_<uuid>.bin` with an
  * optional alphanumeric random prefix; the UUID travels Z85-encoded in
  * `pathOrInlineDv`) and `p` (absolute path). Inline (`i`) is refused —
  * exactly as the reference refuses it (DeletionVectors.java:77). */
object DeltaDeletionVectors {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  // ---------------------------------------------------------------- Z85

  private val Z85Alphabet: Array[Char] =
    (('0' to '9') ++ ('a' to 'z') ++ ('A' to 'Z')).toArray ++
      ".-:+=^!/*?&<>()[]{}@%$#".toCharArray
  private val Z85Decode: Array[Int] = {
    val m = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
    m
  }

  /** 5 chars → 4 bytes per block (big-endian base 85). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input must be 5-char aligned: $s")
    val out = ByteBuffer.allocate(s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var sum = 0L
      for (k <- 0 until 5) {
        val c = s.charAt(i + k)
        require(c < 128 && Z85Decode(c) >= 0, s"invalid Z85 character '$c'")
        sum = sum * 85 + Z85Decode(c)
      }
      out.putInt(sum.toInt)
      i += 5
    }
    out.array()
  }

  /** The `u`-type file name: optional random prefix + Z85 UUID →
    * `[prefix/]deletion_vector_<uuid>.bin`. */
  def uuidFileName(pathOrInlineDv: String): String = {
    val prefixLen = pathOrInlineDv.length - 20 // ENCODED_UUID_LENGTH
    require(prefixLen >= 0, s"encoded UUID too short: $pathOrInlineDv")
    val prefix = pathOrInlineDv.substring(0, prefixLen)
    require(prefix.forall(_.isLetterOrDigit), s"non-alphanumeric DV prefix: $prefix")
    val bytes = z85Decode(pathOrInlineDv.substring(prefixLen))
    val bb = ByteBuffer.wrap(bytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    (if (prefix.isEmpty) "" else s"$prefix/") + s"deletion_vector_$uuid.bin"
  }

  // ------------------------------------------------------------- roaring

  /** One 32-bit roaring bitmap, reading sequentially; returns sorted
    * values, leaving the buffer positioned after the bitmap. */
  private def readRoaring32(buf: ByteBuffer): Array[Int] = {
    val cookie = buf.getInt
    val hasRun = (cookie & 0xFFFF) == 12347
    val size =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require(cookie == 12346, s"unsupported roaring cookie $cookie")
        buf.getInt
      }
    val runFlags: Array[Byte] =
      if (hasRun) { val a = new Array[Byte]((size + 7) / 8); buf.get(a); a }
      else Array.emptyByteArray
    def isRun(i: Int): Boolean = hasRun && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    for (i <- 0 until size) {
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
    }
    // offsets are present unless the run format with < 4 containers
    if (!hasRun || size >= 4) buf.position(buf.position() + 4 * size)
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- 0 until size) {
      val hi = keys(i) << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xFFFF
        for (_ <- 0 until nRuns) {
          val start = buf.getShort & 0xFFFF
          val len = buf.getShort & 0xFFFF
          for (v <- start to start + len) out += (hi | v)
        }
      } else if (cards(i) <= 4096) {
        for (_ <- 0 until cards(i)) out += (hi | (buf.getShort & 0xFFFF))
      } else {
        for (w <- 0 until 1024) {
          val word = buf.getLong
          var b = 0
          while (b < 64) {
            if (((word >>> b) & 1L) == 1L) out += (hi | (w * 64 + b))
            b += 1
          }
        }
      }
    }
    out.toArray
  }

  /** Delta's 64-bit portable envelope → sorted deleted row positions. */
  def decodePortable(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == 1681511377, s"unsupported deletion-vector magic $magic")
    val nBitmaps = buf.getLong
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    for (_ <- 0L until nBitmaps) {
      val key = buf.getInt
      require(key >= 0, s"negative bitmap key $key")
      readRoaring32(buf).foreach(v => out += ((key.toLong << 32) | (v & 0xFFFFFFFFL)))
    }
    out.sorted.toArray
  }

  /** Read + verify the on-disk envelope at `offset`. */
  def readFromFile(file: File, offset: Int, sizeInBytes: Int): Array[Long] = {
    val all = Files.readAllBytes(file.toPath)
    require(offset + 4 + sizeInBytes + 4 <= all.length,
      s"deletion vector out of bounds in ${file.getName}")
    val bb = ByteBuffer.wrap(all) // BIG-endian framing
    val actualSize = bb.getInt(offset)
    require(actualSize == sizeInBytes,
      s"deletion vector size mismatch: expected $sizeInBytes got $actualSize")
    val data = java.util.Arrays.copyOfRange(all, offset + 4, offset + 4 + sizeInBytes)
    val crc = new CRC32
    crc.update(data)
    val expected = bb.getInt(offset + 4 + sizeInBytes)
    require(crc.getValue.toInt == expected,
      s"deletion vector checksum mismatch in ${file.getName}")
    decodePortable(data)
  }

  // ------------------------------------------------------------- encoding

  /** 4 bytes → 5 chars per block (the decoder's inverse). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "Z85 input must be 4-byte aligned")
    val sb = new StringBuilder
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) {
      var sum = bb.getInt & 0xFFFFFFFFL
      val block = new Array[Char](5)
      for (k <- 4 to 0 by -1) { block(k) = Z85Alphabet((sum % 85).toInt); sum /= 85 }
      sb.appendAll(block)
    }
    sb.toString
  }

  /** One 32-bit roaring bitmap over sorted values — array containers up to
    * 4096 members, bitmap containers beyond (runs not emitted). */
  private def writeRoaring32(values: Array[Int]): Array[Byte] = {
    val byKey = values.map(v => (v >>> 16, v & 0xFFFF)).groupBy(_._1)
      .toSeq.sortBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sorted) }
    val size = byKey.length
    val containers = byKey.map { case (_, vs) =>
      if (vs.length <= 4096) {
        val bb = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(v => bb.putShort(v.toShort))
        bb.array()
      } else {
        val words = new Array[Long](1024)
        vs.foreach(v => words(v / 64) |= (1L << (v % 64)))
        val bb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(bb.putLong)
        bb.array()
      }
    }
    val headerLen = 4 + 4 + 4 * size + 4 * size // cookie, size, headers, offsets
    val bb = ByteBuffer.allocate(headerLen + containers.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12346).putInt(size)
    byKey.foreach { case (k, vs) =>
      bb.putShort(k.toShort).putShort((vs.length - 1).toShort)
    }
    var off = headerLen
    containers.foreach { c => bb.putInt(off); off += c.length }
    containers.foreach(bb.put)
    bb.array()
  }

  /** Delta's 64-bit portable envelope over sorted positions. */
  def encodePortable(positions: Array[Long]): Array[Byte] = {
    val byHigh = positions.sorted.map(p => ((p >>> 32).toInt, (p & 0xFFFFFFFFL).toInt))
      .groupBy(_._1).toSeq.sortBy(_._1)
    val bitmaps = byHigh.map { case (k, ps) => (k, writeRoaring32(ps.map(_._2))) }
    val bb = ByteBuffer.allocate(12 + bitmaps.map(4 + _._2.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377).putLong(bitmaps.length.toLong)
    bitmaps.foreach { case (k, data) => bb.putInt(k); bb.put(data) }
    bb.array()
  }

  /** Write a `u`-type deletion-vector file under the table root; returns
    * the descriptor (offset = 1, past the version byte). */
  def writeUuidFile(tablePath: String, positions: Array[Long]): Descriptor =
    writeUuidBytes(tablePath, encodePortable(positions), positions.length.toLong)

  /** Same, from a PRE-ENCODED portable bitmap (built on executors so the
    * driver never sees per-row position state — only the compressed bytes). */
  def writeUuidBytes(tablePath: String, data: Array[Byte], cardinality: Long): Descriptor = {
    val uuid = java.util.UUID.nameUUIDFromBytes(data) // deterministic
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val crc = new CRC32; crc.update(data)
    val out = ByteBuffer.allocate(1 + 4 + data.length + 4) // BE framing
      .put(1.toByte).putInt(data.length).put(data).putInt(crc.getValue.toInt)
    Files.write(new File(tablePath, s"deletion_vector_$uuid.bin").toPath, out.array())
    Descriptor("u", z85Encode(uuidBytes), Some(1), data.length, cardinality)
  }

  /** Resolve a descriptor to deleted positions. */
  def read(tablePath: String, d: Descriptor): Array[Long] = d.storageType match {
    case "u" =>
      val f = new File(tablePath, uuidFileName(d.pathOrInlineDv))
      require(f.isFile, s"deletion vector file not found: $f")
      val positions = readFromFile(f, d.offset.getOrElse(
        throw new IllegalArgumentException("u-type deletion vector without offset")),
        d.sizeInBytes)
      require(positions.length == d.cardinality,
        s"deletion vector cardinality mismatch: ${positions.length} vs ${d.cardinality}")
      positions
    case "p" =>
      val f = new File(d.pathOrInlineDv)
      require(f.isFile, s"deletion vector file not found: $f")
      readFromFile(f, d.offset.getOrElse(
        throw new IllegalArgumentException("p-type deletion vector without offset")),
        d.sizeInBytes)
    case "i" =>
      // INLINE vectors (PROTOCOL.md deletion-vector-descriptor): the
      // z85 payload IS the portable bitmap, no file, no offset. The codec
      // pads to 4-byte groups, so decode then trim to sizeInBytes. (The
      // reference engine refuses these; the open spec defines them.)
      val decoded = z85Decode(d.pathOrInlineDv)
      require(decoded.length >= d.sizeInBytes &&
        decoded.length - d.sizeInBytes < 4,
        s"inline deletion vector size mismatch: ${decoded.length} vs ${d.sizeInBytes}")
      val data = decoded.take(d.sizeInBytes)
      val positions = decodePortable(data)
      require(positions.length == d.cardinality,
        s"inline deletion vector cardinality mismatch: " +
          s"${positions.length} vs ${d.cardinality}")
      positions
    case other => throw new IllegalArgumentException(
      s"unknown deletion vector storage type '$other'")
  }
}
