package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function bundles: URL, UUID, IP, base conversion (SURVEY.md §2.8 —
  * reference UrlFunctions.java:41, UuidFunctions, IpAddressFunctions.java,
  * MathFunctions.java from_base/to_base).
  *
  * All pure compositions of codegen'd built-ins (no UDFs): URL parts via
  * `parse_url`, IPv4 math via split + integer arithmetic, deterministic
  * UUID-v0-style formatting from an md5 hash, radix conversion via `conv`.
  */
object ScalarFunctions {

  // --- URL (reference: operator/scalar/UrlFunctions.java:41) ---
  def urlExtractProtocol(u: Column): Column = parse_url(u, lit("PROTOCOL"))
  def urlExtractHost(u: Column): Column = parse_url(u, lit("HOST"))
  /** Spark's parse_url has no PORT part — extract from the authority. */
  def urlExtractPort(u: Column): Column =
    regexp_extract(u, "^[a-z]+://[^/:?#]+:([0-9]+)", 1).cast("long")
  def urlExtractPath(u: Column): Column = parse_url(u, lit("PATH"))
  def urlExtractQuery(u: Column): Column = parse_url(u, lit("QUERY"))
  def urlExtractFragment(u: Column): Column = parse_url(u, lit("REF"))
  def urlExtractParameter(u: Column, name: String): Column =
    parse_url(u, lit("QUERY"), lit(name))
  def urlEncode(c: Column): Column = url_encode(c)
  def urlDecode(c: Column): Column = url_decode(c)

  // --- UUID (reference: UuidFunctions / UuidType.java) ---
  /** Deterministic uuid-shaped string derived from the md5 of the input —
    * the portable analogue of uuid(); format 8-4-4-4-12. */
  def uuidFromHash(c: Column): Column = {
    val h = md5(c.cast("string"))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  // --- IPv4 (reference: operator/scalar/IpAddressFunctions.java) ---
  /** Dotted-quad string → numeric address. */
  def ipToLong(ip: Column): Column = {
    val o = split(ip, "\\.")
    element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long")
  }

  /** True when `ip` falls inside `cidrBase`/`prefixLen` (IPv4). */
  def ipInCidr(ip: Column, cidrBase: Column, prefixLen: Int): Column = {
    val shiftBits = 32 - prefixLen
    val divisor = 1L << shiftBits
    (ipToLong(ip) / divisor).cast("long") === (ipToLong(cidrBase) / divisor).cast("long")
  }

  // --- Radix conversion (reference: MathFunctions.java from_base/to_base) ---
  def toBase(c: Column, radix: Int): Column = lower(conv(c.cast("string"), 10, radix))
  def fromBase(c: Column, radix: Int): Column = conv(c, radix, 10).cast("long")

  // --- Joda-dialect datetime patterns (reference: DateTimeFunctions.java
  //     format_datetime/parse_datetime use Joda patterns; Spark uses
  //     java.time DateTimeFormatter. The overlapping subset is translated;
  //     tokens with diverging semantics are rejected loudly rather than
  //     silently misformatted.) ---
  private val jodaUnsupported = "xeZC".toSet // weekyear, numeric dow, tz offset, century

  /** Translate a Joda-time pattern to a java.time one (common subset). */
  def translateJodaPattern(p: String): String = {
    require(!p.exists(c => jodaUnsupported.contains(c)),
      s"joda pattern token with diverging semantics in '$p' (one of ${jodaUnsupported.mkString})")
    // Joda 'Y' = year-of-era, java.time 'y' = year-of-era equivalent here
    p.map { case 'Y' => 'y'; case c => c }
  }

  /** format_datetime(ts, jodaPattern). */
  def formatDatetime(ts: Column, jodaPattern: String): Column =
    date_format(ts, translateJodaPattern(jodaPattern))

  /** parse_datetime(str, jodaPattern) → timestamp. */
  def parseDatetime(s: Column, jodaPattern: String): Column =
    to_timestamp(s, translateJodaPattern(jodaPattern))

  // --- MySQL-dialect %-patterns (reference DateTimeFunctions.java
  //     date_parse/date_format use MySQL tokens). Translated to java.time;
  //     tokens outside the supported subset are rejected loudly. ---
  private val mysqlTokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M", 'd' -> "dd",
    'e' -> "d", 'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'I' -> "hh",
    'i' -> "mm", 's' -> "ss", 'S' -> "ss", 'f' -> "SSSSSS", 'p' -> "a",
    'M' -> "MMMM", 'b' -> "MMM", 'j' -> "DDD", 'a' -> "EEE", 'W' -> "EEEE",
    'T' -> "HH:mm:ss", 'r' -> "hh:mm:ss a", '%' -> "%")

  /** Translate a MySQL %-pattern to a java.time one (common subset). */
  def translateMySqlPattern(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '%') {
        require(i + 1 < p.length, s"dangling % in '$p'")
        val t = p.charAt(i + 1)
        sb.append(mysqlTokens.getOrElse(t,
          throw new IllegalArgumentException(s"%$t not supported in '$p'")))
        i += 2
      } else if (c.isLetter) {
        // literal letters must be quoted for java.time
        sb.append('\'').append(c).append('\'')
        i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** date_parse(str, mysqlPattern) → timestamp. */
  def dateParse(s: Column, mysqlPattern: String): Column =
    to_timestamp(s, translateMySqlPattern(mysqlPattern))
}
