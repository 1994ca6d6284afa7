package graft.catalog

/** Percent-escape codec for hive-style partition path segments and lake-log
  * relative paths.
  *
  * Spark's staging layout, the Hive directory layout, and the Delta log's
  * `add.path` all escape special characters as `%XX` ONLY — a literal `'+'`
  * is a legal, unescaped character in a partition value or file name.
  * `java.net.URLDecoder` implements application/x-www-form-urlencoded,
  * which additionally maps `'+'` to a space, silently corrupting such
  * values (reference: trino core/trino-hive-formats escapePathName /
  * Spark ExternalCatalogUtils.unescapePathName). This decodes `%XX`
  * sequences and leaves every other character untouched; a malformed
  * escape passes through verbatim, matching Spark's behavior.
  */
object PathCodec {
  def unescape(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '%' && i + 2 < s.length) {
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi >= 0 && lo >= 0) {
          sb.append(((hi << 4) | lo).toChar)
          i += 3
        } else { sb.append(ch); i += 1 }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}
