package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Teradata compatibility functions (reference: plugin/trino-teradata-functions
  * — TeradataStringFunctions.java:40 index, :62 char2hexint;
  * TeradataDateFunctions.java:63 to_date, :79 to_timestamp, :109 to_char;
  * format tokens dateformat/DateFormatParser.java:36-45).
  *
  * The date functions translate the Teradata token vocabulary
  * (YYYY/YY/MM/DD/HH24/HH/MI/SS, case-insensitive, anything else literal)
  * onto Spark's java.time patterns at PLAN TIME — the formats are literals in
  * Teradata SQL — so parsing/formatting runs in the codegen'd built-ins. */
object TeradataFunctions {

  /** index(string, substring): 1-based position of first occurrence, 0 if
    * absent (delegates to strpos exactly like the reference). */
  def tdIndex(str: Column, sub: Column): Column = instr(str, sub)

  /** char2hexint: uppercase hex of the UTF-16BE encoding. */
  def tdChar2HexInt(str: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(graft.ext.Char2HexInt(expression(str)))
  }

  /** Teradata format → java.time pattern (DateFormatParser.java:36-45).
    * Longest-match tokenization, case-insensitive; unknown chars pass through
    * as quoted literals. */
  def translateFormat(fmt: String): String = {
    val tokens = Seq("yyyy" -> "yyyy", "yy" -> "yy", "mm" -> "MM", "dd" -> "dd",
      "hh24" -> "HH", "hh" -> "hh", "mi" -> "mm", "ss" -> "ss")
    val sb = new StringBuilder
    var i = 0
    val lower = fmt.toLowerCase
    while (i < fmt.length) {
      tokens.find { case (t, _) => lower.startsWith(t, i) } match {
        case Some((t, j)) => sb ++= j; i += t.length
        case None =>
          val c = fmt.charAt(i)
          if (c.isLetter) { sb += '\''; sb += c; sb += '\'' } else sb += c
          i += 1
      }
    }
    sb.toString
  }

  /** to_timestamp(varchar, teradata_format) — timestamp(3) in the reference;
    * micros-precision TimestampType here. */
  def tdToTimestamp(str: Column, fmt: String): Column =
    to_timestamp(str, translateFormat(fmt))

  /** to_date(varchar, teradata_format). */
  def tdToDate(str: Column, fmt: String): Column =
    to_date(str, translateFormat(fmt))

  /** to_char(timestamp, teradata_format). */
  def tdToChar(ts: Column, fmt: String): Column =
    date_format(ts, translateFormat(fmt))
}
