package graft.client

/** Interactive SQL shell over the statement protocol (reference:
  * client/trino-cli — `trino --server host:port [--execute sql]
  * [--output-format fmt]` reads `;`-terminated statements, drives
  * StatementClientV1, prints results). Usage:
  *
  *   graft.client.Cli http://127.0.0.1:PORT            # REPL on stdin
  *   graft.client.Cli http://127.0.0.1:PORT --execute "SELECT ..."
  *   graft.client.Cli ... --execute "..." --output-format CSV|TSV|CSV_HEADER|TSV_HEADER|ALIGNED
  *
  * ALIGNED (default): numeric columns right-align, NULL prints, a row
  * count trails. CSV quotes per RFC 4180; TSV escapes tabs/newlines.
  * Exit with `quit`/`exit`. */
object Cli {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Cli <server-uri> [--execute <sql>] [--output-format <fmt>]")
    val base = args(0).stripSuffix("/")
    val rest = args.drop(1).toList
    val idx = rest.indexOf("--output-format")
    val format =
      if (idx >= 0 && idx + 1 < rest.length) rest(idx + 1).toUpperCase else "ALIGNED"
    val noFormat = if (idx >= 0) rest.patch(idx, Nil, 2) else rest
    noFormat match {
      case "--execute" :: sql :: Nil => runOne(base, sql, System.out, format)
      case Nil => repl(base)
      case other => sys.error(s"unrecognized arguments: $other")
    }
  }

  private def repl(base: String): Unit = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    val buf = new StringBuilder
    // one client-carried session for the whole REPL: SET SESSION / USE /
    // PREPARE accumulate here and travel as headers on later statements
    val sess = new StatementClient.Session
    print("graft> "); Console.flush()
    var line = in.readLine()
    while (line != null) {
      val trimmed = line.trim
      if (buf.isEmpty && (trimmed.equalsIgnoreCase("quit") || trimmed.equalsIgnoreCase("exit")))
        return
      buf.append(line).append('\n')
      // statements end at `;` outside single quotes (multi-line friendly)
      val text = buf.toString
      if (completeStatement(text)) {
        splitStatements(text).foreach { sql =>
          try runOne(base, sql, System.out, session = Some(sess))
          catch { case e: Exception => System.out.println(s"error: ${e.getMessage}") }
        }
        buf.clear()
        print("graft> ")
      } else print("    -> ")
      Console.flush()
      line = in.readLine()
    }
  }

  private def completeStatement(text: String): Boolean = {
    var inQ = false
    var lastMeaningful = ' '
    text.foreach { c =>
      if (c == '\'') inQ = !inQ
      if (!c.isWhitespace) lastMeaningful = if (inQ) 'q' else c
    }
    !inQ && lastMeaningful == ';'
  }

  /** Split buffered input at `;` OUTSIDE single quotes — the same
    * quote-tracking scan completeStatement uses, so `SELECT 'a;b';` stays
    * one statement. */
  private[client] def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    text.foreach { c =>
      if (c == '\'') { inQ = !inQ; cur += c }
      else if (c == ';' && !inQ) { out += cur.toString; cur.clear() }
      else cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private[graft] def runOne(base: String, sql: String, out: java.io.PrintStream,
      format: String = "ALIGNED",
      session: Option[StatementClient.Session] = None): Unit = {
    val res = StatementClient.execute(base, sql, session = session)
    format match {
      case "ALIGNED" => out.println(render(res))
      case "CSV" | "CSV_HEADER" =>
        if (format == "CSV_HEADER")
          out.println(res.columns.map(c => csvCell(c.name)).mkString(","))
        res.rows.foreach(r => out.println(
          r.map(v => csvCell(if (v == null) "" else formatCell(v))).mkString(",")))
      case "TSV" | "TSV_HEADER" =>
        if (format == "TSV_HEADER")
          out.println(res.columns.map(c => tsvCell(c.name)).mkString("\t"))
        res.rows.foreach(r => out.println(
          r.map(v => tsvCell(if (v == null) "" else formatCell(v))).mkString("\t")))
      case other => sys.error(
        s"--output-format ALIGNED | CSV | CSV_HEADER | TSV | TSV_HEADER (got $other)")
    }
  }

  /** RFC 4180: quote when the cell holds a delimiter/quote/newline. */
  private def csvCell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def tsvCell(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  private val numericBases =
    Set("bigint", "integer", "smallint", "tinyint", "double", "real", "decimal")

  /** Aligned text table, psql-flavored like the reference CLI's. */
  private[graft] def render(res: StatementClient.Result): String = {
    val cells = res.rows.map(_.map(formatCell))
    val widths = res.columns.indices.map { i =>
      (res.columns(i).name.length +: cells.map(_(i).length)).max
    }
    val rightAlign = res.columns.map(c =>
      numericBases.contains(c.typeName.takeWhile(_ != '(')))
    def pad(s: String, i: Int): String =
      if (rightAlign(i)) s.reverse.padTo(widths(i), ' ').reverse
      else s.padTo(widths(i), ' ')
    val sb = new StringBuilder
    sb ++= res.columns.iterator.zipWithIndex
      .map { case (c, i) => pad(c.name, i) }.mkString(" ", " | ", " ")
    sb += '\n'
    sb ++= widths.map("-" * (_)).mkString("-", "-+-", "-")
    sb += '\n'
    cells.foreach { r =>
      sb ++= r.iterator.zipWithIndex.map { case (c, i) => pad(c, i) }
        .mkString(" ", " | ", " ")
      sb += '\n'
    }
    val n = res.rows.length
    sb ++= s"($n ${if (n == 1) "row" else "rows"})"
    sb.toString
  }

  private def formatCell(v: Any): String = v match {
    case null => "NULL"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case d: java.math.BigDecimal => d.toPlainString
    case seq: Seq[_] => seq.map(formatCell).mkString("[", ", ", "]")
    case m: Map[_, _] =>
      m.map { case (k, mv) => s"$k=${formatCell(mv)}" }.mkString("{", ", ", "}")
    case other => String.valueOf(other)
  }
}
