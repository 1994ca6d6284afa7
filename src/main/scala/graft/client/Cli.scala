package graft.client

/** Interactive SQL shell over the statement protocol (reference:
  * client/trino-cli — `trino --server host:port [--execute sql]` reads
  * `;`-terminated statements, drives StatementClientV1, prints an aligned
  * table and a row count). Usage:
  *
  *   graft.client.Cli http://127.0.0.1:PORT            # REPL on stdin
  *   graft.client.Cli http://127.0.0.1:PORT --execute "SELECT ..."
  *
  * Numeric columns right-align, everything else left-aligns; NULL prints
  * as the reference's empty-cell convention. Exit with `quit`/`exit`. */
object Cli {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Cli <server-uri> [--execute <sql>]")
    val base = args(0).stripSuffix("/")
    args.drop(1).toList match {
      case "--execute" :: sql :: Nil => runOne(base, sql, System.out)
      case Nil => repl(base)
      case other => sys.error(s"unrecognized arguments: $other")
    }
  }

  private def repl(base: String): Unit = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    val buf = new StringBuilder
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
        text.split(';').map(_.trim).filter(_.nonEmpty).foreach { sql =>
          try runOne(base, sql, System.out)
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

  private[graft] def runOne(base: String, sql: String, out: java.io.PrintStream): Unit = {
    val res = StatementClient.execute(base, sql)
    out.println(render(res))
  }

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
