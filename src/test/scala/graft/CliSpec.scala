package graft

/** The CLI rendering path against a live loopback server: aligned table,
  * right-aligned numerics, NULL cells, row-count trailer. */
class CliSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val handle = server.StatementServer.start(spark, sfDir)
  override def afterAll(): Unit = handle.stop()

  private def captured(sql: String): String = {
    val bos = new java.io.ByteArrayOutputStream()
    client.Cli.runOne(handle.uri, sql, new java.io.PrintStream(bos, true, "UTF-8"))
    bos.toString("UTF-8")
  }

  test("renders an aligned table with right-aligned numerics") {
    val out = captured(
      "SELECT n_name, n_nationkey FROM nation WHERE n_regionkey = 0 ORDER BY n_name")
    val lines = out.linesIterator.toVector
    assert(lines.head.contains("n_name") && lines.head.contains("n_nationkey"))
    assert(lines(1).matches("-+\\+-+"), lines(1))
    // all separator-aligned: every data line has the | in the same column
    val bar = lines.head.indexOf('|')
    assert(lines.drop(2).dropRight(1).forall(_.charAt(bar) == '|'))
    assert(out.trim.endsWith("rows)"))
    // numeric right-aligned: digits end right before the trailing space
    val dataLine = lines(2)
    assert(dataLine.last != ' ' || dataLine.trim.last.isDigit)
  }

  test("NULL renders and the row count trailer counts") {
    val out = captured("SELECT CAST(NULL AS BIGINT) AS v")
    assert(out.contains("NULL"))
    assert(out.trim.endsWith("(1 row)"))
  }

  test("CSV and TSV output formats, header variants, quoting") {
    def capturedAs(sql: String, fmt: String): String = {
      val bos = new java.io.ByteArrayOutputStream()
      client.Cli.runOne(handle.uri, sql, new java.io.PrintStream(bos, true, "UTF-8"), fmt)
      bos.toString("UTF-8")
    }
    val sql = "SELECT 'a,b' AS v, 'q\"t' AS w, CAST(NULL AS BIGINT) AS n"
    val csv = capturedAs(sql, "CSV_HEADER").linesIterator.toVector
    assert(csv(0) == "v,w,n")
    assert(csv(1) == "\"a,b\",\"q\"\"t\",", csv(1)) // RFC 4180 quoting, NULL empty
    val tsv = capturedAs("SELECT n_name FROM nation WHERE n_regionkey = 0 ORDER BY 1", "TSV")
      .linesIterator.toVector
    assert(tsv.length == 5 && !tsv.head.contains("n_name")) // no header, no trailer
    intercept[RuntimeException] { capturedAs("SELECT 1", "YAML") }
  }

  test("--execute main path prints without a REPL") {
    // exercise main() argument parsing (stdout briefly redirected)
    val bos = new java.io.ByteArrayOutputStream()
    val prev = System.out
    System.setOut(new java.io.PrintStream(bos, true, "UTF-8"))
    try client.Cli.main(Array(handle.uri, "--execute", "SELECT 1 AS one"))
    finally System.setOut(prev)
    assert(bos.toString("UTF-8").contains("one"))
  }
}
