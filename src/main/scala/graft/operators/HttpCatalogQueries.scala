package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTTP connector under the DRIVER GATE: the nation and region fixtures
  * are served as CSV over loopback HTTP behind an example-http metadata
  * document (nation deliberately split across TWO source URIs = two
  * splits), read back through [[graft.catalog.HttpCatalog]], joined and
  * aggregated — and must hash-match the DuckDB oracle over the raw
  * parquet. */
object HttpCatalogQueries {

  // one fixture server per JVM (the driver runs Verify in-process)
  private var handle: graft.server.StaticContentServer.Handle = _
  private def server(s: SparkSession, dir: String): graft.server.StaticContentServer.Handle =
    synchronized {
      if (handle == null) {
        import s.implicits._
        val nation = table(s, dir, "nation")
          .select($"n_nationkey".cast("long"), $"n_name", $"n_regionkey".cast("long"))
          .collect() // 25-row fixture table: bounded
          .map(r => s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)}")
        val region = table(s, dir, "region")
          .select($"r_regionkey".cast("long"), $"r_name")
          .collect() // 5-row fixture table: bounded
          .map(r => s"${r.getLong(0)},${r.getString(1)}")
        val (nationA, nationB) = nation.splitAt(nation.length / 2)
        handle = graft.server.StaticContentServer.start(Map(
          "/data/nation-a.csv" -> nationA.mkString("\n"),
          "/data/nation-b.csv" -> nationB.mkString("\n"),
          "/data/region.csv" -> region.mkString("\n")))
        val base = handle.uri
        val meta =
          s"""{"tpch": [
             |  {"name": "nation",
             |   "columns": [{"name": "n_nationkey", "type": "bigint"},
             |               {"name": "n_name", "type": "varchar"},
             |               {"name": "n_regionkey", "type": "bigint"}],
             |   "sources": ["$base/data/nation-a.csv", "$base/data/nation-b.csv"]},
             |  {"name": "region",
             |   "columns": [{"name": "r_regionkey", "type": "bigint"},
             |               {"name": "r_name", "type": "varchar"}],
             |   "sources": ["$base/data/region.csv"]}
             |]}""".stripMargin
        // metadata served by the same instance it describes
        handle.server.createContext("/metadata.json", new com.sun.net.httpserver.HttpHandler {
          override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
            val bytes = meta.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            ex.sendResponseHeaders(200, bytes.length.toLong)
            val os = ex.getResponseBody
            try os.write(bytes) finally os.close()
          }
        })
      }
      handle
    }

  def q_fed_http(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = server(s, dir)
    val metaUri = s"${h.uri}/metadata.json"
    assert(graft.catalog.HttpCatalog.listTables(metaUri, "tpch") ==
      Seq("nation", "region"))
    val nation = graft.catalog.HttpCatalog.readTable(s, metaUri, "tpch", "nation")
    val region = graft.catalog.HttpCatalog.readTable(s, metaUri, "tpch", "region")
    nation
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("nations"),
        sum($"n_nationkey").cast("long").as("key_sum"))
      .orderBy($"r_name")
  }
  val qFedHttpSql: String =
    """SELECT r_name, count(*) AS nations, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
       FROM nation JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q_fed_http" -> q_fed_http _)
  val oracles: Map[String, String] = Map(
    "q_fed_http" -> qFedHttpSql)
}
