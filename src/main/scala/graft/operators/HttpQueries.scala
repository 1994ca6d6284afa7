package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The statement protocol under the DRIVER GATE: a query travels the full
  * network path — POST /v1/statement over loopback HTTP, poll nextUri,
  * concatenate JSON data pages (the reference client loop,
  * client/trino-client StatementClientV1) — and the reassembled rows must
  * hash-match the DuckDB oracle. Proves the front door end-to-end, not
  * just in a spec. The walker is the shared [[graft.client.StatementClient]]
  * the JDBC driver and CLI also ride. */
object HttpQueries {

  // one server per JVM; queries share it (the driver runs Verify in-process)
  private var handle: graft.server.StatementServer.Handle = _
  private def server(s: SparkSession, dir: String): graft.server.StatementServer.Handle =
    synchronized {
      if (handle == null) handle = graft.server.StatementServer.start(s, dir)
      handle
    }

  /** Grouped aggregate over nation+customer, reassembled from HTTP pages. */
  def q_http_statement(s: SparkSession, dir: String): DataFrame = {
    val h = server(s, dir)
    val res = graft.client.StatementClient.execute(h.uri,
      """SELECT n_regionkey AS region_bucket, count(*) AS n,
                CAST(sum(c_custkey) AS BIGINT) AS key_sum
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_regionkey ORDER BY region_bucket""")
    val schema = StructType(Seq(
      StructField("region_bucket", LongType),
      StructField("n", LongType),
      StructField("key_sum", LongType)))
    val typed = res.rows.map(r => Row(
      r(0).toString.toLong, r(1).toString.toLong, r(2).toString.toLong))
    s.createDataFrame(java.util.Arrays.asList(typed: _*), schema)
      .orderBy("region_bucket")
  }
  val qHttpStatementSql: String =
    """SELECT CAST(n_regionkey AS BIGINT) AS region_bucket, count(*) AS n,
              CAST(sum(c_custkey) AS BIGINT) AS key_sum
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_regionkey ORDER BY region_bucket"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q_http_statement" -> q_http_statement _)
  val oracles: Map[String, String] = Map(
    "q_http_statement" -> qHttpStatementSql)
}
