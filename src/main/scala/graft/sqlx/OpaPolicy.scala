package graft.sqlx

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** Open Policy Agent access control (reference: plugin/trino-opa —
  * OpaAccessControl POSTs each authorization decision to the agent's
  * Data API, `POST <opa.policy.uri>` with
  * `{"input":{"context":{"identity":{"user":…}},"action":{"operation":…,
  * "resource":{"table":{…}}}}}`, and reads `{"result": true|false}`;
  * OpaHighLevelClient.java builds exactly this envelope). When an agent
  * is configured it REPLACES the built-in grant checks, like installing
  * the reference plugin replaces the default system access control.
  *
  * Decisions FAIL CLOSED: an unreachable agent or a malformed response
  * denies (reference OpaQueryException semantics — never fail open). */
object OpaPolicy {

  @volatile private var endpoint: Option[String] = None
  @volatile private var rowFiltersEndpoint: Option[String] = None
  @volatile private var columnMaskEndpoint: Option[String] = None

  /** Point enforcement at an agent's policy decision URI
    * (e.g. `http://host:port/v1/data/trino/allow`). */
  def configure(uri: String): Unit = endpoint = Some(uri)

  /** Optional row-filters document (reference opa.policy.row-filters-uri;
    * unset = the agent shapes no rows). */
  def configureRowFilters(uri: String): Unit = rowFiltersEndpoint = Some(uri)

  /** Optional column-masking document (reference
    * opa.policy.column-masking-uri). */
  def configureColumnMask(uri: String): Unit = columnMaskEndpoint = Some(uri)

  def clear(): Unit = {
    endpoint = None; rowFiltersEndpoint = None; columnMaskEndpoint = None
  }
  def isConfigured: Boolean = endpoint.isDefined
  def shapesRows: Boolean =
    rowFiltersEndpoint.isDefined || columnMaskEndpoint.isDefined

  private lazy val http = HttpClient.newBuilder()
    .executor(java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-opa-client"); t.setDaemon(true); t
    }))
    .build()

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One authorization decision. `operation` uses the reference's
    * operation names (SelectFromColumns, InsertIntoTable, DropTable, …);
    * `table` is the fully-qualified table key. Returns None when no agent
    * is configured AT THE SNAPSHOT — callers fall back to the built-in
    * checks, so a concurrent clear() can never fail OPEN. */
  def decide(user: String, operation: String, table: String): Option[Boolean] =
    endpoint match {
      case None => None // not configured: built-in checks decide
      case Some(uri) =>
        val input =
          s"""{"input":{"context":{"identity":{"user":${jstr(user)}}},""" +
            s""""action":{"operation":${jstr(operation)},""" +
            s""""resource":{"table":{"tableName":${jstr(table)}}}}}}"""
        Some(try {
          val resp = http.send(
            HttpRequest.newBuilder(URI.create(uri))
              .header("Content-Type", "application/json")
              .POST(HttpRequest.BodyPublishers.ofString(input)).build(),
            HttpResponse.BodyHandlers.ofString())
          resp.statusCode() == 200 &&
            parseResult(resp.body()).contains(true)
        } catch {
          case _: Exception => false // fail closed
        })
    }

  /** `{"result": true}` → Some(true); anything else → None (deny). An
    * OPA response with no `result` key means the policy path is
    * undefined — the reference denies that too. */
  private[sqlx] def parseResult(body: String): Option[Boolean] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try JsonMethods.parse(body) \ "result" match {
      case JBool(b) => Some(b)
      case _ => None
    } catch { case _: Exception => None }
  }

  private def postForResult(uri: String, input: String): org.json4s.JValue = {
    import org.json4s.jackson.JsonMethods
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(uri))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(input)).build(),
      HttpResponse.BodyHandlers.ofString())
    // an agent error on a POLICY-SHAPING document fails the query loudly
    // (reference OpaQueryException) — silently skipping a filter would
    // leak the very rows the policy hides
    require(resp.statusCode() == 200,
      s"opa: $uri returned ${resp.statusCode()}")
    JsonMethods.parse(resp.body()) \ "result"
  }

  /** Row-filter expressions the agent defines for (user, table)
    * (reference OpaAccessControl.getRowFilters over the rowFilters
    * document: result = array of ViewExpression {"expression": sql}).
    * None = no agent configured; Nil = agent defines none. */
  def rowFilters(user: String, table: String): Option[Seq[String]] =
    rowFiltersEndpoint.map { uri =>
      import org.json4s._
      val input =
        s"""{"input":{"context":{"identity":{"user":${jstr(user)}}},""" +
          s""""action":{"operation":"GetRowFilters",""" +
          s""""resource":{"table":{"tableName":${jstr(table)}}}}}}"""
      postForResult(uri, input) match {
        case JArray(xs) => xs.flatMap(x => x \ "expression" match {
          case JString(e) => Some(e)
          case _ => None
        })
        case _ => Nil // undefined document: no filters
      }
    }

  /** Column mask the agent defines for (user, table, column) (reference
    * OpaAccessControl.getColumnMask over the columnMask document:
    * result = ViewExpression {"expression": sql} or undefined). */
  def columnMask(user: String, table: String, column: String): Option[Option[String]] =
    columnMaskEndpoint.map { uri =>
      import org.json4s._
      val input =
        s"""{"input":{"context":{"identity":{"user":${jstr(user)}}},""" +
          s""""action":{"operation":"GetColumnMask",""" +
          s""""resource":{"column":{"tableName":${jstr(table)},""" +
          s""""columnName":${jstr(column)}}}}}}"""
      postForResult(uri, input) \ "expression" match {
        case JString(e) => Some(e)
        case _ => None
      }
    }
}
