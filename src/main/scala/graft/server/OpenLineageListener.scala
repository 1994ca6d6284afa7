package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant

import org.json4s._
import org.json4s.jackson.JsonMethods

/** OpenLineage event listener (reference: plugin/trino-openlineage
  * OpenLineageListener.java — maps queryCreated → START and
  * queryCompleted → COMPLETE/FAIL/ABORT RunEvents per the public
  * OpenLineage spec, with the query text as the sql job facet and the
  * statement's referenced tables as input/output datasets).
  *
  * RunEvent envelope (openlineage.io/spec): eventType, eventTime
  * (ISO-8601), run.runId (UUID — name-derived from the query id so both
  * lifecycle events share it), job.{namespace,name}, inputs/outputs
  * dataset refs, producer, schemaURL. Datasets come from the same
  * statement walk EXPLAIN (TYPE IO) uses (Statements.ioTables).
  *
  * Like every listener here, a sink failure never fails the query
  * (EventListeners.fire* isolates throwables), and posting happens on the
  * query's execution thread — per-query backpressure, no shared choke. */
final class OpenLineageListener(ingestUri: String, namespace: String = "graft")
    extends EventListeners.Listener {

  private val http = HttpClient.newBuilder()
    .executor(java.util.concurrent.Executors.newFixedThreadPool(1, r => {
      val t = new Thread(r, "graft-openlineage-post"); t.setDaemon(true); t
    }))
    .build()

  private val Producer = "graft-spark-engine"
  private val SchemaUrl =
    "https://openlineage.io/spec/2-0-2/OpenLineage.json#/definitions/RunEvent"

  private def jstr(s: String): String = JsonMethods.compact(JString(s))

  private def datasets(tables: Seq[String]): String =
    tables.map(t =>
      s"""{"namespace":${jstr(namespace)},"name":${jstr(t)}}""").mkString(",")

  /** One RunEvent. The runId must be a UUID: derive it deterministically
    * from the query id so START and COMPLETE correlate. */
  private def runEvent(eventType: String, timeMs: Long, queryId: String,
      query: String, state: String, failure: Option[String]): String = {
    val runId = java.util.UUID.nameUUIDFromBytes(
      queryId.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
    val (inputs, outputs) = graft.sqlx.Statements.ioTables(query)
    val errorFacet = failure.map(m =>
      s""","errorMessage":{"_producer":${jstr(Producer)},""" +
        s""""_schemaURL":${jstr(SchemaUrl)},""" +
        s""""message":${jstr(m)},"programmingLanguage":"SQL"}""").getOrElse("")
    s"""{"eventType":${jstr(eventType)},""" +
      s""""eventTime":${jstr(Instant.ofEpochMilli(timeMs).toString)},""" +
      s""""run":{"runId":${jstr(runId)},"facets":{""" +
      s""""trino_metadata":{"_producer":${jstr(Producer)},""" +
      s""""_schemaURL":${jstr(SchemaUrl)},""" +
      s""""queryId":${jstr(queryId)},"state":${jstr(state)}}$errorFacet}},""" +
      s""""job":{"namespace":${jstr(namespace)},"name":${jstr(queryId)},""" +
      s""""facets":{"sql":{"_producer":${jstr(Producer)},""" +
      s""""_schemaURL":${jstr(SchemaUrl)},"query":${jstr(query)}}}},""" +
      s""""inputs":[${datasets(inputs)}],""" +
      s""""outputs":[${datasets(outputs)}],""" +
      s""""producer":${jstr(Producer)},"schemaURL":${jstr(SchemaUrl)}}"""
  }

  private def post(body: String): Unit = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(ingestUri))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.discarding())
    require(resp.statusCode() / 100 == 2,
      s"openlineage sink returned ${resp.statusCode()}")
  }

  private def field(json: String, path: String*): Option[String] = {
    val v = path.foldLeft(JsonMethods.parse(json): JValue)(_ \ _)
    v match {
      case JString(s) => Some(s)
      case JInt(n) => Some(n.toString)
      case JLong(n) => Some(n.toString)
      case _ => None
    }
  }

  override def queryCreated(json: String): Unit = {
    val id = field(json, "metadata", "queryId").getOrElse("unknown")
    val q = field(json, "metadata", "query").getOrElse("")
    val t = field(json, "createTime").map(_.toLong)
      .getOrElse(System.currentTimeMillis())
    post(runEvent("START", t, id, q, "QUEUED", None))
  }

  override def queryCompleted(json: String): Unit = {
    val id = field(json, "metadata", "queryId").getOrElse("unknown")
    val q = field(json, "metadata", "query").getOrElse("")
    val state = field(json, "metadata", "state").getOrElse("FINISHED")
    val t = field(json, "endTime").map(_.toLong)
      .getOrElse(System.currentTimeMillis())
    val failure = field(json, "failureInfo", "message")
    // reference mapping: FINISHED → COMPLETE, FAILED → FAIL,
    // user cancellation → ABORT
    val eventType = state match {
      case "FINISHED" => "COMPLETE"
      case "CANCELED" | "CANCELLED" => "ABORT"
      case _ => "FAIL"
    }
    post(runEvent(eventType, t, id, q, state, failure))
  }
}
