package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.CopyOnWriteArrayList

import scala.jdk.CollectionConverters._

/** Event-listener SPI analogue (reference: core/trino-spi
  * io.trino.spi.eventlistener.EventListener — queryCreated /
  * queryCompleted — and plugin/trino-http-event-listener, which POSTs the
  * event JSON to a configured ingest URI with bounded retries). The
  * statement server fires queryCreated when a statement is accepted and
  * queryCompleted when it finishes, fails, or is cancelled.
  *
  * Events are posted ON THE QUERY'S EXECUTION THREAD after terminal state
  * is set (never on the HTTP serving threads), so a slow sink delays only
  * its own query's cleanup — and a listener failure NEVER fails the query
  * (reference behavior: log and drop). */
object EventListeners {

  /** Reference-shaped event JSON subset: metadata (queryId, query, state),
    * statistics (elapsedMs, totalRows), createTime/endTime,
    * failureInfo.message when failed. */
  trait Listener {
    def queryCreated(json: String): Unit
    def queryCompleted(json: String): Unit
  }

  private val listeners = new CopyOnWriteArrayList[Listener]()

  def register(l: Listener): Unit = listeners.add(l)
  def unregister(l: Listener): Unit = listeners.remove(l)

  private[server] def fireCreated(json: String): Unit =
    listeners.asScala.foreach(l =>
      try l.queryCreated(json)
      catch { case e: Exception =>
        System.err.println(s"[events] queryCreated listener failed: $e") })

  private[server] def fireCompleted(json: String): Unit =
    listeners.asScala.foreach(l =>
      try l.queryCompleted(json)
      catch { case e: Exception =>
        System.err.println(s"[events] queryCompleted listener failed: $e") })

  /** POST each event to `ingestUri` with up to `retries` re-attempts
    * (reference HttpEventListenerConfig.setRetryCount). */
  final class HttpEventListener(ingestUri: String, retries: Int = 2) extends Listener {
    private val http = HttpClient.newBuilder()
      .executor(java.util.concurrent.Executors.newFixedThreadPool(1, r => {
        val t = new Thread(r, "graft-event-post"); t.setDaemon(true); t
      }))
      .build()

    private def post(json: String): Unit = {
      var attempt = 0
      var done = false
      while (!done) {
        try {
          val resp = http.send(
            HttpRequest.newBuilder(URI.create(ingestUri))
              .header("Content-Type", "application/json")
              .POST(HttpRequest.BodyPublishers.ofString(json)).build(),
            HttpResponse.BodyHandlers.discarding())
          if (resp.statusCode() / 100 == 2) done = true
          else if (attempt >= retries)
            throw new IllegalStateException(s"ingest returned ${resp.statusCode()}")
          else attempt += 1
        } catch {
          case e: Exception if attempt < retries => attempt += 1
          case e: Exception => throw e
        }
      }
    }

    override def queryCreated(json: String): Unit = post(json)
    override def queryCompleted(json: String): Unit = post(json)
  }

  /** Publish each event to a Kafka topic over the wire protocol
    * (reference: plugin/trino-kafka-event-listener —
    * KafkaEventListener routes created/completed events to configured
    * topics keyed by query id; consumers read them back as a stream).
    * Partition = hash(queryId) % partitionCount, so one query's lifecycle
    * events stay ordered within a partition. The producer connection is
    * lazy and re-opened on failure; a broker outage never fails queries
    * (fire* already isolates listener errors). */
  final class KafkaEventListener(host: String, port: Int, topic: String)
      extends Listener {
    private var client: graft.sources.KafkaWire.Client = _
    private var partitions: Int = 0

    private val QueryId = """"queryId"\s*:\s*"([^"]+)"""".r

    private def publish(json: String): Unit = synchronized {
      // any failure — including a partitionCount probe against a not-yet-
      // known topic — resets the connection so the NEXT event retries the
      // whole init (stale partition counts never stick)
      try {
        if (client == null) {
          client = new graft.sources.KafkaWire.Client(host, port)
          partitions = client.partitionCount(topic)
        }
        val key = QueryId.findFirstMatchIn(json).map(_.group(1)).getOrElse("")
        val p = math.floorMod(key.hashCode, math.max(1, partitions))
        client.produce(topic, p, Seq(graft.sources.KafkaWire.Msg(
          key.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          System.currentTimeMillis())))
        ()
      } catch {
        case e: Exception =>
          if (client != null) {
            try client.close() catch { case _: Exception => () }
          }
          client = null
          partitions = 0
          throw e
      }
    }

    override def queryCreated(json: String): Unit = publish(json)
    override def queryCompleted(json: String): Unit = publish(json)
  }
}
