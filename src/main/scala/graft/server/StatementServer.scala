package graft.server

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The network front door: a loopback HTTP server speaking the reference's
  * statement protocol (reference: dispatcher/QueuedStatementResource.java:111
  * accepts `POST /v1/statement`; server/protocol/ExecutingStatementResource
  * .java:69 pages results from `GET /v1/statement/executing/{id}/{slug}/
  * {token}`; client/trino-client QueryResults.java carries id / nextUri /
  * columns / data / stats / error). A client submits SQL text, polls
  * `nextUri` until it disappears, and concatenates each page's `data` —
  * exactly how the reference CLI/JDBC drive a query.
  *
  * Execution: statements run asynchronously on a bounded pool through the
  * same [[graft.sqlx.TrinoDialect]] front door the in-process API uses, so
  * every SQL-text capability (queries, DML, DDL, CALL, transactions,
  * PREPARE) is reachable over the wire. Results are paged 1000 rows at a
  * time. The driver-side collect is the result-serving boundary every
  * coordinator has — bounded by the result size, not the input.
  *
  * Subset (documented): no authentication (loopback bind), no session
  * headers/catalog switching, one page size; `DELETE` on the executing URI
  * cancels a queued/running statement best-effort. */
object StatementServer {

  private val PageSize = 1000

  // daemon threads: the server must never hold a finished JVM open (Verify
  // and the driver gate exit by main-thread return, not System.exit)
  private def daemonPool(n: Int, name: String) =
    Executors.newFixedThreadPool(n, new java.util.concurrent.ThreadFactory {
      private val i = new AtomicLong(0L)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$name-${i.incrementAndGet()}")
        t.setDaemon(true); t
      }
    })

  private sealed trait State
  private case object Queued extends State
  private case object Running extends State
  private final case class Finished(schema: StructType, rows: Array[Row]) extends State
  private final case class Failed(message: String,
      errorName: String = "GENERIC_INTERNAL_ERROR") extends State
  private case object Cancelled extends State

  final class Handle private[StatementServer] (
      val server: HttpServer, pool: java.util.concurrent.ExecutorService) {
    def port: Int = server.getAddress.getPort
    def uri: String = s"http://127.0.0.1:$port"
    def stop(): Unit = { server.stop(0); pool.shutdownNow() }
  }

  /** Start on 127.0.0.1:`port` (0 = ephemeral); statements execute against
    * the fixture catalog at `dir`. With `resourceGroups` set, every
    * submission is admitted through [[ResourceGroups.Manager]] (the
    * reference's dispatcher admission): over-concurrency queues, over-queue
    * fails with QUERY_QUEUE_FULL; the submitting user is the protocol's
    * `X-Trino-User` header. */
  def start(spark: SparkSession, dir: String, port: Int = 0,
      resourceGroups: Option[ResourceGroups.Config] = None): Handle = {
    val rgManager = resourceGroups.map(new ResourceGroups.Manager(_))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val pool = daemonPool(4, "graft-statement-exec")
    val nextId = new AtomicLong(0L)
    val queries = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicReference[State]]()
    // spooled-protocol state: queries that asked for an encoding (via the
    // X-Trino-Query-Data-Encoding header) and their spooled segment files
    val encodings = new ConcurrentHashMap[String, String]()
    val spoolDir = java.nio.file.Files.createTempDirectory("graft-spool").toFile
    spoolDir.deleteOnExit()

    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os: OutputStream = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }

    def resultsJson(id: String, token: Long, st: State): (Int, String) = {
      val base = s""""id":${jstr(id)},"infoUri":${jstr(s"/v1/query/$id")}"""
      st match {
        case Queued | Running =>
          val state = if (st == Queued) "QUEUED" else "RUNNING"
          (200, s"""{$base,"nextUri":${jstr(s"/v1/statement/executing/$id/x/$token")},""" +
            s""""stats":{"state":${jstr(state)}}}""")
        case Cancelled =>
          (200, s"""{$base,"stats":{"state":"FAILED"},""" +
            s""""error":{"message":"Query was canceled","errorName":"USER_CANCELED"}}""")
        case Failed(msg, errorName) =>
          (200, s"""{$base,"stats":{"state":"FAILED"},""" +
            s""""error":{"message":${jstr(msg)},"errorName":${jstr(errorName)}}}""")
        case Finished(schema, rows) =>
          val columns = schema.fields.map(f =>
            s"""{"name":${jstr(f.name)},"type":${jstr(trinoTypeName(f.dataType))}}""")
            .mkString("[", ",", "]")
          encodings.get(id) match {
            case "json" =>
              // spooled protocol (client/trino-client EncodedQueryData):
              // ALL segments in one response — small results ride inline
              // (base64 of the row-array JSON), larger ones spool to
              // segment files fetched out-of-band and ACKed by the client.
              // Subset: loopback URIs, no signing, one encoding ("json").
              val chunks = rows.grouped(PageSize).toVector
              val segs = chunks.zipWithIndex.map { case (chunk, i) =>
                val bytes = chunk.map(r => rowJson(r, schema))
                  .mkString("[", ",", "]").getBytes(StandardCharsets.UTF_8)
                val meta = s""""metadata":{"rowOffset":${i.toLong * PageSize},""" +
                  s""""rowsCount":${chunk.length},"segmentSize":${bytes.length}}"""
                if (rows.length <= PageSize)
                  s"""{"type":"inline","data":${jstr(
                    java.util.Base64.getEncoder.encodeToString(bytes))},$meta}"""
                else {
                  val f = new java.io.File(spoolDir, s"$id-$i.json")
                  java.nio.file.Files.write(f.toPath, bytes)
                  s"""{"type":"spooled","uri":${jstr(s"/v1/spooled/download/$id/$i")},""" +
                    s""""ackUri":${jstr(s"/v1/spooled/ack/$id/$i")},$meta}"""
                }
              }
              (200, s"""{$base,"columns":$columns,"data":{"encoding":"json",""" +
                s""""segments":${segs.mkString("[", ",", "]")}},""" +
                s""""stats":{"state":"FINISHED"}}""")
            case _ =>
              val from = (token * PageSize).toInt
              val page = rows.slice(from, from + PageSize)
              val hasMore = from + PageSize < rows.length
              val data = page.map(r => rowJson(r, schema)).mkString("[", ",", "]")
              val next =
                if (hasMore) s""""nextUri":${jstr(s"/v1/statement/executing/$id/x/${token + 1}")},"""
                else ""
              (200, s"""{$base,$next"columns":$columns,"data":$data,""" +
                s""""stats":{"state":"FINISHED"}}""")
          }
      }
    }

    server.createContext("/v1", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val path = ex.getRequestURI.getPath
        (ex.getRequestMethod, path) match {
          case ("POST", "/v1/statement") =>
            val sql = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val user = Option(ex.getRequestHeaders.getFirst("X-Trino-User"))
              .getOrElse("graft")
            val id = f"graft_${nextId.incrementAndGet()}%08d"
            Option(ex.getRequestHeaders.getFirst("X-Trino-Query-Data-Encoding"))
              .filter(_ == "json") // the one encoding this subset speaks
              .foreach(enc => encodings.put(id, enc))
            val ref = new java.util.concurrent.atomic.AtomicReference[State](Queued)
            queries.put(id, ref)
            // kill affects live statements only: a Finished/Failed result
            // is never clobbered retroactively
            QueryRegistry.register(id, () =>
              ref.compareAndSet(Queued, Cancelled) ||
                ref.compareAndSet(Running, Cancelled))
            val createMs = System.currentTimeMillis()
            EventListeners.fireCreated(
              s"""{"metadata":{"queryId":${jstr(id)},"query":${jstr(sql)},""" +
                s""""state":"QUEUED"},"createTime":$createMs}""")
            val admission = rgManager.map(_.admit(user))
            admission match {
              case Some(ResourceGroups.Reject(message)) =>
                ref.set(Failed(message, "QUERY_QUEUE_FULL"))
              case _ =>
                pool.submit(new Runnable {
                  override def run(): Unit = {
                    val group = admission.collect {
                      case ResourceGroups.RunNow(g) => g
                      case ResourceGroups.Queue(g) => g
                    }
                    try {
                      admission.foreach {
                        case q: ResourceGroups.Queue => rgManager.get.await(q)
                        case _ =>
                      }
                      if (!ref.compareAndSet(Queued, Running)) return // cancelled
                      val t0 = System.nanoTime()
                      def completed(state: String, rows: Long, failure: String): Unit = {
                        val elapsedMs = (System.nanoTime() - t0) / 1000000L
                        val fail = if (failure == null) ""
                          else s""","failureInfo":{"message":${jstr(failure)}}"""
                        EventListeners.fireCompleted(
                          s"""{"metadata":{"queryId":${jstr(id)},"query":${jstr(sql)},""" +
                            s""""state":${jstr(state)}},""" +
                            s""""statistics":{"elapsedMs":$elapsedMs,"totalRows":$rows},""" +
                            s""""createTime":$createMs,""" +
                            s""""endTime":${System.currentTimeMillis()}$fail}""")
                      }
                      try {
                        val df = graft.sqlx.TrinoDialect.sql(spark, dir, sql)
                        val rows = df.collect()
                        ref.compareAndSet(Running, Finished(df.schema, rows))
                        completed("FINISHED", rows.length.toLong, null)
                      } catch {
                        case e: Throwable =>
                          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
                          ref.compareAndSet(Running, Failed(msg))
                          completed("FAILED", 0L, msg)
                      }
                    } finally {
                      // slot held whether pre-acquired (RunNow) or awaited
                      // (Queue); released exactly once at terminal state
                      group.foreach(g => rgManager.get.release(g))
                    }
                  }
                })
            }
            val (code, body) = resultsJson(id, 0L, ref.get())
            respond(ex, code, body)
          case ("GET", ExecutingPath(id, token)) =>
            queries.get(id) match {
              case null => respond(ex, 404, s"""{"error":"unknown query $id"}""")
              case ref => val (code, body) = resultsJson(id, token.toLong, ref.get())
                respond(ex, code, body)
            }
          case ("DELETE", ExecutingPath(id, _)) =>
            queries.get(id) match {
              case null => respond(ex, 404, s"""{"error":"unknown query $id"}""")
              case ref =>
                ref.set(Cancelled)
                ex.sendResponseHeaders(204, -1); ex.close()
            }
          case ("GET", SpooledPath("download", qid, seg)) =>
            val f = new java.io.File(spoolDir, s"$qid-$seg.json")
            if (!f.isFile) respond(ex, 404, s"""{"error":"no spooled segment"}""")
            else {
              val bytes = java.nio.file.Files.readAllBytes(f.toPath)
              ex.getResponseHeaders.set("Content-Type", "application/json")
              ex.sendResponseHeaders(200, bytes.length.toLong)
              val os: OutputStream = ex.getResponseBody
              try os.write(bytes) finally os.close()
            }
          case (m, SpooledPath("ack", qid, seg)) if m == "GET" || m == "DELETE" =>
            // the client's acknowledgement releases the segment's storage
            new java.io.File(spoolDir, s"$qid-$seg.json").delete()
            ex.sendResponseHeaders(204, -1); ex.close()
          case (m, p) => respond(ex, 404, s"""{"error":"no route $m $p"}""")
        }
      } catch {
        case e: Throwable => respond(ex, 500, s"""{"error":${jstr(String.valueOf(e))}}""")
      }
    })
    server.setExecutor(daemonPool(4, "graft-statement-http"))
    // the JDK server's internal HTTP-Dispatcher thread inherits daemon
    // status from its creator and is otherwise non-daemon — start from a
    // daemon thread so an un-stopped server never pins a finished JVM
    val starter = new Thread(() => server.start(), "graft-statement-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    new Handle(server, pool)
  }

  private object SpooledPath {
    private val Re = """/v1/spooled/(download|ack)/([A-Za-z0-9_]+)/([0-9]+)""".r
    def unapply(path: String): Option[(String, String, String)] = path match {
      case Re(op, qid, seg) => Some((op, qid, seg))
      case _ => None
    }
  }

  private object ExecutingPath {
    private val Re = """/v1/statement/executing/([^/]+)/[^/]+/([0-9]+)""".r
    def unapply(path: String): Option[(String, String)] = path match {
      case Re(id, token) => Some((id, token))
      case _ => None
    }
  }

  /** Reference type-name spellings (client/trino-client ClientTypeSignature). */
  def trinoTypeName(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "integer"
    case ShortType => "smallint"
    case ByteType => "tinyint"
    case StringType => "varchar"
    case DoubleType => "double"
    case FloatType => "real"
    case BooleanType => "boolean"
    case DateType => "date"
    case BinaryType => "varbinary"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case _: TimestampType => "timestamp(6)"
    case _: TimestampNTZType => "timestamp(6)"
    case a: ArrayType => s"array(${trinoTypeName(a.elementType)})"
    case m: MapType => s"map(${trinoTypeName(m.keyType)},${trinoTypeName(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${trinoTypeName(f.dataType)}")
        .mkString("row(", ",", ")")
    case other => other.simpleString
  }

  private def rowJson(r: Row, schema: StructType): String =
    schema.fields.indices.map(i => valueJson(r.get(i))).mkString("[", ",", "]")

  private def valueJson(v: Any): String = v match {
    case null => "null"
    case s: String => jstr(s)
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => jnum(n.toDouble)
    case n: Double => jnum(n)
    case d: java.math.BigDecimal => jstr(d.toPlainString)
    case d: scala.math.BigDecimal => jstr(d.bigDecimal.toPlainString)
    case d: java.sql.Date => jstr(d.toString)
    case d: java.time.LocalDate => jstr(d.toString)
    case t: java.sql.Timestamp => jstr(t.toString)
    case t: java.time.Instant => jstr(t.toString)
    case t: java.time.LocalDateTime => jstr(t.toString)
    case b: Array[Byte] => jstr(java.util.Base64.getEncoder.encodeToString(b))
    case seq: scala.collection.Seq[_] =>
      seq.map(valueJson).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => s"${jstr(String.valueOf(k))}:${valueJson(mv)}" }
        .mkString("{", ",", "}")
    case r: Row =>
      (0 until r.length).map(i => valueJson(r.get(i))).mkString("[", ",", "]")
    case other => jstr(String.valueOf(other))
  }

  private def jnum(d: Double): String =
    if (d.isNaN) "\"NaN\""
    else if (d.isPosInfinity) "\"Infinity\""
    else if (d.isNegInfinity) "\"-Infinity\""
    else d.toString

  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
