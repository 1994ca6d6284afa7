package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Redis WIRE PROTOCOL — RESP2 server and client for the key/value
  * connector (reference: plugin/trino-redis — RedisSplitManager enumerates
  * one split per node, RedisRecordCursor SCANs the keyspace and fetches
  * values with pipelined MGET for STRING values / HGETALL for HASH values;
  * RedisInternalFieldDescription fixes the internal columns `_key`,
  * `_value`, `_key_length`, `_value_length`, `_key_corrupt`,
  * `_value_corrupt`). RESP2 is the public Redis serialization protocol:
  * simple strings `+…\r\n`, errors `-…\r\n`, integers `:n\r\n`, bulk
  * strings `$len\r\n…\r\n` (−1 = null), arrays `*n\r\n…` (−1 = null).
  *
  * Scale shape, as in the reference: the DRIVER enumerates nothing but the
  * node list (split = node); each EXECUTOR task owns one node, drives the
  * cursor-based SCAN itself and fetches values in pipelined batches — no
  * key list ever materializes on the driver, memory is O(batch). */
object RedisWire {

  // ------------------------------------------------------------ RESP codec

  private val CRLF = "\r\n".getBytes(StandardCharsets.US_ASCII)

  private def writeBulk(out: OutputStream, s: String): Unit =
    if (s == null) out.write("$-1\r\n".getBytes(StandardCharsets.US_ASCII))
    else {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.write(s"$$${b.length}".getBytes(StandardCharsets.US_ASCII)); out.write(CRLF)
      out.write(b); out.write(CRLF)
    }

  private def writeArrayHeader(out: OutputStream, n: Int): Unit =
    out.write(s"*$n\r\n".getBytes(StandardCharsets.US_ASCII))

  private def writeSimple(out: OutputStream, s: String): Unit =
    out.write(s"+$s\r\n".getBytes(StandardCharsets.US_ASCII))

  private def writeError(out: OutputStream, s: String): Unit =
    out.write(s"-ERR $s\r\n".getBytes(StandardCharsets.US_ASCII))

  private def writeInt(out: OutputStream, n: Long): Unit =
    out.write(s":$n\r\n".getBytes(StandardCharsets.US_ASCII))

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
    require(c >= 0, "RESP: unexpected end of stream")
    require(in.read() == '\n', "RESP: CR not followed by LF")
    sb.toString
  }

  /** Parse one RESP value: String (bulk/simple), Long, Vector[Any], or null. */
  private def readValue(in: InputStream): Any = {
    val line = readLine(in)
    require(line.nonEmpty, "RESP: empty frame")
    val body = line.substring(1)
    line.charAt(0) match {
      case '+' => body
      case '-' => throw new IllegalStateException(s"redis error: $body")
      case ':' => body.toLong
      case '$' =>
        val len = body.toInt
        if (len < 0) null
        else {
          val b = new Array[Byte](len)
          var got = 0
          while (got < len) {
            val n = in.read(b, got, len - got)
            require(n >= 0, "RESP: truncated bulk string")
            got += n
          }
          require(in.read() == '\r' && in.read() == '\n', "RESP: bulk not CRLF-terminated")
          new String(b, StandardCharsets.UTF_8)
        }
      case '*' =>
        val n = body.toInt
        if (n < 0) null else Vector.fill(n)(readValue(in))
      case c => throw new IllegalStateException(s"RESP: unknown type byte '$c'")
    }
  }

  // ---------------------------------------------------------------- server

  /** Glob MATCH subset the reference's cursor uses: '*' wildcard only. */
  private def globMatch(pattern: String, s: String): Boolean =
    if (pattern == null || pattern == "*") true
    else {
      val rx = java.util.regex.Pattern.quote(pattern).replace("*", "\\E.*\\Q")
      s.matches(rx)
    }

  /** A loopback Redis node: string and hash keyspaces, RESP2 front end.
    * Supports the command subset the reference cursor drives: PING, TYPE,
    * DBSIZE, SCAN (cursor, MATCH, COUNT), GET, MGET, HGETALL, and the
    * write side used by fixtures (SET, HSET, FLUSHALL). */
  final class Server(port0: Int = 0) extends AutoCloseable {
    private val strings = new ConcurrentHashMap[String, String]()
    private val hashes = new ConcurrentHashMap[String, Map[String, String]]()
    private val sock = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    def port: Int = sock.getLocalPort

    def set(k: String, v: String): Unit = { strings.put(k, v); () }
    def hset(k: String, fields: Map[String, String]): Unit = { hashes.put(k, fields); () }

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = sock.accept()
          val t = new Thread(() => try serve(s) catch { case _: Throwable => () }
            finally s.close())
          t.setDaemon(true); t.start()
        } catch { case _: Throwable => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    override def close(): Unit = { running = false; sock.close() }

    /** Stable key enumeration for SCAN: cursor = index into the sorted key
      * vector (a real server uses reverse-binary cursors over the dict; an
      * index over a point-in-time sorted snapshot honors the same contract
      * — every key present for the whole scan is returned exactly once). */
    private def allKeys: Vector[String] =
      (strings.keySet.asScala ++ hashes.keySet.asScala).toVector.sorted

    private def serve(s: Socket): Unit = {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      while (true) {
        val req = readValue(in) match {
          case v: Vector[_] => v.map(x => String.valueOf(x))
          case other => Vector(String.valueOf(other))
        }
        if (req.isEmpty) writeError(out, "empty command")
        else req.head.toUpperCase match {
          case "PING" => writeSimple(out, "PONG")
          case "QUIT" => writeSimple(out, "OK"); out.flush(); return
          case "FLUSHALL" => strings.clear(); hashes.clear(); writeSimple(out, "OK")
          case "DBSIZE" => writeInt(out, (strings.size + hashes.size).toLong)
          case "SET" =>
            strings.put(req(1), req(2)); writeSimple(out, "OK")
          case "HSET" =>
            val pairs = req.drop(2).grouped(2).collect { case Vector(f, v) => f -> v }.toMap
            hashes.merge(req(1), pairs, (a, b) => a ++ b)
            writeInt(out, pairs.size.toLong)
          case "TYPE" =>
            writeSimple(out,
              if (strings.containsKey(req(1))) "string"
              else if (hashes.containsKey(req(1))) "hash"
              else "none")
          case "GET" =>
            writeBulk(out, strings.get(req(1)))
          case "MGET" =>
            writeArrayHeader(out, req.length - 1)
            req.drop(1).foreach(k => writeBulk(out, strings.get(k)))
          case "HGETALL" =>
            val m = Option(hashes.get(req(1))).getOrElse(Map.empty)
            writeArrayHeader(out, m.size * 2)
            m.foreach { case (f, v) => writeBulk(out, f); writeBulk(out, v) }
          case "SCAN" =>
            val cursor = req(1).toLong.toInt
            var matchPat: String = null
            var count = 10
            var i = 2
            while (i + 1 < req.length) {
              req(i).toUpperCase match {
                case "MATCH" => matchPat = req(i + 1)
                case "COUNT" => count = req(i + 1).toInt
                case _ => ()
              }
              i += 2
            }
            val keys = allKeys
            val slice = keys.slice(cursor, cursor + count)
            val next = if (cursor + count >= keys.length) 0 else cursor + count
            writeArrayHeader(out, 2)
            writeBulk(out, next.toString)
            val hits = slice.filter(globMatch(matchPat, _))
            writeArrayHeader(out, hits.length)
            hits.foreach(writeBulk(out, _))
          case other => writeError(out, s"unknown command '$other'")
        }
        out.flush()
      }
    }
  }

  // ---------------------------------------------------------------- client

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out = new BufferedOutputStream(sock.getOutputStream)
    override def close(): Unit = sock.close()

    def command(args: String*): Any = {
      writeArrayHeader(out, args.length)
      args.foreach(writeBulk(out, _))
      out.flush()
      readValue(in)
    }

    /** Pipelined batch — N commands written, then N replies read (the
      * reference cursor's pipelined MGET/HGETALL round). */
    def pipeline(cmds: Seq[Seq[String]]): Seq[Any] = {
      cmds.foreach { args =>
        writeArrayHeader(out, args.length)
        args.foreach(writeBulk(out, _))
      }
      out.flush()
      cmds.map(_ => readValue(in))
    }

    def ping(): Boolean = command("PING") == "PONG"
    def set(k: String, v: String): Unit = { command("SET", k, v); () }
    def hset(k: String, fields: Map[String, String]): Unit = {
      command("HSET" +: k +: fields.toSeq.flatMap(p => Seq(p._1, p._2)): _*); ()
    }
    def get(k: String): Option[String] = Option(command("GET", k).asInstanceOf[String])
    def dbsize(): Long = command("DBSIZE").asInstanceOf[Long]

    def scan(cursor: String, matchPat: Option[String], count: Int): (String, Seq[String]) = {
      val args = Seq("SCAN", cursor) ++
        matchPat.toSeq.flatMap(p => Seq("MATCH", p)) ++ Seq("COUNT", count.toString)
      command(args: _*) match {
        case Vector(next: String, keys: Vector[_]) =>
          (next, keys.map(String.valueOf(_)))
        case other => throw new IllegalStateException(s"SCAN: unexpected reply $other")
      }
    }

    def mget(keys: Seq[String]): Seq[Option[String]] =
      if (keys.isEmpty) Nil
      else command("MGET" +: keys: _*) match {
        case v: Vector[_] => v.map(x => Option(x.asInstanceOf[String]))
        case other => throw new IllegalStateException(s"MGET: unexpected reply $other")
      }

    def hgetall(k: String): Map[String, String] = command("HGETALL", k) match {
      case v: Vector[_] =>
        v.map(String.valueOf(_)).grouped(2).collect { case Seq(f, x) => f -> x }.toMap
      case other => throw new IllegalStateException(s"HGETALL: unexpected reply $other")
    }
  }

  // ------------------------------------------------------- spark read path

  /** Internal-column schema (reference RedisInternalFieldDescription). For
    * HASH keys `_value` carries the field map re-encoded as JSON — the
    * decoder-facing text the reference hands its hash row decoder. */
  val rawSchema: StructType = StructType(Seq(
    StructField("_key", StringType, nullable = false),
    StructField("_value", StringType, nullable = true),
    StructField("_key_length", LongType, nullable = false),
    StructField("_value_length", LongType, nullable = true),
    StructField("_key_corrupt", BooleanType, nullable = false),
    StructField("_value_corrupt", BooleanType, nullable = false)))

  private def jsonOf(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s""""${esc(k)}":"${esc(v)}""""
    }.mkString("{", ",", "}")

  /** Distributed keyspace read: one task per node; the task drives SCAN
    * and fetches values in pipelined batches of `batch`. `keyPattern` is
    * pushed into SCAN MATCH — server-side key pruning, as when the
    * reference's table key prefix `schema:table:*` narrows the scan. */
  def read(spark: SparkSession, nodes: Seq[(String, Int)],
      keyPattern: Option[String] = None, batch: Int = 512): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(nodes, math.max(1, nodes.size))
      .flatMap { case (host, port) =>
        new Iterator[Seq[Row]] {
          private val c = new Client(host, port)
          // close on task completion too: a LIMIT (or any early stop)
          // abandons the iterator before exhaustion
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ =>
              try c.close() catch { case _: Exception => () }))
          private var cursor = "0"
          private var first = true
          def hasNext: Boolean = {
            val more = first || cursor != "0"
            if (!more) { try c.close() catch { case _: Exception => () } }
            more
          }
          def next(): Seq[Row] = {
            first = false
            val (nc, keys) = c.scan(cursor, keyPattern, batch)
            cursor = nc
            if (keys.isEmpty) Nil
            else {
              // one TYPE round, then MGET the strings / HGETALL the hashes
              val types = c.pipeline(keys.map(k => Seq("TYPE", k))).map(String.valueOf(_))
              val stringKeys = keys.zip(types).collect { case (k, "string") => k }
              val hashKeys = keys.zip(types).collect { case (k, "hash") => k }
              val svals = stringKeys.zip(c.mget(stringKeys))
              val hvals = c.pipeline(hashKeys.map(k => Seq("HGETALL", k)))
                .zip(hashKeys).map { case (reply, k) =>
                  val m = reply match {
                    case v: Vector[_] => v.map(String.valueOf(_)).grouped(2)
                      .collect { case Seq(f, x) => f -> x }.toMap
                    case _ => Map.empty[String, String]
                  }
                  k -> m
                }
              val out = mutable.ArrayBuffer[Row]()
              svals.foreach { case (k, v) =>
                val vlen: java.lang.Long =
                  v.map(x => java.lang.Long.valueOf(
                    x.getBytes(StandardCharsets.UTF_8).length.toLong)).orNull
                out += Row(k, v.orNull, k.getBytes(StandardCharsets.UTF_8).length.toLong,
                  vlen, false, v.isEmpty)
              }
              hvals.foreach { case (k, m) =>
                val j = jsonOf(m)
                out += Row(k, j, k.getBytes(StandardCharsets.UTF_8).length.toLong,
                  j.getBytes(StandardCharsets.UTF_8).length.toLong, false, m.isEmpty)
              }
              out.toSeq
            }
          }
        }.flatten
      }
    spark.createDataFrame(rows, rawSchema)
  }
}
