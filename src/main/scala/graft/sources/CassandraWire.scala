package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** Cassandra CQL NATIVE PROTOCOL v4 — server and client for the wide-row
  * connector (reference: plugin/trino-cassandra — CassandraSplitManager
  * divides the Murmur3Partitioner token ring into ranges and each split's
  * CQL carries `token(pk) > lo AND token(pk) <= hi`; CassandraSession
  * speaks the native protocol through the datastax driver: STARTUP/READY
  * handshake, QUERY (opcode 0x07) with consistency + paging flags, RESULT
  * Rows (kind 2) with global table spec, column specs, binary values, and
  * `has_more_pages` paging state). Framing per the public protocol spec:
  * 9-byte header (version, flags, stream int16, opcode, length int32).
  *
  * The loopback node stores rows per table, computes each row's token
  * with murmur3_x64_128 (first 64 bits — the Murmur3Partitioner shape,
  * graft.ext.ParityMath.murmur3x64128) over the partition key's CQL
  * binary form, and evaluates the CQL subset the connector generates by
  * rewriting `token(pk)` to a virtual column and delegating to the same
  * SELECT evaluator the other SQL-speaking fixtures use (PgWire.MiniSql).
  * `system_schema.columns` is served as a real table, so schema discovery
  * happens over the wire exactly like a driver does it. */
object CassandraWire {

  import PgWire.{Column => PCol, TableDef}

  // CQL type option ids (protocol §6)
  val TBigint = 0x02
  val TBoolean = 0x04
  val TDouble = 0x07
  val TInt = 0x09
  val TVarchar = 0x0d

  final case class CqlColumn(name: String, cqlType: Int)

  private def oidOf(t: Int): Int = t match {
    case TBigint => PgWire.OidInt8
    case TBoolean => PgWire.OidBool
    case TDouble => PgWire.OidFloat8
    case TInt => PgWire.OidInt4
    case TVarchar => PgWire.OidVarchar
    case other => throw new IllegalArgumentException(s"cql: unmapped type $other")
  }

  private def cqlTypeName(t: Int): String = t match {
    case TBigint => "bigint"
    case TBoolean => "boolean"
    case TDouble => "double"
    case TInt => "int"
    case TVarchar => "varchar"
    case other => throw new IllegalArgumentException(s"cql: unmapped type $other")
  }

  def typeOfName(n: String): Int = n match {
    case "bigint" => TBigint
    case "boolean" => TBoolean
    case "double" => TDouble
    case "int" => TInt
    case "varchar" | "text" => TVarchar
    case other => throw new IllegalArgumentException(s"cql: unmapped type '$other'")
  }

  /** CQL binary value encoding (protocol §6: fixed-width numerics
    * big-endian, utf8 text, one-byte boolean). */
  def encodeValue(v: Any, t: Int): Array[Byte] = (t, v) match {
    case (TBigint, l: Long) => ByteBuffer.allocate(8).putLong(l).array()
    case (TBigint, i: Int) => ByteBuffer.allocate(8).putLong(i.toLong).array()
    case (TInt, i: Int) => ByteBuffer.allocate(4).putInt(i).array()
    case (TInt, l: Long) => ByteBuffer.allocate(4).putInt(l.toInt).array()
    case (TDouble, d: Double) => ByteBuffer.allocate(8).putDouble(d).array()
    case (TBoolean, b: Boolean) => Array((if (b) 1 else 0).toByte)
    case (TVarchar, s: String) => s.getBytes(StandardCharsets.UTF_8)
    case other => throw new IllegalArgumentException(s"cql: cannot encode $other")
  }

  def decodeValue(b: Array[Byte], t: Int): Any = t match {
    case TBigint => ByteBuffer.wrap(b).getLong
    case TInt => ByteBuffer.wrap(b).getInt
    case TDouble => ByteBuffer.wrap(b).getDouble
    case TBoolean => b(0) != 0
    case TVarchar => new String(b, StandardCharsets.UTF_8)
    case other => throw new IllegalArgumentException(s"cql: unmapped type $other")
  }

  /** Murmur3Partitioner token: first 64 bits of murmur3_x64_128 over the
    * key's CQL binary form. */
  def token(keyValue: Any, keyType: Int): Long =
    ByteBuffer.wrap(graft.ext.ParityMath.murmur3x64128(
      encodeValue(keyValue, keyType))).getLong

  // ------------------------------------------------------------ framing

  private val VersionReq = 0x04
  private val VersionResp = 0x84.toByte

  private val OpError = 0x00
  private val OpStartup = 0x01
  private val OpReady = 0x02
  private val OpOptions = 0x05
  private val OpSupported = 0x06
  private val OpQuery = 0x07
  private val OpResult = 0x08

  private def writeFrame(out: DataOutputStream, version: Byte, stream: Short,
      opcode: Int, body: Array[Byte]): Unit = {
    out.writeByte(version.toInt)
    out.writeByte(0) // flags
    out.writeShort(stream.toInt)
    out.writeByte(opcode)
    out.writeInt(body.length)
    out.write(body)
    out.flush()
  }

  private def readFrame(in: DataInputStream): (Byte, Short, Int, Array[Byte]) = {
    val version = in.readByte()
    in.readByte() // flags
    val stream = in.readShort()
    val opcode = in.readByte().toInt & 0xff
    val len = in.readInt()
    val body = new Array[Byte](len)
    in.readFully(body)
    (version, stream, opcode, body)
  }

  private def wString(bb: ByteBuffer, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    bb.putShort(b.length.toShort); bb.put(b)
  }

  private def rString(bb: ByteBuffer): String = {
    val n = bb.getShort
    val b = new Array[Byte](n); bb.get(b)
    new String(b, StandardCharsets.UTF_8)
  }

  private def rLongString(bb: ByteBuffer): String = {
    val n = bb.getInt
    val b = new Array[Byte](n); bb.get(b)
    new String(b, StandardCharsets.UTF_8)
  }

  // ---------------------------------------------------------------- server

  final class Server(port0: Int = 0) extends AutoCloseable {
    // "ks.table" → (cql column types, TableDef with __token virtual col)
    private val tables = new ConcurrentHashMap[String, (Seq[CqlColumn], TableDef)]()
    private val sock = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    def port: Int = sock.getLocalPort

    /** Register a table: first column is the partition key; each row gains
      * the virtual `__token` column = Murmur3Partitioner token of its key,
      * which `token(pk)` predicates rewrite onto. */
    def createTable(ks: String, name: String, columns: Seq[CqlColumn],
        rows: Vector[Array[Any]]): Unit = {
      val keyType = columns.head.cqlType
      val withToken = rows.map(r => r :+ (token(r(0), keyType): Any))
      val pcols = columns.map(c => PCol(c.name, oidOf(c.cqlType))) :+
        PCol("__token", PgWire.OidInt8)
      tables.put(s"$ks.$name", (columns, TableDef(pcols, withToken)))
      refreshSystemSchema()
    }

    /** system_schema.columns, served as a real queryable table (how a
      * driver discovers schemas over the wire). Faithful to a real server:
      * rows are CLUSTERED BY column_name (alphabetical, NOT table order)
      * and carry `kind` (partition_key / regular) and `position` — a client
      * that assumes the first row is the partition key reads garbage, just
      * like against real Cassandra. */
    private def refreshSystemSchema(): Unit = {
      import scala.jdk.CollectionConverters._
      val rows = tables.asScala.toVector
        .filterNot(_._1.startsWith("system_schema."))
        .flatMap { case (key, (cols, _)) =>
          val Array(ks, tbl) = key.split("\\.", 2)
          cols.zipWithIndex.map { case (c, i) =>
            val kind = if (i == 0) "partition_key" else "regular"
            val pos: Long = if (i == 0) 0L else -1L
            Array[Any](ks, tbl, c.name, cqlTypeName(c.cqlType), kind, pos)
          }.sortBy(_(2).asInstanceOf[String])
        }
      val schemaCols = Seq(CqlColumn("keyspace_name", TVarchar),
        CqlColumn("table_name", TVarchar), CqlColumn("column_name", TVarchar),
        CqlColumn("type", TVarchar), CqlColumn("kind", TVarchar),
        CqlColumn("position", TBigint))
      val pcols = schemaCols.map(c => PCol(c.name, oidOf(c.cqlType)))
      tables.put("system_schema.columns",
        (schemaCols, TableDef(pcols, rows.map(_ :+ (0L: Any)))))
      ()
    }

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

    private def serve(s: Socket): Unit = {
      val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
      while (true) {
        val (_, stream, opcode, body) = readFrame(in)
        opcode match {
          case OpOptions =>
            // SUPPORTED with an empty string multimap
            writeFrame(out, VersionResp, stream, OpSupported,
              Array[Byte](0, 0))
          case OpStartup =>
            writeFrame(out, VersionResp, stream, OpReady, Array.empty)
          case OpQuery =>
            try {
              val bb = ByteBuffer.wrap(body)
              val cql = rLongString(bb)
              bb.getShort // consistency
              val flags = bb.get()
              val pageSize = if ((flags & 0x04) != 0) Some(bb.getInt) else None
              val pagingState = if ((flags & 0x08) != 0) {
                val n = bb.getInt
                if (n < 0) None else { val b = new Array[Byte](n); bb.get(b); Some(b) }
              } else None
              writeFrame(out, VersionResp, stream, OpResult,
                runQuery(cql, pageSize, pagingState))
            } catch {
              case e: Throwable =>
                val msg = String.valueOf(e.getMessage)
                val bb = ByteBuffer.allocate(16 + msg.length * 3)
                bb.putInt(0x2000) // syntax error code family
                wString(bb, msg)
                writeFrame(out, VersionResp, stream, OpError,
                  java.util.Arrays.copyOf(bb.array(), bb.position()))
            }
          case other =>
            val bb = ByteBuffer.allocate(64)
            bb.putInt(0x000A)
            wString(bb, s"unsupported opcode $other")
            writeFrame(out, VersionResp, stream, OpError,
              java.util.Arrays.copyOf(bb.array(), bb.position()))
        }
      }
    }

    /** Lower the CQL onto the shared SELECT evaluator: `token(col)` →
      * `"__token"`, `ALLOW FILTERING` stripped, `ks.table` resolved. */
    private def runQuery(cql0: String, pageSize: Option[Int],
        pagingState: Option[Array[Byte]]): Array[Byte] = {
      val cql = cql0.trim
        .replaceAll("(?i)\\s+ALLOW\\s+FILTERING\\s*$", "")
        .replaceAll("(?i)token\\s*\\(\\s*\"?([A-Za-z_0-9]+)\"?\\s*\\)", "\"__token\"")
      // qualify: MiniSql has one flat namespace; accept ks.table directly
      val (keyspace, sql) = {
        val m = java.util.regex.Pattern
          .compile("(?i)\\bFROM\\s+\"?([A-Za-z_0-9]+)\"?\\.\"?([A-Za-z_0-9]+)\"?")
          .matcher(cql)
        if (m.find()) (m.group(1), cql.substring(0, m.start()) +
          s"FROM ${m.group(1)}__${m.group(2)}" + cql.substring(m.end()))
        else ("", cql)
      }
      val lookup: String => Option[TableDef] = { n =>
        val key = n.replace("__", ".")
        Option(tables.get(key)).map(_._2)
      }
      val (cols, allRows) = PgWire.MiniSql.execute(sql, lookup)
      // paging: state = row offset into the full result (the reference
      // treats paging state as an opaque cursor; an offset over a
      // point-in-time result honors that contract on an immutable fixture)
      val offset = pagingState.map(b => ByteBuffer.wrap(b).getInt).getOrElse(0)
      val page = pageSize.getOrElse(5000)
      val visible = cols.zipWithIndex.filter(_._1.name != "__token")
      val slice = allRows.slice(offset, offset + page)
      val more = offset + page < allRows.size

      val bb = ByteBuffer.allocate(1 << 22)
      bb.putInt(2) // kind: Rows
      val metaFlags = 0x01 | (if (more) 0x02 else 0) // global spec | more pages
      bb.putInt(metaFlags)
      bb.putInt(visible.size)
      if (more) {
        bb.putInt(4); bb.putInt(offset + page) // paging state bytes
      }
      wString(bb, keyspace); wString(bb, "t") // global table spec
      visible.foreach { case (c, _) =>
        wString(bb, c.name)
        bb.putShort(cqlTypeOfOid(c.oid).toShort)
      }
      bb.putInt(slice.size)
      slice.foreach { r =>
        visible.foreach { case (c, i) =>
          r(i) match {
            case null => bb.putInt(-1)
            case v =>
              val enc = encodeValue(v, cqlTypeOfOid(c.oid))
              bb.putInt(enc.length); bb.put(enc)
          }
        }
      }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }

    private def cqlTypeOfOid(oid: Int): Int = oid match {
      case PgWire.OidInt8 => TBigint
      case PgWire.OidInt4 => TInt
      case PgWire.OidFloat8 => TDouble
      case PgWire.OidBool => TBoolean
      case _ => TVarchar
    }
  }

  // ---------------------------------------------------------------- client

  final case class Page(columns: Seq[CqlColumn], rows: Vector[Seq[Any]],
      pagingState: Option[Array[Byte]])

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    private var stream: Short = 0

    locally { // STARTUP handshake
      val bb = ByteBuffer.allocate(64)
      bb.putShort(1)
      wString(bb, "CQL_VERSION"); wString(bb, "3.0.0")
      writeFrame(out, VersionReq.toByte, 0, OpStartup,
        java.util.Arrays.copyOf(bb.array(), bb.position()))
      val (_, _, op, body) = readFrame(in)
      require(op == OpReady, s"cql: expected READY, got opcode $op: ${errorOf(op, body)}")
    }

    override def close(): Unit = sock.close()

    private def errorOf(op: Int, body: Array[Byte]): String =
      if (op != OpError) ""
      else {
        val bb = ByteBuffer.wrap(body)
        val code = bb.getInt
        s"[0x${code.toHexString}] ${rString(bb)}"
      }

    /** One QUERY round (consistency ONE, optional page size + state). */
    def query(cql: String, pageSize: Option[Int] = None,
        pagingState: Option[Array[Byte]] = None): Page = {
      stream = ((stream + 1) & 0x7fff).toShort
      val cqlB = cql.getBytes(StandardCharsets.UTF_8)
      val bb = ByteBuffer.allocate(cqlB.length + 64)
      bb.putInt(cqlB.length); bb.put(cqlB)
      bb.putShort(1) // consistency ONE
      val flags = (pageSize.map(_ => 0x04).getOrElse(0) |
        pagingState.map(_ => 0x08).getOrElse(0)).toByte
      bb.put(flags)
      pageSize.foreach(bb.putInt)
      pagingState.foreach { st => bb.putInt(st.length); bb.put(st) }
      writeFrame(out, VersionReq.toByte, stream, OpQuery,
        java.util.Arrays.copyOf(bb.array(), bb.position()))
      val (_, _, op, body) = readFrame(in)
      require(op == OpResult, s"cql error: ${errorOf(op, body)}")
      parseRows(body)
    }

    /** Drain every page of a query as a STREAMING iterator — O(page)
      * memory, the reference cursor shape. */
    def queryAll(cql: String, pageSize: Int = 1000): (Seq[CqlColumn], Iterator[Seq[Any]]) = {
      val first = query(cql, Some(pageSize))
      val it = new Iterator[Seq[Any]] {
        private var page = first
        private var i = 0
        def hasNext: Boolean = {
          while (i >= page.rows.size && page.pagingState.isDefined) {
            page = query(cql, Some(pageSize), page.pagingState)
            i = 0
          }
          i < page.rows.size
        }
        def next(): Seq[Any] = {
          if (!hasNext) throw new NoSuchElementException
          val r = page.rows(i); i += 1; r
        }
      }
      (first.columns, it)
    }

    private def parseRows(body: Array[Byte]): Page = {
      val bb = ByteBuffer.wrap(body)
      val kind = bb.getInt
      require(kind == 2, s"cql: expected Rows result, got kind $kind")
      val flags = bb.getInt
      val nCols = bb.getInt
      val pagingState = if ((flags & 0x02) != 0) {
        val n = bb.getInt
        val b = new Array[Byte](n); bb.get(b); Some(b)
      } else None
      if ((flags & 0x01) != 0) { rString(bb); rString(bb) } // global spec
      val cols = (0 until nCols).map { _ =>
        if ((flags & 0x01) == 0) { rString(bb); rString(bb) } // per-col ks/table
        val name = rString(bb)
        CqlColumn(name, bb.getShort.toInt)
      }
      val nRows = bb.getInt
      val rows = (0 until nRows).map { _ =>
        cols.map { c =>
          val n = bb.getInt
          if (n < 0) null
          else {
            val b = new Array[Byte](n); bb.get(b)
            decodeValue(b, c.cqlType)
          }
        }
      }.toVector
      Page(cols, rows, pagingState)
    }
  }
}
