package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

/** PostgreSQL WIRE PROTOCOL v3 — server and client for the SQL-pushdown
  * connector family (reference: plugin/trino-postgresql — PostgreSqlClient
  * extends BaseJdbcClient and talks to the server over this same public
  * frontend/backend protocol; the reference rides libpq/JDBC for the
  * transport, this module speaks the protocol directly: StartupMessage
  * (196608), AuthenticationOk 'R', ParameterStatus 'S', BackendKeyData
  * 'K', ReadyForQuery 'Z', simple query 'Q' → RowDescription 'T' /
  * DataRow 'D' / CommandComplete 'C', ErrorResponse 'E', Terminate 'X' —
  * all text-format (format code 0), per the published protocol docs).
  *
  * The loopback server evaluates the SQL SUBSET the connector generates —
  * projected SELECT with a WHERE conjunction (=, <>, <, <=, >, >=, IN,
  * IS [NOT] NULL, AND/OR, parens), LIMIT, and MIN/MAX/COUNT aggregates
  * for split planning — mirroring how the other wire fixtures implement
  * exactly the surface their reference client drives. */
object PgWire {

  // PG type OIDs (public catalog constants)
  val OidBool = 16
  val OidInt8 = 20
  val OidInt2 = 21
  val OidInt4 = 23
  val OidText = 25
  val OidFloat4 = 700
  val OidFloat8 = 701
  val OidVarchar = 1043

  final case class Column(name: String, oid: Int)
  final case class TableDef(columns: Seq[Column], rows: Vector[Array[Any]])

  // ---------------------------------------------------------- wire codec

  private def cstr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](b.length + 1)
    System.arraycopy(b, 0, out, 0, b.length)
    out
  }

  /** One typed backend/frontend message: type byte + int32 length
    * (including itself) + payload. */
  private def send(out: DataOutputStream, tpe: Char, payload: Array[Byte]): Unit = {
    out.writeByte(tpe.toInt)
    out.writeInt(payload.length + 4)
    out.write(payload)
  }

  private def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val tpe = in.read()
    if (tpe < 0) throw new EOFException("pg: connection closed")
    val len = in.readInt()
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    (tpe.toChar, payload)
  }

  private def readCstr(b: Array[Byte], off: Int): (String, Int) = {
    var i = off
    while (b(i) != 0) i += 1
    (new String(b, off, i - off, StandardCharsets.UTF_8), i + 1)
  }

  // ---------------------------------------------------------------- server

  final class Server(port0: Int = 0) extends AutoCloseable {
    private val tables = new ConcurrentHashMap[String, TableDef]()
    private val sock = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    def port: Int = sock.getLocalPort

    /** DataRows sent since startup — lets tests assert how many rows
      * actually crossed the wire (the pushdown evidence). */
    val rowsServed = new java.util.concurrent.atomic.AtomicLong()

    def createTable(name: String, columns: Seq[Column], rows: Vector[Array[Any]]): Unit =
      tables.put(name.toLowerCase, TableDef(columns, rows))

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
      // StartupMessage has no type byte: int32 len, int32 protocol, params
      val len = in.readInt()
      val proto = in.readInt()
      if (proto == 80877103) { // SSLRequest: refuse, expect plain startup next
        out.writeByte('N'); out.flush()
        return serve2(s, in, out)
      }
      require(proto == 196608, s"pg: unsupported protocol $proto")
      val rest = new Array[Byte](len - 8)
      in.readFully(rest) // user/database params — loopback trusts all
      greet(out)
      loop(in, out)
    }

    private def serve2(s: Socket, in: DataInputStream, out: DataOutputStream): Unit = {
      val len = in.readInt()
      val proto = in.readInt()
      require(proto == 196608, s"pg: unsupported protocol $proto")
      val rest = new Array[Byte](len - 8)
      in.readFully(rest)
      greet(out)
      loop(in, out)
    }

    private def greet(out: DataOutputStream): Unit = {
      val ok = new java.io.ByteArrayOutputStream()
      new DataOutputStream(ok).writeInt(0) // AuthenticationOk
      send(out, 'R', ok.toByteArray)
      val ps = new java.io.ByteArrayOutputStream()
      ps.write(cstr("server_version")); ps.write(cstr("16.0 (graft loopback)"))
      send(out, 'S', ps.toByteArray)
      val key = new java.io.ByteArrayOutputStream()
      val dk = new DataOutputStream(key); dk.writeInt(1); dk.writeInt(42)
      send(out, 'K', key.toByteArray)
      send(out, 'Z', Array('I'.toByte))
      out.flush()
    }

    private def loop(in: DataInputStream, out: DataOutputStream): Unit = {
      while (true) {
        val (tpe, payload) = readMessage(in)
        tpe match {
          case 'Q' =>
            val (sql, _) = readCstr(payload, 0)
            try {
              val (cols, rows) = MiniSql.execute(sql, n => Option(tables.get(n)))
              sendRowDescription(out, cols)
              rows.foreach(r => sendDataRow(out, r))
              rowsServed.addAndGet(rows.size.toLong)
              send(out, 'C', cstr(s"SELECT ${rows.size}"))
            } catch {
              case e: Throwable => sendError(out, String.valueOf(e.getMessage))
            }
            send(out, 'Z', Array('I'.toByte))
            out.flush()
          case 'X' => return
          case other =>
            sendError(out, s"pg: unsupported message '$other'")
            send(out, 'Z', Array('I'.toByte))
            out.flush()
        }
      }
    }

    private def sendRowDescription(out: DataOutputStream, cols: Seq[Column]): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      d.writeShort(cols.size)
      cols.foreach { c =>
        d.write(cstr(c.name))
        d.writeInt(0)    // table oid
        d.writeShort(0)  // attnum
        d.writeInt(c.oid)
        d.writeShort(-1) // typlen (varlena)
        d.writeInt(-1)   // atttypmod
        d.writeShort(0)  // text format
      }
      send(out, 'T', buf.toByteArray)
    }

    private def sendDataRow(out: DataOutputStream, row: Seq[Any]): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      d.writeShort(row.size)
      row.foreach {
        case null => d.writeInt(-1)
        case v =>
          val text = v match {
            case b: Boolean => if (b) "t" else "f" // PG text format for bool
            case other => String.valueOf(other)
          }
          val bytes = text.getBytes(StandardCharsets.UTF_8)
          d.writeInt(bytes.length)
          d.write(bytes)
      }
      send(out, 'D', buf.toByteArray)
    }

    private def sendError(out: DataOutputStream, msg: String): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      buf.write('S'.toInt); buf.write(cstr("ERROR"))
      buf.write('C'.toInt); buf.write(cstr("42601"))
      buf.write('M'.toInt); buf.write(cstr(msg))
      buf.write(0)
      send(out, 'E', buf.toByteArray)
    }
  }

  // ------------------------------------------------- server-side mini SQL

  /** The SELECT subset the connector's generated SQL needs (projection,
    * conjunctive/disjunctive predicates, IN, NULL tests, LIMIT, MIN/MAX/
    * COUNT for split bounds). Recursive descent over the raw text. */
  private[sources] object MiniSql {
    sealed trait Expr
    final case class Cmp(col: String, op: String, lit: Any) extends Expr
    final case class InList(col: String, lits: Seq[Any]) extends Expr
    final case class NullTest(col: String, isNull: Boolean) extends Expr
    final case class AndE(l: Expr, r: Expr) extends Expr
    final case class OrE(l: Expr, r: Expr) extends Expr
    final case class NotE(e: Expr) extends Expr

    final class P(val s: String) {
      var i = 0
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      def peekWord(w: String): Boolean = {
        ws()
        s.regionMatches(true, i, w, 0, w.length) && {
          // '_' continues an identifier: NOT must not match not_active
          val next = i + w.length
          next >= s.length ||
            (!Character.isLetterOrDigit(s.charAt(next)) && s.charAt(next) != '_')
        }
      }
      def word(w: String): Boolean = { if (peekWord(w)) { i += w.length; true } else false }
      def expect(c: Char): Unit = {
        ws()
        require(i < s.length && s.charAt(i) == c, s"pg: expected '$c' at $i in: $s")
        i += 1
      }
      def tryChar(c: Char): Boolean = {
        ws()
        if (i < s.length && s.charAt(i) == c) { i += 1; true } else false
      }
      def ident(): String = {
        ws()
        if (tryChar('"')) {
          val start = i
          while (s.charAt(i) != '"') i += 1
          val r = s.substring(start, i); i += 1; r
        } else if (tryChar('`')) {
          // MySQL-family backtick quoting (ClickHouse accepts it too) —
          // case-preserved, `` escapes a literal backtick
          val sb = new StringBuilder
          var done = false
          while (!done) {
            val c = s.charAt(i); i += 1
            if (c == '`') {
              if (i < s.length && s.charAt(i) == '`') { sb.append('`'); i += 1 }
              else done = true
            } else sb.append(c)
          }
          sb.toString
        } else {
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          require(i > start, s"pg: expected identifier at $start in: $s")
          s.substring(start, i).toLowerCase
        }
      }
      def literal(): Any = {
        ws()
        if (tryChar('\'')) {
          val sb = new StringBuilder
          var done = false
          while (!done) {
            val c = s.charAt(i); i += 1
            if (c == '\'') {
              if (i < s.length && s.charAt(i) == '\'') { sb.append('\''); i += 1 }
              else done = true
            } else sb.append(c)
          }
          sb.toString
        } else if (word("TRUE")) java.lang.Boolean.TRUE
        else if (word("FALSE")) java.lang.Boolean.FALSE
        else if (word("NULL")) null
        else {
          val start = i
          if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
            s.charAt(i) == 'e' || s.charAt(i) == 'E')) i += 1
          val t = s.substring(start, i)
          require(t.nonEmpty, s"pg: expected literal at $start in: $s")
          if (t.contains('.') || t.toLowerCase.contains('e')) t.toDouble
          else java.lang.Long.valueOf(t)
        }
      }
      def op(): String = {
        ws()
        val ops = Seq("<>", "!=", "<=", ">=", "=", "<", ">")
        ops.find(o => s.regionMatches(i, o, 0, o.length)) match {
          case Some(o) => i += o.length; if (o == "!=") "<>" else o
          case None => throw new IllegalArgumentException(s"pg: expected operator at $i in: $s")
        }
      }
    }

    private def parseExpr(p: P): Expr = {
      var l = parseAnd(p)
      while (p.word("OR")) l = OrE(l, parseAnd(p))
      l
    }
    private def parseAnd(p: P): Expr = {
      var l = parsePrimary(p)
      while (p.word("AND")) l = AndE(l, parsePrimary(p))
      l
    }
    private def parsePrimary(p: P): Expr = {
      if (p.word("NOT")) return NotE(parsePrimary(p))
      if (p.tryChar('(')) {
        val e = parseExpr(p); p.expect(')'); return e
      }
      val col = p.ident()
      if (p.word("IS")) {
        val not = p.word("NOT")
        require(p.word("NULL"), s"pg: expected NULL after IS")
        NullTest(col, isNull = !not)
      } else if (p.word("IN")) {
        p.expect('(')
        val lits = mutable.ArrayBuffer[Any](p.literal())
        while (p.tryChar(',')) lits += p.literal()
        p.expect(')')
        InList(col, lits.toSeq)
      } else Cmp(col, p.op(), p.literal())
    }

    private def cmpVals(a: Any, b: Any): Option[Int] = (a, b) match {
      case (null, _) | (_, null) => None
      case (x: Number, y: Number) =>
        Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
      case _ => None
    }

    /** SQL three-valued logic: None = UNKNOWN (null operand). A WHERE
      * keeps a row only on definite TRUE — so NOT(col = x) correctly drops
      * null rows, matching what a real server gives the connector. */
    private def eval3(e: Expr, cols: Map[String, Int], row: Array[Any]): Option[Boolean] = e match {
      case Cmp(c, op, lit) => cmpVals(row(cols(c)), lit).map { r =>
        op match {
          case "=" => r == 0
          case "<>" => r != 0
          case "<" => r < 0
          case "<=" => r <= 0
          case ">" => r > 0
          case ">=" => r >= 0
        }
      }
      case InList(c, lits) =>
        val v = row(cols(c))
        if (v == null) None
        else if (lits.exists(l => cmpVals(v, l).contains(0))) Some(true)
        else if (lits.contains(null)) None
        else Some(false)
      case NullTest(c, isNull) => Some((row(cols(c)) == null) == isNull)
      case AndE(l, r) => (eval3(l, cols, row), eval3(r, cols, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case OrE(l, r) => (eval3(l, cols, row), eval3(r, cols, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case NotE(x) => eval3(x, cols, row).map(!_)
    }

    private def eval(e: Expr, cols: Map[String, Int], row: Array[Any]): Boolean =
      eval3(e, cols, row).contains(true)

    /** Parse + run one SELECT. Returns (output columns, rows). */
    def execute(sql: String,
        lookup: String => Option[TableDef]): (Seq[Column], Vector[Seq[Any]]) = {
      val p = new P(sql.trim.stripSuffix(";"))
      require(p.word("SELECT"), s"pg: only SELECT supported: $sql")
      // select list: * | items (aggregates or columns)
      sealed trait Item
      case object Star extends Item
      final case class ColItem(name: String) extends Item
      final case class AggItem(fn: String, col: String) extends Item
      final case class LitItem(v: Any) extends Item // SELECT 1 (count probes)
      val items = mutable.ArrayBuffer[Item]()
      p.ws()
      if (p.tryChar('*')) items += Star
      else {
        var more = true
        while (more) {
          p.ws()
          val fn =
            if (p.word("MIN")) "MIN"
            else if (p.word("MAX")) "MAX"
            else if (p.word("COUNT")) "COUNT"
            else if (p.word("SUM")) "SUM"
            else if (p.word("AVG")) "AVG"
            else ""
          if (fn.nonEmpty) {
            p.expect('(')
            val col = if (p.tryChar('*')) "*" else p.ident()
            p.expect(')')
            items += AggItem(fn, col)
          } else if (p.i < p.s.length &&
              (p.s.charAt(p.i).isDigit || p.s.charAt(p.i) == '\'')) {
            items += LitItem(p.literal())
          } else items += ColItem(p.ident())
          more = p.tryChar(',')
        }
      }
      require(p.word("FROM"), s"pg: expected FROM in: $sql")
      // derived table — `FROM (SELECT …) alias` — for LIMIT-0 schema probes
      val table = if (p.tryChar('(')) {
        val start = p.i
        var depth = 1
        while (depth > 0) {
          val c = p.s.charAt(p.i)
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          else if (c == '\'') { p.i += 1; while (p.s.charAt(p.i) != '\'') p.i += 1 }
          p.i += 1
        }
        val (cols, rows) = execute(p.s.substring(start, p.i - 1), lookup)
        if (p.word("AS")) p.ident() else if (!p.peekWord("WHERE") &&
          !p.peekWord("LIMIT") && p.i < p.s.length && {
            p.ws(); p.i < p.s.length && p.s.charAt(p.i).isLetter }) p.ident()
        TableDef(cols, rows.map(_.toArray))
      } else {
        val tableName = p.ident()
        lookup(tableName).getOrElse(
          throw new IllegalArgumentException(s"""relation "$tableName" does not exist"""))
      }
      val colIx = table.columns.map(_.name.toLowerCase).zipWithIndex.toMap
      val where = if (p.word("WHERE")) Some(parseExpr(p)) else None
      val groupBy: Seq[String] =
        if (p.word("GROUP")) {
          require(p.word("BY"), s"pg: expected BY after GROUP in: $sql")
          val gs = mutable.ArrayBuffer[String](p.ident())
          while (p.tryChar(',')) gs += p.ident()
          gs.toSeq.map(_.toLowerCase)
        } else Nil
      // ORDER BY col [ASC|DESC] [NULLS FIRST|LAST] — the connector's
      // TopN pushdown shape; sorts the TABLE rows (the key need not be
      // projected, like real SQL)
      val orderBy: Seq[(String, Boolean, Boolean)] =
        if (p.word("ORDER")) {
          require(p.word("BY"), s"pg: expected BY after ORDER in: $sql")
          val os = mutable.ArrayBuffer[(String, Boolean, Boolean)]()
          var more = true
          while (more) {
            val c = p.ident().toLowerCase
            val asc = if (p.word("DESC")) false else { p.word("ASC"); true }
            val nullsFirst =
              if (p.word("NULLS")) {
                if (p.word("FIRST")) true
                else { require(p.word("LAST"), "pg: expected FIRST/LAST"); false }
              } else !asc // engine default: NULLS LAST for ASC, FIRST for DESC
            os += ((c, asc, nullsFirst))
            more = p.tryChar(',')
          }
          os.toSeq
        } else Nil
      val limit = if (p.word("LIMIT")) Some(p.literal() match {
        case n: java.lang.Long => n.toInt
        case other => String.valueOf(other).toInt
      }) else None
      val offset = if (p.word("OFFSET")) (p.literal() match {
        case n: java.lang.Long => n.toInt
        case other => String.valueOf(other).toInt
      }) else 0
      p.ws()
      require(p.i >= p.s.length, s"pg: trailing input at ${p.i} in: $sql")

      val filtered0 = where match {
        case Some(w) => table.rows.filter(r => eval(w, colIx, r))
        case None => table.rows
      }
      val hasAgg = items.exists(_.isInstanceOf[AggItem]) || groupBy.nonEmpty
      require(orderBy.isEmpty || !hasAgg,
        "pg: ORDER BY with aggregates not supported by this subset")
      val sorted0 =
        if (orderBy.isEmpty) filtered0
        else filtered0.sortWith { (a, b) =>
          var r = 0
          val it = orderBy.iterator
          while (r == 0 && it.hasNext) {
            val (c, asc, nullsFirst) = it.next()
            val (va, vb) = (a(colIx(c)), b(colIx(c)))
            r = (va, vb) match {
              case (null, null) => 0
              case (null, _) => if (nullsFirst) -1 else 1
              case (_, null) => if (nullsFirst) 1 else -1
              case _ =>
                val c0 = cmpVals(va, vb).getOrElse(0)
                if (asc) c0 else -c0
            }
          }
          r < 0
        }
      // SQL applies OFFSET then LIMIT to OUTPUT rows: after aggregation
      val filtered =
        if (hasAgg) sorted0
        else limit.map(l => sorted0.drop(offset).take(l))
          .getOrElse(sorted0.drop(offset))

      if (hasAgg) {
        // SUM over integer columns types as int8, over floats as float8;
        // AVG is always float8; COUNT int8; MIN/MAX keep the column type
        def intOid(oid: Int): Boolean =
          oid == OidInt2 || oid == OidInt4 || oid == OidInt8
        val outCols = items.map {
          case AggItem("COUNT", _) => Column("count", OidInt8)
          case AggItem("AVG", _) => Column("avg", OidFloat8)
          case AggItem("SUM", c) =>
            val oid = table.columns(colIx(c.toLowerCase)).oid
            Column("sum", if (intOid(oid)) OidInt8 else OidFloat8)
          case AggItem(fn, c) =>
            Column(fn.toLowerCase, table.columns(colIx(c.toLowerCase)).oid)
          case ColItem(n) =>
            require(groupBy.contains(n.toLowerCase),
              s"""pg: column "$n" must appear in the GROUP BY clause""")
            table.columns(colIx(n.toLowerCase))
          case other => throw new IllegalArgumentException(
            s"pg: cannot mix $other with aggregates")
        }
        def lt(a: Any, b: Any): Boolean = cmpVals(a, b).exists(_ < 0)
        def aggRow(rows: Vector[Array[Any]], key: Seq[Any]): Seq[Any] =
          items.toSeq.map {
            case AggItem("COUNT", "*") => java.lang.Long.valueOf(rows.size.toLong)
            case AggItem(fn, c) =>
              val vals = rows.map(_(colIx(c.toLowerCase))).filter(_ != null)
              fn match {
                case "COUNT" => java.lang.Long.valueOf(vals.size.toLong)
                case _ if vals.isEmpty => null
                case "MIN" => vals.reduce((a, b) => if (lt(b, a)) b else a)
                case "MAX" => vals.reduce((a, b) => if (lt(a, b)) b else a)
                case "SUM" =>
                  if (intOid(table.columns(colIx(c.toLowerCase)).oid))
                    java.lang.Long.valueOf(
                      vals.map(_.asInstanceOf[Number].longValue).sum)
                  else java.lang.Double.valueOf(
                    vals.map(_.asInstanceOf[Number].doubleValue).sum)
                case "AVG" => java.lang.Double.valueOf(
                  vals.map(_.asInstanceOf[Number].doubleValue).sum / vals.size)
              }
            case ColItem(n) => key(groupBy.indexOf(n.toLowerCase))
            case _ => null
          }
        val rows: Vector[Seq[Any]] =
          if (groupBy.isEmpty) Vector(aggRow(filtered, Nil))
          else filtered
            .groupBy(r => groupBy.map(g => r(colIx(g))))
            .toVector
            .sortBy(_._1.map(String.valueOf).mkString(" "))
            .map { case (key, rs) => aggRow(rs, key) }
        (outCols.toSeq,
          limit.map(l => rows.drop(offset).take(l))
            .getOrElse(rows.drop(offset)))
      } else {
        // -1 marks a literal item (its value indexed separately)
        val lits = items.collect { case LitItem(v) => v }
        var litIx = -1
        val projected: Seq[Int] = items.toSeq.flatMap {
          case Star => table.columns.indices
          case ColItem(n) => Seq(colIx.getOrElse(n.toLowerCase,
            throw new IllegalArgumentException(s"""column "$n" does not exist""")))
          case LitItem(_) => litIx += 1; Seq(-1 - litIx)
          case _ => Nil
        }
        val outCols = projected.map { ix =>
          if (ix >= 0) table.columns(ix)
          else Column("?column?", lits(-1 - ix) match {
            case _: java.lang.Long => OidInt4
            case _: java.lang.Double => OidFloat8
            case _ => OidText
          })
        }
        (outCols,
          filtered.map(r => projected.map(ix =>
            if (ix >= 0) r(ix) else lits(-1 - ix))))
      }
    }

  }

  // ---------------------------------------------------------------- client

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    // startup: protocol 3.0 + user/database, then drain to ReadyForQuery
    locally {
      val params = new java.io.ByteArrayOutputStream()
      params.write(cstr("user")); params.write(cstr("graft"))
      params.write(cstr("database")); params.write(cstr("graft"))
      params.write(0)
      val body = params.toByteArray
      out.writeInt(body.length + 8)
      out.writeInt(196608)
      out.write(body)
      out.flush()
      var ready = false
      while (!ready) {
        val (tpe, payload) = readMessage(in)
        tpe match {
          case 'R' =>
            val code = ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
              ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
            require(code == 0, s"pg: unsupported auth method $code")
          case 'S' | 'K' | 'N' => () // ParameterStatus / BackendKeyData / notice
          case 'Z' => ready = true
          case 'E' => throw new IllegalStateException(s"pg: ${errorMessage(payload)}")
          case other => throw new IllegalStateException(s"pg: unexpected startup msg '$other'")
        }
      }
    }

    override def close(): Unit = {
      try { send(out, 'X', Array.empty); out.flush() } catch { case _: Throwable => () }
      sock.close()
    }

    private def errorMessage(payload: Array[Byte]): String = {
      var i = 0; var msg = "unknown error"
      while (i < payload.length && payload(i) != 0) {
        val code = payload(i).toChar
        val (text, next) = readCstr(payload, i + 1)
        if (code == 'M') msg = text
        i = next
      }
      msg
    }

    private def parseRowDescription(payload: Array[Byte]): Seq[Column] = {
      val d = new DataInputStream(new java.io.ByteArrayInputStream(payload))
      val n = d.readShort()
      (0 until n).map { _ =>
        // name is a cstring; then 18 fixed bytes (oid 6 bytes in)
        val sb = new StringBuilder
        var c = d.read()
        while (c != 0) { sb.append(c.toChar); c = d.read() }
        d.readInt(); d.readShort()
        val oid = d.readInt()
        d.readShort(); d.readInt(); d.readShort()
        Column(sb.toString, oid)
      }
    }

    private def parseDataRow(payload: Array[Byte]): Seq[String] = {
      val d = new DataInputStream(new java.io.ByteArrayInputStream(payload))
      val n = d.readShort()
      (0 until n).map { _ =>
        val len = d.readInt()
        if (len < 0) null
        else {
          val b = new Array[Byte](len)
          d.readFully(b)
          new String(b, StandardCharsets.UTF_8)
        }
      }
    }

    /** Simple query protocol, STREAMED: one 'Q'; rows are decoded from the
      * socket as the iterator is pulled — memory O(row), never O(result).
      * The iterator must be drained (or the connection dropped) before the
      * next query on this client. */
    def queryStream(sql: String): (Seq[Column], Iterator[Seq[String]]) = {
      send(out, 'Q', cstr(sql))
      out.flush()
      var cols: Seq[Column] = Nil
      var firstRow: Seq[String] = null
      var finished = false
      // read up to the first DataRow (or completion) to learn the columns
      while (firstRow == null && !finished) {
        val (tpe, payload) = readMessage(in)
        tpe match {
          case 'T' => cols = parseRowDescription(payload)
          case 'D' => firstRow = parseDataRow(payload)
          case 'C' | 'S' | 'N' => ()
          case 'E' =>
            val msg = errorMessage(payload)
            drainToReady()
            throw new IllegalStateException(s"pg error: $msg")
          case 'Z' => finished = true
          case other => throw new IllegalStateException(s"pg: unexpected msg '$other'")
        }
      }
      val head = Option(firstRow)
      val done0 = finished
      val it = new Iterator[Seq[String]] {
        private var pending = head
        private var done = done0
        private def advance(): Unit = {
          var found = false
          while (!found && !done) {
            val (tpe, payload) = readMessage(in)
            tpe match {
              case 'D' => pending = Some(parseDataRow(payload)); found = true
              case 'C' | 'S' | 'N' => ()
              case 'E' =>
                val msg = errorMessage(payload)
                drainToReady()
                throw new IllegalStateException(s"pg error: $msg")
              case 'Z' => done = true
              case other => throw new IllegalStateException(s"pg: unexpected msg '$other'")
            }
          }
        }
        def hasNext: Boolean = {
          if (pending.isEmpty && !done) advance()
          pending.nonEmpty
        }
        def next(): Seq[String] = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending.get
          pending = None
          r
        }
      }
      (cols, it)
    }

    private def drainToReady(): Unit = {
      var done = false
      while (!done) {
        val (tpe, _) = readMessage(in)
        if (tpe == 'Z') done = true
      }
    }

    /** Materialized variant for bounded metadata/fixture queries. */
    def query(sql: String): (Seq[Column], Vector[Seq[String]]) = {
      val (cols, it) = queryStream(sql)
      (cols, it.toVector)
    }
  }

  /** Text-format value → JVM value by type OID (the client-side decode the
    * reference gets from JDBC's ResultSet accessors). */
  def decode(text: String, oid: Int): Any =
    if (text == null) null
    else oid match {
      case OidBool => text == "t" || text == "true"
      case OidInt2 => text.toShort
      case OidInt4 => text.toInt
      case OidInt8 => text.toLong
      case OidFloat4 => text.toFloat
      case OidFloat8 => text.toDouble
      case _ => text
    }
}
