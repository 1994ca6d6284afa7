package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

/** MongoDB WIRE PROTOCOL — OP_MSG (opcode 2013) + BSON, server and client
  * for the document connector (reference: plugin/trino-mongodb —
  * MongoSession.execute issues `find` with a filter document built from
  * the pushed TupleDomain ($eq/$gt/$gte/$lt/$lte/$in under $and/$or), a
  * projection document from the column handles, and drains the cursor
  * with `getMore`; MongoSplitManager emits a single split per table).
  * Both the message framing and BSON are public specifications
  * (bsonspec.org; the MongoDB wire protocol docs).
  *
  * BSON subset: double 0x01, string 0x02, document 0x03, array 0x04,
  * bool 0x08, null 0x0A, int32 0x10, int64 0x12 — the scalar types the
  * connector maps. Documents are ordered key/value sequences (command
  * name must be the first key), so the codec carries Seq, not Map. */
object MongoWire {

  type Doc = Seq[(String, Any)]

  def get(d: Doc, k: String): Option[Any] = d.collectFirst { case (`k`, v) => v }

  // ----------------------------------------------------------- BSON codec

  private def cstr(out: mutable.ArrayBuilder[Byte], s: String): Unit = {
    out ++= s.getBytes(StandardCharsets.UTF_8)
    out += 0
  }

  private def i32(out: mutable.ArrayBuilder[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte
    out += ((v >> 16) & 0xff).toByte
    out += ((v >> 24) & 0xff).toByte
  }

  private def i64(out: mutable.ArrayBuilder[Byte], v: Long): Unit = {
    i32(out, (v & 0xffffffffL).toInt)
    i32(out, (v >>> 32).toInt)
  }

  def encodeDoc(doc: Doc): Array[Byte] = {
    val body = mutable.ArrayBuilder.make[Byte]
    doc.foreach { case (k, v) => encodeElement(body, k, v) }
    val elems = body.result()
    val out = mutable.ArrayBuilder.make[Byte]
    i32(out, elems.length + 5)
    out ++= elems
    out += 0
    out.result()
  }

  private def encodeElement(out: mutable.ArrayBuilder[Byte], k: String, v: Any): Unit =
    v match {
      case null => out += 0x0a; cstr(out, k)
      case d: Double => out += 0x01; cstr(out, k)
        i64(out, java.lang.Double.doubleToLongBits(d))
      case f: Float => encodeElement(out, k, f.toDouble)
      case s: String =>
        out += 0x02; cstr(out, k)
        val b = s.getBytes(StandardCharsets.UTF_8)
        i32(out, b.length + 1); out ++= b; out += 0
      case d: Seq[_] if d.forall(_.isInstanceOf[(_, _)]) && d.nonEmpty &&
          d.head.asInstanceOf[(_, _)]._1.isInstanceOf[String] =>
        out += 0x03; cstr(out, k)
        out ++= encodeDoc(d.asInstanceOf[Doc])
      case d: Seq[_] => // array: a doc keyed "0","1",…
        out += 0x04; cstr(out, k)
        out ++= encodeDoc(d.zipWithIndex.map { case (x, i) => i.toString -> x })
      case b: Boolean => out += 0x08; cstr(out, k); out += (if (b) 1 else 0).toByte
      case i: Int => out += 0x10; cstr(out, k); i32(out, i)
      case l: Long => out += 0x12; cstr(out, k); i64(out, l)
      case e: EmptyDoc.type => out += 0x03; cstr(out, k); out ++= encodeDoc(Nil)
      case other => throw new IllegalArgumentException(
        s"bson: cannot encode ${other.getClass.getName}")
    }

  /** Marker for an empty subdocument (an empty Seq would be an array). */
  case object EmptyDoc

  def decodeDoc(bytes: Array[Byte]): Doc = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    decodeDoc(bb)
  }

  private def decodeDoc(bb: ByteBuffer): Doc = {
    val start = bb.position()
    val len = bb.getInt
    val out = Vector.newBuilder[(String, Any)]
    while (bb.position() < start + len - 1) {
      val tpe = bb.get()
      val name = readCstr(bb)
      val v: Any = tpe match {
        case 0x01 => java.lang.Double.longBitsToDouble(bb.getLong)
        case 0x02 =>
          val n = bb.getInt
          val b = new Array[Byte](n - 1); bb.get(b); bb.get() // trailing \0
          new String(b, StandardCharsets.UTF_8)
        case 0x03 => decodeDoc(bb)
        case 0x04 => decodeDoc(bb).map(_._2).toVector
        case 0x08 => bb.get() != 0
        case 0x0a => null
        case 0x10 => bb.getInt
        case 0x12 => bb.getLong
        case other => throw new IllegalArgumentException(
          f"bson: unsupported type 0x$other%02x for '$name'")
      }
      out += name -> v
    }
    require(bb.get() == 0, "bson: document not NUL-terminated")
    out.result()
  }

  private def readCstr(bb: ByteBuffer): String = {
    val sb = new mutable.ArrayBuilder.ofByte
    var c = bb.get()
    while (c != 0) { sb += c; c = bb.get() }
    new String(sb.result(), StandardCharsets.UTF_8)
  }

  // -------------------------------------------------------- OP_MSG framing

  private val OpMsg = 2013

  private def sendMsg(out: DataOutputStream, requestId: Int, responseTo: Int,
      doc: Doc): Unit = {
    val body = encodeDoc(doc)
    val len = 16 + 4 + 1 + body.length
    val bb = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(len).putInt(requestId).putInt(responseTo).putInt(OpMsg)
    bb.putInt(0)    // flagBits
    bb.put(0: Byte) // section kind 0
    bb.put(body)
    out.write(bb.array())
    out.flush()
  }

  private def readMsg(in: DataInputStream): (Int, Int, Doc) = {
    val hdr = new Array[Byte](16)
    try in.readFully(hdr)
    catch { case _: EOFException => throw new EOFException("mongo: connection closed") }
    val hb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
    val len = hb.getInt
    val requestId = hb.getInt
    hb.getInt // responseTo
    val op = hb.getInt
    require(op == OpMsg, s"mongo: unsupported opcode $op (OP_MSG only)")
    val rest = new Array[Byte](len - 16)
    in.readFully(rest)
    val bb = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
    bb.getInt // flagBits
    val kind = bb.get()
    require(kind == 0, s"mongo: section kind $kind not supported")
    (requestId, len, decodeDoc(bb))
  }

  // ---------------------------------------------------------------- server

  final class Server(port0: Int = 0) extends AutoCloseable {
    // "db.coll" → documents
    private val collections = new ConcurrentHashMap[String, Vector[Doc]]()
    private val cursors = new ConcurrentHashMap[Long, Vector[Doc]]()
    private val cursorSeq = new AtomicLong(0)
    private val sock = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    def port: Int = sock.getLocalPort

    def insert(db: String, coll: String, docs: Seq[Doc]): Unit =
      collections.merge(s"$db.$coll", docs.toVector, (a, b) => a ++ b)

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
      var rid = 1000
      while (true) {
        val (reqId, _, cmd) = readMsg(in)
        rid += 1
        val reply = try runCommand(cmd) catch {
          case e: Throwable => Seq("ok" -> 0.0,
            "errmsg" -> String.valueOf(e.getMessage), "code" -> 2)
        }
        sendMsg(out, rid, reqId, reply)
      }
    }

    private def runCommand(cmd: Doc): Doc = {
      val (name, _) = cmd.head
      name match {
        case "hello" | "isMaster" | "ismaster" =>
          Seq("ok" -> 1.0, "isWritablePrimary" -> true,
            "maxWireVersion" -> 17, "minWireVersion" -> 0,
            "maxBsonObjectSize" -> 16777216)
        case "ping" => Seq("ok" -> 1.0)
        case "find" =>
          val coll = get(cmd, "find").get.asInstanceOf[String]
          val db = get(cmd, "$db").map(_.asInstanceOf[String]).getOrElse("test")
          val ns = s"$db.$coll"
          val docs = Option(collections.get(ns)).getOrElse(Vector.empty)
          val filter = get(cmd, "filter").collect { case d: Seq[_] => d.asInstanceOf[Doc] }
            .getOrElse(Nil)
          val projection = get(cmd, "projection").collect { case d: Seq[_] => d.asInstanceOf[Doc] }
          val limit = get(cmd, "limit").collect {
            case i: Int => i
            case l: Long => l.toInt
          }.filter(_ > 0)
          val batch = get(cmd, "batchSize").collect {
            case i: Int => i
            case l: Long => l.toInt
          }.filter(_ > 0).getOrElse(101)
          var hits = docs.filter(d => matches(filter, d)).map(project(projection, _))
          limit.foreach(l => hits = hits.take(l))
          val (first, rest) = hits.splitAt(batch)
          val cid = if (rest.isEmpty) 0L else {
            val id = cursorSeq.incrementAndGet()
            cursors.put(id, rest)
            id
          }
          Seq("cursor" -> Seq[(String, Any)](
            "firstBatch" -> first.toVector,
            "id" -> cid, "ns" -> ns), "ok" -> 1.0)
        case "getMore" =>
          val cid = get(cmd, "getMore").get match {
            case l: Long => l
            case i: Int => i.toLong
          }
          val coll = get(cmd, "collection").get.asInstanceOf[String]
          val db = get(cmd, "$db").map(_.asInstanceOf[String]).getOrElse("test")
          val batch = get(cmd, "batchSize").collect {
            case i: Int => i
            case l: Long => l.toInt
          }.filter(_ > 0).getOrElse(101)
          val remaining = cursors.get(cid)
          require(remaining != null, s"mongo: cursor $cid not found")
          val (page, rest) = remaining.splitAt(batch)
          if (rest.isEmpty) cursors.remove(cid) else cursors.put(cid, rest)
          Seq("cursor" -> Seq[(String, Any)](
            "nextBatch" -> page,
            "id" -> (if (rest.isEmpty) 0L else cid), "ns" -> s"$db.$coll"), "ok" -> 1.0)
        case "killCursors" =>
          get(cmd, "cursors").collect { case ids: Seq[_] =>
            ids.foreach { case l: Long => cursors.remove(l); case _ => () }
          }
          Seq("ok" -> 1.0)
        case other => throw new IllegalArgumentException(
          s"mongo: unsupported command '$other'")
      }
    }

    private def project(projection: Option[Doc], d: Doc): Doc = projection match {
      case None | Some(Nil) => d
      case Some(p) =>
        val keep = p.collect { case (k, v)
          if v == 1 || v == 1L || v == true || v == 1.0 => k }.toSet
        d.filter { case (k, _) => keep(k) }
    }

    private def cmpVals(a: Any, b: Any): Option[Int] = (a, b) match {
      case (null, _) | (_, null) => None
      case (x: Number, y: Number) =>
        Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
      case _ => None
    }

    private def isOperatorDoc(v: Any): Boolean = v match {
      case s: Seq[_] => s.nonEmpty && s.forall {
        case (k: String, _) => k.startsWith("$")
        case _ => false
      }
      case _ => false
    }

    /** Filter-document evaluation: the `$`-operator subset the reference
      * TupleDomain lowering emits. */
    private def matches(filter: Doc, d: Doc): Boolean = filter.forall {
      case ("$and", cs: Seq[_]) =>
        cs.forall(c => matches(c.asInstanceOf[Doc], d))
      case ("$or", cs: Seq[_]) =>
        cs.exists(c => matches(c.asInstanceOf[Doc], d))
      case ("$nor", cs: Seq[_]) =>
        !cs.exists(c => matches(c.asInstanceOf[Doc], d))
      case (field, ops) if isOperatorDoc(ops) =>
        val v = get(d, field).orNull
        ops.asInstanceOf[Doc].forall {
          // mongo semantics: {$eq:null} matches null AND missing fields,
          // {$ne:null} excludes them (cmpVals cannot see null equality)
          case ("$eq", null) => v == null
          case ("$ne", null) => v != null
          case ("$eq", x) => cmpVals(v, x).contains(0)
          case ("$ne", x) => !cmpVals(v, x).contains(0)
          case ("$gt", x) => cmpVals(v, x).exists(_ > 0)
          case ("$gte", x) => cmpVals(v, x).exists(_ >= 0)
          case ("$lt", x) => cmpVals(v, x).exists(_ < 0)
          case ("$lte", x) => cmpVals(v, x).exists(_ <= 0)
          case ("$in", xs: Seq[_]) => xs.exists(x => cmpVals(v, x).contains(0))
          case ("$exists", want: Boolean) => get(d, field).isDefined == want
          case (op, _) => throw new IllegalArgumentException(
            s"mongo: unsupported operator '$op'")
        }
      case (field, lit) => // implicit equality
        cmpVals(get(d, field).orNull, lit).contains(0)
    }
  }

  // ---------------------------------------------------------------- client

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    private var requestId = 0

    override def close(): Unit = sock.close()

    def command(db: String, cmd: Doc): Doc = {
      requestId += 1
      sendMsg(out, requestId, 0, cmd :+ ("$db" -> db))
      val (_, _, reply) = readMsg(in)
      get(reply, "ok") match {
        case Some(1.0) | Some(1) => reply
        case _ => throw new IllegalStateException("mongo error: " +
          get(reply, "errmsg").map(String.valueOf(_)).getOrElse(reply.toString))
      }
    }

    def hello(): Doc = command("admin", Seq("hello" -> 1))

    /** `find` + `getMore` drained as a STREAMING iterator: O(batch) memory
      * per pull, matching the reference cursor consumption. */
    def find(db: String, coll: String, filter: Doc = Nil,
        projection: Option[Doc] = None, limit: Option[Int] = None,
        batchSize: Int = 101): Iterator[Doc] = {
      val base: Doc = Seq[(String, Any)]("find" -> coll) ++
        (if (filter.nonEmpty) Seq("filter" -> filter) else Seq("filter" -> EmptyDoc)) ++
        projection.map(p => "projection" -> (p: Any)).toSeq ++
        limit.map(l => "limit" -> (l: Any)).toSeq :+ ("batchSize" -> (batchSize: Any))
      val reply = command(db, base)
      val cursor = get(reply, "cursor").get.asInstanceOf[Doc]
      var cid = get(cursor, "id").get.asInstanceOf[Long]
      var batch = get(cursor, "firstBatch").get.asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Doc])
      new Iterator[Doc] {
        private var it = batch.iterator
        def hasNext: Boolean = {
          while (!it.hasNext && cid != 0L) {
            val r = command(db, Seq[(String, Any)]("getMore" -> cid,
              "collection" -> coll, "batchSize" -> batchSize))
            val c = get(r, "cursor").get.asInstanceOf[Doc]
            cid = get(c, "id").get.asInstanceOf[Long]
            it = get(c, "nextBatch").get.asInstanceOf[Seq[Any]]
              .map(_.asInstanceOf[Doc]).iterator
          }
          it.hasNext
        }
        def next(): Doc = { if (!hasNext) throw new NoSuchElementException; it.next() }
      }
    }
  }
}
