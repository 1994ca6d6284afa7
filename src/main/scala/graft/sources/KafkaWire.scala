package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Kafka WIRE PROTOCOL — broker and client for the topic connector
  * (reference: plugin/trino-kafka opens real consumer connections per
  * split — KafkaSplitManager/KafkaRecordSetProvider; [[EventTopic]] was
  * the simulated log only). Implemented from the public Kafka protocol
  * specification at fixed low versions, which are real on-wire formats
  * every broker still speaks:
  *
  *  - framing: i32 size-prefixed request/response
  *  - request header v1: api_key i16, api_version i16, correlation i32,
  *    client_id nullable-string; response header v0: correlation i32
  *  - Metadata v0 (api_key 3): topics ⇒ brokers + per-topic partition
  *    leaders
  *  - Fetch v0 (api_key 1): (topic, partition, offset, max_bytes) ⇒
  *    error, high watermark, message set
  *  - MessageSet v1 entries: offset i64, size i32, crc32 i32 (over magic
  *    through value), magic=1, attributes=0 (no compression), timestamp
  *    i64, key bytes, value bytes
  *
  * Scale shape: the DRIVER asks Metadata once (split enumeration); each
  * EXECUTOR task opens its own connection and Fetch-pages exactly one
  * partition from its offset to the high watermark — the reference
  * connector's split-per-partition consumption. The loopback broker
  * serves fixture logs; a real deployment points the same client at real
  * brokers. */
object KafkaWire {

  final case class Msg(key: Array[Byte], value: Array[Byte], timestamp: Long)

  /** A live topic whose partitions can grow while served (the broker's
    * mutable log; the streaming source polls its end offsets). */
  final class Topic(val partitions: Int) {
    @volatile private var state: Vector[Vector[Msg]] =
      Vector.fill(partitions)(Vector.empty)
    def append(partition: Int, msgs: Msg*): Unit = synchronized {
      state = state.updated(partition, state(partition) ++ msgs)
    }
    def log(partition: Int): Vector[Msg] = state(partition)
  }

  // ------------------------------------------------------------- framing

  private def frame(body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + body.length)
    bb.putInt(body.length).put(body).array()
  }

  private def readFrame(in: DataInputStream): Array[Byte] = {
    val size = in.readInt()
    require(size >= 0 && size < (1 << 26), s"kafka frame size $size out of range")
    val b = new Array[Byte](size)
    in.readFully(b)
    b
  }

  private def wStr(bb: ByteBuffer, s: String): Unit =
    if (s == null) bb.putShort(-1)
    else {
      val b = s.getBytes(StandardCharsets.UTF_8)
      bb.putShort(b.length.toShort).put(b)
    }
  private def rStr(bb: ByteBuffer): String = {
    val len = bb.getShort
    if (len < 0) null
    else {
      val b = new Array[Byte](len); bb.get(b)
      new String(b, StandardCharsets.UTF_8)
    }
  }
  private def wBytes(bb: ByteBuffer, b: Array[Byte]): Unit =
    if (b == null) bb.putInt(-1) else { bb.putInt(b.length); bb.put(b) }
  private def rBytes(bb: ByteBuffer): Array[Byte] = {
    val len = bb.getInt
    if (len < 0) null
    else { val b = new Array[Byte](len); bb.get(b); b }
  }

  // -------------------------------------------------- message set codec

  /** Encode messages from `baseOffset` as a v1 message set. */
  def encodeMessageSet(msgs: Seq[Msg], baseOffset: Long): Array[Byte] = {
    val entries = msgs.zipWithIndex.map { case (m, i) =>
      val keyLen = if (m.key == null) 0 else m.key.length
      val valLen = if (m.value == null) 0 else m.value.length
      val body = ByteBuffer.allocate(1 + 1 + 8 + 4 + keyLen + 4 + valLen)
      body.put(1: Byte) // magic v1
      body.put(0: Byte) // attributes: no compression
      body.putLong(m.timestamp)
      wBytes(body, m.key)
      wBytes(body, m.value)
      val bodyArr = body.array()
      val crc = new CRC32
      crc.update(bodyArr)
      val e = ByteBuffer.allocate(8 + 4 + 4 + bodyArr.length)
      e.putLong(baseOffset + i)
      e.putInt(4 + bodyArr.length) // message size incl. crc
      e.putInt(crc.getValue.toInt)
      e.put(bodyArr)
      e.array()
    }
    entries.foldLeft(Array.emptyByteArray)(_ ++ _)
  }

  /** Decode a v1/v0 message set → (offset, Msg); validates each CRC. */
  def decodeMessageSet(bytes: Array[Byte]): Seq[(Long, Msg)] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = Seq.newBuilder[(Long, Msg)]
    while (bb.remaining() >= 12) {
      val offset = bb.getLong
      val size = bb.getInt
      if (bb.remaining() < size) return out.result() // partial trailing message (v0 contract)
      val msg = new Array[Byte](size); bb.get(msg)
      val mb = ByteBuffer.wrap(msg)
      val crc = mb.getInt
      val check = new CRC32
      check.update(msg, 4, msg.length - 4)
      require(check.getValue.toInt == crc, s"kafka message crc mismatch at offset $offset")
      val magic = mb.get()
      require(magic == 0 || magic == 1, s"kafka message magic $magic not supported " +
        "(record batches v2 use a different container)")
      mb.get() // attributes (compression refused below)
      val ts = if (magic == 1) mb.getLong else -1L
      val key = rBytes(mb)
      val value = rBytes(mb)
      out += ((offset, Msg(key, value, ts)))
    }
    out.result()
  }

  // -------------------------------------------------------------- broker

  final class Handle private[KafkaWire] (val server: ServerSocket) {
    def port: Int = server.getLocalPort
    def stop(): Unit = server.close()
  }

  /** Serve immutable `logs` (topic → partitions → messages). */
  def serve(logs: Map[String, IndexedSeq[IndexedSeq[Msg]]], port: Int = 0): Handle =
    serveTopics(logs.map { case (name, parts) =>
      val t = new Topic(parts.size)
      parts.indices.foreach(p => t.append(p, parts(p): _*))
      name -> t
    }, port)

  /** Serve live [[Topic]]s over the Kafka protocol on a loopback port —
    * appends become visible to Fetch/ListOffsets immediately (the
    * streaming source's feed). One daemon thread per connection. */
  def serveTopics(topics: Map[String, Topic], port: Int = 0): Handle = {
    val server = new ServerSocket(port, 64, InetAddress.getLoopbackAddress)
    val accept = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val t = new Thread(() => serveConnection(topics, server.getLocalPort, sock),
          "graft-kafka-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => }
    }, "graft-kafka-accept")
    accept.setDaemon(true)
    accept.start()
    new Handle(server)
  }

  private def serveConnection(topics: Map[String, Topic],
      port: Int, sock: Socket): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      while (true) {
        val req = ByteBuffer.wrap(readFrame(in))
        val apiKey = req.getShort
        val apiVersion = req.getShort
        val correlation = req.getInt
        rStr(req) // client_id
        val resp = (apiKey, apiVersion) match {
          case (0, 0) => produceResponse(topics, req)
          case (3, 0) => metadataResponse(topics, port, req)
          case (1, 0) => fetchResponse(topics, req)
          case (2, 0) => listOffsetsResponse(topics, req)
          case other => throw new IllegalArgumentException(
            s"kafka api $other not served (Produce/Metadata/Fetch/ListOffsets v0 only)")
        }
        val body = ByteBuffer.allocate(4 + resp.length)
        body.putInt(correlation).put(resp)
        out.write(frame(body.array()))
        out.flush()
      }
    } catch {
      case _: EOFException =>
      case _: java.net.SocketException =>
    } finally sock.close()
  }

  /** Produce v0 (api_key 0): append each partition's message set to the
    * live Topic log; reply [topic, [partition, error, base_offset]]. */
  private def produceResponse(topics: Map[String, Topic],
      req: ByteBuffer): Array[Byte] = {
    req.getShort // required_acks (loopback always acks like acks=1)
    req.getInt   // timeout_ms
    val nTopics = req.getInt
    val results = (0 until nTopics).map { _ =>
      val topic = rStr(req)
      val nParts = req.getInt
      val parts = (0 until nParts).map { _ =>
        val pid = req.getInt
        val setSize = req.getInt
        val set = new Array[Byte](setSize); req.get(set)
        topics.get(topic).filter(t => pid >= 0 && pid < t.partitions) match {
          case None => (pid, 3.toShort, -1L) // UNKNOWN_TOPIC_OR_PARTITION
          case Some(t) => t.synchronized {
            val base = t.log(pid).size.toLong
            t.append(pid, decodeMessageSet(set).map(_._2): _*)
            (pid, 0.toShort, base)
          }
        }
      }
      (topic, parts)
    }
    val bb = ByteBuffer.allocate(1 << 20)
    bb.putInt(results.size)
    results.foreach { case (topic, parts) =>
      wStr(bb, topic)
      bb.putInt(parts.size)
      parts.foreach { case (pid, err, base) =>
        bb.putInt(pid); bb.putShort(err); bb.putLong(base)
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  private def metadataResponse(topics: Map[String, Topic],
      port: Int, req: ByteBuffer): Array[Byte] = {
    val nTopics = req.getInt
    val asked = (0 until nTopics).map(_ => rStr(req))
    val names = if (asked.isEmpty) topics.keys.toSeq.sorted else asked
    val bb = ByteBuffer.allocate(1 << 20)
    // brokers: [node_id, host, port]
    bb.putInt(1)
    bb.putInt(0); wStr(bb, "127.0.0.1"); bb.putInt(port)
    // topic metadata
    bb.putInt(names.size)
    names.foreach { t =>
      val topic = topics.get(t)
      bb.putShort(if (topic.isDefined) 0 else 3) // 3 = UNKNOWN_TOPIC_OR_PARTITION
      wStr(bb, t)
      val n = topic.map(_.partitions).getOrElse(0)
      bb.putInt(n)
      (0 until n).foreach { p =>
        bb.putShort(0)    // partition error
        bb.putInt(p)      // partition id
        bb.putInt(0)      // leader = node 0
        bb.putInt(1); bb.putInt(0) // replicas [0]
        bb.putInt(1); bb.putInt(0) // isr [0]
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  /** ListOffsets v0 (api_key 2): timestamp -1 = log-end, -2 = earliest. */
  private def listOffsetsResponse(topics: Map[String, Topic],
      req: ByteBuffer): Array[Byte] = {
    req.getInt // replica_id
    val nTopics = req.getInt
    val wanted = (0 until nTopics).map { _ =>
      val topic = rStr(req)
      val nParts = req.getInt
      (topic, (0 until nParts).map(_ => (req.getInt, req.getLong, req.getInt)))
    }
    val bb = ByteBuffer.allocate(1 << 20)
    bb.putInt(wanted.size)
    wanted.foreach { case (name, parts) =>
      wStr(bb, name)
      bb.putInt(parts.size)
      parts.foreach { case (pid, time, _) =>
        bb.putInt(pid)
        topics.get(name).filter(t => pid >= 0 && pid < t.partitions) match {
          case None => bb.putShort(3); bb.putInt(0)
          case Some(t) =>
            bb.putShort(0)
            bb.putInt(1)
            bb.putLong(if (time == -2L) 0L else t.log(pid).size.toLong)
        }
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  private def fetchResponse(topics: Map[String, Topic],
      req: ByteBuffer): Array[Byte] = {
    req.getInt // replica_id
    req.getInt // max_wait_ms
    req.getInt // min_bytes
    val nTopics = req.getInt
    val wanted = (0 until nTopics).map { _ =>
      val topic = rStr(req)
      val nParts = req.getInt
      val parts = (0 until nParts).map { _ =>
        (req.getInt, req.getLong, req.getInt) // partition, offset, max_bytes
      }
      (topic, parts)
    }
    val bb = ByteBuffer.allocate(1 << 24)
    bb.putInt(wanted.size)
    wanted.foreach { case (topic, parts) =>
      wStr(bb, topic)
      bb.putInt(parts.size)
      parts.foreach { case (pid, offset, maxBytes) =>
        bb.putInt(pid)
        topics.get(topic).filter(t => pid >= 0 && pid < t.partitions) match {
          case None =>
            bb.putShort(3) // UNKNOWN_TOPIC_OR_PARTITION
            bb.putLong(-1L)
            bb.putInt(0)
          case Some(t) =>
            val log = t.log(pid)
            if (offset < 0 || offset > log.size) {
              bb.putShort(1) // OFFSET_OUT_OF_RANGE
              bb.putLong(log.size.toLong)
              bb.putInt(0)
            } else {
              // whole messages up to maxBytes, always at least one so the
              // consumer makes progress (v0 brokers may truncate instead;
              // the decoder tolerates both)
              var budget = maxBytes
              val slice = Seq.newBuilder[Msg]
              var i = offset.toInt
              var first = true
              while (i < log.size && (first || budget > 0)) {
                val m = log(i)
                val sz = 34 + (if (m.key == null) 0 else m.key.length) +
                  (if (m.value == null) 0 else m.value.length)
                if (first || sz <= budget) { slice += m; budget -= sz; i += 1 }
                else budget = 0
                first = false
              }
              val set = encodeMessageSet(slice.result(), offset)
              bb.putShort(0)
              bb.putLong(log.size.toLong) // high watermark
              bb.putInt(set.length)
              bb.put(set)
            }
        }
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  // -------------------------------------------------------------- client

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    private var correlation = 0

    override def close(): Unit = sock.close()

    private def request(apiKey: Short, body: ByteBuffer): ByteBuffer = {
      correlation += 1
      val cid = "graft"
      val cidB = cid.getBytes(StandardCharsets.UTF_8)
      val payload = java.util.Arrays.copyOf(body.array(), body.position())
      val bb = ByteBuffer.allocate(2 + 2 + 4 + 2 + cidB.length + payload.length)
      bb.putShort(apiKey).putShort(0).putInt(correlation)
      bb.putShort(cidB.length.toShort).put(cidB)
      bb.put(payload)
      out.write(frame(bb.array()))
      out.flush()
      val resp = ByteBuffer.wrap(readFrame(in))
      val got = resp.getInt
      require(got == correlation, s"kafka correlation mismatch: $got != $correlation")
      resp
    }

    /** Topic metadata → partition count (error code checked). */
    def partitionCount(topic: String): Int = {
      val body = ByteBuffer.allocate(256)
      body.putInt(1); wStr(body, topic)
      val r = request(3, body)
      val nBrokers = r.getInt
      (0 until nBrokers).foreach { _ => r.getInt; rStr(r); r.getInt }
      val nTopics = r.getInt
      require(nTopics == 1, s"expected 1 topic in metadata, got $nTopics")
      val err = r.getShort
      val name = rStr(r)
      require(err == 0, s"kafka metadata error $err for topic $name")
      r.getInt // partition count... consume entries to validate
    }

    /** ListOffsets v0: the partition's log-end offset (timestamp -1). */
    def logEndOffset(topic: String, partition: Int): Long = {
      val body = ByteBuffer.allocate(256)
      body.putInt(-1) // replica_id
      body.putInt(1); wStr(body, topic)
      body.putInt(1); body.putInt(partition); body.putLong(-1L); body.putInt(1)
      val r = request(2, body)
      val nTopics = r.getInt
      require(nTopics == 1)
      rStr(r)
      val nParts = r.getInt
      require(nParts == 1)
      r.getInt // partition id
      val err = r.getShort
      require(err == 0, s"kafka list_offsets error $err for $topic/$partition")
      val n = r.getInt
      require(n == 1, s"expected one offset, got $n")
      r.getLong
    }

    /** Produce v0: append `msgs` to one partition; returns the base offset
      * the broker assigned. */
    def produce(topic: String, partition: Int, msgs: Seq[Msg]): Long = {
      val set = encodeMessageSet(msgs, 0L)
      val body = ByteBuffer.allocate(64 + set.length)
      body.putShort(1)   // required_acks
      body.putInt(5000)  // timeout_ms
      body.putInt(1); wStr(body, topic)
      body.putInt(1); body.putInt(partition)
      body.putInt(set.length); body.put(set)
      val r = request(0, body)
      val nTopics = r.getInt
      require(nTopics == 1)
      rStr(r)
      val nParts = r.getInt
      require(nParts == 1)
      r.getInt // partition id
      val err = r.getShort
      require(err == 0, s"kafka produce error $err for $topic/$partition")
      r.getLong
    }

    /** One Fetch round → (high watermark, messages from `offset`). */
    def fetch(topic: String, partition: Int, offset: Long,
        maxBytes: Int = 1 << 20): (Long, Seq[(Long, Msg)]) = {
      val body = ByteBuffer.allocate(256)
      body.putInt(-1)  // replica_id (consumer)
      body.putInt(500) // max_wait_ms
      body.putInt(1)   // min_bytes
      body.putInt(1); wStr(body, topic)
      body.putInt(1); body.putInt(partition); body.putLong(offset); body.putInt(maxBytes)
      val r = request(1, body)
      val nTopics = r.getInt
      require(nTopics == 1)
      rStr(r) // topic
      val nParts = r.getInt
      require(nParts == 1)
      r.getInt // partition id
      val err = r.getShort
      require(err == 0, s"kafka fetch error $err for $topic/$partition@$offset")
      val hw = r.getLong
      val setSize = r.getInt
      val set = new Array[Byte](setSize); r.get(set)
      (hw, decodeMessageSet(set))
    }

    /** Drain one partition from `from` to the high watermark. */
    def drain(topic: String, partition: Int, from: Long = 0L,
        maxBytes: Int = 1 << 20): Seq[(Long, Msg)] = {
      val all = Seq.newBuilder[(Long, Msg)]
      var offset = from
      var done = false
      while (!done) {
        val (hw, msgs) = fetch(topic, partition, offset, maxBytes)
        all ++= msgs
        offset = msgs.lastOption.map(_._1 + 1).getOrElse(offset)
        done = offset >= hw || msgs.isEmpty
      }
      all.result()
    }
  }

  // ------------------------------------------------------ spark read path

  val rawSchema: StructType = StructType(Seq(
    StructField("_partition_id", IntegerType, nullable = false),
    StructField("_partition_offset", LongType, nullable = false),
    StructField("_key", StringType, nullable = true),
    StructField("_message", StringType, nullable = true),
    StructField("_timestamp", TimestampType, nullable = true)))

  /** Distributed topic read over the wire: the driver asks Metadata for
    * the partition list (split enumeration); each executor task opens its
    * own connection and drains exactly one partition — the reference
    * connector's split-per-partition shape. */
  def read(spark: SparkSession, host: String, port: Int, topic: String,
      fetchMaxBytes: Int = 1 << 20): DataFrame = {
    val nParts = {
      val c = new Client(host, port)
      try c.partitionCount(topic) finally c.close()
    }
    val rows = spark.sparkContext
      .parallelize(0 until nParts, math.max(1, nParts))
      .flatMap { pid =>
        val c = new Client(host, port)
        try c.drain(topic, pid, 0L, fetchMaxBytes).map { case (offset, m) =>
          Row(pid, offset,
            if (m.key == null) null else new String(m.key, StandardCharsets.UTF_8),
            if (m.value == null) null else new String(m.value, StandardCharsets.UTF_8),
            if (m.timestamp < 0) null
            else new java.sql.Timestamp(m.timestamp))
        } finally c.close()
      }
    spark.createDataFrame(rows, rawSchema)
  }
}
