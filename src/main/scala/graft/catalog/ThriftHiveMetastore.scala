package graft.catalog

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File}
import java.net.{InetAddress, ServerSocket, Socket}

import org.apache.spark.sql.{DataFrame, SparkSession}

import ThriftProtocol._

/** Hive metastore THRIFT WIRE PROTOCOL — server and client (reference:
  * plugin/trino-hive/.../metastore/thrift/ThriftHiveMetastore.java speaks
  * this protocol to a remote HMS; the file-layout metastore
  * [[HiveFileCatalog]] was the only metastore this engine spoke before).
  * The server exposes a file-metastore warehouse over the real HMS wire
  * API; the client resolves all table/partition metadata over the wire
  * and feeds the same distributed read path. Struct field ids follow the
  * public `hive_metastore.thrift` IDL:
  *
  *  - FieldSchema       1:name 2:type 3:comment
  *  - SerDeInfo         1:name 2:serializationLib 3:parameters
  *  - StorageDescriptor 1:cols 2:location 3:inputFormat 4:outputFormat
  *                      5:compressed 6:numBuckets 7:serdeInfo
  *  - Table             1:tableName 2:dbName 3:owner 4:createTime
  *                      5:lastAccessTime 6:retention 7:sd 8:partitionKeys
  *                      9:parameters 12:tableType
  *  - Partition         1:values 2:dbName 3:tableName 4:createTime
  *                      5:lastAccessTime 6:sd 7:parameters
  *  - Database          1:name 2:description 3:locationUri
  *  - NoSuchObjectException 1:message
  *
  * Methods served: get_all_databases, get_database, get_all_tables,
  * get_table, get_partition_names, get_partitions. Unknown methods answer
  * a TApplicationException EXCEPTION message (1:message 2:type=1
  * UNKNOWN_METHOD). One thread per connection (daemon), loopback bind;
  * metadata volumes are partition-count bounded exactly like the real
  * HMS's own answers. */
object ThriftHiveMetastore {

  // hive storage format ↔ the Hive class names the real metastore stores
  private val FormatClasses: Map[String, (String, String, String)] = Map(
    "PARQUET" -> (("org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
      "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat",
      "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe")),
    "ORC" -> (("org.apache.hadoop.hive.ql.io.orc.OrcInputFormat",
      "org.apache.hadoop.hive.ql.io.orc.OrcOutputFormat",
      "org.apache.hadoop.hive.ql.io.orc.OrcSerde")),
    "CSV" -> (("org.apache.hadoop.mapred.TextInputFormat",
      "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
      "org.apache.hadoop.hive.serde2.OpenCSVSerde")),
    "JSON" -> (("org.apache.hadoop.mapred.TextInputFormat",
      "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
      "org.apache.hadoop.hive.serde2.JsonSerDe")),
    "TEXTFILE" -> (("org.apache.hadoop.mapred.TextInputFormat",
      "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
      "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")))

  private def formatFromSerde(serdeLib: String): String =
    FormatClasses.collectFirst { case (fmt, (_, _, lib)) if lib == serdeLib => fmt }
      .getOrElse(throw new IllegalArgumentException(
        s"hive serde '$serdeLib' is not supported by this connector"))

  // ---------------------------------------------------------------- server

  final class Handle private[ThriftHiveMetastore] (val server: ServerSocket) {
    def port: Int = server.getLocalPort
    def stop(): Unit = server.close()
  }

  /** Serve `catalogDir` (a [[HiveFileCatalog]] warehouse) over the HMS
    * thrift protocol on a loopback port. */
  def serve(catalogDir: String, port: Int = 0): Handle = {
    val server = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
    val accept = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val worker = new Thread(() => serveConnection(catalogDir, sock),
          "graft-hms-conn")
        worker.setDaemon(true)
        worker.start()
      } catch { case _: java.io.IOException => /* closed */ }
    }, "graft-hms-accept")
    accept.setDaemon(true)
    accept.start()
    new Handle(server)
  }

  private def serveConnection(catalogDir: String, sock: Socket): Unit = {
    try {
      val r = new Reader(new DataInputStream(new BufferedInputStream(sock.getInputStream)))
      val w = new Writer(new DataOutputStream(new BufferedOutputStream(sock.getOutputStream)))
      while (true) {
        val (method, msgType, seqid) = r.messageBegin()
        require(msgType == CALL, s"unexpected thrift message type $msgType")
        handleCall(catalogDir, method, seqid, r, w)
        w.flush()
      }
    } catch {
      case _: EOFException => // client hung up
      case _: java.net.SocketException =>
    } finally sock.close()
  }

  private def handleCall(catalogDir: String, method: String, seqid: Int,
      r: Reader, w: Writer): Unit = {

    def reply(body: Writer => Unit): Unit = {
      w.messageBegin(method, REPLY, seqid)
      body(w); w.stop()
    }
    def noSuchObject(msg: String): Unit = reply { w =>
      w.fieldBegin(STRUCT, 1) // o1: NoSuchObjectException
      w.stringField(1, msg); w.stop()
    }

    // create_table carries a STRUCT argument — parse it before the
    // string-only generic args pass below would skip it
    if (method == "create_table") {
      var tbl: Option[ThriftTable] = None
      r.readStruct { (t, id) =>
        if (t == STRUCT && id == 1) tbl = Some(readTableStruct(r)) else r.skip(t)
      }
      tbl match {
        case None => noSuchObject("create_table: no Table argument")
        case Some(t) =>
          try {
            val cols = t.dataColumns.map(c =>
              HiveFileCatalog.HiveColumn(c.name, c.hiveType))
            val parts = t.partitionKeys.map(c =>
              HiveFileCatalog.HiveColumn(c.name, c.hiveType))
            // a location outside the metastore's own directory makes an
            // EXTERNAL table over staged files (the CTAS commit shape)
            val defaultDir = new File(new File(catalogDir, t.dbName),
              t.tableName).getAbsolutePath
            val ext = Option(t.location).map(_.stripPrefix("file:"))
              .filter(l => l.nonEmpty && l != defaultDir)
            HiveFileCatalog.declareTable(catalogDir, t.dbName, t.tableName,
              if (ext.isDefined) "EXTERNAL_TABLE" else t.tableType,
              cols, parts, t.storageFormat, ext.map("file:" + _))
            reply(_ => ()) // void success: empty result struct
          } catch {
            case e: Exception => reply { w =>
              w.fieldBegin(STRUCT, 1) // o1: AlreadyExistsException shape
              w.stringField(1, String.valueOf(e.getMessage)); w.stop()
            }
          }
      }
      return
    }

    // read the args struct fields we understand; skip the rest
    var args = Vector.empty[String]
    r.readStruct { (t, _) =>
      if (t == STRING) args :+= r.string()
      else r.skip(t)
    }

    method match {
      case "get_all_databases" => reply { w =>
        w.stringListField(0, HiveFileCatalog.listDatabases(catalogDir))
      }
      case "get_database" =>
        val db = args(0)
        if (!HiveFileCatalog.listDatabases(catalogDir).contains(db))
          noSuchObject(s"database $db")
        else reply { w =>
          // body writes the success field's VALUE completely (inner
          // structs closed); reply() itself closes the result struct
          w.fieldBegin(STRUCT, 0)
          w.stringField(1, db)
          w.stringField(2, "")
          w.stringField(3, "file:" + new File(catalogDir, db).getAbsolutePath)
          w.stop()
        }
      case "get_all_tables" => reply { w =>
        w.stringListField(0, HiveFileCatalog.listTables(catalogDir, args(0)))
      }
      case "get_table" =>
        val (db, tbl) = (args(0), args(1))
        if (!HiveFileCatalog.listTables(catalogDir, db).contains(tbl))
          noSuchObject(s"table $db.$tbl")
        else {
          val t = HiveFileCatalog.loadTable(catalogDir, db, tbl)
          reply { w =>
            w.fieldBegin(STRUCT, 0)
            writeTable(w, db, tbl, t) // closes the Table struct itself
          }
        }
      case "get_partition_names" =>
        val t = HiveFileCatalog.loadTable(catalogDir, args(0), args(1))
        reply(w => w.stringListField(0, partitionDirs(t).map(_._1)))
      case "get_partitions" =>
        val (db, tbl) = (args(0), args(1))
        val t = HiveFileCatalog.loadTable(catalogDir, db, tbl)
        reply { w =>
          val parts = partitionDirs(t)
          w.fieldBegin(LIST, 0)
          w.listBegin(STRUCT, parts.size)
          parts.foreach { case (_, values, dir) =>
            w.fieldBegin(LIST, 1) // values
            w.listBegin(STRING, values.size); values.foreach(w.string)
            w.stringField(2, db)
            w.stringField(3, tbl)
            w.fieldBegin(STRUCT, 6)
            writeSd(w, t, dir)
            w.stop() // partition struct
          }
        }
      case other =>
        // TApplicationException(1:message, 2:type) — 1 = UNKNOWN_METHOD
        w.messageBegin(other, EXCEPTION, seqid)
        w.stringField(1, s"unknown method $other")
        w.i32Field(2, 1)
        w.stop()
    }
  }

  /** (hive partition name "k=v/k2=v2", values, directory) per partition. */
  private def partitionDirs(t: HiveFileCatalog.HiveTable):
      Seq[(String, Seq[String], File)] = {
    def walk(dir: File, depth: Int, name: List[String], values: List[String]):
        Seq[(String, Seq[String], File)] =
      if (depth == t.partitionColumns.length)
        Seq((name.reverse.mkString("/"), values.reverse, dir))
      else {
        val key = t.partitionColumns(depth).name
        Option(dir.listFiles()).getOrElse(Array.empty).toSeq
          .filter(d => d.isDirectory && d.getName.startsWith(s"$key="))
          .sortBy(_.getName)
          .flatMap { d =>
            val v = PathCodec.unescape(d.getName.stripPrefix(s"$key="))
            walk(d, depth + 1, d.getName :: name, v :: values)
          }
      }
    if (t.partitionColumns.isEmpty) Seq.empty
    else walk(t.location, 0, Nil, Nil)
  }

  private def writeFieldSchemas(w: Writer, id: Int,
      cols: Seq[HiveFileCatalog.HiveColumn]): Unit = {
    w.fieldBegin(LIST, id)
    w.listBegin(STRUCT, cols.size)
    cols.foreach { c =>
      w.stringField(1, c.name)
      w.stringField(2, c.hiveType)
      w.stringField(3, "")
      w.stop()
    }
  }

  private def writeSd(w: Writer, t: HiveFileCatalog.HiveTable, location: File): Unit = {
    val (inF, outF, serde) = FormatClasses(t.storageFormat.toUpperCase)
    writeFieldSchemas(w, 1, t.dataColumns)
    w.stringField(2, "file:" + location.getAbsolutePath)
    w.stringField(3, inF)
    w.stringField(4, outF)
    w.boolField(5, false)
    w.i32Field(6, 0)
    w.fieldBegin(STRUCT, 7) // serdeInfo
    w.stringField(1, "")
    w.stringField(2, serde)
    w.emptyMapField(3)
    w.stop()
    w.stop() // sd
  }

  private def writeTable(w: Writer, db: String, tbl: String,
      t: HiveFileCatalog.HiveTable): Unit = {
    w.stringField(1, tbl)
    w.stringField(2, db)
    w.stringField(3, "graft")
    w.i32Field(4, 0)
    w.i32Field(5, 0)
    w.i32Field(6, 0)
    w.fieldBegin(STRUCT, 7)
    writeSd(w, t, t.location)
    writeFieldSchemas(w, 8, t.partitionColumns)
    w.emptyMapField(9)
    w.stringField(12, t.tableType)
    w.stop() // table
  }

  // ---------------------------------------------------------------- client

  final case class ThriftColumn(name: String, hiveType: String)
  final case class ThriftTable(dbName: String, tableName: String,
      tableType: String, dataColumns: Seq[ThriftColumn],
      partitionKeys: Seq[ThriftColumn], location: String,
      storageFormat: String)
  final case class ThriftPartition(values: Seq[String], location: String)

  // shared Table-struct codec (the client reads get_table replies; the
  // server reads create_table arguments — same wire shape both ways)

  private def readFieldSchemas(r: Reader): Seq[ThriftColumn] = {
    val (et, n) = r.listBegin()
    require(et == STRUCT, s"expected list<FieldSchema>, got $et")
    (0 until n).map { _ =>
      var name = ""; var tpe = ""
      r.readStruct { (t, id) =>
        (t, id) match {
          case (STRING, 1) => name = r.string()
          case (STRING, 2) => tpe = r.string()
          case _ => r.skip(t)
        }
      }
      ThriftColumn(name, tpe)
    }
  }

  private def readSd(r: Reader): (Seq[ThriftColumn], String, String) = {
    var cols = Seq.empty[ThriftColumn]
    var location = ""
    var serde = ""
    r.readStruct { (t, id) =>
      (t, id) match {
        case (LIST, 1) => cols = readFieldSchemas(r)
        case (STRING, 2) => location = r.string()
        case (STRUCT, 7) =>
          r.readStruct { (ft, fid) =>
            if (ft == STRING && fid == 2) serde = r.string() else r.skip(ft)
          }
        case _ => r.skip(t)
      }
    }
    (cols, location, serde)
  }

  private def readTableStruct(r: Reader): ThriftTable = {
    var tableName = ""; var dbName = ""; var tableType = ""
    var cols = Seq.empty[ThriftColumn]; var parts = Seq.empty[ThriftColumn]
    var location = ""; var serde = ""
    r.readStruct { (t, id) =>
      (t, id) match {
        case (STRING, 1) => tableName = r.string()
        case (STRING, 2) => dbName = r.string()
        case (STRUCT, 7) =>
          val (c, l, s) = readSd(r); cols = c; location = l; serde = s
        case (LIST, 8) => parts = readFieldSchemas(r)
        case (STRING, 12) => tableType = r.string()
        case _ => r.skip(t)
      }
    }
    ThriftTable(dbName, tableName, tableType, cols, parts, location,
      formatFromSerde(serde))
  }

  final class NoSuchObject(msg: String) extends RuntimeException(msg)

  /** One-connection blocking HMS client (the reference pools these; one
    * suffices for plan-time metadata). */
  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val r = new Reader(new DataInputStream(
      new BufferedInputStream(sock.getInputStream)))
    private val w = new Writer(new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream)))
    private var seq = 0

    override def close(): Unit = sock.close()

    private def call[A](method: String, writeArgs: Writer => Unit)(
        readResult: (Byte, Int, Reader) => Option[A]): A = {
      seq += 1
      w.messageBegin(method, CALL, seq)
      writeArgs(w)
      w.stop()
      w.flush()
      val (name, msgType, seqid) = r.messageBegin()
      require(seqid == seq && name == method,
        s"thrift reply mismatch: $name#$seqid for $method#$seq")
      if (msgType == EXCEPTION) {
        var msg = "thrift application exception"
        r.readStruct { (t, id) =>
          if (t == STRING && id == 1) msg = r.string() else r.skip(t)
        }
        throw new IllegalStateException(msg)
      }
      var result: Option[A] = None
      var error: Option[String] = None
      r.readStruct { (t, id) =>
        readResult(t, id, r) match {
          case Some(a) => result = Some(a)
          case None =>
            if (t == STRUCT && id >= 1) { // declared exception (o1…)
              var msg = "remote exception"
              r.readStruct { (ft, fid) =>
                if (ft == STRING && fid == 1) msg = r.string() else r.skip(ft)
              }
              error = Some(msg)
            } else r.skip(t)
        }
      }
      error.foreach(m => throw new NoSuchObject(m))
      result.getOrElse(throw new IllegalStateException(
        s"thrift $method: no success field in result"))
    }

    def getAllDatabases(): Seq[String] =
      call("get_all_databases", _ => ()) { (t, id, r) =>
        if (t == LIST && id == 0) Some(r.stringList()) else None
      }

    def getAllTables(db: String): Seq[String] =
      call("get_all_tables", w => w.stringField(1, db)) { (t, id, r) =>
        if (t == LIST && id == 0) Some(r.stringList()) else None
      }

    def getTable(db: String, tbl: String): ThriftTable =
      call("get_table",
        w => { w.stringField(1, db); w.stringField(2, tbl) }) { (t, id, r) =>
        if (t == STRUCT && id == 0) Some(readTableStruct(r)) else None
      }

    /** HMS `void create_table(1: Table tbl)` — registration makes staged
      * files visible (reference HiveMetadata.finishCreateTable commits
      * through exactly this call). Declared exceptions (AlreadyExists…)
      * surface as [[NoSuchObject]]-style remote errors. */
    def createTable(t: ThriftTable): Unit =
      callVoid("create_table", w => {
        w.fieldBegin(STRUCT, 1)
        w.stringField(1, t.tableName)
        w.stringField(2, t.dbName)
        w.stringField(3, "graft")
        w.fieldBegin(STRUCT, 7) // sd
        w.fieldBegin(LIST, 1)
        w.listBegin(STRUCT, t.dataColumns.size)
        t.dataColumns.foreach { c =>
          w.stringField(1, c.name); w.stringField(2, c.hiveType); w.stop()
        }
        w.stringField(2, t.location)
        w.fieldBegin(STRUCT, 7) // serdeInfo: serializationLib names the format
        w.stringField(2, FormatClasses(t.storageFormat.toUpperCase)._3)
        w.stop()
        w.stop() // sd
        w.fieldBegin(LIST, 8)
        w.listBegin(STRUCT, t.partitionKeys.size)
        t.partitionKeys.foreach { c =>
          w.stringField(1, c.name); w.stringField(2, c.hiveType); w.stop()
        }
        w.stringField(12, t.tableType)
        w.stop() // table
      })

    /** Like [[call]] but for void methods: an empty result struct is
      * success; declared exception fields still raise. */
    private def callVoid(method: String, writeArgs: Writer => Unit): Unit = {
      seq += 1
      w.messageBegin(method, CALL, seq)
      writeArgs(w)
      w.stop()
      w.flush()
      val (name, msgType, seqid) = r.messageBegin()
      require(seqid == seq && name == method,
        s"thrift reply mismatch: $name#$seqid for $method#$seq")
      if (msgType == EXCEPTION) {
        var msg = "thrift application exception"
        r.readStruct { (t, id) =>
          if (t == STRING && id == 1) msg = r.string() else r.skip(t)
        }
        throw new IllegalStateException(msg)
      }
      var error: Option[String] = None
      r.readStruct { (t, id) =>
        if (t == STRUCT && id >= 1) {
          var msg = "remote exception"
          r.readStruct { (ft, fid) =>
            if (ft == STRING && fid == 1) msg = r.string() else r.skip(ft)
          }
          error = Some(msg)
        } else r.skip(t)
      }
      error.foreach(m => throw new NoSuchObject(m))
    }

    def getPartitions(db: String, tbl: String,
        max: Int = Short.MaxValue): Seq[ThriftPartition] =
      call("get_partitions", w => {
        w.stringField(1, db); w.stringField(2, tbl)
        w.fieldBegin(I16, 3); w.i16(max)
      }) { (t, id, r) =>
        if (t == LIST && id == 0) {
          val (et, n) = r.listBegin()
          require(et == STRUCT, s"expected list<Partition>, got $et")
          Some((0 until n).map(_ => readPartition(r)))
        } else None
      }

    private def readPartition(r: Reader): ThriftPartition = {
      var values = Seq.empty[String]; var location = ""
      r.readStruct { (t, id) =>
        (t, id) match {
          case (LIST, 1) => values = r.stringList()
          case (STRUCT, 6) => location = readSd(r)._2
          case _ => r.skip(t)
        }
      }
      ThriftPartition(values, location)
    }
  }

  // -------------------------------------------------- catalog integration

  /** Read a hive table with ALL metadata resolved over the thrift wire
    * (schema, storage format, partition keys + per-partition locations),
    * pruning partitions against `partitionFilter` at plan time; the data
    * read is the same distributed scan [[HiveFileCatalog]] issues. */
  def readTable(spark: SparkSession, host: String, port: Int,
      db: String, table: String,
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    val client = new Client(host, port)
    try {
      val t = client.getTable(db, table)
      val hive = HiveFileCatalog.HiveTable(
        t.tableType,
        t.dataColumns.map(c => HiveFileCatalog.HiveColumn(c.name, c.hiveType)),
        t.partitionKeys.map(c => HiveFileCatalog.HiveColumn(c.name, c.hiveType)),
        t.storageFormat,
        externalLocation = Some(t.location),
        location = new File(t.location.stripPrefix("file:")))
      // the reference's split source asks the HMS exactly like this; the
      // shared reader prunes + scans the wire-resolved layout
      HiveFileCatalog.readLoaded(spark, hive, partitionFilter)
    } finally client.close()
  }
}
