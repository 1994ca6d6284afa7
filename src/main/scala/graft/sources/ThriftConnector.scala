package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.ThriftProtocol
import graft.catalog.ThriftProtocol._

/** Generic Thrift connector — the SPI-over-the-wire data-source protocol
  * (reference: plugin/trino-thrift + plugin/trino-thrift-api —
  * `TrinoThriftService.java`: trinoListSchemaNames / trinoListTables /
  * trinoGetTableMetadata / trinoGetSplits (batched with nextToken, one
  * opaque TrinoThriftId per split) / trinoGetRows (per-split pages of
  * TYPED COLUMN BLOCKS — `TrinoThriftBlock` field ids 1=integer 2=bigint
  * 3=double 4=varchar(nulls,sizes,bytes) 5=boolean — with rowCount and a
  * continuation token); transport is the same strict TBinaryProtocol
  * this repo already speaks to the Hive metastore).
  *
  * Any external system that serves these five methods becomes a table
  * source. Scale shape is the reference's: the DRIVER fetches metadata
  * and the split batch (bounded); each EXECUTOR task owns one opaque
  * split and drives its own page loop — column blocks stream through
  * O(page) memory. Column pruning travels as the `columns` argument of
  * trinoGetRows, so unprojected columns never cross the wire.
  * The TupleDomain outputConstraint is accepted and ignored by this
  * loopback server (documented subset — the reference's own example
  * server does the same). */
object ThriftConnector {

  final case class Col(name: String, tpe: String) // bigint|integer|double|varchar|boolean
  final case class TableData(schema: String, table: String, cols: Seq[Col],
      rows: Vector[Array[Any]])

  private[sources] def sparkType(t: String): DataType = t match {
    case "bigint" => LongType
    case "integer" => IntegerType
    case "double" => DoubleType
    case "varchar" => StringType
    case "boolean" => BooleanType
    case other => throw new IllegalArgumentException(s"thrift: unmapped type '$other'")
  }

  // ---------------------------------------------------------------- server

  final class Server(port0: Int = 0, rowsPerSplit: Int = 1000,
      pageRows: Int = 300) extends AutoCloseable {
    private val tables = new ConcurrentHashMap[(String, String), TableData]()
    /** Wire-visible projection log — specs assert pruning reached the wire. */
    val columnsRequested = new java.util.concurrent.CopyOnWriteArrayList[Seq[String]]()

    def register(td: TableData): Unit = tables.put((td.schema, td.table), td)

    private val sock = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    def port: Int = sock.getLocalPort

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
      val r = new Reader(in)
      val w = new Writer(out)
      while (true) {
        val (method, _, seqid) = r.messageBegin()
        method match {
          case "trinoListSchemaNames" =>
            r.readStruct((t, _) => r.skip(t))
            w.messageBegin(method, REPLY, seqid)
            w.fieldBegin(LIST, 0)
            val names = tables.keySet.asScala.map(_._1).toSeq.distinct.sorted
            w.listBegin(STRING, names.size); names.foreach(w.string)
            w.stop(); w.flush()
          case "trinoListTables" =>
            var schemaFilter: Option[String] = None
            r.readStruct { (t, id) =>
              if (id == 1 && t == STRUCT) r.readStruct { (t2, id2) =>
                if (id2 == 1 && t2 == STRING) schemaFilter = Some(r.string())
                else r.skip(t2)
              } else r.skip(t)
            }
            val hits = tables.keySet.asScala.toSeq.sorted
              .filter(k => schemaFilter.forall(_ == k._1))
            w.messageBegin(method, REPLY, seqid)
            w.fieldBegin(LIST, 0)
            w.listBegin(STRUCT, hits.size)
            hits.foreach { case (sc, tb) =>
              w.stringField(1, sc); w.stringField(2, tb); w.stop()
            }
            w.stop(); w.flush()
          case "trinoGetTableMetadata" =>
            val (sc, tb) = readSchemaTableArg(r)
            w.messageBegin(method, REPLY, seqid)
            w.fieldBegin(STRUCT, 0) // TrinoThriftNullableTableMetadata
            Option(tables.get((sc, tb))).foreach { td =>
              w.fieldBegin(STRUCT, 1) // tableMetadata
              w.fieldBegin(STRUCT, 1) // schemaTableName
              w.stringField(1, sc); w.stringField(2, tb); w.stop()
              w.fieldBegin(LIST, 2)
              w.listBegin(STRUCT, td.cols.size)
              td.cols.foreach { c =>
                w.stringField(1, c.name); w.stringField(2, c.tpe)
                w.boolField(4, false) // hidden
                w.stop()
              }
              w.stop()
            }
            w.stop() // nullable wrapper
            w.stop(); w.flush()
          case "trinoGetSplits" =>
            var sc = ""; var tb = ""; var maxSplits = 100; var from = 0
            r.readStruct { (t, id) =>
              (t, id) match {
                case (STRUCT, 1) => r.readStruct { (t2, id2) =>
                  if (id2 == 1 && t2 == STRING) sc = r.string()
                  else if (id2 == 2 && t2 == STRING) tb = r.string()
                  else r.skip(t2)
                }
                case (I32, 4) => maxSplits = r.i32()
                case (STRUCT, 5) => r.readStruct { (t2, id2) =>
                  if (id2 == 1 && t2 == STRING) from = r.string().toInt
                  else r.skip(t2)
                }
                case _ => r.skip(t)
              }
            }
            val td = tables.get((sc, tb))
            require(td != null, s"thrift: no table $sc.$tb")
            val total = td.rows.size
            val splitStarts = (from until total by rowsPerSplit).take(maxSplits)
            val nextFrom = splitStarts.lastOption.map(_ + rowsPerSplit)
              .filter(_ < total)
            w.messageBegin(method, REPLY, seqid)
            w.fieldBegin(STRUCT, 0)
            w.fieldBegin(LIST, 1)
            w.listBegin(STRUCT, splitStarts.size)
            splitStarts.foreach { st =>
              val end = math.min(total, st + rowsPerSplit)
              w.fieldBegin(STRUCT, 1) // TrinoThriftId
              w.stringField(1, s"$sc $tb $st $end"); w.stop()
              w.fieldBegin(LIST, 2); w.listBegin(STRUCT, 0) // hosts: any
              w.stop()
            }
            nextFrom.foreach { n =>
              w.fieldBegin(STRUCT, 2); w.stringField(1, n.toString); w.stop()
            }
            w.stop() // SplitBatch
            w.stop(); w.flush()
          case "trinoGetRows" =>
            var splitId = ""; var cols: Seq[String] = Nil; var offset = 0
            r.readStruct { (t, id) =>
              (t, id) match {
                case (STRUCT, 1) => r.readStruct { (t2, id2) =>
                  if (id2 == 1 && t2 == STRING) splitId = r.string() else r.skip(t2)
                }
                case (LIST, 2) =>
                  val (_, n) = r.listBegin()
                  cols = (0 until n).map(_ => r.string())
                case (STRUCT, 4) => r.readStruct { (t2, id2) =>
                  if (id2 == 1 && t2 == STRING) offset = r.string().toInt
                  else r.skip(t2)
                }
                case _ => r.skip(t)
              }
            }
            columnsRequested.add(cols)
            val Array(sc, tb, stS, endS) = splitId.split(" ")
            val td = tables.get((sc, tb))
            require(td != null, s"thrift: no table $sc.$tb")
            val (st, end) = (stS.toInt, endS.toInt)
            val pageStart = st + offset
            val page = td.rows.slice(pageStart, math.min(end, pageStart + pageRows))
            val more = pageStart + page.size < end
            val colIx = td.cols.map(_.name).zipWithIndex.toMap
            w.messageBegin(method, REPLY, seqid)
            w.fieldBegin(STRUCT, 0)
            w.fieldBegin(LIST, 1)
            w.listBegin(STRUCT, cols.size)
            cols.foreach { cName =>
              val ci = colIx.getOrElse(cName,
                throw new IllegalArgumentException(s"thrift: no column $cName"))
              writeBlock(w, td.cols(ci).tpe, page.map(_(ci)))
            }
            w.i32Field(2, page.size)
            if (more) {
              w.fieldBegin(STRUCT, 3)
              w.stringField(1, (offset + page.size).toString); w.stop()
            }
            w.stop() // PageResult
            w.stop(); w.flush()
          case other =>
            r.readStruct((t, _) => r.skip(t))
            w.messageBegin(other, EXCEPTION, seqid)
            w.stringField(1, s"unknown method '$other'")
            w.i32Field(2, 1)
            w.stop(); w.flush()
        }
      }
    }

    private def readSchemaTableArg(r: Reader): (String, String) = {
      var sc = ""; var tb = ""
      r.readStruct { (t, id) =>
        if (id == 1 && t == STRUCT) r.readStruct { (t2, id2) =>
          if (id2 == 1 && t2 == STRING) sc = r.string()
          else if (id2 == 2 && t2 == STRING) tb = r.string()
          else r.skip(t2)
        } else r.skip(t)
      }
      (sc, tb)
    }

    /** One TrinoThriftBlock: the union field for this type, carrying
      * nulls + values (varchar = nulls + sizes + concatenated bytes). */
    private def writeBlock(w: Writer, tpe: String, values: Seq[Any]): Unit = {
      val fieldId = tpe match {
        case "integer" => 1
        case "bigint" => 2
        case "double" => 3
        case "varchar" => 4
        case "boolean" => 5
      }
      w.fieldBegin(STRUCT, fieldId)
      w.fieldBegin(LIST, 1) // nulls
      w.listBegin(BOOL, values.size)
      values.foreach(v => w.bool(v == null))
      tpe match {
        case "integer" =>
          w.fieldBegin(LIST, 2); w.listBegin(I32, values.size)
          values.foreach {
            case null => w.i32(0)
            case v: Int => w.i32(v)
            case v: Long => w.i32(v.toInt)
          }
        case "bigint" =>
          w.fieldBegin(LIST, 2); w.listBegin(I64, values.size)
          values.foreach {
            case null => w.i64(0L)
            case v: Long => w.i64(v)
            case v: Int => w.i64(v.toLong)
          }
        case "double" =>
          w.fieldBegin(LIST, 2); w.listBegin(DOUBLE, values.size)
          values.foreach {
            case null => w.double(0.0)
            case v: Double => w.double(v)
          }
        case "varchar" =>
          val bytes = values.map {
            case null => Array.empty[Byte]
            case v: String => v.getBytes(StandardCharsets.UTF_8)
          }
          w.fieldBegin(LIST, 2); w.listBegin(I32, bytes.size)
          bytes.foreach(b => w.i32(b.length))
          w.fieldBegin(STRING, 3) // thrift binary: raw bytes on the wire
          w.binary(bytes.toArray.flatten)
        case "boolean" =>
          w.fieldBegin(LIST, 2); w.listBegin(BOOL, values.size)
          values.foreach {
            case null => w.bool(false)
            case v: Boolean => w.bool(v)
          }
      }
      w.stop() // the typed data struct (e.g. TrinoThriftBigint)
      w.stop() // the enclosing TrinoThriftBlock union struct
    }
  }

  // ---------------------------------------------------------------- client

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    private val r = new Reader(in)
    private val w = new Writer(out)
    private var seq = 0

    override def close(): Unit = sock.close()

    private def call[A](method: String, writeArgs: Writer => Unit)(readReply: Reader => A): A = {
      seq += 1
      w.messageBegin(method, CALL, seq)
      writeArgs(w)
      w.stop(); w.flush()
      val (_, msgType, _) = r.messageBegin()
      if (msgType == EXCEPTION) {
        var msg = "thrift exception"
        r.readStruct((t, id) => if (id == 1 && t == STRING) msg = r.string() else r.skip(t))
        throw new IllegalStateException(s"thrift: $msg")
      }
      readReply(r)
    }

    def listSchemaNames(): Seq[String] = call("trinoListSchemaNames", _ => ()) { r =>
      var names: Seq[String] = Nil
      r.readStruct((t, id) => if (id == 0 && t == LIST) names = r.stringList()
        else r.skip(t))
      names
    }

    def listTables(schema: Option[String]): Seq[(String, String)] =
      call("trinoListTables", { w =>
        w.fieldBegin(STRUCT, 1)
        schema.foreach(s => w.stringField(1, s))
        w.stop()
      }) { r =>
        val hits = mutable.ArrayBuffer[(String, String)]()
        r.readStruct { (t, id) =>
          if (id == 0 && t == LIST) {
            val (_, n) = r.listBegin()
            (0 until n).foreach { _ =>
              var sc = ""; var tb = ""
              r.readStruct { (t2, id2) =>
                if (id2 == 1 && t2 == STRING) sc = r.string()
                else if (id2 == 2 && t2 == STRING) tb = r.string()
                else r.skip(t2)
              }
              hits += ((sc, tb))
            }
          } else r.skip(t)
        }
        hits.toSeq
      }

    def tableMetadata(schema: String, table: String): Seq[Col] =
      call("trinoGetTableMetadata", { w =>
        w.fieldBegin(STRUCT, 1)
        w.stringField(1, schema); w.stringField(2, table); w.stop()
      }) { r =>
        val cols = mutable.ArrayBuffer[Col]()
        var found = false
        r.readStruct { (t, id) =>
          if (id == 0 && t == STRUCT) r.readStruct { (t1, id1) =>
            if (id1 == 1 && t1 == STRUCT) { // tableMetadata present
              found = true
              r.readStruct { (t2, id2) =>
                if (id2 == 2 && t2 == LIST) {
                  val (_, n) = r.listBegin()
                  (0 until n).foreach { _ =>
                    var nm = ""; var tp = ""
                    r.readStruct { (t3, id3) =>
                      if (id3 == 1 && t3 == STRING) nm = r.string()
                      else if (id3 == 2 && t3 == STRING) tp = r.string()
                      else r.skip(t3)
                    }
                    cols += Col(nm, tp)
                  }
                } else r.skip(t2)
              }
            } else r.skip(t1)
          } else r.skip(t)
        }
        require(found, s"thrift: no such table $schema.$table")
        cols.toSeq
      }

    /** Drain the split batches (reference nextToken loop). Returns the
      * opaque split ids. */
    def splits(schema: String, table: String, maxPerBatch: Int = 50): Seq[String] = {
      val all = mutable.ArrayBuffer[String]()
      var token: Option[String] = None
      var first = true
      while (first || token.isDefined) {
        first = false
        val (ids, next) = call("trinoGetSplits", { w =>
          w.fieldBegin(STRUCT, 1)
          w.stringField(1, schema); w.stringField(2, table); w.stop()
          w.i32Field(4, maxPerBatch)
          token.foreach { tk =>
            w.fieldBegin(STRUCT, 5); w.stringField(1, tk); w.stop()
          }
        }) { r =>
          val ids = mutable.ArrayBuffer[String]()
          var next: Option[String] = None
          r.readStruct { (t, id) =>
            if (id == 0 && t == STRUCT) r.readStruct { (t1, id1) =>
              (t1, id1) match {
                case (LIST, 1) =>
                  val (_, n) = r.listBegin()
                  (0 until n).foreach { _ =>
                    r.readStruct { (t2, id2) =>
                      if (id2 == 1 && t2 == STRUCT) r.readStruct { (t3, id3) =>
                        if (id3 == 1 && t3 == STRING) ids += r.string()
                        else r.skip(t3)
                      } else r.skip(t2)
                    }
                  }
                case (STRUCT, 2) => r.readStruct { (t2, id2) =>
                  if (id2 == 1 && t2 == STRING) next = Some(r.string())
                  else r.skip(t2)
                }
                case _ => r.skip(t1)
              }
            } else r.skip(t)
          }
          (ids.toSeq, next)
        }
        all ++= ids
        token = next
      }
      all.toSeq
    }

    /** One split's rows as a STREAMING page loop — decode typed blocks,
      * transpose to rows, O(page) memory. */
    def rows(splitId: String, columns: Seq[Col]): Iterator[Seq[Any]] = {
      var token: Option[String] = None
      var first = true
      new Iterator[Seq[Any]] {
        private var page: Iterator[Seq[Any]] = Iterator.empty
        def hasNext: Boolean = {
          while (!page.hasNext && (first || token.isDefined)) {
            first = false
            val (rows0, next) = fetchPage(splitId, columns, token)
            page = rows0.iterator
            token = next
          }
          page.hasNext
        }
        def next(): Seq[Any] = { if (!hasNext) throw new NoSuchElementException; page.next() }
      }
    }

    private def fetchPage(splitId: String, columns: Seq[Col],
        token: Option[String]): (Vector[Seq[Any]], Option[String]) =
      call("trinoGetRows", { w =>
        w.fieldBegin(STRUCT, 1)
        w.stringField(1, splitId); w.stop()
        w.stringListField(2, columns.map(_.name))
        w.fieldBegin(I64, 3); w.i64(16L * 1024 * 1024)
        token.foreach { tk =>
          w.fieldBegin(STRUCT, 4); w.stringField(1, tk); w.stop()
        }
      }) { r =>
        var blocks: Vector[Seq[Any]] = Vector.empty
        var rowCount = 0
        var next: Option[String] = None
        r.readStruct { (t, id) =>
          if (id == 0 && t == STRUCT) r.readStruct { (t1, id1) =>
            (t1, id1) match {
              case (LIST, 1) =>
                val (_, n) = r.listBegin()
                blocks = (0 until n).map(_ => readBlock(r)).toVector
              case (I32, 2) => rowCount = r.i32()
              case (STRUCT, 3) => r.readStruct { (t2, id2) =>
                if (id2 == 1 && t2 == STRING) next = Some(r.string())
                else r.skip(t2)
              }
              case _ => r.skip(t1)
            }
          } else r.skip(t)
        }
        val rows = (0 until rowCount).map(i => blocks.map(_(i))).toVector
        (rows, next)
      }

    /** One TrinoThriftBlock → a column of values (null-masked). */
    private def readBlock(r: Reader): Seq[Any] = {
      var nulls: Seq[Boolean] = Nil
      var result: Seq[Any] = Nil
      r.readStruct { (t, fieldId) =>
        require(t == STRUCT, s"thrift: block union field must be a struct")
        var sizes: Seq[Int] = Nil
        var raw: Seq[Any] = Nil
        var bytes: Array[Byte] = Array.empty
        r.readStruct { (t2, id2) =>
          (t2, id2) match {
            case (LIST, 1) =>
              val (_, n) = r.listBegin()
              nulls = (0 until n).map(_ => r.bool())
            case (LIST, 2) =>
              val (et, n) = r.listBegin()
              raw = (0 until n).map { _ =>
                et match {
                  case I32 => r.i32()
                  case I64 => r.i64()
                  case DOUBLE => r.double()
                  case BOOL => r.bool()
                  case other => throw new IllegalArgumentException(
                    s"thrift: unexpected block element type $other")
                }
              }
              sizes = raw.collect { case i: Int => i } // reused when varchar
            case (STRING, 3) =>
              bytes = r.binary() // raw bytes: sizes index into these directly
            case _ => r.skip(t2)
          }
        }
        result =
          if (fieldId == 4) { // varchar: sizes + concatenated bytes
            var off = 0
            nulls.zip(sizes).map { case (isNull, sz) =>
              val v = if (isNull) null
                else new String(bytes, off, sz, StandardCharsets.UTF_8)
              off += sz
              v
            }
          } else nulls.zip(raw).map { case (isNull, v) => if (isNull) null else v }
      }
      result
    }
  }

  // ------------------------------------------------------- spark read path

  val format: String = classOf[ThriftSource].getName

  def read(spark: SparkSession, host: String, port: Int, schema: String,
      table: String): DataFrame =
    spark.read.format(format)
      .option("host", host).option("port", port.toString)
      .option("schema", schema).option("table", table)
      .load()
}

class ThriftSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val c = new ThriftConnector.Client(options.get("host"), options.get("port").toInt)
    try {
      val cols = c.tableMetadata(options.get("schema"), options.get("table"))
      StructType(cols.map(col =>
        StructField(col.name, ThriftConnector.sparkType(col.tpe))))
    } finally c.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ThriftTable(schema, properties.get("host"), properties.get("port").toInt,
      properties.get("schema"), properties.get("table"))
}

final class ThriftTable(tableSchema: StructType, host: String, port: Int,
    schemaName: String, tableName: String) extends Table with SupportsRead {
  override def name(): String = s"thrift:$schemaName.$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var projected: StructType = tableSchema
      // empty projection (count(*)) is served by rowCount alone: zero
      // columns cross the wire, pages still carry the row tally
      override def pruneColumns(requiredSchema: StructType): Unit =
        projected = requiredSchema
      override def build(): Scan =
        new ThriftScan(host, port, schemaName, tableName, projected)
    }
}

final class ThriftScan(host: String, port: Int, schemaName: String,
    tableName: String, projected: StructType)
    extends Scan with Batch with Serializable {
  override def readSchema(): StructType = projected
  override def toBatch: Batch = this
  override def description(): String =
    s"ThriftScan($schemaName.$tableName, columns=${projected.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val c = new ThriftConnector.Client(host, port)
    try c.splits(schemaName, tableName).map(id =>
      ThriftSplitPartition(id): InputPartition).toArray
    finally c.close()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (h, p, schema) = (host, port, projected)
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new ThriftSplitReader(h, p,
          partition.asInstanceOf[ThriftSplitPartition].splitId, schema)
    }
  }
}

final case class ThriftSplitPartition(splitId: String) extends InputPartition

final class ThriftSplitReader(host: String, port: Int, splitId: String,
    schema: StructType) extends PartitionReader[InternalRow] {
  private val client = new ThriftConnector.Client(host, port)
  private val cols = schema.fields.toSeq.map(f =>
    ThriftConnector.Col(f.name, f.dataType match {
      case LongType => "bigint"
      case IntegerType => "integer"
      case DoubleType => "double"
      case BooleanType => "boolean"
      case _ => "varchar"
    }))
  private val it = client.rows(splitId, cols)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) false
    else {
      val r = it.next()
      current = InternalRow.fromSeq(schema.fields.indices.map { i =>
        r(i) match {
          case null => null
          case s: String => UTF8String.fromString(s)
          case other => other
        }
      })
      true
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = client.close()
}
