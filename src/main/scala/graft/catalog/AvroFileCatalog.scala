package graft.catalog

import java.io.File
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableFileInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Avro file-format connector (reference: lib/trino-hive-formats
  * .../avro/AvroFileReader.java + AvroPageDataReader — the hive connector's
  * `STORED AS AVRO` tables; format/schema docs: avro.apache.org spec).
  *
  * Unlike the CSV catalog, Avro container files are SELF-DESCRIBING: the
  * catalog reads each table's schema from the file header (writer schema),
  * exactly as the reference resolves avro table schemas. And they are
  * SPLITTABLE on 16-byte sync markers, so `planInputPartitions` cuts each file
  * into byte-range splits at `spark.sql.files.maxPartitionBytes` boundaries
  * and each reader seeks `DataFileReader.sync(start)` and stops at
  * `pastSync(end)` — the exact split contract avro-mapred uses, which is
  * what keeps a 100 TB avro lake readable with full parallelism rather than
  * one task per file.
  *
  * Type subset (documented): avro primitives (boolean/int/long/float/
  * double/string/bytes), nullable unions `[null, T]`, enum→string,
  * logical date (int) and timestamp-micros (long). Nested records, arrays,
  * and maps are REJECTED loudly at schema-load time — never misread.
  */
class AvroFileCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option 'path'"))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dirs = Option(new File(root).listFiles()).getOrElse(Array.empty)
    dirs.filter(_.isDirectory).map(d => Identifier.of(Array("default"), d.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = new File(root, ident.name.toLowerCase)
    val files = AvroIO.dataFiles(dir)
    if (files.isEmpty)
      throw new NoSuchTableException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    // Schema from the first file's header — avro is self-describing.
    val reader = new DataFileReader[GenericRecord](
      new SeekableFileInput(files.head), new GenericDatumReader[GenericRecord]())
    val avroSchema = try reader.getSchema finally reader.close()
    new AvroTable(ident.name.toLowerCase, dir.getAbsolutePath,
      AvroIO.toStructType(avroSchema))
  }

  /** CREATE TABLE materializes an empty schema-carrier file, so the table
    * is immediately loadable and stays SELF-describing (the schema lives in
    * the avro headers, not in catalog state) — the hive-avro convention. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException("avro catalog: PARTITIONED BY not supported")
    val dir = new File(root, ident.name.toLowerCase)
    if (AvroIO.dataFiles(dir).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalogName) ++ ident.namespace() :+ ident.name())
    dir.mkdirs()
    val avroSchema = AvroIO.toAvroSchema(schema, "row")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new File(dir, "part-00000-schema.avro"))
    w.close()
    new AvroTable(ident.name.toLowerCase, dir.getAbsolutePath, schema)
  }
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("avro catalog: ALTER not supported")
  override def dropTable(ident: Identifier): Boolean = {
    val dir = new File(root, ident.name.toLowerCase)
    if (!dir.isDirectory) false
    else {
      Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      dir.delete()
    }
  }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = new File(root, oldIdent.name.toLowerCase)
    val to = new File(root, newIdent.name.toLowerCase)
    if (!from.isDirectory)
      throw new NoSuchTableException(Seq(catalogName) ++ oldIdent.namespace() :+ oldIdent.name())
    if (!from.renameTo(to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }
}

final class AvroTable(tableName: String, dir: String, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new AvroScan(dir, tableSchema) }
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new AvroBatchWrite(dir, tableSchema)
        }
    }
}

/** Task-side avro writers with a rename-on-commit protocol: each task
  * writes `_tmp-<uuid>.avro` in the table dir and reports it in its commit
  * message; the driver commit renames the temp files into `part-…` place
  * (same-directory rename = atomic on POSIX), abort deletes them — the
  * TableWriter/TableFinish commit shape (reference
  * core/trino-main/.../TableFinishOperator.java). */
final class AvroBatchWrite(dir: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val avroJson = AvroIO.toAvroSchema(schema, "row").toString
    val d = dir
    val sch = schema
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val tmp = new File(d, f"_tmp-$partitionId%05d-$taskId.avro")
          private val avroSchema = new org.apache.avro.Schema.Parser().parse(avroJson)
          private val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](avroSchema))
          w.create(avroSchema, tmp)
          private var n = 0L
          override def write(row: InternalRow): Unit = {
            w.append(AvroIO.toRecord(row, sch, avroSchema)); n += 1
          }
          override def commit(): WriterCommitMessage = {
            w.close()
            if (n == 0) { tmp.delete(); AvroCommitMessage(None, partitionId) }
            else AvroCommitMessage(Some(tmp.getName), partitionId)
          }
          override def abort(): Unit = { w.close(); tmp.delete() }
          override def close(): Unit = ()
        }
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case AvroCommitMessage(Some(name), pid) =>
      val tmp = new File(dir, name)
      val dst = new File(dir, f"part-i$pid%05d-${System.nanoTime()}%x.avro")
      if (!tmp.renameTo(dst))
        throw new IllegalStateException(s"avro commit rename $tmp -> $dst failed")
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case AvroCommitMessage(Some(name), _) =>
      new File(dir, name).delete()
    }
}

final case class AvroCommitMessage(tmpName: Option[String], partitionId: Int)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Byte-range splits at maxPartitionBytes boundaries; sync-marker aligned
  * reads make the ranges exact-once. */
final class AvroScan(dir: String, tableSchema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = tableSchema
  override def toBatch: Batch = this
  override def description(): String = s"AvroScan($dir)"

  override def planInputPartitions(): Array[InputPartition] = {
    val maxSplit = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    AvroIO.dataFiles(new File(dir)).flatMap { f =>
      val len = f.length()
      (0L until len by maxSplit).map { start =>
        AvroInputPartition(f.getAbsolutePath, start, math.min(start + maxSplit, len))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(tableSchema)
}

final case class AvroInputPartition(path: String, start: Long, end: Long)
    extends InputPartition

final class AvroReaderFactory(tableSchema: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    new PartitionReader[InternalRow] {
      private val reader = new DataFileReader[GenericRecord](
        new SeekableFileInput(new File(p.path)), new GenericDatumReader[GenericRecord]())
      // sync(start) positions after the first sync marker past `start`;
      // blocks whose sync sits in [start, end) belong to THIS split
      // (pastSync is exclusive at `end`), so every block is read exactly
      // once across adjacent splits — the avro-mapred split contract.
      reader.sync(p.start)
      private val fieldPos: Array[Int] = {
        val avroFields = reader.getSchema.getFields.asScala
        tableSchema.fields.map(f => avroFields.indexWhere(_.name == f.name))
      }
      private val converters = tableSchema.fields.map(f => AvroIO.readConverter(f.dataType))
      private var rec: GenericRecord = _

      override def next(): Boolean = {
        if (!reader.hasNext || reader.pastSync(p.end)) return false
        rec = reader.next(rec)
        true
      }
      override def get(): InternalRow = {
        val out = new GenericInternalRow(fieldPos.length)
        var i = 0
        while (i < fieldPos.length) {
          val v = rec.get(fieldPos(i))
          out.update(i, if (v == null) null else converters(i)(v))
          i += 1
        }
        out
      }
      override def close(): Unit = reader.close()
    }
  }
}

object AvroIO {

  def dataFiles(dir: File): Array[File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".avro")).sortBy(_.getName)

  /** Avro writer schema for a Spark struct (primitives + date/ts-micros,
    * everything nullable via [null, T] like hive-written avro). */
  def toAvroSchema(schema: StructType, recordName: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType =>
          LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new UnsupportedOperationException(
          s"avro writer: unsupported Spark type $other for field ${f.name}")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base), null, null)
    }
    val rec = Schema.createRecord(recordName, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  /** Spark struct for an avro record schema (the documented read subset). */
  def toStructType(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"not a record schema: $avro")
    StructType(avro.getFields.asScala.map { f =>
      val (s, nullable) = unwrapNullable(f.schema())
      StructField(f.name, toSparkType(s, f.name), nullable)
    }.toArray)
  }

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"avro reader: only [null, T] unions are supported, got $s")
      (nonNull.head, branches.size > nonNull.size)
    } else (s, false)

  private def toSparkType(s: Schema, field: String): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) TimestampType
      else if (s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros]) TimestampNTZType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ENUM => StringType
    case other => throw new UnsupportedOperationException(
      s"avro reader: unsupported avro type $other at field '$field' " +
        "(nested records/arrays/maps are outside the documented subset)")
  }

  /** Avro datum → Catalyst value, per Spark type. */
  def readConverter(dt: DataType): Any => Any = dt match {
    case StringType => {
      case u: Utf8 => UTF8String.fromBytes(java.util.Arrays.copyOf(u.getBytes, u.getByteLength))
      case s: CharSequence => UTF8String.fromString(s.toString)
      case e => UTF8String.fromString(e.toString) // enum symbol
    }
    case BinaryType => {
      case bb: java.nio.ByteBuffer =>
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case fixed: GenericData.Fixed => fixed.bytes().clone()
      case other => other
    }
    case DateType | IntegerType => v => v.asInstanceOf[Int]
    case TimestampType | TimestampNTZType | LongType => v => v.asInstanceOf[Long]
    case _ => identity
  }

  /** Distributed avro write: one container file per partition, written on
    * the executors (no driver collect) — the write path a cluster would
    * use, just with a local filesystem target here. */
  def write(df: DataFrame, outDir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema, "row").toString
    new File(outDir).mkdirs()
    df.queryExecution.toRdd.mapPartitionsWithIndex { (idx, rows) =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
      w.create(avroSchema, new File(outDir, f"part-$idx%05d.avro"))
      rows.foreach(row => w.append(toRecord(row, schema, avroSchema)))
      w.close()
      Iterator.empty
    }.count() // force the distributed write
  }

  /** Catalyst row → avro record (shared by AvroIO.write and the DSv2
    * INSERT path). */
  def toRecord(row: InternalRow, schema: StructType, avroSchema: Schema): GenericRecord = {
    val rec = new GenericData.Record(avroSchema)
    val fields = schema.fields
    var i = 0
    while (i < fields.length) {
      if (!row.isNullAt(i)) {
        val v = fields(i).dataType match {
          case StringType => new Utf8(row.getUTF8String(i).toString)
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
          case LongType | TimestampType | TimestampNTZType =>
            java.lang.Long.valueOf(row.getLong(i))
          case FloatType => java.lang.Float.valueOf(row.getFloat(i))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
          case other => throw new UnsupportedOperationException(s"avro write: $other")
        }
        rec.put(i, v)
      }
      i += 1
    }
    rec
  }

  private val populated = scala.collection.mutable.Set.empty[String]

  /** Register the catalog as `graft_avro`, materializing the orders table
    * from the parquet fixture once per JVM per scale factor. */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val tag = java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
    val root = new File(s"target/avrocat/g$tag").getAbsolutePath
    if (!populated.contains(root)) {
      write(graft.sources.Tables.load(spark, sfDir, "orders"), s"$root/orders")
      populated += root
    }
    spark.conf.set("spark.sql.catalog.graft_avro", classOf[AvroFileCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_avro.path", root)
    root
  }
}
