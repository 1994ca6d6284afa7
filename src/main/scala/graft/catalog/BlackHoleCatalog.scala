package graft.catalog

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Blackhole connector (reference: plugin/trino-blackhole — writes are
  * swallowed, reads produce `split_count × pages_per_split × rows_per_page`
  * constant "zero rows"; BlackHolePageSourceProvider.java:88
  * generateZeroPage, BlackHolePageSink discards). Used exactly as the
  * reference uses it: a zero-cost sink for write-path benchmarking and a
  * deterministic synthetic source for scheduler/scan benchmarking whose
  * data costs nothing to produce.
  *
  * Table properties (same names as the reference's): `split_count`
  * (read parallelism — one Spark InputPartition each), `pages_per_split`,
  * `rows_per_page`, `field_length` (length of constant varchar fields).
  * All default 0/0/1/16, so a bare blackhole table reads as EMPTY and any
  * INSERT vanishes — the reference's default behavior.
  *
  * Scale: reads generate rows inside each task (nothing is stored or
  * shuffled); writes discard rows inside each task (nothing is sent to the
  * driver). Both sides are embarrassingly parallel at any cluster size.
  */
class BlackHoleCatalog extends TableCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    BlackHoleCatalog.tables.keySet.asScala.toArray.sorted
      .map(t => Identifier.of(Array("default"), t))

  override def loadTable(ident: Identifier): Table = {
    val t = BlackHoleCatalog.tables.get(ident.name.toLowerCase)
    if (t == null)
      throw new NoSuchTableException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    def prop(name: String, dflt: Int): Int = {
      val v = Option(properties.get(name)).map(_.toInt).getOrElse(dflt)
      if (v < 0) throw new IllegalArgumentException(s"$name property is negative")
      v
    }
    val t = new BlackHoleTable(ident.name.toLowerCase, schema,
      prop("split_count", 0), prop("pages_per_split", 0),
      prop("rows_per_page", 1), prop("field_length", 16))
    val existing = BlackHoleCatalog.tables.putIfAbsent(ident.name.toLowerCase, t)
    if (existing != null)
      throw new TableAlreadyExistsException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("blackhole: ALTER not supported")
  override def dropTable(ident: Identifier): Boolean =
    BlackHoleCatalog.tables.remove(ident.name.toLowerCase) != null
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = BlackHoleCatalog.tables.remove(oldIdent.name.toLowerCase)
    if (t == null)
      throw new NoSuchTableException(Seq(catalogName) ++ oldIdent.namespace() :+ oldIdent.name())
    BlackHoleCatalog.tables.put(newIdent.name.toLowerCase, t)
  }
}

object BlackHoleCatalog {
  private[catalog] val tables = new ConcurrentHashMap[String, BlackHoleTable]

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.catalog.graft_blackhole", classOf[BlackHoleCatalog].getName)
}

final class BlackHoleTable(tableName: String, tableSchema: StructType,
    splitCount: Int, pagesPerSplit: Int, rowsPerPage: Int, fieldLength: Int)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new BlackHoleScan(tableSchema, splitCount, pagesPerSplit * rowsPerPage, fieldLength)
    }

  // The sink: rows are dropped in the writer task; commit is a no-op.
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // nothing stored, nothing to truncate
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
            new DataWriterFactory {
              override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
                new DataWriter[InternalRow] {
                  override def write(record: InternalRow): Unit = () // swallowed
                  override def commit(): WriterCommitMessage = BlackHoleCommit
                  override def abort(): Unit = ()
                  override def close(): Unit = ()
                }
            }
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

case object BlackHoleCommit extends WriterCommitMessage

/** `splitCount` InputPartitions, each generating `rowsPerSplit` copies of
  * the constant zero row inside the task (reference generateZeroPage:
  * numerics 0, booleans false, varchar = `field_length` constant bytes). */
final class BlackHoleScan(tableSchema: StructType, splitCount: Int,
    rowsPerSplit: Int, fieldLength: Int) extends Scan with Batch {

  override def readSchema(): StructType = tableSchema
  override def toBatch: Batch = this
  override def description(): String = s"BlackHoleScan(splits=$splitCount)"

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(splitCount)(i => BlackHoleInputPartition(i, rowsPerSplit, fieldLength))

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = tableSchema
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[BlackHoleInputPartition]
        val row = BlackHoleScan.zeroRow(schema, p.fieldLength)
        new PartitionReader[InternalRow] {
          private var left = p.rows
          override def next(): Boolean = { left -= 1; left >= 0 }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
  }
}

object BlackHoleScan {
  def zeroRow(schema: StructType, fieldLength: Int): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: Any = f.dataType match {
        case BooleanType => false
        case ByteType => 0.toByte
        case ShortType => 0.toShort
        case IntegerType | DateType => 0
        case LongType | TimestampType | TimestampNTZType => 0L
        case FloatType => 0.0f
        case DoubleType => 0.0
        case StringType => UTF8String.fromString("x" * fieldLength)
        case BinaryType => new Array[Byte](fieldLength)
        case d: DecimalType => org.apache.spark.sql.types.Decimal(0L, d.precision, d.scale)
        case other => throw new UnsupportedOperationException(
          s"blackhole: unsupported type $other")
      }
      row.update(i, v)
    }
    row
  }
}

final case class BlackHoleInputPartition(id: Int, rows: Int, fieldLength: Int)
    extends InputPartition
