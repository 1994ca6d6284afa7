package graft.catalog

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The memory connector: tables whose data lives in RAM, never on disk
  * (reference: plugin/trino-memory/src/main/java/io/trino/plugin/memory/
  * MemoryPagesStore.java:34 — pages are retained on the worker that wrote
  * them and served back on scan; MemoryMetadata.java tracks name→id).
  *
  * Spark-first shape: a DSv2 `TableCatalog` whose tables implement
  * `SupportsRead` + `SupportsWrite`, so CREATE TABLE / CTAS / INSERT INTO /
  * INSERT OVERWRITE / SELECT all flow through the normal analyzer paths with
  * full multi-catalog names (`graft_mem.default.t`). Rows are kept as
  * `UnsafeRow` blocks exactly as the writer tasks produced them — one block
  * per writer task, so the write-side partitioning is preserved across the
  * read boundary (the same property trino-memory gets from its per-node
  * page store) and a round-tripped table re-parallelizes into its original
  * task count instead of collapsing to one partition.
  *
  * Scale note (local[32] vs 1000 executors): in this single-JVM build the
  * block store is a process-wide singleton, which is the faithful local
  * analog of trino-memory's per-worker `MemoryPagesStore`. On a real
  * cluster the same Table/Scan/Write classes would back the store with the
  * executor block manager (each writer task registering its block locally,
  * `planInputPartitions` reporting locality hints); the data path —
  * task-local blocks, no driver-side collect of query results — is
  * unchanged. `MemTableData.bytes` tracks the UnsafeRow footprint and an
  * over-limit INSERT fails loudly, like the reference's `max-data-per-node`
  * guard (MemoryPagesStore.java:63).
  */
class MemoryCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MemoryStore.tables.keySet.asScala.toArray.sorted
      .map(t => Identifier.of(Array("default"), t))

  override def loadTable(ident: Identifier): Table = {
    val t = MemoryStore.tables.get(MemoryStore.key(ident))
    if (t == null)
      throw new NoSuchTableException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    new MemoryTable(MemoryStore.key(ident), t.schema)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "memory catalog: PARTITIONED BY not supported (trino-memory has no partitioning either)")
    val existing = MemoryStore.tables
      .putIfAbsent(MemoryStore.key(ident), new MemoryStore.MemTableData(schema))
    if (existing != null)
      throw new TableAlreadyExistsException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    new MemoryTable(MemoryStore.key(ident), schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("memory catalog: ALTER not supported")

  override def dropTable(ident: Identifier): Boolean =
    MemoryStore.tables.remove(MemoryStore.key(ident)) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = MemoryStore.tables.remove(MemoryStore.key(oldIdent))
    if (t == null)
      throw new NoSuchTableException(Seq(catalogName) ++ oldIdent.namespace() :+ oldIdent.name())
    MemoryStore.tables.put(MemoryStore.key(newIdent), t)
  }

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = Array.empty
  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespace.sameElements(Array("default"))) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String], metadata: JMap[String, String]): Unit =
    throw new UnsupportedOperationException("memory catalog: fixed 'default' namespace")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("memory catalog: fixed 'default' namespace")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}

/** Process-wide block store — the local analog of MemoryPagesStore.
  * Blocks are UnsafeRow arrays, one per completed writer task. */
object MemoryStore {
  /** Per-node data cap, mirroring trino-memory `memory.max-data-per-node`. */
  val maxBytes: Long = 4L * 1024 * 1024 * 1024

  final class Block(val rows: Array[InternalRow], val bytes: Long) extends Serializable

  final class MemTableData(val schema: StructType) {
    val blocks = new ArrayBuffer[Block]
    var bytes: Long = 0L
    def append(bs: Seq[Block]): Unit = synchronized {
      val add = bs.map(_.bytes).sum
      if (bytes + add > maxBytes)
        throw new IllegalStateException(
          s"memory catalog: table would exceed max-data-per-node ($maxBytes bytes)")
      blocks ++= bs
      bytes += add
    }
    def truncate(): Unit = synchronized { blocks.clear(); bytes = 0L }
    def snapshot(): Array[Block] = synchronized(blocks.toArray)
  }

  val tables = new ConcurrentHashMap[String, MemTableData]

  def key(ident: Identifier): String = ident.name.toLowerCase

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.catalog.graft_mem", classOf[MemoryCatalog].getName)
}

final class MemoryTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new MemoryScan(tableName, tableSchema)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemoryWriteBuilder(tableName, tableSchema)
}

/** One InputPartition per stored block: the read side re-parallelizes into
  * the write side's task layout. */
final class MemoryScan(tableName: String, tableSchema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = tableSchema
  override def toBatch: Batch = this
  override def description(): String = s"MemoryScan($tableName)"

  override def planInputPartitions(): Array[InputPartition] = {
    val t = MemoryStore.tables.get(tableName)
    if (t == null) throw new IllegalStateException(s"memory table '$tableName' dropped mid-query")
    t.snapshot().map(b => MemoryInputPartition(b): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[MemoryInputPartition].block.rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()
        }
      }
    }
}

final case class MemoryInputPartition(block: MemoryStore.Block) extends InputPartition

final class MemoryWriteBuilder(tableName: String, tableSchema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemoryBatchWrite(tableName, tableSchema, overwrite)
  }
}

/** Writer tasks buffer UnsafeRow copies; the rows travel back as the commit
  * message (trino-memory moves pages node-local the same way — data never
  * funnels through a query-result collect) and commit() publishes all
  * task blocks atomically under the table lock. abort() publishes nothing. */
final class MemoryBatchWrite(tableName: String, tableSchema: StructType, overwrite: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemoryDataWriterFactory(tableSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val t = MemoryStore.tables.get(tableName)
    if (t == null) throw new IllegalStateException(s"memory table '$tableName' dropped mid-write")
    val blocks = messages.collect {
      case m: MemoryCommitMessage if m.block.rows.nonEmpty => m.block
    }
    t.synchronized {
      if (overwrite) t.truncate()
      t.append(blocks.toSeq)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class MemoryCommitMessage(block: MemoryStore.Block) extends WriterCommitMessage

final class MemoryDataWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val proj = UnsafeProjection.create(schema)
      private val buf = new ArrayBuffer[InternalRow]
      private var bytes = 0L
      override def write(record: InternalRow): Unit = {
        val u = proj(record).copy()
        bytes += u.getSizeInBytes
        buf += u
      }
      override def commit(): WriterCommitMessage =
        MemoryCommitMessage(new MemoryStore.Block(buf.toArray, bytes))
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
