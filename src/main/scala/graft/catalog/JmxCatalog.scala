package graft.catalog

import java.lang.management.ManagementFactory
import java.util.{Map => JMap}
import javax.management.{MBeanAttributeInfo, ObjectName}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** JMX connector (reference: plugin/trino-jmx — JmxMetadata.java:184 maps
  * readable MBean attributes to columns, :219 lists `jmx.current` tables by
  * canonical ObjectName, JmxRecordSetProvider reads attribute values; the
  * reference's `node` column identifies the cluster member a row came
  * from). Tables live in the `current` namespace and are addressed by
  * ObjectName, wildcards included:
  *
  *   SELECT * FROM graft_jmx.current.`java.lang:type=Memory`
  *   SELECT object_name, collectioncount
  *   FROM graft_jmx.current.`java.lang:type=garbagecollector,name=*`
  *
  * Schema = `node` + `object_name` + the readable attributes of the FIRST
  * matching MBean (lowercased, like the reference's case folding), typed
  * from MBeanAttributeInfo (long/int/double/boolean/String; anything else
  * — composite data, arrays — renders as its string form, the lossless
  * fallback). One row per matching MBean.
  *
  * Scale note: on a real cluster the reference fans one split to every
  * node and each returns its own MBean values; this single-JVM engine has
  * exactly one node (`local`), so the read is a driver-side singleton scan
  * — metadata-sized by construction, never data-scaled. */
class JmxCatalog extends TableCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val server = ManagementFactory.getPlatformMBeanServer
    server.queryNames(null, null).asScala.toArray
      .map(o => Identifier.of(Array("current"),
        o.getCanonicalName.toLowerCase(java.util.Locale.ENGLISH))).sortBy(_.name)
  }

  override def loadTable(ident: Identifier): Table = {
    val server = ManagementFactory.getPlatformMBeanServer
    val pattern =
      try new ObjectName(ident.name)
      catch {
        case _: javax.management.MalformedObjectNameException =>
          throw new NoSuchTableException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
      }
    val matched = server.queryNames(pattern, null).asScala.toSeq
      .sortBy(_.getCanonicalName)
    if (matched.isEmpty)
      throw new NoSuchTableException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    new JmxTable(ident.name, matched)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException("jmx: tables are MBeans; CREATE not supported")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("jmx: ALTER not supported")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("jmx: DROP not supported")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("jmx: RENAME not supported")
}

object JmxCatalog {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.catalog.graft_jmx", classOf[JmxCatalog].getName)

  /** Attribute JVM type name → Spark type (JmxMetadata.getColumnType). */
  def sparkType(jvmType: String): DataType = jvmType match {
    case "long" | "java.lang.Long" => LongType
    case "int" | "java.lang.Integer" | "short" | "java.lang.Short" => IntegerType
    case "double" | "java.lang.Double" | "float" | "java.lang.Float" => DoubleType
    case "boolean" | "java.lang.Boolean" => BooleanType
    case _ => StringType // String, CompositeData, arrays: string form
  }
}

final class JmxTable(tableName: String, matched: Seq[ObjectName])
    extends Table with SupportsRead {

  private val attrs: Seq[MBeanAttributeInfo] = {
    val server = ManagementFactory.getPlatformMBeanServer
    server.getMBeanInfo(matched.head).getAttributes.toSeq
      .filter(_.isReadable)
      // one column per distinct lowercased name (first wins)
      .groupBy(_.getName.toLowerCase(java.util.Locale.ENGLISH))
      .map(_._2.head).toSeq.sortBy(_.getName)
  }

  override def name(): String = tableName
  override def schema(): StructType = StructType(
    Seq(StructField("node", StringType, nullable = false),
      StructField("object_name", StringType, nullable = false)) ++
      attrs.map(a => StructField(a.getName.toLowerCase(java.util.Locale.ENGLISH),
        JmxCatalog.sparkType(a.getType), nullable = true)))
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val tableSchema = schema()
    val attrNames = attrs.map(_.getName)
    val attrTypes = attrs.map(a => JmxCatalog.sparkType(a.getType))
    val names = matched.map(_.getCanonicalName)
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def description(): String = s"JmxScan($tableName)"
        // a single metadata-sized partition: the MBean server is in THIS
        // JVM (the reference fans one split per cluster node; local = 1)
        override def planInputPartitions(): Array[InputPartition] =
          Array(JmxInputPartition(names, attrNames, attrTypes))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
              val p = partition.asInstanceOf[JmxInputPartition]
              val server = ManagementFactory.getPlatformMBeanServer
              val rows = p.objectNames.map { on =>
                val obj = new ObjectName(on)
                val out = new GenericInternalRow(2 + p.attrNames.length)
                out.update(0, UTF8String.fromString("local"))
                out.update(1, UTF8String.fromString(on))
                p.attrNames.zipWithIndex.foreach { case (a, i) =>
                  val v =
                    try server.getAttribute(obj, a)
                    catch { case _: Exception => null } // unreadable at runtime
                  // coerce by the DECLARED column type — the runtime boxed
                  // class may be narrower/wider than MBeanAttributeInfo says
                  out.update(2 + i, (v, p.attrTypes(i)) match {
                    case (null, _) => null
                    case (n: java.lang.Number, LongType) => n.longValue()
                    case (n: java.lang.Number, IntegerType) => n.intValue()
                    case (n: java.lang.Number, DoubleType) => n.doubleValue()
                    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
                    case (other, _) => UTF8String.fromString(String.valueOf(other))
                  })
                }
                out: InternalRow
              }.iterator
              new PartitionReader[InternalRow] {
                private var current: InternalRow = _
                override def next(): Boolean =
                  if (rows.hasNext) { current = rows.next(); true } else false
                override def get(): InternalRow = current
                override def close(): Unit = ()
              }
            }
          }
      }
    }
  }
}

final case class JmxInputPartition(objectNames: Seq[String],
    attrNames: Seq[String], attrTypes: Seq[DataType]) extends InputPartition
