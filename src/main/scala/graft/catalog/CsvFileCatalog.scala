package graft.catalog

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
import org.apache.spark.sql.execution.datasources.v2.csv.CSVTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A second file-format catalog: headerless CSV with DECLARED schemas,
  * registered as a native Spark DSv2 catalog plugin so its tables resolve by
  * `graft_csv.default.<table>` MULTI-CATALOG SQL names — the engine's analog
  * of the reference's hive-formats text tables behind a connector
  * (reference: lib/trino-hive-formats/src/main/java/io/trino/hive/formats/line/csv/CsvDeserializerFactory.java,
  * catalog name resolution core/trino-main/src/main/java/io/trino/metadata/MetadataManager.java:298).
  *
  * Spark-first: `loadTable` hands back Spark's own CSV DSv2 `FileTable`, so
  * scans get the CSV source's predicate pushdown and column pruning for free
  * (asserted in FederationSpec) and splits follow maxPartitionBytes like any
  * file scan. This class is ONLY metadata: name → (path, schema).
  *
  * The declared-schema table set mirrors the fixture dimension tables; data
  * files are populated once per JVM per scale factor from the parquet
  * fixtures (the "remote" system's own data — at real scale the CSV lake
  * exists independently).
  */
class CsvFileCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option 'path'"))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    CsvFileCatalog.schemas.keys.map(t => Identifier.of(Array("default"), t)).toArray

  override def loadTable(ident: Identifier): Table = {
    val tbl = ident.name.toLowerCase
    val schema = CsvFileCatalog.schemas.getOrElse(tbl,
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace() :+ ident.name()))
    CSVTable(tbl, SparkSession.active,
      new CaseInsensitiveStringMap(Map("header" -> "false").asJava),
      Seq(s"$root/$tbl"), Some(schema), classOf[CSVFileFormat])
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException("read-only catalog")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only catalog")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")
}

object CsvFileCatalog {

  /** Declared schemas (the catalog's metadata, not inferred). */
  val schemas: Map[String, StructType] = Map(
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))))

  private val populated = scala.collection.mutable.Set.empty[String]

  /** Register the catalog for `sfDir` under the name `graft_csv` and make
    * sure its data files exist — once per JVM per scale factor. */
  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    val tag = java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
    val root = new java.io.File(s"target/csvcat/g$tag").getAbsolutePath
    if (!populated.contains(root)) {
      schemas.keys.foreach { t =>
        graft.sources.Tables.load(spark, sfDir, t)
          .write.mode("overwrite").option("header", "false").csv(s"$root/$t")
      }
      populated += root
    }
    spark.conf.set("spark.sql.catalog.graft_csv", classOf[CsvFileCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_csv.path", root)
  }

  /** Register Spark's built-in JDBC catalog plugin over the embedded Derby
    * store as `graft_jdbc` — true `catalog.table` names for the JDBC side
    * too (reference MetadataManager catalog resolution). */
  def ensureJdbcCatalog(spark: SparkSession, sfDir: String): Unit = {
    val url = DerbyCatalog.ensureOrders(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft_jdbc",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graft_jdbc.url", url)
    spark.conf.set("spark.sql.catalog.graft_jdbc.driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // DSv2 JDBC pushdown breadth: aggregates/limits compiled into the
    // remote SQL where Derby's dialect supports them (the reference's
    // AggregationPushdown / TopNPushdown connector rules)
    spark.conf.set("spark.sql.catalog.graft_jdbc.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.graft_jdbc.pushDownLimit", "true")
  }
}
