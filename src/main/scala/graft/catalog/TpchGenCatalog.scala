package graft.catalog

import java.util.{Map => JMap, OptionalLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Generated-on-the-fly TPC-H catalog — the engine's analogue of the
  * reference's tpch connector (reference: plugin/trino-tpch/src/main/java/io/
  * trino/plugin/tpch/TpchConnectorFactory.java:43, split planning
  * TpchSplitManager.java:35 — splits are ROW RANGES, not files; each node
  * generates its share).
  *
  * Spark-first scale design, mirrored here as a native DSv2 source:
  *  - a split is a half-open row-index range; the reader synthesizes rows
  *    from the index with pure integer arithmetic — ZERO I/O, so a 1000-
  *    executor cluster generates 100 TB in parallel with no source
  *    bottleneck (the reference uses this connector for exactly that kind
  *    of benchmark bootstrapping);
  *  - column pruning is honored at generation time
  *    (SupportsPushDownRequiredColumns): unprojected columns are never
  *    computed (asserted in FederationSpec);
  *  - row counts and byte sizes are reported (SupportsReportStatistics) so
  *    Catalyst broadcasts generated dimension tables like any well-stat'd
  *    source.
  *
  * The value formulas are deliberately SIMPLE deterministic index
  * arithmetic, not a dbgen port (the official text pools/distributions are
  * out of scope — the reference links the public tpch java library for
  * that). Every formula is replayable as DuckDB SQL over range(n), which is
  * how the oracle verifies the generator end-to-end
  * (operators.Federation.q_fed_tpch_generated).
  *
  * sf semantics follow TPC-H: customer 150k·sf, orders 1.5M·sf, supplier
  * 10k·sf, part 200k·sf; lineitem/partsupp are exactly 4 rows per
  * order/part (dbgen draws 1–7 lines per order; the fixed fan-out keeps the
  * global row-index ↔ (order, line) mapping closed-form on both engines).
  */
class TpchGenCatalog extends TableCatalog {

  private var catalogName: String = _
  private var sf: Double = 0.01
  private var splitRows: Long = 100000L

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    sf = Option(options.get("sf")).map(_.toDouble).getOrElse(0.01)
    splitRows = Option(options.get("split_rows")).map(_.toLong).getOrElse(100000L)
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    TpchGen.schemas.keys.map(t => Identifier.of(Array("default"), t)).toArray

  override def loadTable(ident: Identifier): Table = {
    val tbl = ident.name.toLowerCase
    if (!TpchGen.schemas.contains(tbl))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace() :+ ident.name())
    new TpchGenTable(tbl, sf, splitRows)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException("generated catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("generated catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("generated catalog is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("generated catalog is read-only")
}

final class TpchGenTable(table: String, sf: Double, splitRows: Long)
    extends Table with SupportsRead {
  override def name(): String = table
  override def schema(): StructType = TpchGen.schemas(table)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TpchGenScanBuilder(table, sf, splitRows)
}

final class TpchGenScanBuilder(table: String, sf: Double, splitRows: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TpchGen.schemas(table)
  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projection (e.g. count(*)) still needs a row cursor
    required = requiredSchema
  override def build(): Scan = new TpchGenScan(table, sf, splitRows, required)
}

final class TpchGenScan(table: String, sf: Double, splitRows: Long,
    required: StructType) extends Scan with Batch with SupportsReportStatistics {
  private val rows = TpchGen.rowCount(table, sf)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"tpchgen[$table sf=$sf rows=$rows cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1L, (rows + splitRows - 1) / splitRows)
    (0L until n).map { s =>
      val start = s * splitRows
      TpchGenPartition(table, start, math.min(start + splitRows, rows), sf)
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TpchGenReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      // ~8 bytes per numeric + 16 per string of the PRUNED schema: pruning
      // a wide table down to two columns shrinks the estimate, exactly what
      // the broadcast decision should see
      OptionalLong.of(rows * required.fields.map {
        case f if f.dataType == StringType => 16L
        case _ => 8L
      }.sum.max(1L))
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }
}

final case class TpchGenPartition(table: String, start: Long, end: Long,
    sf: Double) extends InputPartition

final class TpchGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[TpchGenPartition]
    new TpchGenReader(part, required)
  }
}

final class TpchGenReader(part: TpchGenPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = part.start - 1
  private val gens: Array[Long => Any] =
    required.fieldNames.map(TpchGen.generator(part.table, _, part.sf))
  private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
    new Array[Any](gens.length))

  override def next(): Boolean = { i += 1; i < part.end }
  override def get(): InternalRow = {
    var c = 0
    while (c < gens.length) { row.update(c, gens(c)(i)); c += 1 }
    row
  }
  override def close(): Unit = ()
}

/** Schemas + per-column index formulas, and their DuckDB SQL replays. */
object TpchGen {

  private val EpochDay19920101 = 8035L // LocalDate.of(1992,1,1).toEpochDay

  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType, nullable = false),
      StructField("r_name", StringType, nullable = false))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType, nullable = false),
      StructField("n_name", StringType, nullable = false),
      StructField("n_regionkey", IntegerType, nullable = false))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType, nullable = false),
      StructField("c_name", StringType, nullable = false),
      StructField("c_nationkey", IntegerType, nullable = false),
      StructField("c_acctbal", DoubleType, nullable = false),
      StructField("c_mktsegment", StringType, nullable = false))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType, nullable = false),
      StructField("s_name", StringType, nullable = false),
      StructField("s_nationkey", IntegerType, nullable = false),
      StructField("s_acctbal", DoubleType, nullable = false))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType, nullable = false),
      StructField("p_name", StringType, nullable = false),
      StructField("p_brand", StringType, nullable = false),
      StructField("p_type", StringType, nullable = false),
      StructField("p_size", IntegerType, nullable = false),
      StructField("p_retailprice", DoubleType, nullable = false))),
    "partsupp" -> StructType(Seq(
      StructField("ps_partkey", LongType, nullable = false),
      StructField("ps_suppkey", LongType, nullable = false),
      StructField("ps_availqty", IntegerType, nullable = false),
      StructField("ps_supplycost", DoubleType, nullable = false))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_custkey", LongType, nullable = false),
      StructField("o_orderstatus", StringType, nullable = false),
      StructField("o_totalprice", DoubleType, nullable = false),
      StructField("o_orderdate", DateType, nullable = false),
      StructField("o_orderpriority", StringType, nullable = false))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType, nullable = false),
      StructField("l_linenumber", IntegerType, nullable = false),
      StructField("l_partkey", LongType, nullable = false),
      StructField("l_suppkey", LongType, nullable = false),
      StructField("l_quantity", DoubleType, nullable = false),
      StructField("l_extendedprice", DoubleType, nullable = false),
      StructField("l_discount", DoubleType, nullable = false),
      StructField("l_tax", DoubleType, nullable = false),
      StructField("l_returnflag", StringType, nullable = false),
      StructField("l_linestatus", StringType, nullable = false),
      StructField("l_shipdate", DateType, nullable = false))))

  def customers(sf: Double): Long = math.max(1L, (150000 * sf).toLong)
  def suppliers(sf: Double): Long = math.max(1L, (10000 * sf).toLong)
  def parts(sf: Double): Long = math.max(1L, (200000 * sf).toLong)
  def ordersCount(sf: Double): Long = math.max(1L, (1500000 * sf).toLong)

  def rowCount(table: String, sf: Double): Long = table match {
    case "region" => 5L
    case "nation" => 25L
    case "customer" => customers(sf)
    case "supplier" => suppliers(sf)
    case "part" => parts(sf)
    case "partsupp" => 4 * parts(sf)
    case "orders" => ordersCount(sf)
    case "lineitem" => 4 * ordersCount(sf)
  }

  private val regions =
    Array("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val segments =
    Array("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
  private val prios =
    Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val partTypes = Array("ECONOMY ANODIZED STEEL", "LARGE BRUSHED BRASS",
    "MEDIUM POLISHED COPPER", "PROMO BURNISHED NICKEL", "SMALL PLATED TIN",
    "STANDARD POLISHED STEEL")
  private val statuses = Array("O", "F", "P")
  private val flags = Array("R", "A", "N")
  private val lineStatuses = Array("O", "F")

  private def u(s: String) = UTF8String.fromString(s)
  private def pad9(v: Long) = f"$v%09d"

  /** Column generator: 0-based global row index → catalyst value. Each
    * formula has a 1:1 SQL replay in [[oracleCte]]. */
  def generator(table: String, col: String, sf: Double): Long => Any = {
    val nCust = customers(sf); val nSupp = suppliers(sf); val nPart = parts(sf)
    (table, col) match {
      case ("region", "r_regionkey") => i => i.toInt
      case ("region", "r_name") => i => u(regions(i.toInt))
      case ("nation", "n_nationkey") => i => i.toInt
      case ("nation", "n_name") => i => u("NATION_" + i)
      case ("nation", "n_regionkey") => i => (i % 5).toInt
      case ("customer", "c_custkey") => i => i + 1
      case ("customer", "c_name") => i => u("Customer#" + pad9(i + 1))
      case ("customer", "c_nationkey") => i => ((i * 7) % 25).toInt
      case ("customer", "c_acctbal") => i => ((i * 104729) % 1099999) / 100.0 - 999.99
      case ("customer", "c_mktsegment") => i => u(segments(((i * 31) % 5).toInt))
      case ("supplier", "s_suppkey") => i => i + 1
      case ("supplier", "s_name") => i => u("Supplier#" + pad9(i + 1))
      case ("supplier", "s_nationkey") => i => ((i * 11) % 25).toInt
      case ("supplier", "s_acctbal") => i => ((i * 48271) % 1099999) / 100.0 - 999.99
      case ("part", "p_partkey") => i => i + 1
      case ("part", "p_name") => i => u("part_" + i)
      case ("part", "p_brand") => i => u("Brand#" + (1 + (i * 3) % 5) + (1 + (i * 7) % 5))
      case ("part", "p_type") => i => u(partTypes(((i * 13) % 6).toInt))
      case ("part", "p_size") => i => (1 + (i * 17) % 50).toInt
      case ("part", "p_retailprice") => i => 900.0 + ((i * 31) % 20001) / 100.0
      case ("partsupp", "ps_partkey") => i => i / 4 + 1
      case ("partsupp", "ps_suppkey") => i => 1 + (i / 4 + (i % 4) * (nSupp / 4 + 1)) % nSupp
      case ("partsupp", "ps_availqty") => i => (1 + (i * 37) % 9999).toInt
      case ("partsupp", "ps_supplycost") => i => 1.0 + ((i * 53) % 99900) / 100.0
      case ("orders", "o_orderkey") => i => i + 1
      case ("orders", "o_custkey") => i => 1 + (i * 7919) % nCust
      case ("orders", "o_orderstatus") => i => u(statuses(((i * 13) % 3).toInt))
      case ("orders", "o_totalprice") => i => 1000.0 + ((i * 104729) % 10000000) / 100.0
      case ("orders", "o_orderdate") => i => (EpochDay19920101 + (i * 17) % 2406).toInt
      case ("orders", "o_orderpriority") => i => u(prios(((i * 19) % 5).toInt))
      case ("lineitem", "l_orderkey") => i => i / 4 + 1
      case ("lineitem", "l_linenumber") => i => (i % 4 + 1).toInt
      case ("lineitem", "l_partkey") => i => 1 + (i * 7561) % nPart
      case ("lineitem", "l_suppkey") => i => 1 + (i * 8291) % nSupp
      case ("lineitem", "l_quantity") => i => (1 + (i * 11) % 50).toDouble
      case ("lineitem", "l_extendedprice") => i => 901.0 + ((i * 104729) % 90000) / 100.0
      case ("lineitem", "l_discount") => i => ((i * 13) % 11) / 100.0
      case ("lineitem", "l_tax") => i => ((i * 17) % 9) / 100.0
      case ("lineitem", "l_returnflag") => i => u(flags(((i * 7) % 3).toInt))
      case ("lineitem", "l_linestatus") => i => u(lineStatuses(((i * 3) % 2).toInt))
      case ("lineitem", "l_shipdate") => i => (EpochDay19920101 + 2 + (i * 19) % 2400).toInt
    }
  }

  /** DuckDB CTE replaying the generator for `table` at `sf` — the oracle's
    * side of the 1:1 formula contract (range(n) yields 0-based i like the
    * reader's row index). */
  def oracleCte(table: String, sf: Double): String = {
    val nCust = customers(sf); val nSupp = suppliers(sf); val nPart = parts(sf)
    table match {
      case "region" =>
        """SELECT CAST(range AS INT) AS r_regionkey,
             (['AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'])[CAST(range AS INT)+1] AS r_name
           FROM range(5)"""
      case "nation" =>
        """SELECT CAST(range AS INT) AS n_nationkey,
             'NATION_' || range AS n_name,
             CAST(range % 5 AS INT) AS n_regionkey
           FROM range(25)"""
      case "customer" =>
        s"""SELECT range + 1 AS c_custkey,
             'Customer#' || lpad(CAST(range + 1 AS VARCHAR), 9, '0') AS c_name,
             CAST((range * 7) % 25 AS INT) AS c_nationkey,
             ((range * 104729) % 1099999) / 100.0 - 999.99 AS c_acctbal,
             (['AUTOMOBILE','BUILDING','FURNITURE','MACHINERY','HOUSEHOLD'])[CAST((range * 31) % 5 AS INT)+1] AS c_mktsegment
           FROM range($nCust)"""
      case "supplier" =>
        s"""SELECT range + 1 AS s_suppkey,
             'Supplier#' || lpad(CAST(range + 1 AS VARCHAR), 9, '0') AS s_name,
             CAST((range * 11) % 25 AS INT) AS s_nationkey,
             ((range * 48271) % 1099999) / 100.0 - 999.99 AS s_acctbal
           FROM range($nSupp)"""
      case "orders" =>
        s"""SELECT range + 1 AS o_orderkey,
             1 + (range * 7919) % $nCust AS o_custkey,
             (['O','F','P'])[CAST((range * 13) % 3 AS INT)+1] AS o_orderstatus,
             1000.0 + ((range * 104729) % 10000000) / 100.0 AS o_totalprice,
             DATE '1992-01-01' + CAST((range * 17) % 2406 AS INT) AS o_orderdate,
             (['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'])[CAST((range * 19) % 5 AS INT)+1] AS o_orderpriority
           FROM range(${ordersCount(sf)})"""
      case "lineitem" =>
        s"""SELECT range // 4 + 1 AS l_orderkey,
             CAST(range % 4 + 1 AS INT) AS l_linenumber,
             1 + (range * 7561) % $nPart AS l_partkey,
             1 + (range * 8291) % $nSupp AS l_suppkey,
             CAST(1 + (range * 11) % 50 AS DOUBLE) AS l_quantity,
             901.0 + ((range * 104729) % 90000) / 100.0 AS l_extendedprice,
             ((range * 13) % 11) / 100.0 AS l_discount,
             ((range * 17) % 9) / 100.0 AS l_tax,
             (['R','A','N'])[CAST((range * 7) % 3 AS INT)+1] AS l_returnflag,
             (['O','F'])[CAST((range * 3) % 2 AS INT)+1] AS l_linestatus,
             DATE '1992-01-03' + CAST((range * 19) % 2400 AS INT) AS l_shipdate
           FROM range(${4 * ordersCount(sf)})"""
      case "part" =>
        s"""SELECT range + 1 AS p_partkey,
             'part_' || range AS p_name,
             'Brand#' || (1 + (range * 3) % 5) || (1 + (range * 7) % 5) AS p_brand,
             (['ECONOMY ANODIZED STEEL','LARGE BRUSHED BRASS','MEDIUM POLISHED COPPER','PROMO BURNISHED NICKEL','SMALL PLATED TIN','STANDARD POLISHED STEEL'])[CAST((range * 13) % 6 AS INT)+1] AS p_type,
             CAST(1 + (range * 17) % 50 AS INT) AS p_size,
             900.0 + ((range * 31) % 20001) / 100.0 AS p_retailprice
           FROM range($nPart)"""
      case "partsupp" =>
        s"""SELECT range // 4 + 1 AS ps_partkey,
             1 + (range // 4 + (range % 4) * ($nSupp // 4 + 1)) % $nSupp AS ps_suppkey,
             CAST(1 + (range * 37) % 9999 AS INT) AS ps_availqty,
             1.0 + ((range * 53) % 99900) / 100.0 AS ps_supplycost
           FROM range(${4 * parts(sf)})"""
    }
  }

  /** Register the catalog under `graft_tpch` at `sf`. */
  def ensure(spark: SparkSession, sf: Double): Unit = {
    spark.conf.set("spark.sql.catalog.graft_tpch", classOf[TpchGenCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_tpch.sf", sf.toString)
  }
}
