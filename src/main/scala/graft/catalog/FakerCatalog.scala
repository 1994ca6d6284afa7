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
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Faker connector (reference: plugin/trino-faker — FakerMetadata,
  * FakerPageSource; property names from ColumnInfo.java:27-32 and
  * FakerConnector.java:127-191): schemaless synthetic data for testing —
  * you CREATE TABLE with a shape and SELECT generated rows.
  *
  * Property mapping (Spark DSv2 has no per-column DDL properties, so column
  * properties are namespaced into table properties):
  *  - table: `default_limit` (rows a full scan yields; reference default
  *    1000), `split_count` (read parallelism, default 4), `seed`,
  *    `null_probability` (table-wide default).
  *  - column `c`: `col.c.min`, `col.c.max`, `col.c.step`,
  *    `col.c.allowed_values` (comma-separated), `col.c.null_probability`,
  *    `col.c.generator`.
  *
  * DETERMINISM (documented departure): the reference draws from a PRNG per
  * query, so two scans disagree. This engine derives every cell from
  * splitmix64(seed, column, global row index) — the same table reads the
  * same everywhere, which makes generated fixtures usable in tests and
  * keeps re-runs of a 1000-executor scan consistent. The reference's
  * `generator` property takes Datafaker `#{...}` expressions; that library
  * is not in this environment, so generator strings are honored by a
  * deterministic two-word lexicon sampler (clearly a stand-in, same policy
  * as the Multimodal codecs and AI functions).
  *
  * Scale: rows are generated inside each task from (partition id, row
  * index) — nothing stored, nothing shuffled, LIMIT is pushed into the
  * generators (SupportsPushDownLimit), so a bounded preview of an
  * arbitrarily large synthetic table costs only the rows previewed. */
class FakerCatalog extends TableCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    FakerCatalog.tables.keySet.asScala.toArray.sorted
      .map(t => Identifier.of(Array("default"), t))

  override def loadTable(ident: Identifier): Table = {
    val t = FakerCatalog.tables.get(ident.name.toLowerCase)
    if (t == null)
      throw new NoSuchTableException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val props = properties.asScala.toMap
    val nullP = props.get("null_probability").map(_.toDouble).getOrElse(0.0)
    require(nullP >= 0 && nullP <= 1,
      "null_probability value must be between 0 and 1, inclusive")
    val limit = props.get("default_limit").map(_.toLong).getOrElse(1000L)
    require(limit >= 1, "default_limit value must be equal or greater than 1")
    val t = new FakerTable(ident.name.toLowerCase, schema,
      limit,
      props.get("split_count").map(_.toInt).getOrElse(4),
      props.get("seed").map(_.toLong).getOrElse(0L),
      nullP, props)
    val existing = FakerCatalog.tables.putIfAbsent(ident.name.toLowerCase, t)
    if (existing != null)
      throw new TableAlreadyExistsException(Seq(catalogName) ++ ident.namespace() :+ ident.name())
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("faker: ALTER not supported")
  override def dropTable(ident: Identifier): Boolean =
    FakerCatalog.tables.remove(ident.name.toLowerCase) != null
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = FakerCatalog.tables.remove(oldIdent.name.toLowerCase)
    if (t == null)
      throw new NoSuchTableException(Seq(catalogName) ++ oldIdent.namespace() :+ oldIdent.name())
    FakerCatalog.tables.put(newIdent.name.toLowerCase, t)
  }
}

object FakerCatalog {
  private[catalog] val tables = new ConcurrentHashMap[String, FakerTable]

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.catalog.graft_faker", classOf[FakerCatalog].getName)

  /** splitmix64 — the per-cell hash every generator draws from. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Uniform double in [0, 1). */
  def unit(h: Long): Double = (h >>> 11) * 1.1102230246251565e-16 // 2^-53

  private val Lexicon: Array[String] = Array(
    "amber", "basalt", "cedar", "delta", "ember", "fjord", "garnet", "harbor",
    "indigo", "juniper", "krypton", "lumen", "meadow", "nimbus", "onyx",
    "prism", "quartz", "raven", "sierra", "tundra", "umber", "vertex",
    "willow", "xenon", "yarrow", "zephyr", "anchor", "breeze", "cobalt",
    "drift", "echo", "flint")

  /** Deterministic stand-in for Datafaker `#{...}` generator expressions. */
  def words(h: Long): String =
    Lexicon((h & 0x1f).toInt) + " " + Lexicon(((h >>> 8) & 0x1f).toInt)
}

final case class FakerColumnSpec(min: Option[String], max: Option[String],
    step: Option[String], allowed: Option[Array[String]],
    nullProbability: Option[Double], generator: Option[String])

final class FakerTable(tableName: String, tableSchema: StructType,
    defaultLimit: Long, splitCount: Int, seed: Long,
    tableNullProbability: Double, props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  private[catalog] def columnSpec(c: String): FakerColumnSpec = FakerColumnSpec(
    props.get(s"col.$c.min"), props.get(s"col.$c.max"), props.get(s"col.$c.step"),
    props.get(s"col.$c.allowed_values").map(_.split(",").map(_.trim)),
    props.get(s"col.$c.null_probability").map(_.toDouble),
    props.get(s"col.$c.generator"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownLimit with SupportsPushDownRequiredColumns {
      private var limit: Long = defaultLimit
      private var projected: StructType = tableSchema
      override def pushLimit(l: Int): Boolean = { limit = math.min(limit, l); true }
      override def pruneColumns(requiredSchema: StructType): Unit =
        projected = requiredSchema
      override def build(): Scan = new FakerScan(tableName, tableSchema, projected,
        limit, splitCount, seed, tableNullProbability,
        tableSchema.fieldNames.map(c => c -> columnSpec(c)).toMap)
    }
}

/** Rows [0, limit) sliced contiguously across `splitCount` partitions; each
  * cell = typed draw from mix(seed ⊕ column-hash ⊕ global row index). */
final class FakerScan(tableName: String, fullSchema: StructType,
    projected: StructType, limit: Long, splitCount: Int, seed: Long,
    tableNullP: Double, specs: Map[String, FakerColumnSpec])
    extends Scan with Batch with Serializable {

  override def readSchema(): StructType = projected
  override def toBatch: Batch = this
  override def description(): String = s"FakerScan($tableName, limit=$limit)"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, splitCount)
    val per = (limit + n - 1) / n
    (0 until n).flatMap { i =>
      val start = i * per
      val end = math.min(limit, start + per)
      if (start < end) Some(FakerInputPartition(start, end): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = projected
    val colSeeds = schema.fields.map(f =>
      FakerCatalog.mix(seed ^ f.name.hashCode.toLong))
    val colSpecs = schema.fields.map(f => specs(f.name))
    val nullP = schema.fields.map(f =>
      colSpecs(schema.fieldIndex(f.name)).nullProbability.getOrElse(tableNullP))
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[FakerInputPartition]
        new PartitionReader[InternalRow] {
          private var row = p.start - 1
          override def next(): Boolean = { row += 1; row < p.end }
          override def get(): InternalRow = {
            val out = new GenericInternalRow(schema.length)
            var i = 0
            while (i < schema.length) {
              val h = FakerCatalog.mix(colSeeds(i) ^ row)
              val isNull = nullP(i) > 0 &&
                FakerCatalog.unit(FakerCatalog.mix(h ^ 0x5eedL)) < nullP(i)
              if (isNull) out.update(i, null)
              else out.update(i, FakerScan.cell(schema.fields(i), colSpecs(i), h))
              i += 1
            }
            out
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}

object FakerScan {
  import FakerCatalog.{mix, unit, words}

  private def boundedLong(h: Long, min: Long, max: Long, step: Long): Long = {
    val span = (max - min) / step + 1
    min + java.lang.Long.remainderUnsigned(h, span) * step
  }

  /** One typed cell. Ranges follow the reference's min/max/step column
    * properties; allowed_values wins over ranges (as in FakerPageSource). */
  def cell(f: StructField, spec: FakerColumnSpec, h: Long): Any = {
    def lmin(d: Long) = spec.min.map(_.toLong).getOrElse(d)
    def lmax(d: Long) = spec.max.map(_.toLong).getOrElse(d)
    def lstep = spec.step.map(_.toLong).getOrElse(1L)
    spec.allowed match {
      case Some(vals) =>
        val pick = vals(java.lang.Long.remainderUnsigned(h, vals.length).toInt)
        f.dataType match {
          case StringType => UTF8String.fromString(pick)
          case IntegerType => pick.toInt
          case LongType => pick.toLong
          case DoubleType => pick.toDouble
          case BooleanType => pick.toBoolean
          case d: DecimalType => Decimal(BigDecimal(pick), d.precision, d.scale)
          case other => throw new UnsupportedOperationException(
            s"faker: allowed_values unsupported for $other")
        }
      case None => f.dataType match {
        case BooleanType => (h & 1) == 0
        case IntegerType => boundedLong(h, lmin(0), lmax(1000000), lstep).toInt
        case LongType => boundedLong(h, lmin(0), lmax(1000000000L), lstep)
        case DoubleType =>
          val mn = spec.min.map(_.toDouble).getOrElse(0.0)
          val mx = spec.max.map(_.toDouble).getOrElse(1.0)
          mn + unit(h) * (mx - mn)
        case d: DecimalType =>
          val mn = spec.min.map(BigDecimal(_)).getOrElse(BigDecimal(0))
          val mx = spec.max.map(BigDecimal(_)).getOrElse(BigDecimal(1000))
          val unscaledSpan = ((mx - mn) * BigDecimal(10).pow(d.scale)).toLong
          val v = mn + BigDecimal(java.lang.Long.remainderUnsigned(h, unscaledSpan + 1),
            d.scale)
          Decimal(v, d.precision, d.scale)
        case DateType =>
          val mn = spec.min.map(java.time.LocalDate.parse(_).toEpochDay)
            .getOrElse(java.time.LocalDate.of(2020, 1, 1).toEpochDay)
          val mx = spec.max.map(java.time.LocalDate.parse(_).toEpochDay)
            .getOrElse(java.time.LocalDate.of(2026, 1, 1).toEpochDay)
          boundedLong(h, mn, mx, 1L).toInt
        case TimestampType | TimestampNTZType =>
          val mn = spec.min.map(s => java.time.Instant.parse(s).toEpochMilli * 1000L)
            .getOrElse(1577836800000000L) // 2020-01-01T00:00:00Z
          val mx = spec.max.map(s => java.time.Instant.parse(s).toEpochMilli * 1000L)
            .getOrElse(1767225600000000L) // 2026-01-01T00:00:00Z
          boundedLong(h, mn, mx, 1L)
        case StringType =>
          // generator strings are honored by the deterministic lexicon
          // sampler (documented stand-in for Datafaker expressions)
          UTF8String.fromString(words(mix(h ^ spec.generator.map(_.hashCode.toLong)
            .getOrElse(0L))))
        case other => throw new UnsupportedOperationException(
          s"faker: unsupported type $other")
      }
    }
  }
}

final case class FakerInputPartition(start: Long, end: Long) extends InputPartition
