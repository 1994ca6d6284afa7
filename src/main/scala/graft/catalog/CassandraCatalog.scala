package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.CassandraWire

/** Cassandra connector over the CQL native protocol (reference:
  * plugin/trino-cassandra — CassandraSplitManager cuts the
  * Murmur3Partitioner TOKEN RING into ranges, one split per range, each
  * split's CQL carrying `token(pk) > lo AND token(pk) <= hi`;
  * CassandraMetadata reads system_schema.columns for the table layout;
  * pushed predicates render into the CQL with ALLOW FILTERING where the
  * engine demands it).
  *
  * Scale shape: the DRIVER runs one system_schema query; each EXECUTOR
  * task owns one token range and drives its own paged QUERY — ring
  * coverage is exact (first range closes at the minimum token, every
  * other range is half-open), so each row lands in exactly one split
  * regardless of data. */
object CassandraCatalog {

  val format: String = classOf[CassandraSource].getName

  def read(spark: SparkSession, host: String, port: Int, keyspace: String,
      table: String, splits: Int = 4): DataFrame =
    spark.read.format(format)
      .option("host", host).option("port", port.toString)
      .option("keyspace", keyspace).option("table", table)
      .option("splits", splits.toString)
      .load()

  private[catalog] def sparkType(cqlTypeName: String): DataType = cqlTypeName match {
    case "bigint" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "varchar" | "text" => StringType
    case other => throw new IllegalArgumentException(s"cassandra: unmapped '$other'")
  }

  private[catalog] def cqlLit(v: Any): Option[String] = v match {
    case null => None
    case s: UTF8String => cqlLit(s.toString)
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case b: Boolean => Some(if (b) "TRUE" else "FALSE")
    case n @ (_: Long | _: Int | _: Short | _: Byte) => Some(n.toString)
    // NaN/Infinity have no CQL literal — evaluate in Spark instead
    case d: Double => if (java.lang.Double.isFinite(d)) Some(d.toString) else None
    case f: Float =>
      if (java.lang.Float.isFinite(f)) Some(f.toDouble.toString) else None
    case _ => None
  }

  /** One pushed Filter → one CQL relation. CQL has no OR/NOT — only
    * conjunctions push (the reference's TupleDomain is conjunctive too). */
  private[catalog] def clause(f: Filter, fields: Set[String]): Option[String] = {
    def col(c: String): Option[String] = if (fields(c)) Some("\"" + c + "\"") else None
    f match {
      case EqualTo(c, v) => for { q <- col(c); l <- cqlLit(v) } yield s"$q = $l"
      case GreaterThan(c, v) => for { q <- col(c); l <- cqlLit(v) } yield s"$q > $l"
      case GreaterThanOrEqual(c, v) => for { q <- col(c); l <- cqlLit(v) } yield s"$q >= $l"
      case LessThan(c, v) => for { q <- col(c); l <- cqlLit(v) } yield s"$q < $l"
      case LessThanOrEqual(c, v) => for { q <- col(c); l <- cqlLit(v) } yield s"$q <= $l"
      case In(c, vs) if vs.nonEmpty =>
        val ls = vs.toSeq.map(cqlLit)
        if (col(c).isEmpty || ls.exists(_.isEmpty)) None
        else Some(s""""$c" IN (${ls.flatten.mkString(", ")})""")
      case And(l, r) => for { a <- clause(l, fields); b <- clause(r, fields) }
        yield s"$a AND $b"
      case _ => None
    }
  }
}

class CassandraSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val c = new CassandraWire.Client(options.get("host"), options.get("port").toInt)
    try {
      // schema discovery over the wire, like a driver. system_schema.columns
      // clusters rows BY COLUMN NAME, so key membership must come from the
      // `kind` column, never from row order (reference CassandraMetadata
      // reads kind/position the same way); fields are presented key-first
      // (partition key by position, clustering by position, then regular
      // alphabetically), the canonical CQL layout.
      val (_, rows) = c.queryAll(
        s"""SELECT column_name, type, kind, position FROM system_schema.columns
            WHERE keyspace_name = '${options.get("keyspace")}'
            AND table_name = '${options.get("table")}' ALLOW FILTERING""")
      val cols = rows.toVector.map { r =>
        (r(0).asInstanceOf[String], r(1).asInstanceOf[String],
          r(2).asInstanceOf[String], r(3).asInstanceOf[Long])
      }
      require(cols.nonEmpty,
        s"cassandra: no such table ${options.get("keyspace")}.${options.get("table")}")
      def field(name: String, tpe: String, kind: String, pos: Long) =
        StructField(name, CassandraCatalog.sparkType(tpe), nullable = true,
          metadata = new MetadataBuilder()
            .putString("cassandra.kind", kind)
            .putLong("cassandra.position", pos).build())
      val pk = cols.filter(_._3 == "partition_key").sortBy(_._4)
      val clustering = cols.filter(_._3 == "clustering").sortBy(_._4)
      val regular = cols.filterNot(c3 =>
        c3._3 == "partition_key" || c3._3 == "clustering").sortBy(_._1)
      StructType((pk ++ clustering ++ regular).map((field _).tupled))
    } finally c.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CassandraTable(schema, properties.get("host"), properties.get("port").toInt,
      properties.get("keyspace"), properties.get("table"),
      Option(properties.get("splits")).map(_.toInt).getOrElse(4))
}

final class CassandraTable(tableSchema: StructType, host: String, port: Int,
    keyspace: String, table: String, splits: Int) extends Table with SupportsRead {
  override def name(): String = s"cassandra:$keyspace.$table"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
      private val fields = tableSchema.fieldNames.toSet
      private var pushed: Array[Filter] = Array.empty
      private var clauses: Seq[String] = Nil
      private var projected: StructType = tableSchema
      private var limit: Option[Int] = None

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (ok, rest) = filters.partition(f =>
          CassandraCatalog.clause(f, fields).isDefined)
        pushed = ok
        clauses = ok.toSeq.flatMap(f => CassandraCatalog.clause(f, fields))
        rest
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        projected = requiredSchema
      override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

      override def build(): Scan = {
        // token() target = the partition key columns by kind/position
        // metadata (composite keys render token("a", "b")); a schema with
        // no kind metadata (hand-declared) falls back to the first field
        val pk = tableSchema.fields
          .filter(f => f.metadata.contains("cassandra.kind") &&
            f.metadata.getString("cassandra.kind") == "partition_key")
          .sortBy(_.metadata.getLong("cassandra.position"))
          .map(_.name).toSeq
        val tokenArgs = (if (pk.nonEmpty) pk else Seq(tableSchema.fieldNames.head))
          .map(n => "\"" + n + "\"").mkString(", ")
        new CassandraScan(host, port, keyspace, table,
          tokenArgs, projected, clauses, limit, splits)
      }
    }
}

final class CassandraScan(host: String, port: Int, keyspace: String,
    table: String, tokenArgs: String, projected: StructType,
    clauses: Seq[String], limit: Option[Int], splits: Int)
    extends Scan with Batch with Serializable {

  override def readSchema(): StructType = projected
  override def toBatch: Batch = this

  private def selectList: String =
    if (projected.isEmpty) tokenArgs
    else projected.fieldNames.map(f => "\"" + f + "\"").mkString(", ")

  /** One token range's CQL — the reference's split query shape.
    * `tokenArgs` is the pre-rendered partition-key column list. */
  private[catalog] def splitCql(range: (Long, Long, Boolean)): String = {
    val (lo, hi, first) = range
    val tokenCond =
      if (first) s"token($tokenArgs) >= $lo AND token($tokenArgs) <= $hi"
      else s"token($tokenArgs) > $lo AND token($tokenArgs) <= $hi"
    val conds = tokenCond +: clauses
    val lim = limit.map(l => s" LIMIT $l").getOrElse("")
    s"SELECT $selectList FROM $keyspace.$table WHERE ${conds.mkString(" AND ")}$lim ALLOW FILTERING"
  }

  override def description(): String =
    s"CassandraScan($keyspace.$table, where=${clauses.mkString(" AND ")}, splits=$splits)"

  override def planInputPartitions(): Array[InputPartition] = {
    // the full Murmur3 ring divided into `splits` contiguous ranges
    val n = math.max(1, splits)
    val span = java.math.BigInteger.valueOf(Long.MaxValue)
      .subtract(java.math.BigInteger.valueOf(Long.MinValue))
    val step = span.divide(java.math.BigInteger.valueOf(n.toLong))
    (0 until n).map { i =>
      val lo = java.math.BigInteger.valueOf(Long.MinValue)
        .add(step.multiply(java.math.BigInteger.valueOf(i.toLong)))
      val hi = if (i == n - 1) java.math.BigInteger.valueOf(Long.MaxValue)
        else lo.add(step)
      CassandraTokenRange(lo.longValueExact(), hi.longValueExact(), i == 0)
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (h, p, schema) = (host, port, projected)
    val self = this
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new CassandraReader(h, p, self.splitCql {
          val r = partition.asInstanceOf[CassandraTokenRange]
          (r.lo, r.hi, r.first)
        }, schema)
    }
  }
}

final case class CassandraTokenRange(lo: Long, hi: Long, first: Boolean)
    extends InputPartition

/** One token range's paged query, streamed on the executor. */
final class CassandraReader(host: String, port: Int, cql: String,
    schema: StructType) extends PartitionReader[InternalRow] {
  private val client = new CassandraWire.Client(host, port)
  private val (cols, rows) = client.queryAll(cql, pageSize = 1000)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!rows.hasNext) false
    else {
      val r = rows.next()
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
