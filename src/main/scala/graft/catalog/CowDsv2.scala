package graft.catalog

import java.nio.file.{Files, Paths}
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, Literal, Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 serving layer for bucketed CoW tables: a `Table` whose `Scan` plans
  * ONE input partition per hash bucket straight from the version's parquet
  * MANIFEST and reports `KeyGroupedPartitioning(bucket(n, cols), …)` — the
  * storage-partitioned-join API (Spark ≥ 3.3). This serves ANY snapshot
  * bucket-aware with
  *
  *  - no version DIRECTORY and no hardlink/copy carry at commit time
  *    (commit cost is O(files touched by the mutation), not O(file census)),
  *  - no catalog DDL per read (the old path re-pointed a session-catalog
  *    entry — DROP + CREATE + RECOVER PARTITIONS per READ on partitioned
  *    tables), and
  *  - no per-version catalog entries for time travel — a past version is
  *    just another manifest.
  *
  * This is the structure of the reference's iceberg bucketing (reference:
  * plugin/trino-iceberg/src/main/java/io/trino/plugin/iceberg/util/...
  * bucket transforms served from manifests alone; split generation in
  * core/trino-main): layout metadata lives in the table format, not in a
  * directory shape or an external catalog.
  *
  * Spark-first division of labor: graft plans the bucket → files mapping
  * (the part Spark cannot know) and DELEGATES all per-file parquet mechanics
  * to Spark's own `ParquetPartitionReaderFactory` via
  * [[org.apache.spark.sql.graftcow.ParquetShim]] — vectorized reads,
  * pushed-filter row-group pruning, partition-value appending and
  * `input_file_name()` bookkeeping are the stock implementations. Joins and
  * aggregations on the bucket key then plan zero exchanges through Spark's
  * EnsureRequirements (KeyGroupedPartitioning satisfies ClusteredDistribution;
  * two compatible scans storage-partition-join), and with
  * `spark.sql.sources.v2.bucketing.shuffle.enabled` a NON-bucketed probe side
  * shuffles TO the index's layout via the reported `bucket` function while
  * the index side never moves — the incremental-dedup contract.
  */
object CowDsv2 {
  /** Session-catalog plugin name the DSv2 tables resolve through. */
  val CatalogName = "graft_cow"

  /** Register the catalog plugin + the storage-partitioned-join confs in
    * this session (idempotent; all four are runtime-settable). */
  def ensureSession(spark: SparkSession): Unit = {
    if (!spark.conf.getOption(s"spark.sql.catalog.$CatalogName")
        .contains(classOf[GraftCowCatalog].getName))
      spark.conf.set(s"spark.sql.catalog.$CatalogName",
        classOf[GraftCowCatalog].getName)
    Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // lets a non-bucketed join side shuffle TO a KeyGroupedPartitioning
      // via the reported bucket function (the index-probe shape)
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true"
    ).foreach { case (k, v) =>
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }
  }

  /** (root, version) → identifier name. Hex keeps the name parser-safe. */
  def encode(root: String, version: Int): String =
    "t" + root.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString + s"_v$version"

  def decode(name: String): (String, Int) = {
    val m = "^t([0-9a-f]+)_v(\\d+)$".r.findFirstMatchIn(name).getOrElse(
      throw new IllegalArgumentException(s"not a graft_cow identifier: $name"))
    val bytes = m.group(1).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    (new String(bytes, "UTF-8"), m.group(2).toInt)
  }

  /** The DSv2 DataFrame for version `v` of the CoW table at `root`. */
  def table(spark: SparkSession, root: String, version: Int): DataFrame = {
    ensureSession(spark)
    spark.table(s"$CatalogName.`${encode(root, version)}`")
  }

  /** Spark bucket id from a `bucketBy`-written file name
    * (`part-…-<uuid>_000NN.c000.….parquet`). */
  def bucketIdOf(fileName: String): Option[Int] =
    "_(\\d{5})\\.".r.findFirstMatchIn(fileName).map(_.group(1).toInt)

  /** The exact bucket assignment Spark's `bucketBy` writer used:
    * pmod(Murmur3(cols…, seed 42), n) — HashPartitioning.partitionIdExpression.
    * `values` are Catalyst-internal, in bucket-column order. */
  def bucketId(values: Seq[Any], dataTypes: Seq[DataType], n: Int): Int = {
    var acc = 42
    var i = 0
    while (i < values.length) {
      acc = Murmur3HashFunction.hash(values(i), dataTypes(i), acc.toLong).toInt
      i += 1
    }
    val r = acc % n
    if (r < 0) r + n else r
  }

  // ------------------------------------------------- table layout metadata
  private[catalog] final case class Layout(
      root: String, version: Int,
      storedSchema: StructType, partCols: Seq[String],
      bucketCols: Seq[String], bucketCount: Int, sortCols: Seq[String]) {
    /** File-side columns (partition values live in the path, not the file). */
    val dataSchema: StructType =
      StructType(storedSchema.fields.filterNot(f =>
        partCols.exists(_.equalsIgnoreCase(f.name))))
    /** Partition columns, in declaration order, typed from the table schema. */
    val partitionSchema: StructType =
      StructType(partCols.map(c => storedSchema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"partition column $c not in schema"))))
    val bucketTypes: Seq[DataType] =
      bucketCols.map(c => storedSchema.fields.find(_.name.equalsIgnoreCase(c)).get.dataType)
  }

  private[catalog] def layoutOf(root: String, version: Int): Layout = {
    def readOpt(name: String): Option[String] = {
      val p = Paths.get(root, name)
      if (Files.exists(p)) Some(new String(Files.readAllBytes(p))) else None
    }
    val schemaDdl = readOpt("_table_schema").getOrElse(
      throw new NoSuchTableException(Identifier.of(Array.empty, s"$root@v$version")))
    val partCols = readOpt("_partitioning").map(_.trim.split(",").toSeq
      .map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
    val bkt = readOpt("_bucketing").getOrElse(
      throw new IllegalArgumentException(s"$root is not a bucketed CoW table"))
    val lines = bkt.split("\n", -1)
    val sorted = if (lines.length > 2 && lines(2).trim.nonEmpty)
      lines(2).trim.split(",").toSeq.map(_.trim) else Seq.empty
    Layout(root, version, StructType.fromDDL(schemaDdl), partCols,
      lines(1).trim.split(",").toSeq.map(_.trim), lines(0).trim.toInt, sorted)
  }

  /** Hive %xx path unescaping (only %-sequences; '+' is literal). */
  private[catalog] def unescapePath(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse `col=value` segments out of a manifest path (segments between the
    * version/stage dir and the file name), lowercased col → raw value. */
  private[catalog] def partValuesOf(path: String): Map[String, String] =
    path.split('/').iterator.filter(_.contains('=')).map { seg =>
      val i = seg.indexOf('=')
      seg.substring(0, i).toLowerCase -> unescapePath(seg.substring(i + 1))
    }.toMap

  private[catalog] def castPartValue(raw: String, dt: DataType): Any =
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else Cast(Literal(UTF8String.fromString(raw), StringType), dt,
      Option("UTC")).eval(null)

  /** Type-exact bound comparison for the pruning decisions (r18 fix: the
    * previous `Double.compare(x.doubleValue, y.doubleValue)` collapsed
    * longs that differ only below 2^53 — a file with max = 2^53+1 probed
    * with `> 2^53` compared EQUAL and was wrongly pruned, silently losing
    * rows — and `String.compareTo` orders by UTF-16 code units while the
    * stored min/max were computed in Spark's UTF8String binary (UTF-8
    * byte) order, which disagrees for supplementary-plane characters).
    * Returns None (= keep the file) whenever the ordering the scan would
    * apply is not provably the ordering the bounds were computed under —
    * the shape of Iceberg's typed comparators. */
  private[graft] def cmpExact(a: Any, b: Any): Option[Int] = {
    def big(n: java.lang.Number): Option[java.math.BigDecimal] = n match {
      case d: java.math.BigDecimal => Some(d)
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
           _: java.lang.Long =>
        Some(java.math.BigDecimal.valueOf(n.longValue()))
      case _: java.lang.Float | _: java.lang.Double =>
        val d = n.doubleValue()
        // NaN/Infinity have no BigDecimal form (and parquet writers drop
        // NaN from stats) — undecidable, keep. new BigDecimal(double) is
        // the exact binary value (never rounds) and collapses -0.0 to 0,
        // matching SQL equality of signed zeros.
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) None
        else Some(new java.math.BigDecimal(d))
      case _ => None
    }
    def floaty(n: Any): Boolean =
      n.isInstanceOf[java.lang.Float] || n.isInstanceOf[java.lang.Double]
    (a, b) match {
      case (null, _) | (_, null) => None
      case (x: java.lang.Number, y: java.lang.Number) if floaty(x) && floaty(y) =>
        // Spark's total order for floating point: -0.0 == 0.0 (the == check)
        // and NaN == NaN / NaN above everything (Double.compare) — so NaN
        // partition values under `IN`/`<=>` keep matching, as before r18
        val dx = x.doubleValue(); val dy = y.doubleValue()
        if (dx == dy) Some(0) else Some(java.lang.Double.compare(dx, dy))
      case (x: java.lang.Number, y: java.lang.Number) =>
        for { bx <- big(x); by <- big(y) } yield bx.compareTo(by)
      case (x: String, y: String) =>
        // binary UTF-8 order — the order min/max were aggregated under
        Some(UTF8String.fromString(x).compareTo(UTF8String.fromString(y)))
      case (x: Comparable[_], y) if x.getClass == y.getClass =>
        Some(x.asInstanceOf[Comparable[Any]].compareTo(y))
      case _ => None
    }
  }
}

/** Catalog plugin: resolves `graft_cow.t<hex(root)>_v<N>` identifiers to
  * [[CowBucketTable]]s and serves the `bucket` function Spark's SPJ planner
  * loads to resolve the reported transform (V2ExpressionUtils loads
  * `bucket` from the relation's FunctionCatalog). Read-only by design —
  * DDL/DML go through the CoW kernel, not this plugin. */
class GraftCowCatalog extends TableCatalog with FunctionCatalog {
  private var cname: String = CowDsv2.CatalogName
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    cname = name
  override def name(): String = cname

  override def listTables(ns: Array[String]): Array[Identifier] = Array.empty
  override def loadTable(ident: Identifier): Table = {
    val (root, v) =
      try CowDsv2.decode(ident.name())
      catch { case _: IllegalArgumentException => throw new NoSuchTableException(ident) }
    if (!Files.exists(Paths.get(root, "_manifests", s"v$v")))
      throw new NoSuchTableException(ident)
    // CowTable.read routes schema-evolved snapshots and versions below the
    // schema floor to the mergeSchema file-list path; a DIRECT
    // graft_cow.<ident> reference must fail loudly for them rather than
    // serve the declared schema over a divergent file generation
    // (silently-NULL columns)
    if (Files.exists(Paths.get(root, "_schema_evolved")))
      throw new NoSuchTableException(ident)
    val floorFile = Paths.get(root, "_schema_floor")
    val floor =
      if (Files.exists(floorFile))
        new String(Files.readAllBytes(floorFile)).trim.toInt
      else 0
    if (v < floor) throw new NoSuchTableException(ident)
    new CowBucketTable(CowDsv2.layoutOf(root, v))
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft_cow is read-only (use CoW DDL)")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft_cow is read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("graft_cow is read-only")

  override def listFunctions(ns: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketUnbound
    else throw new NoSuchFunctionException(ident)
  override def functionExists(ident: Identifier): Boolean =
    ident.name().equalsIgnoreCase("bucket")
}

/** The `bucket(numBuckets, cols…)` function behind the reported transform.
  * Binding captures the argument types; the bound function reproduces the
  * EXACT assignment Spark's `bucketBy` writer used (Murmur3 seed 42, pmod),
  * so a shuffle planned THROUGH this function lands rows in the same bucket
  * as the files on disk. */
object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): Spark bucketBy hash bucket id"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"bucket() expects (int numBuckets, cols...), got ${inputType.simpleString}")
    GraftBucketFunction(inputType.fields.map(_.dataType))
  }
}

final case class GraftBucketFunction(inTypes: Array[DataType])
    extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String =
    "graft.bucket(" + inTypes.drop(1).map(_.catalogString).mkString(",") + ")"
  override def inputTypes(): Array[DataType] = inTypes
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val vals = (1 until inTypes.length).map(i =>
      if (input.isNullAt(i)) null else input.get(i, inTypes(i)))
    Integer.valueOf(CowDsv2.bucketId(vals, inTypes.toSeq.drop(1), n))
  }
}

/** One snapshot of one bucketed CoW table, served from its manifest. */
final class CowBucketTable(layout: CowDsv2.Layout)
    extends Table with SupportsRead {
  override def name(): String = s"graft_cow:${layout.root}@v${layout.version}"
  override def schema(): StructType =
    StructType(layout.dataSchema.fields ++ layout.partitionSchema.fields)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(layout.bucketCount, layout.bucketCols: _*))
  override def properties(): java.util.Map[String, String] =
    Map("provider" -> "graft-cow", "version" -> layout.version.toString).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CowScanBuilder(SparkSession.active, layout, schema())
}

private[graft] final class CowScanBuilder(
    spark: SparkSession, layout: CowDsv2.Layout, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushedData: Array[Filter] = Array.empty
  private var partFilters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val isPart = (c: String) => layout.partCols.exists(_.equalsIgnoreCase(c))
    val (part, data) = filters.partition(f =>
      f.references.nonEmpty && f.references.forall(isPart))
    partFilters = part
    pushedData = data.filter(_.references.forall(c =>
      layout.dataSchema.fields.exists(_.name.equalsIgnoreCase(c))))
    // everything stays a post-scan filter: parquet row-group stats and the
    // partition pruning below only PRUNE, Spark re-evaluates exactly
    filters
  }
  override def pushedFilters(): Array[Filter] = pushedData ++ partFilters

  override def build(): Scan =
    new CowScan(spark, layout, required, pushedData, partFilters)
}

/** An InputPartition = one hash bucket's file slice of the snapshot. */
private[graft] final case class CowInputPartition(
    bucketId: Int, files: Array[PartitionedFile])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
  def toFilePartition: FilePartition = FilePartition(bucketId, files)
}

/** Delegates per-file parquet reading to Spark's own factory (which expects
  * FilePartition input partitions). */
private[graft] final case class CowReaderFactory(delegate: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def fp(p: InputPartition): FilePartition =
    p.asInstanceOf[CowInputPartition].toFilePartition
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    delegate.createReader(fp(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    delegate.createColumnarReader(fp(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(fp(p))
}

private[graft] final class CowScan(
    spark: SparkSession, layout: CowDsv2.Layout, required: StructType,
    dataFilters: Array[Filter], partFilters: Array[Filter])
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportStatistics with SupportsRuntimeFiltering
    with SupportsReportOrdering {

  /** Per-partition sort order (SQL `sorted_by`), reported ONLY when it
    * actually holds: every bucket partition streams a single sorted file
    * (a compacted/fresh generation). Multi-file buckets (appends) and
    * hive-partitioned layouts concatenate files, so they report nothing —
    * never a wrong ordering. Eliminates the SMJ sorts on bucket+sort-key
    * joins, the reference's sorted-bucket read contract
    * (plugin/trino-hive sorted_by). */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val avail = readSchema().fieldNames.map(_.toLowerCase).toSet
    val ok = layout.sortCols.nonEmpty &&
      layout.sortCols.forall(c => avail.contains(c.toLowerCase)) &&
      staticPartitions.nonEmpty && staticPartitions.forall(_.files.length <= 1)
    if (!ok) Array.empty
    else layout.sortCols.map(c => Expressions.sort(
      Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING,
      org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST)).toArray
  }

  // ---- runtime (DPP-style) filters, delivered by Spark after broadcast
  // materialization: partition-column predicates prune whole hive
  // partitions, bucket-column IN/EQ sets prune to the matching buckets —
  // the DSv2 analogue of FileSourceScan's dynamic partition pruning.
  // Static pruning (the reported partitioning) is unaffected: Spark
  // re-plans input partitions after filter() and regroups the surviving
  // keys itself.
  @volatile private var runtimePartFilters: Array[Filter] = Array.empty
  @volatile private var runtimeBuckets: Option[Set[Int]] = None
  // per-bucket-column equality value sets accumulated across runtime
  // deliveries (filters for different columns can arrive in separate
  // filter() calls, one per materialized join side)
  @volatile private var runtimeEqSets: Map[String, Set[Any]] = Map.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    // only columns that survived column pruning: Spark resolves these
    // against the scan's (pruned) output
    val avail = readSchema().fieldNames.map(_.toLowerCase).toSet
    (layout.partCols ++ layout.bucketCols).distinct
      .filter(c => avail.contains(c.toLowerCase))
      .map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray
  }

  // synchronized: deliveries for different join sides can arrive on
  // separate threads; the read-modify-write on runtimeEqSets/runtimeBuckets
  // must not drop one column's intersect (each delivery alone stays a sound
  // superset, but a lost update silently weakens pruning — ADVICE r18)
  override def filter(filters: Array[Filter]): Unit = synchronized {
    val isPart = (c: String) => layout.partCols.exists(_.equalsIgnoreCase(c))
    runtimePartFilters = runtimePartFilters ++ filters.filter(f =>
      f.references.nonEmpty && f.references.forall(isPart))
    // bucket-column IN/EQ → allowed bucket ids. r18: generalized from the
    // single-column special case to ANY bucket arity — per-column value
    // sets accumulate across deliveries, and once EVERY bucket column has
    // one, the CROSS PRODUCT of the sets (a superset of the true tuples,
    // so never wrong pruning) derives the allowed ids — the runtime twin
    // of targetBucket's static all-columns-equality rule. Bounded: a
    // product over 65536 combinations skips derivation (keep all buckets).
    // value canonicalization for the SETS: Array[Byte] compares by
    // reference, so binary bucket values are wrapped (value equality) and
    // unwrapped before hashing — two deliveries of content-equal arrays
    // must intersect to themselves, not to the empty set
    def canon(v: Any): Any = v match {
      case bs: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(bs)
      case x => x
    }
    def uncanon(v: Any): Any = v match {
      case s: scala.collection.immutable.ArraySeq[_] => s.unsafeArray
      case x => x
    }
    val lcCols = layout.bucketCols.map(_.toLowerCase)
    filters.foreach {
      case In(a, vs) if lcCols.contains(a.toLowerCase) =>
        val s = vs.filter(_ != null).map(canon).toSet
        runtimeEqSets = runtimeEqSets.updated(a.toLowerCase,
          runtimeEqSets.get(a.toLowerCase).fold(s)(_ intersect s))
      case EqualTo(a, v) if lcCols.contains(a.toLowerCase) && v != null =>
        val s = Set[Any](canon(v))
        runtimeEqSets = runtimeEqSets.updated(a.toLowerCase,
          runtimeEqSets.get(a.toLowerCase).fold(s)(_ intersect s))
      case _ =>
    }
    if (lcCols.forall(runtimeEqSets.contains)) {
      val sets = lcCols.map(c => runtimeEqSets(c).toSeq)
      // saturating product: each step caps at 65537 (acc ≤ 65537 and
      // size ≤ 2^31 can't overflow a Long) so huge In-sets never sneak
      // past the guard; an empty set zeroes the product (prune all —
      // correct: that column has no possible value)
      val combos = sets.foldLeft(1L)((acc, s) => math.min(acc * s.size, 65537L))
      if (combos <= 65536L) {
        val internal = sets.map(_.map(v =>
          CatalystTypeConverters.convertToCatalyst(uncanon(v))))
        val allowed = internal
          .foldLeft(Seq(List.empty[Any]))((acc, s) => acc.flatMap(t => s.map(t :+ _)))
          .map(vals => CowDsv2.bucketId(vals, layout.bucketTypes, layout.bucketCount))
          .toSet
        runtimeBuckets = Some(runtimeBuckets.fold(allowed)(_ intersect allowed))
      }
    }
  }

  /** True when this manifest version carries the `_stats_utf8` marker:
    * every string min/max in it was merged (and carried) under UTF-8
    * binary order, the order cmpExact compares under. Manifests written
    * before the r18 UTF-8 merge fix may hold UTF-16-merged string bounds
    * whose max is understated above the BMP — their string stats are
    * ignored (keep = never wrong pruning; ADVICE r19). */
  private lazy val stringStatsTrusted: Boolean = Files.exists(
    Paths.get(layout.root, "_manifests", s"v${layout.version}", "_stats_utf8"))

  private val readDataSchema = StructType(required.fields.filter(f =>
    layout.dataSchema.fields.exists(_.name.equalsIgnoreCase(f.name))))
  private val readPartitionSchema = StructType(required.fields.filter(f =>
    layout.partCols.exists(_.equalsIgnoreCase(f.name))))

  override def readSchema(): StructType =
    StructType(readDataSchema.fields ++ readPartitionSchema.fields)
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCowScan ${layout.root} v${layout.version} " +
      s"bucket(${layout.bucketCount}, ${layout.bucketCols.mkString(",")})" +
      (if (partFilters.nonEmpty) s" partFilters=${partFilters.mkString(",")}" else "")

  /** Equality filters on EVERY bucket column → the single target bucket id
    * (point-lookup bucket pruning, the HiveBucketing fast path). */
  private def targetBucket: Option[Int] = {
    val eqs = layout.bucketCols.map { c =>
      dataFilters.collectFirst {
        case EqualTo(a, v) if a.equalsIgnoreCase(c) => v
      }
    }
    if (eqs.exists(_.isEmpty)) None
    else {
      val internal = eqs.flatten.zip(layout.bucketTypes).map { case (v, dt) =>
        CatalystTypeConverters.convertToCatalyst(v) match {
          case r if r == null => null
          case r => r
        }
      }
      Some(CowDsv2.bucketId(internal, layout.bucketTypes, layout.bucketCount))
    }
  }

  // ---- hive-partition pruning over parsed path values (conservative:
  // anything not understood keeps the file)
  private def partKeep(raw: Map[String, String],
      filters: Array[Filter]): Boolean = {
    val types = layout.partitionSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    def scalaValue(col: String): Option[Any] = {
      val lc = col.toLowerCase
      raw.get(lc).map { s =>
        val dt = types.getOrElse(lc, StringType)
        val internal = CowDsv2.castPartValue(s, dt)
        if (internal == null) null
        else CatalystTypeConverters.createToScalaConverter(dt)(internal)
      }
    }
    def cmp(a: Any, b: Any): Option[Int] = CowDsv2.cmpExact(a, b)
    def eval(f: Filter): Option[Boolean] = f match {
      case EqualTo(a, v) => scalaValue(a).flatMap(x => cmp(x, v).map(_ == 0))
      // r18: an UNDECIDABLE comparison (cmp = None) must propagate as None
      // (keep the file), not count as "no match" — In/<=> used to fold it
      // into false and wrongly prune
      case EqualNullSafe(a, v) => scalaValue(a).flatMap(x =>
        if (x == null) Some(v == null)
        else if (v == null) Some(false)
        else cmp(x, v).map(_ == 0))
      case In(a, vs) => scalaValue(a).flatMap { x =>
        if (x == null) Some(false) // null IN (...) is never TRUE: prune is safe
        else {
          // short-circuits on the first definite hit (DPP can deliver
          // thousands of values); an undecidable element poisons a
          // would-be false into None (keep)
          var undecided = false
          val hit = vs.exists { v =>
            v != null && (cmp(x, v) match {
              case Some(c) => c == 0
              case None => undecided = true; false
            })
          }
          if (hit) Some(true) else if (undecided) None else Some(false)
        }
      }
      case IsNull(a) => scalaValue(a).map(_ == null)
      case IsNotNull(a) => scalaValue(a).map(_ != null)
      case GreaterThan(a, v) => scalaValue(a).flatMap(x => cmp(x, v).map(_ > 0))
      case GreaterThanOrEqual(a, v) => scalaValue(a).flatMap(x => cmp(x, v).map(_ >= 0))
      case LessThan(a, v) => scalaValue(a).flatMap(x => cmp(x, v).map(_ < 0))
      case LessThanOrEqual(a, v) => scalaValue(a).flatMap(x => cmp(x, v).map(_ <= 0))
      case And(l, r) => (eval(l), eval(r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l), eval(r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(x) => eval(x).map(!_)
      case _ => None
    }
    filters.forall(f => eval(f).getOrElse(true))
  }

  /** File-level min/max/null pruning over the manifest's stored column
    * stats (r17; reference: the iceberg connector prunes data files from
    * manifest value ranges before any footer is read). Conservative: a
    * missing stats map, a column without stats, or a shape the interval
    * logic cannot decide keeps the file. */
  private def statsKeep(stats: Map[String, org.apache.spark.sql.Row],
      filters: Array[Filter]): Boolean = {
    if (stats == null || stats.isEmpty || filters.isEmpty) return true
    val types = layout.dataSchema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    def cmp(a: Any, b: Any): Option[Int] = CowDsv2.cmpExact(a, b)
    // (min, max) as Scala values typed by the table schema, like hive
    // partition values; None when undecidable. NaN bounds are rejected
    // here too, not only at write time: a manifest written before the
    // write-side NaN validation (or by a foreign writer) may carry
    // Math.min/max-poisoned "NaN" bounds, and the float total order would
    // otherwise confidently mis-prune against them (r18 review).
    def notNaN(v: Any): Boolean = v match {
      case d: java.lang.Double => !d.isNaN
      case f: java.lang.Float => !f.isNaN
      case _ => true
    }
    def bounds(colName: String): Option[(Any, Any)] = {
      val lc = colName.toLowerCase
      for {
        r <- stats.get(lc)
        dt <- types.get(lc)
        // legacy string bounds were merged across row groups with UTF-16
        // String.compareTo; cmpExact compares in UTF-8 order, so a
        // supplementary-plane max could be understated and wrongly prune.
        // Only manifests carrying the UTF-8-merge marker get string-range
        // pruning (ADVICE r18); numeric/boolean bounds are order-stable.
        if dt != StringType || stringStatsTrusted
        if !r.isNullAt(0) && !r.isNullAt(1)
        mn = CatalystTypeConverters.createToScalaConverter(dt)(
          CowDsv2.castPartValue(r.getString(0), dt))
        mx = CatalystTypeConverters.createToScalaConverter(dt)(
          CowDsv2.castPartValue(r.getString(1), dt))
        if mn != null && mx != null && notNaN(mn) && notNaN(mx)
      } yield (mn, mx)
    }
    def counts(colName: String): Option[(Long, Long)] =
      stats.get(colName.toLowerCase).map(r => (r.getLong(2), r.getLong(3)))
    // "EVERY row of the file satisfies f" — Some(true) only when provable
    // from the stored bounds/counts; anything else is None. Feeds Not:
    // may(Not f) is false exactly when must(f) is true. Or uses the valid
    // under-approximation must(l)∨must(r) ⇒ must(l OR r); And needs both.
    def must(f: Filter): Option[Boolean] = f match {
      case EqualTo(a, v) => for {
        (mn, mx) <- bounds(a); (nulls, _) <- counts(a)
        c1 <- cmp(mn, v); c2 <- cmp(mx, v)
      } yield c1 == 0 && c2 == 0 && nulls == 0L
      case EqualNullSafe(a, v) =>
        if (v == null) counts(a).map { case (nulls, cnt) => nulls == cnt }
        else must(EqualTo(a, v))
      // single-point file: min==max==v for some v in the list
      case In(a, vs) =>
        if (vs.isEmpty) Some(false)
        else for {
          (mn, mx) <- bounds(a); (nulls, _) <- counts(a); c <- cmp(mn, mx)
        } yield c == 0 && nulls == 0L &&
          vs.exists(v => v != null && cmp(mn, v).contains(0))
      case GreaterThan(a, v) => for {
        b <- bounds(a); (nulls, _) <- counts(a); c <- cmp(b._1, v)
      } yield c > 0 && nulls == 0L
      case GreaterThanOrEqual(a, v) => for {
        b <- bounds(a); (nulls, _) <- counts(a); c <- cmp(b._1, v)
      } yield c >= 0 && nulls == 0L
      case LessThan(a, v) => for {
        b <- bounds(a); (nulls, _) <- counts(a); c <- cmp(b._2, v)
      } yield c < 0 && nulls == 0L
      case LessThanOrEqual(a, v) => for {
        b <- bounds(a); (nulls, _) <- counts(a); c <- cmp(b._2, v)
      } yield c <= 0 && nulls == 0L
      case IsNull(a) => counts(a).map { case (nulls, cnt) => nulls == cnt }
      case IsNotNull(a) => counts(a).map(_._1 == 0L)
      case And(l, r) => (must(l), must(r)) match {
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (must(l), must(r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case _ => None
      }
      case Not(x) => eval(x) match {
        case Some(false) => Some(true) // no row may satisfy x
        case _ => None
      }
      case _ => None
    }
    def eval(f: Filter): Option[Boolean] = f match {
      case EqualTo(a, v) => bounds(a).flatMap { case (mn, mx) =>
        for { c1 <- cmp(mn, v); c2 <- cmp(mx, v) } yield c1 <= 0 && c2 >= 0 }
      case EqualNullSafe(a, v) =>
        if (v == null) counts(a).map(_._1 > 0)
        else eval(EqualTo(a, v))
      case In(a, vs) => bounds(a).flatMap { case (mn, mx) =>
        val hits = vs.map(v =>
          for { c1 <- cmp(mn, v); c2 <- cmp(mx, v) } yield c1 <= 0 && c2 >= 0)
        if (hits.exists(_.contains(true))) Some(true)
        else if (hits.forall(_.contains(false))) Some(false)
        else None }
      case GreaterThan(a, v) => bounds(a).flatMap(b => cmp(b._2, v).map(_ > 0))
      case GreaterThanOrEqual(a, v) => bounds(a).flatMap(b => cmp(b._2, v).map(_ >= 0))
      case LessThan(a, v) => bounds(a).flatMap(b => cmp(b._1, v).map(_ < 0))
      case LessThanOrEqual(a, v) => bounds(a).flatMap(b => cmp(b._1, v).map(_ <= 0))
      case IsNull(a) => counts(a).map(_._1 > 0)
      case IsNotNull(a) => counts(a).map { case (nulls, cnt) => cnt > nulls }
      case And(l, r) => (eval(l), eval(r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l), eval(r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      // Not(x) prunes only when x provably holds for EVERY row (a file
      // that is one constant value, e.g.): may-semantics cannot negate a
      // may-answer, so this goes through the must evaluator (r18 verdict #5)
      case Not(x) => must(x) match {
        case Some(true) => Some(false)
        case _ => eval(x) match {
          case Some(false) => Some(true) // x impossible ⇒ Not(x) certain
          case _ => None
        }
      }
      case _ => None // exotic shapes: keep
    }
    filters.forall(f => eval(f).getOrElse(true))
  }

  /** Conservative pre-filter pushed into the DISTRIBUTED manifest read:
    * its survivors are a superset of what the driver-side
    * targetBucket/statsKeep logic keeps (which remains authoritative after
    * the collect), so a translation gap can only under-prune. The payoff is
    * driver-memory scale: a point predicate over a million-file manifest
    * collects a handful of surviving rows, not the census. */
  private[graft] def manifestPreFilter(hasStats: Boolean)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, coalesce, try_element_at, regexp_extract, when}
    type C = org.apache.spark.sql.Column
    // extract the bucket id from the FILE NAME component only, matching the
    // authoritative driver-side bucketIdOf (r18 fix: the previous extract
    // ran over the full path, so a root directory or hive partition VALUE
    // containing `_ddddd.` — e.g. dt=batch_00001.csv — yielded a wrong
    // bucket id and violated the documented superset contract). A file
    // name without a bucket id keeps the row (coalesce → true) so the
    // driver-side loud failure still fires instead of a silent drop.
    val bucketF: Option[C] = targetBucket.map { b =>
      val fileName = regexp_extract(col("path"), "[^/]*$", 0)
      val idTxt = regexp_extract(fileName, "_(\\d{5})\\.", 1)
      // rlike-guarded cast: regexp_extract yields '' on no match, and
      // ''.cast('int') THROWS under spark.sql.ansi.enabled=true instead of
      // going null for the coalesce to keep (ADVICE r18) — the guard makes
      // keep-on-no-match hold under both ANSI modes (a matched extract is
      // exactly five digits, which casts cleanly everywhere)
      coalesce(
        when(idTxt.rlike("^\\d{5}$"), idTxt.cast("int") === b),
        lit(true))
    }
    val types = layout.dataSchema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    // string stats mirror statsKeep's trust gate: untrusted → untranslated
    // (keep), so the pre-filter stays a superset of the driver-side keeps
    def statType(c: String): Option[DataType] =
      types.get(c.toLowerCase).filter(dt => dt != StringType || stringStatsTrusted)
    // try_element_at: missing keys yield NULL under ANSI mode too
    def fld(c: String): C = try_element_at(col("stats"), lit(c.toLowerCase))
    def bound(c: String, end: String, dt: DataType): C =
      fld(c).getField(end).cast(dt)
    def lim(v: Any, dt: DataType): C = lit(v).cast(dt)
    def nullsF(c: String): C = fld(c).getField("nulls")
    def cntF(c: String): C = fld(c).getField("cnt")
    // TRUE only when the stats PROVE every row of the file satisfies f —
    // the distributed twin of statsKeep's must(); missing stats / missing
    // column / failed cast resolve to FALSE (not proven), which the Not
    // lowering below turns into keep. Never-null by construction.
    def mustC(f: Filter): Option[C] = if (!hasStats) None else {
      def proven(c: String)(p: C): C =
        coalesce(col("stats").isNotNull && fld(c).isNotNull && p, lit(false))
      f match {
        case EqualTo(a, v) => statType(a).map(dt => proven(a)(
          bound(a, "min", dt) === lim(v, dt) &&
            bound(a, "max", dt) === lim(v, dt) && nullsF(a) === 0L))
        case EqualNullSafe(a, v) =>
          if (v == null) Some(proven(a)(nullsF(a) === cntF(a)))
          else mustC(EqualTo(a, v))
        case GreaterThan(a, v) => statType(a).map(dt => proven(a)(
          bound(a, "min", dt) > lim(v, dt) && nullsF(a) === 0L))
        case GreaterThanOrEqual(a, v) => statType(a).map(dt => proven(a)(
          bound(a, "min", dt) >= lim(v, dt) && nullsF(a) === 0L))
        case LessThan(a, v) => statType(a).map(dt => proven(a)(
          bound(a, "max", dt) < lim(v, dt) && nullsF(a) === 0L))
        case LessThanOrEqual(a, v) => statType(a).map(dt => proven(a)(
          bound(a, "max", dt) <= lim(v, dt) && nullsF(a) === 0L))
        case IsNull(a) => Some(proven(a)(nullsF(a) === cntF(a)))
        case IsNotNull(a) => Some(proven(a)(nullsF(a) === 0L))
        case And(l, r) => for { a <- mustC(l); b <- mustC(r) } yield a && b
        case Or(l, r) => (mustC(l), mustC(r)) match {
          case (Some(a), Some(b)) => Some(a || b)
          case (one, other) => one.orElse(other) // must(l) ⇒ must(l OR r)
        }
        case _ => None
      }
    }
    def interval(f: Filter): Option[C] = if (!hasStats) None else {
      // three-valued-logic guard: missing stats map / missing column /
      // failed cast all resolve to KEEP
      def guard(c: String)(p: C): C =
        coalesce(col("stats").isNull || fld(c).isNull || p, lit(true))
      f match {
        case EqualTo(a, v) => statType(a).map(dt => guard(a)(
          bound(a, "min", dt) <= lim(v, dt) && bound(a, "max", dt) >= lim(v, dt)))
        case EqualNullSafe(a, v) =>
          if (v == null) Some(guard(a)(nullsF(a) > 0L))
          else interval(EqualTo(a, v))
        case In(a, vs) if vs.nonEmpty => statType(a).map(dt => guard(a)(
          vs.map(v => bound(a, "min", dt) <= lim(v, dt) &&
            bound(a, "max", dt) >= lim(v, dt)).reduce(_ || _)))
        case GreaterThan(a, v) => statType(a).map(dt =>
          guard(a)(bound(a, "max", dt) > lim(v, dt)))
        case GreaterThanOrEqual(a, v) => statType(a).map(dt =>
          guard(a)(bound(a, "max", dt) >= lim(v, dt)))
        case LessThan(a, v) => statType(a).map(dt =>
          guard(a)(bound(a, "min", dt) < lim(v, dt)))
        case LessThanOrEqual(a, v) => statType(a).map(dt =>
          guard(a)(bound(a, "min", dt) <= lim(v, dt)))
        case And(l, r) => (interval(l), interval(r)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (one, other) => one.orElse(other) // half-translated AND stays conservative
        }
        case Or(l, r) => for { a <- interval(l); b <- interval(r) } yield a || b
        // keep unless the stats PROVE x holds for every row (r18 verdict
        // #5: Not used to pass through untranslated, so a million-file
        // manifest under a Not(EqualTo) collected the full census)
        case Not(x) => mustC(x).map(m => !m)
        case _ => None
      }
    }
    (bucketF.toSeq ++ dataFilters.flatMap(interval)).reduceOption(_ && _)
  }

  /** Manifest → surviving files after STATIC pruning, grouped into one
    * partition per bucket — this is the set the reported partitioning
    * describes. Planning cost is O(|manifest|) distributed work — the same
    * order as any source's split enumeration — and O(survivors) driver
    * memory (manifestPreFilter). */
  private lazy val staticPartitions: Array[CowInputPartition] = {
    val manifestRaw = spark.read.parquet(
      Paths.get(layout.root, "_manifests", s"v${layout.version}").toString)
    val present = manifestRaw.columns.toSet
    val extras = Seq("stats", "size", "mtime").filter(present)
    val selected = manifestRaw.select("path", extras: _*)
    val preFiltered = manifestPreFilter(extras.contains("stats"))
      .fold(selected)(selected.filter)
    val manifest: Array[(String, Map[String, org.apache.spark.sql.Row], Option[(Long, Long)])] =
      preFiltered.collect().map { r =>
        def at(name: String): Int = 1 + extras.indexOf(name)
        val st =
          if (extras.contains("stats") && !r.isNullAt(at("stats")))
            r.getMap[String, org.apache.spark.sql.Row](at("stats")).toMap
          else Map.empty[String, org.apache.spark.sql.Row]
        // manifest-carried physical metadata: planning never stats the FS
        val sz =
          if (extras.contains("size") && !r.isNullAt(at("size")) &&
              extras.contains("mtime") && !r.isNullAt(at("mtime")))
            Some((r.getLong(at("size")), r.getLong(at("mtime"))))
          else None
        (r.getString(0), st, sz)
      }
    val tb = targetBucket
    val partTypes = readPartitionSchema.fields
    val byBucket = manifest.iterator.flatMap { case (p, fstats, fmeta) =>
      val fileName = p.substring(p.lastIndexOf('/') + 1)
      val b = CowDsv2.bucketIdOf(fileName).getOrElse(throw new IllegalStateException(
        s"bucketed CoW manifest entry without a bucket id: $p"))
      if (tb.exists(_ != b)) Iterator.empty
      else if (!statsKeep(fstats, dataFilters)) Iterator.empty
      else {
        val rawVals = CowDsv2.partValuesOf(p)
        if (!partKeep(rawVals, partFilters)) Iterator.empty
        else {
          val pvVals: Array[Any] = partTypes.map(f =>
            rawVals.get(f.name.toLowerCase)
              .map(CowDsv2.castPartValue(_, f.dataType)).orNull)
          val (len, mtime) = fmeta.getOrElse {
            // pre-r17 manifest entry without physical metadata: one stat
            val path = Paths.get(p)
            (Files.size(path), Files.getLastModifiedTime(path).toMillis)
          }
          Iterator.single((b, PartitionedFile(new GenericInternalRow(pvVals),
            SparkPath.fromPathString(p), 0L, len, Array.empty[String],
            mtime, len)))
        }
      }
    }.toArray.groupBy(_._1)
    byBucket.toArray.sortBy(_._1).map { case (b, fs) =>
      CowInputPartition(b, fs.map(_._2).sortBy(_.filePath.toString))
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val rb = runtimeBuckets
    val rf = runtimePartFilters
    if (rb.isEmpty && rf.isEmpty) staticPartitions.toArray[InputPartition]
    else staticPartitions.iterator
      .filter(p => rb.forall(_.contains(p.bucketId)))
      .map { p =>
        if (rf.isEmpty) p
        else p.copy(files = p.files.filter(f =>
          partKeep(CowDsv2.partValuesOf(f.filePath.toString), rf)))
      }
      .filter(_.files.nonEmpty)
      .toArray[InputPartition]
  }

  override def outputPartitioning(): Partitioning =
    if (staticPartitions.isEmpty) new UnknownPartitioning(0)
    else new KeyGroupedPartitioning(
      Array(Expressions.bucket(layout.bucketCount, layout.bucketCols: _*)),
      staticPartitions.length)

  override def createReaderFactory(): PartitionReaderFactory =
    CowReaderFactory(org.apache.spark.sql.graftcow.ParquetShim.parquetReaderFactory(
      spark, layout.dataSchema, readDataSchema, readPartitionSchema, dataFilters))

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = {
      val total = staticPartitions.iterator.flatMap(_.files).map(_.fileSize).sum
      // column pruning shrinks what actually flows; approximate by the
      // pruned-to-full ratio WEIGHTED BY FIELD WIDTH (defaultSize) so a
      // scan pruned to one wide string column does not under-report bytes
      // and wrongly qualify for broadcast (r18 fix: the previous ratio
      // counted columns, weighing a text column the same as an int)
      def width(fs: Array[StructField]): Long =
        math.max(1L, fs.map(_.dataType.defaultSize.toLong).sum)
      val ratio = math.min(1.0,
        width(readSchema().fields).toDouble / width(layout.storedSchema.fields))
      OptionalLong.of(math.max(1L, (total * ratio).toLong))
    }
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}
