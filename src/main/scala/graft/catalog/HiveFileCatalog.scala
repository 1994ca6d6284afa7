package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Hive connector over the reference's FILE metastore (reference:
  * plugin/trino-hive/.../metastore/file/FileHiveMetastore.java — databases
  * are directories under the catalog root, each database/table carries a
  * `.trinoSchema` JSON (TableMetadata.java: tableType, dataColumns,
  * partitionColumns, storageFormat, externalLocation), and each partition
  * directory `k=v[/k2=v2]` carries its own `.trinoSchema`).
  *
  * Reading: hive type names map to Spark types, the storage format picks
  * the Spark reader (PARQUET / ORC / CSV / JSON / TEXTFILE; avro tables
  * are served by the dedicated [[AvroFileCatalog]]), partition values
  * come from
  * the directory names and are PRUNED at plan time against an optional
  * predicate over the partition-value map — only surviving directories'
  * data files enter the scan (the metastore listing is driver-side
  * metadata, bounded by partition count, same as every Hive planner).
  *
  * Supported subset (documented): MANAGED/EXTERNAL tables, primitive
  * column types, storage formats above; no bucketing, no views, no
  * column statistics. */
object HiveFileCatalog {

  /** Partition directories pruned by the last read (observability). */
  val lastPruned = new ThreadLocal[Integer] { override def initialValue(): Integer = 0 }

  final case class HiveColumn(name: String, hiveType: String)
  final case class HiveTable(
      tableType: String,
      dataColumns: Seq[HiveColumn],
      partitionColumns: Seq[HiveColumn],
      storageFormat: String,
      externalLocation: Option[String],
      location: File)

  def hiveTypeToSpark(t: String): DataType = t.toLowerCase match {
    case "tinyint" => ByteType
    case "smallint" => ShortType
    case "int" | "integer" => IntegerType
    case "bigint" => LongType
    case "float" | "real" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "string" => StringType
    case "binary" => BinaryType
    case "date" => DateType
    case "timestamp" => TimestampType
    case s if s.startsWith("varchar") || s.startsWith("char") => StringType
    case s if s.startsWith("decimal") =>
      val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")").split(",")
      DecimalType(p.trim.toInt, sc.trim.toInt)
    case other => throw new IllegalArgumentException(
      s"hive type '$other' is not supported by this connector")
  }

  def sparkTypeToHive(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case _: TimestampType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"spark type $other has no hive mapping in this connector")
  }

  def loadTable(catalogDir: String, db: String, table: String): HiveTable = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val dir = new File(new File(catalogDir, db), table)
    val schemaFile = new File(dir, ".trinoSchema")
    require(schemaFile.isFile,
      s"no .trinoSchema for $db.$table under $catalogDir (not a file-metastore table)")
    val j = JsonMethods.parse(new String(
      Files.readAllBytes(schemaFile.toPath), StandardCharsets.UTF_8))
    def cols(field: String): Seq[HiveColumn] = (j \ field) match {
      case JArray(cs) => cs.map { c =>
        val JString(n) = (c \ "name"): @unchecked
        val JString(t) = (c \ "type"): @unchecked
        HiveColumn(n, t)
      }
      case _ => Seq.empty
    }
    val JString(tableType) = (j \ "tableType"): @unchecked
    require(tableType == "MANAGED_TABLE" || tableType == "EXTERNAL_TABLE",
      s"hive table type '$tableType' is not supported by this connector")
    val fmt = (j \ "storageFormat") match {
      case JString(f) => f
      case _ => throw new IllegalArgumentException(
        s"$db.$table: no storageFormat in .trinoSchema")
    }
    val ext = (j \ "externalLocation") match {
      case JString(l) => Some(l)
      case _ => None
    }
    HiveTable(tableType, cols("dataColumns"), cols("partitionColumns"), fmt, ext,
      ext.map(l => new File(l.stripPrefix("file:"))).getOrElse(dir))
  }

  def listDatabases(catalogDir: String): Seq[String] =
    Option(new File(catalogDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && new File(d, ".trinoSchema").isFile)
      .map(_.getName).sorted.toSeq

  def listTables(catalogDir: String, db: String): Seq[String] =
    Option(new File(catalogDir, db).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && new File(d, ".trinoSchema").isFile)
      .map(_.getName).sorted.toSeq

  /** Read a table; `partitionFilter` prunes partition DIRECTORIES at plan
    * time (values as named in the hive paths). */
  def readTable(spark: SparkSession, catalogDir: String, db: String,
      table: String,
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame =
    readLoaded(spark, loadTable(catalogDir, db, table), partitionFilter)

  /** Same read path over an already-resolved [[HiveTable]] — the thrift
    * metastore client ([[ThriftHiveMetastore]]) resolves metadata over the
    * wire and feeds it here, so both metastore protocols share one scan. */
  def readLoaded(spark: SparkSession, t: HiveTable,
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataSchema = StructType(t.dataColumns.map(c =>
      StructField(c.name, hiveTypeToSpark(c.hiveType), nullable = true)))

    def dataFilesUnder(dir: File): Seq[File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))

    def readFiles(files: Seq[File]): DataFrame = {
      val paths = files.map(_.getAbsolutePath)
      if (paths.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
      t.storageFormat.toUpperCase match {
        case "PARQUET" => spark.read.schema(dataSchema).parquet(paths: _*)
        case "ORC" => spark.read.schema(dataSchema).orc(paths: _*)
        case "CSV" | "TEXTFILE" =>
          // hive text default delimiters: TEXTFILE ctrl-A, CSV comma
          val sep = if (t.storageFormat.equalsIgnoreCase("CSV")) "," else "\u0001"
          spark.read.schema(dataSchema)
            .option("sep", sep).option("header", "false").csv(paths: _*)
        case "JSON" => spark.read.schema(dataSchema).json(paths: _*)
        case other => throw new IllegalArgumentException(
          s"hive storage format '$other' is not supported by this connector")
      }
    }

    if (t.partitionColumns.isEmpty) {
      lastPruned.set(0)
      readFiles(dataFilesUnder(t.location))
    } else {
      // partition dirs nest k=v[/k2=v2] under the table location, in the
      // declared partition-column order
      def walk(dir: File, depth: Int, acc: Map[String, String]):
          Seq[(Map[String, String], File)] =
        if (depth == t.partitionColumns.length) Seq((acc, dir))
        else {
          val key = t.partitionColumns(depth).name
          Option(dir.listFiles()).getOrElse(Array.empty).toSeq
            .filter(d => d.isDirectory && d.getName.startsWith(s"$key="))
            .flatMap { d =>
              val v = PathCodec.unescape(d.getName.stripPrefix(s"$key="))
              walk(d, depth + 1, acc + (key -> v))
            }
        }
      val all = walk(t.location, 0, Map.empty)
      val (kept, pruned) = all.partition { case (pv, _) => partitionFilter(pv) }
      lastPruned.set(pruned.length)
      val parts = kept.map { case (pv, dir) =>
        val df = readFiles(dataFilesUnder(dir))
        // partition columns come from the path, typed per the metastore
        t.partitionColumns.foldLeft(df) { (acc, pc) =>
          acc.withColumn(pc.name,
            lit(pv(pc.name)).cast(hiveTypeToSpark(pc.hiveType)))
        }
      }
      val fullSchema = StructType(dataSchema.fields ++ t.partitionColumns.map(c =>
        StructField(c.name, hiveTypeToSpark(c.hiveType), nullable = true)))
      if (parts.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fullSchema)
      else parts.reduce(_ unionByName _)
    }
  }

  // ---- producer half (fixtures + CTAS-style writes) ----

  /** Write a table in the file-metastore layout: data files (optionally
    * hive-partitioned) plus the `.trinoSchema` JSON the reference's
    * FileHiveMetastore stores. */
  def writeTable(df: DataFrame, catalogDir: String, db: String, table: String,
      format: String = "PARQUET", partitionBy: Seq[String] = Seq.empty): Unit = {
    val dbDir = new File(catalogDir, db)
    if (!new File(dbDir, ".trinoSchema").isFile) {
      dbDir.mkdirs()
      Files.write(Paths.get(dbDir.getAbsolutePath, ".trinoSchema"),
        s"""{"databaseName":${jq(db)},"parameters":{}}"""
          .getBytes(StandardCharsets.UTF_8))
    }
    val dir = new File(dbDir, table)
    dir.mkdirs()
    val dataCols = df.schema.fields.filterNot(f => partitionBy.contains(f.name))
    val partCols = partitionBy.map(c => df.schema(c))
    val writer = df.write.mode("overwrite")
    val fmtWriter = format.toUpperCase match {
      case "PARQUET" => (p: String) =>
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(p)
      case "ORC" => (p: String) =>
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).orc(p)
      case "CSV" => (p: String) =>
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
          .option("header", "false").csv(p)
      case "JSON" => (p: String) =>
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).json(p)
      case other => throw new IllegalArgumentException(
        s"hive write format '$other' is not supported by this connector")
    }
    fmtWriter(dir.getAbsolutePath)
    def colJson(f: StructField): String =
      s"""{"name":${jq(f.name)},"type":${jq(sparkTypeToHive(f.dataType))}}"""
    val meta =
      s"""{"tableType":"MANAGED_TABLE",
           "dataColumns":[${dataCols.map(colJson).mkString(",")}],
           "partitionColumns":[${partCols.map(colJson).mkString(",")}],
           "parameters":{},
           "storageFormat":${jq(format.toUpperCase)},
           "serdeParameters":{}}"""
    Files.write(Paths.get(dir.getAbsolutePath, ".trinoSchema"),
      meta.getBytes(StandardCharsets.UTF_8))
  }

  /** Declare a table's METADATA only (the HMS create_table semantic: data
    * files are staged by the caller; registration makes them visible).
    * `externalLocation` marks an EXTERNAL_TABLE over staged files. */
  def declareTable(catalogDir: String, db: String, table: String,
      tableType: String, dataColumns: Seq[HiveColumn],
      partitionColumns: Seq[HiveColumn], format: String,
      externalLocation: Option[String]): Unit = {
    val dbDir = new File(catalogDir, db)
    if (!new File(dbDir, ".trinoSchema").isFile) {
      dbDir.mkdirs()
      Files.write(Paths.get(dbDir.getAbsolutePath, ".trinoSchema"),
        s"""{"databaseName":${jq(db)},"parameters":{}}"""
          .getBytes(StandardCharsets.UTF_8))
    }
    val dir = new File(dbDir, table)
    require(!new File(dir, ".trinoSchema").isFile,
      s"AlreadyExistsException: table $db.$table already exists")
    dir.mkdirs()
    def colJson(c: HiveColumn): String =
      s"""{"name":${jq(c.name)},"type":${jq(c.hiveType)}}"""
    val ext = externalLocation
      .map(l => s""""externalLocation":${jq(l)},""").getOrElse("")
    val meta =
      s"""{"tableType":${jq(tableType)},
           "dataColumns":[${dataColumns.map(colJson).mkString(",")}],
           "partitionColumns":[${partitionColumns.map(colJson).mkString(",")}],
           "parameters":{},$ext
           "storageFormat":${jq(format.toUpperCase)},
           "serdeParameters":{}}"""
    Files.write(Paths.get(dir.getAbsolutePath, ".trinoSchema"),
      meta.getBytes(StandardCharsets.UTF_8))
    ()
  }

  private def jq(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
