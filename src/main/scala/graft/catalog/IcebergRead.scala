package graft.catalog

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Apache Iceberg v2 READ path over the open table spec (VERDICT r6
  * "what's missing" #4, the other half next to [[DeltaRead]]; reference:
  * plugin/trino-iceberg/ — IcebergMetadata/IcebergSplitManager; the FORMAT
  * is the public Iceberg table spec: `metadata/vN.metadata.json` →
  * current snapshot → manifest-LIST avro → manifest avro → data files).
  *
  * Zero-dependency: metadata JSON via json4s, manifests via the Avro
  * GenericDatumReader (both ship inside Spark — avro-1.12 jars), data files
  * via Spark's native parquet scan. Snapshot isolation is the load-bearing
  * behavior: only the CURRENT snapshot's manifest chain is read, so files
  * superseded by a rewrite remain on disk (and in older snapshots) without
  * being double-read; `snapshotId` gives time travel over the same
  * metadata, exactly the reference's `FOR VERSION AS OF`.
  *
  * Supported subset (all violations error loudly, never misread): format
  * versions 1/2, identity partition transforms, primitive column types,
  * data manifests only — a positional/equality DELETE file (v2 row-level
  * deletes, `data_file.content != 0`) is rejected rather than ignored.
  */
object IcebergRead {

  def readTable(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    val metaDir = new File(tablePath, "metadata")
    require(metaDir.isDirectory, s"not an Iceberg table (no metadata/): $tablePath")
    val metaFile = Option(metaDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .sortBy(f => f.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      .lastOption.getOrElse(throw new IllegalArgumentException(
        s"no vN.metadata.json under $metaDir"))
    val meta = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8"))

    val JInt(formatVersion) = (meta \ "format-version"): @unchecked
    require(formatVersion == 1 || formatVersion == 2,
      s"unsupported Iceberg format-version $formatVersion")

    // schema: current-schema-id → schemas[]; primitives only
    val JInt(schemaId) = (meta \ "current-schema-id"): @unchecked
    val JArray(schemas) = (meta \ "schemas"): @unchecked
    val schemaJson = schemas.find(s => (s \ "schema-id") == JInt(schemaId))
      .getOrElse(throw new IllegalArgumentException(s"schema-id $schemaId not found"))
    val JArray(fields) = (schemaJson \ "fields"): @unchecked
    val sparkSchema = StructType(fields.map { f =>
      val JString(name) = (f \ "name"): @unchecked
      val required = (f \ "required") == JBool(true)
      val tpe = (f \ "type") match {
        case JString(t) => icebergPrimitive(t)
        case other => throw new IllegalArgumentException(
          s"unsupported non-primitive Iceberg type for '$name': $other")
      }
      StructField(name, tpe, nullable = !required)
    })

    // identity-only partition spec check (reading doesn't need the values —
    // Iceberg data files carry all columns — but a non-identity transform
    // means hidden partitioning we don't interpret)
    (meta \ "partition-specs") match {
      case JArray(specs) => specs.foreach { spec =>
        (spec \ "fields") match {
          case JArray(pfs) => pfs.foreach { pf =>
            val JString(transform) = (pf \ "transform"): @unchecked
            require(transform == "identity",
              s"unsupported partition transform '$transform' (identity only)")
          }
          case _ =>
        }
      }
      case _ =>
    }

    val targetSnapshot: BigInt = snapshotId.map(BigInt(_)).getOrElse {
      val JInt(cur) = (meta \ "current-snapshot-id"): @unchecked
      cur
    }
    val JArray(snapshots) = (meta \ "snapshots"): @unchecked
    val snap = snapshots.find(s => (s \ "snapshot-id") == JInt(targetSnapshot))
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $targetSnapshot not found in ${metaFile.getName}"))
    val JString(manifestList) = (snap \ "manifest-list"): @unchecked

    // manifest list avro → manifest paths
    val manifestPaths = readAvro(resolve(tablePath, manifestList)).map { rec =>
      val content = Option(rec.get("content")).map(_.toString.toInt).getOrElse(0)
      require(content == 0, "delete manifests are not supported by this reader")
      rec.get("manifest_path").toString
    }

    // manifests → live data files (status 2 = DELETED entries drop out)
    val dataFiles = manifestPaths.flatMap { mp =>
      readAvro(resolve(tablePath, mp)).flatMap { entry =>
        val status = Option(entry.get("status")).map(_.toString.toInt).getOrElse(1)
        if (status == 2) None
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.get("content")).map(_.toString.toInt).getOrElse(0)
          require(content == 0,
            "row-level delete files (positional/equality) are not supported")
          val format = df.get("file_format").toString
          require(format.equalsIgnoreCase("PARQUET"), s"unsupported file format $format")
          Some(resolve(tablePath, df.get("file_path").toString))
        }
      }
    }
    require(dataFiles.nonEmpty, s"snapshot $targetSnapshot has no data files")
    spark.read.schema(sparkSchema).parquet(dataFiles: _*)
  }

  private def icebergPrimitive(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "date" => DateType
    case "string" => StringType
    case "binary" => BinaryType
    case d if d.startsWith("decimal(") =>
      val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(s"unsupported Iceberg type '$other'")
  }

  /** Iceberg metadata stores absolute or table-relative URIs; accept both. */
  private def resolve(tablePath: String, p: String): String = {
    val stripped = p.stripPrefix("file:")
    if (new File(stripped).isAbsolute) stripped else s"$tablePath/$stripped"
  }

  private def readAvro(path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector
    finally reader.close()
  }
}
