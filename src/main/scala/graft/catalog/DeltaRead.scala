package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta Lake READ path over the open delta-log protocol (VERDICT r6
  * "what's missing" #4; reference: plugin/trino-delta-lake/ — notably
  * transactionlog/TransactionLogAccess.java and DeltaLakeSplitManager; the
  * PROTOCOL itself is the public Delta Lake spec: `_delta_log/` holds
  * ordered versions `%020d.json`, each a line-JSON sequence of
  * `metaData` / `add` / `remove` actions; the live table = last-writer-wins
  * replay of adds minus removes).
  *
  * Zero-dependency by design: the log is parsed with json4s (ships inside
  * Spark), the schema is Delta's OWN Spark-schema JSON (`DataType.fromJson`
  * reads `schemaString` directly), and the data files are plain parquet read
  * by Spark's native scan — so pushdown/pruning over the data files is stock
  * Catalyst. Partition columns come from each add-action's
  * `partitionValues`, attached as typed literals per file group — the same
  * partition-pruning shape the reference's split manager produces.
  *
  * Scale: log replay is driver-side METADATA work, bounded by log size
  * (every Delta reader does this; the reference caches it per-snapshot);
  * data reading is fully distributed. Supported subset: a complete JSON
  * commit sequence from version 0 (no checkpoints of any flavor, no cleaned
  * logs), minReaderVersion 1 (no deletion vectors, no column mapping) —
  * documented gaps, each erroring loudly rather than misreading.
  */
object DeltaRead {

  private final case class Add(path: String, partitionValues: Map[String, String])

  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val logDir = new File(tablePath, "_delta_log")
    require(logDir.isDirectory, s"not a Delta table (no _delta_log): $tablePath")
    val logFiles = Option(logDir.listFiles()).getOrElse(Array.empty)
    val versions = logFiles
      .filter(_.getName.matches("\\d{20}\\.json")).sortBy(_.getName)
    require(versions.nonEmpty, s"empty Delta log: $tablePath")
    // Checkpoints compact the JSON prefix away; replaying only the surviving
    // JSON suffix would silently return partial data. Refuse on ANY
    // checkpoint artifact — classic single-part (N.checkpoint.parquet),
    // multi-part (N.checkpoint.i.of.parquet), v2 (N.checkpoint.<uuid>.json),
    // or a _last_checkpoint pointer — and require the JSON sequence to be
    // complete from version 0.
    require(!logFiles.exists(f => f.getName.contains(".checkpoint.") ||
        f.getName == "_last_checkpoint"),
      "Delta checkpoints are not supported by this reader")
    require(versions.head.getName == "0" * 20 + ".json",
      s"Delta log does not start at version 0 (earliest: ${versions.head.getName}); " +
        "a log-cleaned table cannot be replayed by this reader")
    versions.map(_.getName.stripSuffix(".json").toLong)
      .zipWithIndex.foreach { case (v, i) =>
        require(v == i, s"Delta log has a gap before version $v")
      }

    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Seq.empty
    val active = scala.collection.mutable.LinkedHashMap[String, Add]()
    for (vf <- versions;
         line <- Files.readAllLines(vf.toPath, StandardCharsets.UTF_8).asScala
         if line.trim.nonEmpty) {
      val json = JsonMethods.parse(line)
      // Protocol actions gate reader capabilities: minReaderVersion > 1 or any
      // readerFeature outside what this reader implements (none beyond the
      // base protocol) means the data may require interpretation we don't do
      // (deletion vectors, column mapping, v2 checkpoints, type widening…).
      json \ "protocol" match {
        case JObject(_) =>
          (json \ "protocol" \ "minReaderVersion") match {
            case JInt(v) if v > 1 =>
              (json \ "protocol" \ "readerFeatures") match {
                case JArray(fs) =>
                  val names = fs.collect { case JString(f) => f }
                  throw new IllegalArgumentException(
                    s"Delta minReaderVersion $v with readerFeatures " +
                      s"${names.mkString("[", ", ", "]")} is not supported by this reader")
                case _ => throw new IllegalArgumentException(
                  s"Delta minReaderVersion $v is not supported by this reader")
              }
            case _ =>
          }
        case _ =>
      }
      json \ "metaData" match {
        case JObject(_) =>
          (json \ "metaData" \ "schemaString") match {
            case JString(s) => schemaJson = Some(s)
            case _ =>
          }
          (json \ "metaData" \ "partitionColumns") match {
            case JArray(cols) => partCols = cols.collect { case JString(c) => c }
            case _ =>
          }
          // column mapping renames physical parquet columns — reading by
          // logical name would silently misread, so refuse loudly
          (json \ "metaData" \ "configuration" \ "delta.columnMapping.mode") match {
            case JString(mode) if mode != "none" =>
              throw new IllegalArgumentException(
                s"Delta column mapping mode '$mode' is not supported by this reader")
            case _ =>
          }
        case _ =>
      }
      json \ "add" match {
        case JObject(_) =>
          val JString(path) = (json \ "add" \ "path"): @unchecked
          val pv = (json \ "add" \ "partitionValues") match {
            case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
            case _ => Map.empty[String, String]
          }
          val decoded = java.net.URLDecoder.decode(path, "UTF-8")
          active(decoded) = Add(decoded, pv)
        case _ =>
      }
      json \ "remove" match {
        case JObject(_) =>
          val JString(path) = (json \ "remove" \ "path"): @unchecked
          active.remove(java.net.URLDecoder.decode(path, "UTF-8"))
        case _ =>
      }
      json \ "add" \ "deletionVector" match {
        case JObject(_) => throw new IllegalArgumentException(
          "Delta deletion vectors are not supported by this reader")
        case _ =>
      }
    }
    val schema = DataType.fromJson(schemaJson.getOrElse(
      throw new IllegalArgumentException("Delta log has no metaData action")))
      .asInstanceOf[StructType]
    val dataSchema = StructType(schema.fields.filterNot(f => partCols.contains(f.name)))

    if (active.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    // one native parquet scan per partition-value group, typed literals for
    // the partition columns, union preserving the declared column order
    val groups = active.values.toSeq.groupBy(_.partitionValues)
    groups.map { case (pv, adds) =>
      val base = spark.read.schema(dataSchema)
        .parquet(adds.map(a => s"$tablePath/${a.path}"): _*)
      partCols.foldLeft(base) { (df, pc) =>
        val tpe = schema(pc).dataType
        df.withColumn(pc, lit(pv.getOrElse(pc, null)).cast(tpe))
      }.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    }.reduce(_ unionByName _)
  }
}
