package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** HTTP connector (reference: plugin/trino-example-http — ExampleClient
  * fetches a metadata JSON `{schema: [{name, columns: [{name, type}],
  * sources: [uri...]}]}`, ExampleSplitManager makes ONE SPLIT PER SOURCE
  * URI, ExampleRecordCursor comma-splits each line). Spark-first: the
  * source list becomes an RDD with one partition per URI, so each split's
  * HTTP fetch and CSV decode run ON AN EXECUTOR — at 1000 sources that is
  * 1000 parallel fetches, no driver bottleneck; only the metadata document
  * (bounded: table names and column defs) is fetched driver-side.
  *
  * Subset like the reference example: comma-split lines without quoting or
  * escapes; types varchar | bigint | integer | double | boolean | date.
  * Malformed cells fail loudly with the line and URI. */
object HttpCatalog {

  final case class Col(name: String, tpe: String)
  final case class TableDef(name: String, columns: Seq[Col], sources: Seq[String])

  // ONE shared client per JVM (a per-fetch client leaks its executor
  // thread across a long session); idle cached-pool threads are reclaimed
  private lazy val http = HttpClient.newBuilder()
    .executor(java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-http-catalog"); t.setDaemon(true); t
    }))
    .build()

  private def get(uri: String): String = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(uri)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"http catalog: GET $uri returned ${resp.statusCode()}")
    resp.body()
  }

  /** Fetch + parse the metadata document: schema name → table defs. */
  def metadata(metadataUri: String): Map[String, Seq[TableDef]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val JObject(schemas) = JsonMethods.parse(get(metadataUri)): @unchecked
    schemas.map { case (schemaName, JArray(tables)) =>
      schemaName -> tables.map { t =>
        val JString(name) = (t \ "name"): @unchecked
        val JArray(cols) = (t \ "columns"): @unchecked
        val JArray(sources) = (t \ "sources"): @unchecked
        TableDef(name,
          cols.map { c =>
            val JString(n) = (c \ "name"): @unchecked
            val JString(tp) = (c \ "type"): @unchecked
            Col(n, tp)
          },
          sources.map { case JString(u) => u
            case other => throw new IllegalArgumentException(s"bad source $other") })
      }
    }.toMap
  }

  def listTables(metadataUri: String, schema: String): Seq[String] =
    metadata(metadataUri).getOrElse(schema,
      throw new IllegalArgumentException(s"http catalog: no schema '$schema'"))
      .map(_.name).sorted

  private def sparkType(t: String): DataType = t match {
    case "varchar" => StringType
    case "bigint" => LongType
    case "integer" => IntegerType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "date" => DateType
    case other => throw new IllegalArgumentException(
      s"http catalog: unsupported column type '$other'")
  }

  def readTable(spark: SparkSession, metadataUri: String, schema: String,
      table: String): DataFrame = {
    val defs = metadata(metadataUri).getOrElse(schema,
      throw new IllegalArgumentException(s"http catalog: no schema '$schema'"))
    val t = defs.find(_.name == table).getOrElse(
      throw new IllegalArgumentException(
        s"http catalog: no table '$schema.$table' " +
          s"(have ${defs.map(_.name).mkString(",")})"))
    val structure = StructType(t.columns.map(c =>
      StructField(c.name, sparkType(c.tpe), nullable = true)))
    val types = t.columns.map(_.tpe).toArray
    // one split per source URI, reference semantics; each fetched on the
    // executor that owns the partition
    val rows = spark.sparkContext
      .parallelize(t.sources, math.max(1, t.sources.length))
      .flatMap { uri =>
        get(uri).linesIterator.filter(_.nonEmpty).map { line =>
          val cells = line.split(",", -1)
          require(cells.length == types.length,
            s"http catalog: ${cells.length} fields (expected ${types.length}) " +
              s"in line '$line' of $uri")
          Row.fromSeq(cells.iterator.zipWithIndex.map { case (cell, i) =>
            if (cell.isEmpty) null
            else types(i) match {
              case "varchar" => cell
              case "bigint" => cell.toLong
              case "integer" => cell.toInt
              case "double" => cell.toDouble
              case "boolean" => cell.toBoolean
              case "date" => java.sql.Date.valueOf(cell)
            }
          }.toSeq)
        }
      }
    spark.createDataFrame(rows, structure)
  }
}
