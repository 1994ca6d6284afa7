package graft.catalog

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog over all lake formats (reference: plugin/trino-lakehouse —
  * LakehouseMetadata dispatches each table to the Hive/Iceberg/Delta/Hudi
  * connector by the table's type, TableType.java:18). The reference reads
  * the type from metastore table properties; this file-rooted analogue
  * detects it from the table layout itself, which is what the properties
  * record:
  *
  *   - `_delta_log/`                  → DELTA    ([[DeltaRead]])
  *   - `metadata/v*.metadata.json`    → ICEBERG  ([[IcebergRead]])
  *   - `.hoodie/`                     → HUDI     ([[HudiRead]], snapshot)
  *   - anything else with parquet     → HIVE     (plain/dir-partitioned)
  *
  * A warehouse directory is a schema: each child directory is a table,
  * whatever its format — the point of the reference plugin (one catalog
  * name, four table formats, format-specific features still available).
  * Reads resolve the LATEST snapshot per format; time travel stays on the
  * format-specific readers (Iceberg snapshotId / Hudi asOf instant), which
  * remain directly reachable. */
object LakehouseCatalog {

  sealed trait TableType
  case object Delta extends TableType
  case object Iceberg extends TableType
  case object Hudi extends TableType
  case object Hive extends TableType

  def detect(tablePath: String): TableType = {
    val root = new File(tablePath)
    require(root.isDirectory, s"lakehouse: no table directory at $tablePath")
    if (new File(root, "_delta_log").isDirectory) Delta
    else if (new File(root, "metadata").isDirectory &&
        Option(new File(root, "metadata").listFiles()).getOrElse(Array.empty)
          .exists(_.getName.matches("v\\d+\\.metadata\\.json"))) Iceberg
    else if (new File(root, ".hoodie").isDirectory) Hudi
    else Hive
  }

  /** Table names = child directories of the warehouse. */
  def tables(warehouseDir: String): Seq[String] =
    Option(new File(warehouseDir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq

  def readTable(spark: SparkSession, warehouseDir: String, table: String): DataFrame =
    read(spark, new File(warehouseDir, table).getAbsolutePath)

  /** Route a table path to its format's reader (latest snapshot). */
  def read(spark: SparkSession, tablePath: String): DataFrame = detect(tablePath) match {
    case Delta => DeltaRead.readTable(spark, tablePath)
    case Iceberg => IcebergRead.readTable(spark, tablePath)
    case Hudi => HudiRead.readTableSnapshot(spark, tablePath)
    case Hive => spark.read.parquet(tablePath)
  }
}
