package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse catalog under the DRIVER GATE (reference: plugin/trino-lakehouse
  * — one catalog dispatching Hive/Iceberg/Delta/Hudi tables by type). The
  * fixture warehouse holds the SAME logical schema spread across THREE
  * different table formats — nation as a Delta table, supplier as an
  * Iceberg table, region as a Hudi table — each written by this engine's
  * own writer for that format; the query three-way-joins across formats
  * through [[graft.catalog.LakehouseCatalog]]'s layout detection and must
  * hash-match a DuckDB oracle over the raw parquet. */
object LakehouseQueries {

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
  }

  /** Build (idempotently) the three-format warehouse. */
  private[graft] def buildWarehouse(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_lakehouse_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new File(root, "_built")
    if (marker.isFile) return root.getAbsolutePath
    deleteTree(root)
    root.mkdirs()

    graft.catalog.DeltaWrite.write(
      table(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("n_nationkey"),
          $"n_regionkey".cast("long").as("n_regionkey"), $"n_name"),
      new File(root, "nation").getAbsolutePath)
    graft.catalog.IcebergWrite.write(
      table(s, dir, "supplier")
        .select($"s_suppkey".cast("long").as("s_suppkey"),
          $"s_nationkey".cast("long").as("s_nationkey"), $"s_name"),
      new File(root, "supplier").getAbsolutePath)
    graft.catalog.HudiWrite.write(
      table(s, dir, "region")
        .select($"r_regionkey".cast("long").as("r_regionkey"), $"r_name"),
      new File(root, "region").getAbsolutePath)

    java.nio.file.Files.write(marker.toPath, Array.empty[Byte])
    root.getAbsolutePath
  }

  /** Cross-format join: Delta ⋈ Iceberg ⋈ Hudi under one catalog. */
  def q_fed_lakehouse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wh = buildWarehouse(s, dir)
    val L = graft.catalog.LakehouseCatalog
    // the catalog resolves each table's format from its layout
    assert(L.detect(s"$wh/nation") == L.Delta)
    assert(L.detect(s"$wh/supplier") == L.Iceberg)
    assert(L.detect(s"$wh/region") == L.Hudi)
    val nation = L.readTable(s, wh, "nation")
    val supplier = L.readTable(s, wh, "supplier")
    val region = L.readTable(s, wh, "region")
    supplier
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("suppliers"),
        sum($"s_suppkey").cast("long").as("key_sum"))
      .orderBy($"r_name")
  }
  val qFedLakehouseSql: String =
    """SELECT r_name, count(*) AS suppliers, CAST(sum(s_suppkey) AS BIGINT) AS key_sum
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q_fed_lakehouse" -> q_fed_lakehouse _)
  val oracles: Map[String, String] = Map(
    "q_fed_lakehouse" -> qFedLakehouseSql)
}
