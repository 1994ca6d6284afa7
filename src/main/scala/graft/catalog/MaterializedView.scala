package graft.catalog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized views (reference:
  * core/trino-spi/src/main/java/io/trino/spi/connector/ConnectorMaterializedViewDefinition.java,
  * execution/CreateMaterializedViewTask.java, RefreshMaterializedViewTask.java,
  * freshness in metadata/MaterializedViewDefinition — a stored SQL definition
  * plus a connector-backed storage table and a recorded freshness basis).
  *
  * Spark-first mapping: the storage table is a CowTable, so REFRESH publishes
  * the recomputed result as an atomic new snapshot — concurrent readers keep
  * the previous materialization (snapshot isolation), and past
  * materializations stay time-travelable. The definition is dialect SQL text
  * (runs through graft.sqlx.TrinoDialect, so reference-dialect definitions
  * work); CowTable-backed sources are registered as temp views for the
  * defining query, and their versions at (re)materialization time form the
  * freshness basis: the view is STALE exactly when a source table has
  * advanced past the recorded version — the reference's freshness contract.
  * Fixture/parquet sources are immutable and contribute no staleness.
  *
  * Layout:
  * {{{
  *   <root>/_mv.def        definition: sql ⊕ fixture dir ⊕ source roots/basis
  *   <root>/table/         CowTable materialization (versioned)
  * }}}
  */
final class MaterializedView private (
    val root: String, spark: SparkSession,
    defSql: String, dir: String, sources: Map[String, String]) {

  private def storage: CowTable = CowTable.open(spark, s"$root/table")

  /** Read the CURRENT materialization (no recompute). */
  def read(): DataFrame = storage.read()

  /** A past materialization (CowTable time travel). */
  def read(asOfVersion: Int): DataFrame = storage.read(Some(asOfVersion))

  def definitionSql: String = defSql

  private def currentBasis: Map[String, Int] =
    sources.map { case (name, sroot) => name -> CowTable.open(spark, sroot).currentVersion }

  private def recordedBasis: Map[String, Int] =
    MaterializedView.readDef(root)._4

  /** Stale ⟺ some source table advanced past the recorded basis version. */
  def isStale: Boolean = currentBasis.exists { case (n, v) => recordedBasis.get(n) != Some(v) }

  /** Recompute the definition and publish atomically as a new snapshot. */
  def refresh(): Unit = {
    val basis = currentBasis
    storage.replace(MaterializedView.compute(spark, defSql, dir, sources))
    MaterializedView.writeDef(root, defSql, dir, sources, basis)
  }
}

object MaterializedView {

  /** CREATE MATERIALIZED VIEW: run the definition, materialize, record basis. */
  def create(spark: SparkSession, root: String, defSql: String, dir: String,
      sources: Map[String, String] = Map.empty): MaterializedView = {
    val basis = sources.map { case (n, r) => n -> CowTable.open(spark, r).currentVersion }
    CowTable.create(spark, s"$root/table", compute(spark, defSql, dir, sources))
    writeDef(root, defSql, dir, sources, basis)
    new MaterializedView(root, spark, defSql, dir, sources)
  }

  def open(spark: SparkSession, root: String): MaterializedView = {
    val (sql, dir, sources, _) = readDef(root)
    new MaterializedView(root, spark, sql, dir, sources)
  }

  private def compute(spark: SparkSession, defSql: String, dir: String,
      sources: Map[String, String]): DataFrame = {
    sources.foreach { case (name, sroot) =>
      CowTable.open(spark, sroot).read().createOrReplaceTempView(name)
    }
    graft.sqlx.TrinoDialect.sql(spark, dir, defSql)
  }

  // definition file: 4 sections separated by a record separator — no JSON
  // parser needed, content-transparent for arbitrary SQL text
  private val Sep = "\u001e"

  private def writeDef(root: String, sql: String, dir: String,
      sources: Map[String, String], basis: Map[String, Int]): Unit = {
    val src = sources.map { case (n, r) => s"$n=$r" }.mkString("\n")
    val bas = basis.map { case (n, v) => s"$n=$v" }.mkString("\n")
    Files.createDirectories(Paths.get(root))
    Files.write(Paths.get(root, "_mv.def"),
      Seq(sql, dir, src, bas).mkString(Sep).getBytes("UTF-8"))
  }

  private def readDef(root: String): (String, String, Map[String, String], Map[String, Int]) = {
    val parts = new String(
      Files.readAllBytes(Paths.get(root, "_mv.def")), "UTF-8").split(Sep, -1)
    def kv(s: String): Map[String, String] =
      s.split("\n").filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap
    (parts(0), parts(1), kv(parts(2)), kv(parts(3)).map { case (k, v) => k -> v.toInt })
  }
}
