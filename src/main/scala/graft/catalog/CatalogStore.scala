package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Dynamic catalog management behind `CREATE/DROP CATALOG` (reference:
  * SqlBase.g4:58 `CREATE CATALOG … USING connectorName (WITH properties)?`,
  * executed by core/trino-main io/trino/execution/CreateCatalogTask over a
  * `CatalogStore` that persists each catalog's properties so a restarted
  * coordinator reloads them).
  *
  * Spark-first: a catalog here IS a Spark `CatalogPlugin` registration —
  * `spark.sql.catalog.<name>` plus one conf per property. Everything
  * downstream (multi-part name resolution, SHOW CATALOGS, DSv2 scans with
  * their pushdowns) is stock Spark behavior; this module only maps the
  * reference's connector names onto plugin classes, validates properties,
  * and persists the registration like the reference's file-based
  * CatalogStore (one properties file per catalog). */
object CatalogStore {

  /** connector name → (CatalogPlugin class name, required property keys).
    * The JDBC entry is Spark's own JDBCTableCatalog: its url property makes
    * any JDBC engine a catalog, with Spark's filter/limit/aggregate
    * pushdown riding the standard options. */
  val connectors: Map[String, (String, Seq[String])] = Map(
    "csv" -> (classOf[CsvFileCatalog].getName, Seq("path")),
    "avro" -> (classOf[AvroFileCatalog].getName, Seq("path")),
    "memory" -> (classOf[MemoryCatalog].getName, Nil),
    "blackhole" -> (classOf[BlackHoleCatalog].getName, Nil),
    "jmx" -> (classOf[JmxCatalog].getName, Nil),
    "tpch" -> (classOf[TpchGenCatalog].getName, Nil),
    "faker" -> (classOf[FakerCatalog].getName, Nil),
    "jdbc" -> ("org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
      Seq("url")),
    // wire connectors as catalogs: connection properties → multi-part
    // names over the wire read paths (the reference's principal
    // CREATE CATALOG use case)
    "postgresql" -> (classOf[PgWireCatalog].getName, Seq("host", "port")),
    "clickhouse" -> (classOf[ChWireCatalog].getName, Seq("host", "port")),
    "elasticsearch" -> (classOf[EsWireCatalog].getName, Seq("host", "port")))

  /** Store directory (one .properties file per catalog). Overridable for
    * tests/deployments via -Dgraft.catalog.store; the DEFAULT is a stable
    * per-user path (round-12 advice: a PID-suffixed tmp dir meant load()
    * could never see a previous process's catalogs, defeating the
    * restart-reload contract — and catalog properties may hold credentials,
    * so the files live under the user's home with owner-only permissions,
    * mirroring the reference's etc/catalog directory). */
  private def storeDir: Path = {
    val p = sys.props.get("graft.catalog.store").map(Paths.get(_)).getOrElse(
      Paths.get(System.getProperty("user.home"), ".graft", "catalog"))
    // create with owner-only perms ATOMICALLY (round-13 advice: a
    // create-then-chmod sequence leaves a world-readable window — persistent
    // if the process dies between the two calls)
    try {
      import java.nio.file.attribute.PosixFilePermissions
      Files.createDirectories(p, PosixFilePermissions.asFileAttribute(
        PosixFilePermissions.fromString("rwx------")))
    } catch {
      case _: UnsupportedOperationException => Files.createDirectories(p)
    }
    restrictToOwner(p) // tighten pre-existing dirs created by older builds
    p
  }

  /** Best-effort POSIX rwx------ / rw------- (no-op on non-POSIX stores). */
  private def restrictToOwner(p: Path): Unit =
    try {
      import java.nio.file.attribute.PosixFilePermissions
      Files.setPosixFilePermissions(p, PosixFilePermissions.fromString(
        if (Files.isDirectory(p)) "rwx------" else "rw-------"))
    } catch { case _: UnsupportedOperationException => }

  private def fileOf(name: String): Path = storeDir.resolve(s"$name.properties")

  /** name → connector for catalogs created through this store (what
    * system.metadata.catalogs reports as connector_name). */
  private val live = scala.collection.concurrent.TrieMap[String, String]()

  def connectorOf(name: String): Option[String] = live.get(name)

  def exists(spark: SparkSession, name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name").isDefined

  /** Register + persist. Fails with the reference's shapes: unknown
    * connector → "No factory for connector", missing required property →
    * named in the message. */
  def create(spark: SparkSession, name: String, connector: String,
      props: Seq[(String, String)]): Unit = {
    val (cls, required) = connectors.getOrElse(connector.toLowerCase,
      throw new IllegalArgumentException(
        s"No factory for connector '$connector'. Available: " +
          connectors.keys.toSeq.sorted.mkString(", ")))
    val given = props.map(_._1.toLowerCase).toSet
    required.filterNot(given).foreach(k =>
      throw new IllegalArgumentException(
        s"Catalog '$name' (connector '$connector') requires property '$k'"))
    spark.conf.set(s"spark.sql.catalog.$name", cls)
    props.foreach { case (k, v) => spark.conf.set(s"spark.sql.catalog.$name.$k", v) }
    val p = new Properties()
    p.setProperty("connector.name", connector.toLowerCase)
    props.foreach { case (k, v) => p.setProperty(k, v) }
    // create the (possibly credential-bearing) file with owner-only perms
    // BEFORE any content is written — never a world-readable window
    val f = fileOf(name)
    try {
      import java.nio.file.attribute.PosixFilePermissions
      if (!Files.exists(f))
        Files.createFile(f, PosixFilePermissions.asFileAttribute(
          PosixFilePermissions.fromString("rw-------")))
      else restrictToOwner(f)
    } catch { case _: UnsupportedOperationException => }
    val out = Files.newOutputStream(f)
    try p.store(out, null) finally out.close()
    restrictToOwner(f) // tighten files pre-existing from older builds
    live(name) = connector.toLowerCase
  }

  /** Unregister + remove the persisted file. */
  def drop(spark: SparkSession, name: String): Unit = {
    spark.conf.getAll.keys
      .filter(k => k == s"spark.sql.catalog.$name" ||
        k.startsWith(s"spark.sql.catalog.$name."))
      .foreach(spark.conf.unset)
    Files.deleteIfExists(fileOf(name))
    live.remove(name)
    ()
  }

  /** Reload every persisted catalog into `spark` (what a restarted
    * coordinator does with the reference's CatalogStore). Returns the
    * loaded names. */
  def load(spark: SparkSession): Seq[String] = {
    val files = Files.list(storeDir).iterator().asScala
      .filter(_.toString.endsWith(".properties")).toSeq
    files.map { f =>
      val p = new Properties()
      val in = Files.newInputStream(f)
      try p.load(in) finally in.close()
      val name = f.getFileName.toString.stripSuffix(".properties")
      val connector = p.getProperty("connector.name")
      val props = p.stringPropertyNames().asScala.toSeq
        .filterNot(_ == "connector.name").map(k => k -> p.getProperty(k))
      create(spark, name, connector, props)
      name
    }.sorted
  }
}
