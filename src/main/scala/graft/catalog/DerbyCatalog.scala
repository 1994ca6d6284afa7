package graft.catalog

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedded-JDBC catalog: a second, non-parquet catalog federated into the engine.
  *
  * Plays the role of the reference's connector federation — its defining feature:
  * a JDBC connector family built on a shared base client
  * (reference: plugin/trino-base-jdbc/src/main/java/io/trino/plugin/jdbc/BaseJdbcClient.java),
  * with predicate pushdown decided at plan time
  * (reference: core/trino-main/src/main/java/io/trino/sql/planner/iterative/rule/PushPredicateIntoTableScan.java:78).
  *
  * Spark-first mapping: `spark.read.jdbc` is the connector SPI here — Catalyst's
  * v1 JDBC relation implements filter pushdown (`PushedFilters` on the scan),
  * column pruning (only referenced columns appear in the generated SELECT), and
  * split enumeration via `partitionColumn`/bounds (each partition becomes a
  * range-predicated query, the analog of the reference's JDBC splits).
  *
  * Derby is used as the remote store because its embedded engine ships on the
  * Spark classpath — no new dependency, fully offline. The catalog is populated
  * once per JVM from the parquet fixture (the "remote" system's own data); at
  * real scale the remote DB exists independently and population is not needed.
  *
  * Scale notes:
  *  - Partitioned reads: `ordersPartitioned` computes bounds with one metadata
  *    query (the split-enumeration analog) and reads N range-disjoint slices in
  *    parallel — the shape that keeps a 1000-executor cluster busy against a
  *    sharded remote store.
  *  - Index join: `indexLookupJoin` pushes a bounded key set into the remote
  *    WHERE clause (reference: core/trino-main/src/main/java/io/trino/sql/planner/plan/IndexJoinNode.java,
  *    operator/index/IndexLoaderOperator — connector lookup by join keys). The
  *    key set is capped; above the cap it degrades to a scan-side hash join,
  *    which is the correct behavior at scale (an unbounded IN-list is worse
  *    than a shuffle join).
  */
object DerbyCatalog {
  private val DriverClass = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Derby's system home (databases + derby.log) lives under target/ so the
    * repo root stays clean and nothing outside the repo is touched. */
  private lazy val systemHome: String = {
    val dir = new java.io.File("target/derby").getAbsoluteFile
    dir.mkdirs()
    System.setProperty("derby.system.home", dir.getPath)
    dir.getPath
  }

  private def urlFor(sfDir: String): String = {
    val tag = java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
    s"jdbc:derby:$systemHome/g$tag;create=true"
  }

  def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", DriverClass)
    p
  }

  private val populated = scala.collection.mutable.Set.empty[String]

  /** Populate ORDERS in the embedded catalog from the parquet fixture — once per
    * JVM per scale factor AND dialect. Strings are pinned via the dialect's
    * type map (Spark's Derby dialect would default them to CLOB, which Derby
    * cannot compare or index); column names go through the dialect (the
    * fold-to-upper dialect stores upper-case identifiers). */
  def ensureOrders(spark: SparkSession, sfDir: String,
      dialect: JdbcSqlDialect = JdbcSqlDialect.Quoted): String = synchronized {
    val url = urlFor(sfDir)
    val key = s"$url#${dialect.tableName("orders")}"
    if (!populated.contains(key)) {
      val df = graft.sources.Tables.load(spark, sfDir, "orders")
      df.toDF(df.columns.map(dialect.columnName).toIndexedSeq: _*)
        .coalesce(1) // embedded Derby is single-writer; real remote DBs take parallel writers
        .write.mode("overwrite")
        .option("driver", DriverClass)
        .option("createTableColumnTypes", dialect.stringColumnTypes)
        .jdbc(url, dialect.tableName("orders"), props)
      populated += key
    }
    url
  }

  /** Plain federated read — pushdown/pruning handled by the JDBC relation.
    * Columns come back dialect-normalized to the engine's lower-case names. */
  def orders(spark: SparkSession, sfDir: String,
      dialect: JdbcSqlDialect = JdbcSqlDialect.Quoted): DataFrame = {
    val url = ensureOrders(spark, sfDir, dialect)
    lowered(spark.read.option("driver", DriverClass)
      .jdbc(url, dialect.tableName("orders"), props))
  }

  /** Split-enumerated federated read: one metadata query for bounds, then
    * `numPartitions` range-disjoint slice queries executed in parallel. */
  def ordersPartitioned(spark: SparkSession, sfDir: String,
      numPartitions: Int = 4,
      dialect: JdbcSqlDialect = JdbcSqlDialect.Quoted): DataFrame = {
    val url = ensureOrders(spark, sfDir, dialect)
    val (lo, hi) = bounds(url, "orders", "o_orderkey", dialect)
    lowered(spark.read
      .option("driver", DriverClass)
      .jdbc(url, dialect.tableName("orders"),
        dialect.columnName("o_orderkey"), lo, hi, numPartitions, props))
  }

  private def lowered(df: DataFrame): DataFrame = {
    val lower = df.columns.map(_.toLowerCase)
    if (java.util.Arrays.equals(lower.asInstanceOf[Array[AnyRef]],
        df.columns.asInstanceOf[Array[AnyRef]])) df
    else df.toDF(lower.toIndexedSeq: _*)
  }

  /** Pass-through query execution in the remote engine — the analog of the
    * reference's `TABLE(system.query(...))` table function
    * (reference: plugin/trino-base-jdbc/src/main/java/io/trino/plugin/jdbc/procedure/... query TVF):
    * the SQL text runs entirely remote-side; Spark sees only the result schema. */
  def query(spark: SparkSession, sfDir: String, remoteSql: String,
      dialect: JdbcSqlDialect = JdbcSqlDialect.Quoted): DataFrame = {
    val url = ensureOrders(spark, sfDir, dialect)
    spark.read
      .option("driver", DriverClass)
      .option("url", url)
      .option("query", remoteSql)
      .format("jdbc")
      .load()
  }

  /** Index join: look up remote rows by the probe side's join keys.
    *
    * The probe key set is collected (bounded by `maxKeys`) and pushed into the
    * remote WHERE clause — the connector-lookup join of the reference
    * (sql/planner/plan/IndexJoinNode.java). Above the cap this degrades to the
    * partitioned scan + hash join, which is the right plan when the key set no
    * longer fits a lookup. The collect is a driver-side key-set fetch of at most
    * `maxKeys` longs — the same bounded metadata exchange the reference's index
    * source performs — not a data collect.
    */
  def indexLookupJoin(
      spark: SparkSession, sfDir: String,
      probe: DataFrame, probeKey: String,
      maxKeys: Int = 10000,
      dialect: JdbcSqlDialect = JdbcSqlDialect.Quoted): DataFrame = {
    import org.apache.spark.sql.functions.col
    val keys = probe.select(col(probeKey)).distinct().limit(maxKeys + 1)
      .collect().map(_.getLong(0))
    if (keys.length > maxKeys) {
      ordersPartitioned(spark, sfDir, dialect = dialect)
        .join(probe, col("o_orderkey") === col(probeKey))
    } else {
      // identifier handling is the dialect's: double-quoted case-sensitive
      // names vs unquoted fold-to-upper render differently here
      val lookup = lowered(query(spark, sfDir,
        dialect.inListLookup("orders", "o_orderkey", keys.toSeq), dialect))
      lookup.join(probe, col("o_orderkey") === col(probeKey))
    }
  }

  /** One-row metadata query for split bounds (split-enumeration analog). */
  private def bounds(url: String, table: String, col: String,
      dialect: JdbcSqlDialect): (Long, Long) = {
    Class.forName(DriverClass)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(dialect.boundsQuery(table, col))
      rs.next()
      (rs.getLong(1), rs.getLong(2))
    } finally conn.close()
  }
}
