package graft

import java.nio.file.Files

/** Catalog / DDL surface (SURVEY.md §3 entry C: DDL & utility statements —
  * reference execution/CreateTableTask.java et al., SHOW/DESCRIBE rewrites
  * sql/rewrite/ShowQueriesRewrite.java): views, external tables, INSERT,
  * DESCRIBE, SHOW, DROP through spark.sql + the session catalog. */
class CatalogSpec extends SparkSpec {

  test("CREATE VIEW / SHOW / DESCRIBE / DROP round-trip") {
    graft.sources.Tables.registerAll(spark, sfDir)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW nation_eu AS SELECT * FROM nation WHERE n_regionkey = 0")
    assert(spark.catalog.tableExists("nation_eu"))
    val described = spark.sql("DESCRIBE nation_eu").collect().map(_.getString(0)).toSet
    assert(described.contains("n_nationkey") && described.contains("n_name"))
    val shown = spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(shown.contains("nation_eu"))
    val n = spark.sql("SELECT count(*) FROM nation_eu").collect()(0).getLong(0)
    assert(n > 0)
    spark.sql("DROP VIEW nation_eu")
    assert(!spark.catalog.tableExists("nation_eu"))
  }

  test("ANALYZE TABLE computes CBO statistics") {
    val loc = java.nio.file.Files.createTempDirectory("graft_stats").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS graft_stats_t")
    operators.table(spark, sfDir, "nation")
      .write.mode("overwrite").option("path", loc).saveAsTable("graft_stats_t")
    spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
    val stats = spark.sql("DESCRIBE EXTENDED graft_stats_t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats("Statistics").contains("rows"), stats("Statistics"))
    spark.sql("DROP TABLE graft_stats_t")
  }

  test("EXPLAIN ANALYZE report carries per-node runtime metrics") {
    val rep = graft.engine.ExplainAnalyze.report(
      operators.Relational.q1_agg(spark, sfDir))
    assert(rep.contains("HashAggregate"), rep)
    val metrics = graft.engine.ExplainAnalyze.analyze(
      operators.Relational.q1_agg(spark, sfDir))
    val scanRows = metrics.filter(_.node.toLowerCase.contains("scan"))
      .flatMap(_.metrics.get("numOutputRows"))
    assert(scanRows.exists(_ > 0), metrics.map(_.node).mkString(","))
  }

  test("joda-dialect datetime format/parse round-trips") {
    import graft.functions.ScalarFunctions._
    import org.apache.spark.sql.functions.{to_timestamp, date_format, lit}
    import spark.implicits._
    val df = Seq("2024-03-15 10:30:00").toDF("s")
      .withColumn("ts", to_timestamp($"s"))
    val r = df.select(
      formatDatetime($"ts", "YYYY/MM/dd HH:mm").as("f"),
      date_format(parseDatetime(lit("15/03/2024"), "dd/MM/YYYY"), "yyyy-MM-dd").as("p"))
      .collect()(0)
    assert(r.getString(0) == "2024/03/15 10:30")
    assert(r.getString(1) == "2024-03-15")
    intercept[IllegalArgumentException](translateJodaPattern("xxxx-ww"))
  }

  test("parameterized queries (PREPARE/EXECUTE analogue)") {
    graft.sources.Tables.registerAll(spark, sfDir)
    val named = spark.sql(
      "SELECT count(*) FROM nation WHERE n_regionkey = :rk",
      Map("rk" -> 0)).collect()(0).getLong(0)
    val direct = spark.sql(
      "SELECT count(*) FROM nation WHERE n_regionkey = 0").collect()(0).getLong(0)
    assert(named == direct && named > 0)
    val positional = spark.sql(
      "SELECT n_name FROM nation WHERE n_nationkey = ? ORDER BY n_name",
      Array(3)).collect()(0).getString(0)
    assert(positional == "NATION_3")
  }

  test("CREATE TABLE USING parquet + INSERT INTO + SELECT") {
    val loc = Files.createTempDirectory("graft_cat").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS graft_t")
    spark.sql(s"CREATE TABLE graft_t (id BIGINT, name STRING) USING parquet LOCATION '$loc'")
    spark.sql("INSERT INTO graft_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_t SELECT 3, 'c'")
    val rows = spark.sql("SELECT id, name FROM graft_t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql("DROP TABLE graft_t")
    assert(!spark.catalog.tableExists("graft_t"))
  }

  test("CREATE FUNCTION DDL round-trip: characteristics stripped, dialect body, OR REPLACE") {
    graft.sqlx.TrinoDialect.sql(spark, sfDir,
      "CREATE FUNCTION cat_spec_fn(x bigint) RETURNS bigint " +
        "LANGUAGE SQL DETERMINISTIC CALLED ON NULL INPUT RETURN x * 2")
    assert(spark.sql("SELECT cat_spec_fn(21)").collect()(0).getLong(0) == 42L)
    // body in the reference dialect (strpos), replaced via OR REPLACE
    graft.sqlx.TrinoDialect.sql(spark, sfDir,
      "CREATE OR REPLACE FUNCTION cat_spec_fn(x bigint) RETURNS bigint " +
        "RETURN x + CAST(strpos('abc', 'c') AS bigint)")
    assert(spark.sql("SELECT cat_spec_fn(10)").collect()(0).getLong(0) == 13L)
    // malformed DDL fails with the subset message
    val e = intercept[IllegalArgumentException] {
      graft.sqlx.TrinoDialect.sql(spark, sfDir, "CREATE FUNCTION broken RETURNS int RETURN 1")
    }
    assert(e.getMessage.contains("CREATE FUNCTION subset"))
  }
}
