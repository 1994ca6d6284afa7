package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.catalog.MemoryStore

/** Memory connector (reference plugin/trino-memory): DSv2 catalog whose
  * tables hold UnsafeRow blocks in RAM — CREATE/CTAS/INSERT/OVERWRITE/
  * SELECT/RENAME/DROP through normal multi-catalog SQL. */
class MemoryCatalogSpec extends SparkSpec {

  MemoryStore.register(spark)

  private def drop(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS graft_mem.default.$name")

  test("CTAS, read back, INSERT INTO appends, OVERWRITE truncates") {
    drop("t1")
    spark.sql("CREATE TABLE graft_mem.default.t1 AS SELECT * FROM VALUES (1, 'a'), (2, 'b') v(id, s)")
    assert(spark.table("graft_mem.default.t1").count() === 2)

    spark.sql("INSERT INTO graft_mem.default.t1 VALUES (3, 'c')")
    assert(spark.table("graft_mem.default.t1").count() === 3)
    assert(spark.sql("SELECT sum(id) FROM graft_mem.default.t1").head.getLong(0) === 6L)

    spark.sql("INSERT OVERWRITE graft_mem.default.t1 VALUES (9, 'z')")
    assert(spark.table("graft_mem.default.t1").collect().toSeq === Seq(Row(9, "z")))
    drop("t1")
  }

  test("read side preserves the writer-task partitioning (no single-partition collapse)") {
    drop("t2")
    spark.range(0, 10000, 1, 8).selectExpr("id", "id * 2 AS v")
      .writeTo("graft_mem.default.t2").create()
    val back = spark.table("graft_mem.default.t2")
    assert(back.rdd.getNumPartitions === 8,
      s"expected 8 read blocks (one per writer task), got ${back.rdd.getNumPartitions}")
    assert(back.agg(sum("v")).head.getLong(0) === (0L until 10000).map(_ * 2).sum)
    drop("t2")
  }

  test("rename and drop; duplicate create fails; unknown table fails") {
    drop("t3"); drop("t3b")
    spark.sql("CREATE TABLE graft_mem.default.t3 (id INT, s STRING)")
    intercept[Exception](spark.sql("CREATE TABLE graft_mem.default.t3 (id INT)"))
    spark.sql("ALTER TABLE graft_mem.default.t3 RENAME TO graft_mem.default.t3b")
    assert(spark.table("graft_mem.default.t3b").count() === 0)
    intercept[Exception](spark.table("graft_mem.default.t3").count())
    spark.sql("DROP TABLE graft_mem.default.t3b")
    intercept[Exception](spark.table("graft_mem.default.t3b").count())
  }

  test("joins against a parquet-catalog table work in one statement") {
    drop("dim")
    spark.sql("CREATE TABLE graft_mem.default.dim AS SELECT * FROM VALUES (0, 'even'), (1, 'odd') v(parity, label)")
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .withColumn("parity", (col("l_orderkey") % 2).cast("int"))
    val joined = li.join(spark.table("graft_mem.default.dim"), "parity")
      .groupBy("label").count().orderBy("label")
    val rows = joined.collect()
    assert(rows.length === 2 && rows.map(_.getLong(1)).sum === li.count())
    drop("dim")
  }
}
