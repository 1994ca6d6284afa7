package graft

import org.apache.spark.sql.functions._

import graft.catalog.BlackHoleCatalog

/** Blackhole connector (reference plugin/trino-blackhole): discarded
  * writes, generated constant reads, split parallelism. */
class BlackHoleSpec extends SparkSpec {

  BlackHoleCatalog.register(spark)

  test("default table swallows inserts and reads empty") {
    spark.sql("DROP TABLE IF EXISTS graft_blackhole.default.sink")
    spark.sql("CREATE TABLE graft_blackhole.default.sink (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft_blackhole.default.sink SELECT id, 'v' FROM range(100000)")
    assert(spark.table("graft_blackhole.default.sink").count() === 0)
    spark.sql("DROP TABLE graft_blackhole.default.sink")
  }

  test("configured table generates split_count × pages_per_split × rows_per_page zero rows") {
    spark.sql("DROP TABLE IF EXISTS graft_blackhole.default.gen")
    spark.sql(
      """CREATE TABLE graft_blackhole.default.gen
         (n BIGINT, s STRING, d DOUBLE, b BOOLEAN)
         TBLPROPERTIES('split_count'='4','pages_per_split'='3','rows_per_page'='50','field_length'='5')""")
    val df = spark.table("graft_blackhole.default.gen")
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 4L * 3 * 50)
    val r = df.distinct().collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 0L && r(0).getString(1) === "xxxxx" &&
      r(0).getDouble(2) === 0.0 && !r(0).getBoolean(3))
    spark.sql("DROP TABLE graft_blackhole.default.gen")
  }

  test("write-path benchmarking: a full query can sink into blackhole") {
    spark.sql("DROP TABLE IF EXISTS graft_blackhole.default.bench_sink")
    spark.sql("CREATE TABLE graft_blackhole.default.bench_sink (k BIGINT, c BIGINT)")
    graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("c"))
      .writeTo("graft_blackhole.default.bench_sink").append()
    assert(spark.table("graft_blackhole.default.bench_sink").count() === 0)
    spark.sql("DROP TABLE graft_blackhole.default.bench_sink")
  }
}
