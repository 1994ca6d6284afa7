package graft

import java.io.File

import org.apache.spark.sql.functions._

/** graft.catalog.HiveFileCatalog: the reference's file-metastore layout
  * (.trinoSchema JSON per database/table, hive-partitioned directories) —
  * schema-driven typed reads per storage format, plan-time partition
  * pruning, listings, and loud refusals. */
class HiveCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = new File(System.getProperty("java.io.tmpdir"), s"graft_hivespec_$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    root.getAbsolutePath
  }

  test("partitioned parquet: values from the path, pruning skips directories") {
    val wh = fresh("part")
    val df = (1L to 90L).toDF("id")
      .withColumn("pk", ($"id" % 3).cast("int"))
      .withColumn("v", $"id" * 2)
    catalog.HiveFileCatalog.writeTable(df, wh, "db1", "t1",
      format = "PARQUET", partitionBy = Seq("pk"))
    val all = catalog.HiveFileCatalog.readTable(spark, wh, "db1", "t1")
    assert(all.count() == 90)
    assert(all.columns.toSet == Set("id", "v", "pk"))
    val one = catalog.HiveFileCatalog.readTable(spark, wh, "db1", "t1",
      partitionFilter = pv => pv("pk") == "1")
    assert(one.count() == 30)
    assert(one.select("pk").distinct().head().getInt(0) == 1)
    assert(catalog.HiveFileCatalog.lastPruned.get() == 2,
      s"expected 2 of 3 partitions pruned, got ${catalog.HiveFileCatalog.lastPruned.get()}")
  }

  test("csv + json formats read through the metastore schema (typed, not inferred)") {
    val wh = fresh("fmt")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "x")
    catalog.HiveFileCatalog.writeTable(df, wh, "db1", "t_csv", format = "CSV")
    catalog.HiveFileCatalog.writeTable(df, wh, "db1", "t_json", format = "JSON")
    for (t <- Seq("t_csv", "t_json")) {
      val back = catalog.HiveFileCatalog.readTable(spark, wh, "db1", t)
      assert(back.schema("k").dataType.typeName == "long", t)
      assert(back.orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
        Seq((1L, "a", 1.5), (2L, "b", 2.5)), t)
    }
  }

  test("listings and refusals") {
    val wh = fresh("list")
    catalog.HiveFileCatalog.writeTable(Seq(1).toDF("x"), wh, "dba", "ta")
    catalog.HiveFileCatalog.writeTable(Seq(1).toDF("x"), wh, "dbb", "tb")
    assert(catalog.HiveFileCatalog.listDatabases(wh) == Seq("dba", "dbb"))
    assert(catalog.HiveFileCatalog.listTables(wh, "dba") == Seq("ta"))
    val e = intercept[IllegalArgumentException] {
      catalog.HiveFileCatalog.readTable(spark, wh, "dba", "missing")
    }
    assert(e.getMessage.contains(".trinoSchema"))
  }
}
