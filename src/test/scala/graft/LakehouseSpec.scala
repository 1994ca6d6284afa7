package graft

import java.io.File

import org.apache.spark.sql.functions._

/** graft.catalog.LakehouseCatalog: layout detection routes each table to
  * its format's reader (reference plugin/trino-lakehouse's TableType
  * dispatch), including the plain-parquet HIVE fallback the gate query
  * doesn't cover, and the lakehouse_table TVF from SQL text. */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): File = {
    val root = new File(System.getProperty("java.io.tmpdir"), s"graft_lh_$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    root.mkdirs()
    root
  }

  test("detection: all four layouts recognized; reads replay each format") {
    val wh = fresh("detect")
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v")
    catalog.DeltaWrite.write(df, new File(wh, "t_delta").getAbsolutePath)
    catalog.IcebergWrite.write(df, new File(wh, "t_iceberg").getAbsolutePath)
    catalog.HudiWrite.write(df, new File(wh, "t_hudi").getAbsolutePath)
    df.write.parquet(new File(wh, "t_hive").getAbsolutePath)

    val L = catalog.LakehouseCatalog
    assert(L.detect(new File(wh, "t_delta").getAbsolutePath) == L.Delta)
    assert(L.detect(new File(wh, "t_iceberg").getAbsolutePath) == L.Iceberg)
    assert(L.detect(new File(wh, "t_hudi").getAbsolutePath) == L.Hudi)
    assert(L.detect(new File(wh, "t_hive").getAbsolutePath) == L.Hive)

    assert(L.tables(wh.getAbsolutePath) ==
      Seq("t_delta", "t_hive", "t_hudi", "t_iceberg"))
    for (t <- L.tables(wh.getAbsolutePath)) {
      val back = L.readTable(spark, wh.getAbsolutePath, t)
      assert(back.count() == 20, s"$t row count")
      assert(back.agg(sum($"k")).collect()(0).getLong(0) == 210L, s"$t content")
    }
  }

  test("detection sees through a format change: Delta DELETE stays honored") {
    // a naive read-all-parquet would double-count; the router must land on
    // the Delta log replay, not the Hive fallback
    val wh = fresh("route")
    val path = new File(wh, "t").getAbsolutePath
    val df = (1L to 10L).map(i => (i, i * 2)).toDF("k", "v")
    catalog.DeltaWrite.write(df, path)
    catalog.DeltaWrite.write(df.filter($"k" > 5), path) // second commit appends
    val got = catalog.LakehouseCatalog.read(spark, path).count()
    assert(got == 15, s"log replay expected 15 rows, got $got")
  }

  test("lakehouse_table TVF reads any format from SQL text") {
    val wh = fresh("tvf")
    val path = new File(wh, "t").getAbsolutePath
    (1L to 7L).toDF("k").write.parquet(path) // hive fallback via TVF
    val out = sqlx.TrinoDialect.sql(spark, sfDir,
      s"SELECT CAST(sum(k) AS BIGINT) AS s FROM TABLE(lakehouse_table('$path'))")
    assert(out.collect()(0).getLong(0) == 28L)
  }

  test("a missing table directory fails loudly") {
    val e = intercept[IllegalArgumentException] {
      catalog.LakehouseCatalog.detect("/tmp/graft_lh_nowhere_at_all")
    }
    assert(e.getMessage.contains("no table directory"))
  }
}
