package graft

import java.io.File
import java.sql.{Date, Timestamp}

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{AvroFileCatalog, AvroIO}

/** Avro connector: header-schema resolution, typed decode incl. nulls and
  * logical types, sync-marker byte-range splits, loud nested rejection
  * (reference lib/trino-hive-formats avro readers). */
class AvroFormatSpec extends SparkSpec {

  private def tmpRoot(tag: String): String = {
    val d = new File(s"target/avrotest/$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    d.getAbsolutePath
  }

  // One catalog name per root: Spark caches a catalog plugin instance on
  // first use, so a re-pointed `.path` conf would be ignored.
  private def register(name: String, root: String): String = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[AvroFileCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.path", root)
    name
  }

  test("roundtrip of all supported types, including nulls and logical date/timestamp") {
    val root = tmpRoot("types")
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(true, 1, 10L, 1.5f, 2.5, "alpha", Array[Byte](1, 2), Date.valueOf("2020-01-02"),
        Timestamp.valueOf("2020-01-02 03:04:05.123456")),
      Row(null, null, null, null, null, null, null, null, null),
      Row(false, -7, -70L, -0.5f, -1.25, "βeta", Array[Byte](), Date.valueOf("1969-12-31"),
        Timestamp.valueOf("1969-12-31 23:59:59.0")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    AvroIO.write(df, s"$root/t")
    register("av_types", root)
    val back = spark.table("av_types.default.t")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy(col("l").asc_nulls_last).collect()
    val want = df.orderBy(col("l").asc_nulls_last).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      (0 until schema.length).foreach { i =>
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq === b.toSeq)
          case (a, b) => assert(a === b, s"col ${schema(i).name}")
        }
      }
    }
  }

  test("sync-marker splits: small maxPartitionBytes yields many splits, exactly-once rows") {
    val root = tmpRoot("splits")
    val df = spark.range(0, 20000, 1, 2).selectExpr("id", "repeat('x', 64) AS pad")
    AvroIO.write(df, s"$root/big")
    register("av_splits", root)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val back = spark.table("av_splits.default.big")
      assert(back.rdd.getNumPartitions > 4,
        s"expected byte-range splits, got ${back.rdd.getNumPartitions}")
      assert(back.count() === 20000)
      assert(back.select("id").distinct().count() === 20000) // no double-reads at boundaries
      assert(back.agg(sum("id")).head.getLong(0) === (0L until 20000).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("nested avro schemas are rejected loudly at load time") {
    val root = tmpRoot("nested")
    new File(s"$root/bad").mkdirs()
    val avroSchema = SchemaBuilder.record("r").fields()
      .name("id").`type`().longType().noDefault()
      .name("tags").`type`().array().items().stringType().noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new File(s"$root/bad/part-00000.avro"))
    val rec = new GenericData.Record(avroSchema)
    rec.put("id", 1L)
    rec.put("tags", java.util.Arrays.asList("a"))
    w.append(rec); w.close()
    register("av_nested", root)
    val e = intercept[Exception](spark.table("av_nested.default.bad").count())
    assert(e.getMessage != null)
  }

  test("SQL write path: CTAS, INSERT INTO appends, DROP removes files") {
    val root = tmpRoot("write")
    register("av_write", root)
    spark.sql("CREATE TABLE av_write.default.wt AS SELECT id, CAST(id * 2 AS DOUBLE) AS v FROM range(0, 1000, 1, 4)")
    val t = spark.table("av_write.default.wt")
    assert(t.count() === 1000)
    spark.sql("INSERT INTO av_write.default.wt SELECT id, CAST(0.5 AS DOUBLE) FROM range(1000, 1500)")
    assert(spark.table("av_write.default.wt").count() === 1500)
    assert(spark.table("av_write.default.wt").agg(sum("id")).head.getLong(0) ===
      (0L until 1500).sum)
    // no leftover temp files after commit
    assert(!new File(s"$root/wt").listFiles().exists(_.getName.startsWith("_tmp")))
    spark.sql("DROP TABLE av_write.default.wt")
    assert(!new File(s"$root/wt").exists())
  }

  test("schema comes from the file header: no declared schema anywhere") {
    val root = tmpRoot("selfdesc")
    AvroIO.write(spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s"), s"$root/t2")
    register("av_selfdesc", root)
    val st = spark.table("av_selfdesc.default.t2").schema
    assert(st.fieldNames.toSeq === Seq("id", "s"))
    assert(st("id").dataType === LongType && st("s").dataType === StringType)
  }
}
