package graft

import java.io.File

import org.apache.spark.sql.functions._

/** graft.catalog.IcebergWrite: spec-shaped v2 metadata (metadata JSON →
  * manifest list avro → manifest avro → parquet) that this engine's
  * IcebergRead replays (documented subset — see IcebergWrite's header),
  * including the written column stats driving plan-time file pruning. */
class IcebergWriteSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = new File(System.getProperty("java.io.tmpdir"), s"graft_icew_$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    root.getAbsolutePath
  }

  test("create + append replay to the full row set; snapshots time travel") {
    val path = fresh("append")
    val sup = operators.table(spark, sfDir, "supplier")
    assert(catalog.IcebergWrite.write(sup.filter($"s_suppkey" <= 5), path) == 1L)
    assert(catalog.IcebergWrite.write(sup.filter($"s_suppkey" > 5), path) == 2L)
    val back = catalog.IcebergRead.readTable(spark, path)
    assert(back.count() == sup.count())
    assert(back.agg(sum($"s_suppkey")).head().getLong(0) ==
      sup.agg(sum($"s_suppkey")).head().getLong(0))
    // snapshot 1 sees only the first half
    val asOf = catalog.IcebergRead.readTable(spark, path, snapshotId = Some(1L))
    assert(asOf.count() == sup.filter($"s_suppkey" <= 5).count())
  }

  test("written column stats drive manifest pruning in the reader") {
    val path = fresh("prune")
    // two disjoint key bands → two files with disjoint bounds
    val df = (1L to 100L).toDF("k").withColumn("v", $"k" * 2)
    catalog.IcebergWrite.write(df.filter($"k" <= 50).repartition(1), path)
    catalog.IcebergWrite.write(df.filter($"k" > 50).repartition(1), path)
    val pruned = catalog.IcebergRead.readTable(spark, path,
      prune = Some(catalog.IcebergRead.Prune("k", lo = Some(80L), hi = None)))
    // the hint prunes FILES from the plan (rows still need the filter):
    // only the high-band file survives
    assert(catalog.IcebergRead.lastPruned.get() >= 1,
      "low-band file should be pruned from the plan")
    assert(pruned.count() == 50)
    assert(pruned.filter($"k" >= 80).count() == 21)
  }

  test("unsupported column types are refused") {
    val path = fresh("badtype")
    val df = Seq((1, Seq(1, 2))).toDF("k", "arr")
    intercept[IllegalArgumentException] {
      catalog.IcebergWrite.write(df, path)
    }
  }

  test("deleteWhere writes position deletes; composed deletes replay") {
    val path = fresh("posdel")
    val df = (1L to 100L).toDF("k").withColumn("v", $"k" * 2)
    catalog.IcebergWrite.write(df, path)
    val s2 = catalog.IcebergWrite.deleteWhere(spark, path, $"k" % 10 === 0)
    assert(s2 == 2L)
    val after1 = catalog.IcebergRead.readTable(spark, path)
    assert(after1.count() == 90)
    // second delete composes with the first
    val s3 = catalog.IcebergWrite.deleteWhere(spark, path, $"k" % 10 === 1)
    assert(s3 == 3L)
    val after2 = catalog.IcebergRead.readTable(spark, path)
    assert(after2.count() == 80)
    assert(after2.agg(sum($"k")).head().getLong(0) ==
      (1L to 100L).filter(k => k % 10 != 0 && k % 10 != 1).sum)
    // time travel: the pre-delete snapshot still sees all rows
    assert(catalog.IcebergRead.readTable(spark, path, snapshotId = Some(1L))
      .count() == 100)
    // no-match delete commits nothing
    assert(catalog.IcebergWrite.deleteWhere(spark, path, $"k" === 9999L) == -1L)
  }

  test("position deletes stay distributed: many delete files, all applied") {
    val path = fresh("posdel_dist")
    val df = (1L to 2000L).toDF("k").withColumn("v", $"k" * 2)
    catalog.IcebergWrite.write(df.repartition(4), path)
    // force the delete scan into multiple tasks so the natural-partitioning
    // write provably emits >1 position-delete file (no coalesce(1) funnel)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevAqe = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      catalog.IcebergWrite.deleteWhere(spark, path, $"k" % 3 === 0)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevAqe)
    }
    val deleteFiles = Option(new File(path, "data").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("delete-"))
    assert(deleteFiles.length > 1,
      s"expected >1 position-delete file, got ${deleteFiles.length}")
    // the reader applies ALL of them
    val back = catalog.IcebergRead.readTable(spark, path)
    assert(back.count() == (1L to 2000L).count(_ % 3 != 0))
    assert(back.agg(sum($"k")).head().getLong(0) ==
      (1L to 2000L).filter(_ % 3 != 0).sum)
  }

  test("identity-partitioned write: spec fields, typed partition record, full columns") {
    val path = fresh("partitioned")
    val nation = operators.table(spark, sfDir, "nation")
      .select($"n_nationkey", $"n_name", $"n_regionkey".cast("int").as("n_regionkey"))
    catalog.IcebergWrite.write(nation, path, partitionBy = Seq("n_regionkey"))
    val back = catalog.IcebergRead.readTable(spark, path)
    // identity partitioning keeps the source column in the data files
    assert(back.columns.contains("n_regionkey"))
    assert(back.count() == nation.count())
    val perRegion = back.groupBy($"n_regionkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = nation.groupBy($"n_regionkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRegion == expect)
    // the metadata declares the identity spec field
    val meta = new String(java.nio.file.Files.readAllBytes(
      new File(path, "metadata/v1.metadata.json").toPath))
    assert(meta.contains("\"transform\":\"identity\""))
    assert(meta.contains("\"name\":\"n_regionkey\""))
    // delete composes with the partitioned layout
    catalog.IcebergWrite.deleteWhere(spark, path, $"n_regionkey" === 0)
    assert(catalog.IcebergRead.readTable(spark, path).count() ==
      nation.filter($"n_regionkey" =!= 0).count())
  }

  test("bucket transform: spec murmur3 vector, roundtrip, equality pruning") {
    // Iceberg spec's published vector: hash(34) = 2017239379
    assert(catalog.IcebergTransforms.hashLong(34L) == 2017239379)
    val path = fresh("ib_bucket")
    val df = (1L to 400L).toDF("k").withColumn("v", $"k" * 7)
    catalog.IcebergWrite.write(df, path, partitionBy = Seq("k"),
      transform = "bucket[8]")
    val back = catalog.IcebergRead.readTable(spark, path)
    assert(back.count() == 400)
    assert(back.agg(org.apache.spark.sql.functions.sum($"v")).head().getLong(0) ==
      (1L to 400L).map(_ * 7).sum)
    // equality lookup prunes every other bucket: stats can't (each bucket
    // file spans nearly the whole 1..400 key range)
    val hit = catalog.IcebergRead.readTable(spark, path,
      prune = Some(catalog.IcebergRead.Prune("k", Some(42L), Some(42L))))
    assert(hit.filter($"k" === 42L).count() == 1)
    assert(catalog.IcebergRead.lastPruned.get() >= 6,
      s"expected >=6 of 8 bucket files pruned, got ${catalog.IcebergRead.lastPruned.get()}")
    // a RANGE over a bucketed column must NOT partition-prune (order is
    // destroyed) — every row of the range still comes back
    val range = catalog.IcebergRead.readTable(spark, path,
      prune = Some(catalog.IcebergRead.Prune("k", Some(100L), Some(200L))))
    assert(range.filter($"k".between(100L, 200L)).count() == 101)
  }

  test("truncate transform: range pruning keeps only overlapping slabs") {
    val path = fresh("ib_trunc")
    val df = (0L until 1000L).toDF("k").repartition(1) // one file per slab
    catalog.IcebergWrite.write(df, path, partitionBy = Seq("k"),
      transform = "truncate[100]")
    assert(catalog.IcebergRead.readTable(spark, path).count() == 1000)
    val got = catalog.IcebergRead.readTable(spark, path,
      prune = Some(catalog.IcebergRead.Prune("k", Some(250L), Some(449L))))
    assert(got.filter($"k".between(250L, 449L)).count() == 200)
    // 10 slabs of width 100; [250,449] overlaps slabs 200/300/400 → 7 pruned
    assert(catalog.IcebergRead.lastPruned.get() == 7,
      s"expected 7 of 10 slabs pruned, got ${catalog.IcebergRead.lastPruned.get()}")
    // appends validate the TRANSFORMED spec, not just column names
    val e = intercept[IllegalArgumentException] {
      catalog.IcebergWrite.write(df, path, partitionBy = Seq("k"),
        transform = "truncate[50]")
    }
    assert(e.getMessage.contains("partitioning mismatch"))
  }

  test("month transform: temporal pruning keeps only overlapping months") {
    val path = fresh("ib_month")
    val df = (0 until 365).map(d =>
      java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(d)))
      .toDF("d").repartition(1)
    catalog.IcebergWrite.write(df, path, partitionBy = Seq("d"),
      transform = "month")
    assert(catalog.IcebergRead.readTable(spark, path).count() == 365)
    val lo = java.time.LocalDate.of(2023, 4, 10).toEpochDay
    val hi = java.time.LocalDate.of(2023, 5, 20).toEpochDay
    val got = catalog.IcebergRead.readTable(spark, path,
      prune = Some(catalog.IcebergRead.Prune("d", Some(lo), Some(hi))))
    assert(got.count() == 61) // all rows of the two surviving month files
    // 12 month partitions; [Apr 10, May 20] overlaps April + May → 10 pruned
    assert(catalog.IcebergRead.lastPruned.get() == 10,
      s"expected 10 of 12 months pruned, got ${catalog.IcebergRead.lastPruned.get()}")
  }

  test("hour transform: timestamps partition by hours since epoch") {
    val path = fresh("ib_hour")
    val df = (0 until 48).map(h =>
      java.sql.Timestamp.valueOf(java.time.LocalDateTime
        .of(2023, 6, 1, 0, 0).plusHours(h).plusMinutes(17)))
      .toDF("ts").repartition(1)
    catalog.IcebergWrite.write(df, path, partitionBy = Seq("ts"),
      transform = "hour")
    assert(catalog.IcebergRead.readTable(spark, path).count() == 48)
    // 48 distinct hour partitions, field name per the spec convention
    val meta = new File(path, "metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
    assert(meta.contains("\"transform\":\"hour\""))
    assert(meta.contains("ts_hour"))
    val dataDirs = new File(path, "data").listFiles().filter(_.isDirectory)
    assert(dataDirs.length == 48, s"expected 48 hour dirs, got ${dataDirs.length}")
  }

  test("void transform: every row lands in the single null partition") {
    val path = fresh("ib_void")
    val df = (1 to 10).toDF("v").repartition(1)
    catalog.IcebergWrite.write(df, path, partitionBy = Seq("v"),
      transform = "void")
    assert(catalog.IcebergRead.readTable(spark, path)
      .agg(sum($"v")).collect().head.getLong(0) == 55)
    val meta = new File(path, "metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
    assert(meta.contains("\"transform\":\"void\""))
    assert(meta.contains("v_null"))
    val dataDirs = new File(path, "data").listFiles().filter(_.isDirectory)
    assert(dataDirs.length == 1, s"void must produce ONE partition dir: ${dataDirs.toSeq}")
  }

  test("v2 layout: field-ids, manifest_file counts, byte-equal delete paths") {
    import scala.jdk.CollectionConverters._
    val path = fresh("v2layout")
    val df = (1L to 40L).map(i => (i, s"n$i")).toDF("k", "v").repartition(1)
    catalog.IcebergWrite.write(df, path)
    catalog.IcebergWrite.deleteWhere(spark, path, $"k" % 10L === 0L)

    def avro(f: java.io.File) = {
      val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        f, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      try (r.getSchema, r.iterator().asScala.toVector) finally r.close()
    }
    val metaDir = new java.io.File(path, "metadata")
    val list = new java.io.File(metaDir, "snap-2-1-manifest-list.avro")
    val (listSchema, listRows) = avro(list)
    // spec field-ids present on manifest_file fields
    assert(listSchema.getField("manifest_path").getObjectProp("field-id") == 500)
    assert(listSchema.getField("sequence_number").getObjectProp("field-id") == 515)
    // v2-required tallies populated
    val dataRow = listRows.find(_.get("content").toString == "0").get
    assert(dataRow.get("added_files_count").toString.toInt == 1)
    assert(dataRow.get("added_rows_count").toString.toLong == 40L)
    val delRow = listRows.find(_.get("content").toString == "1").get
    assert(delRow.get("sequence_number").toString.toLong == 2L)
    assert(delRow.get("added_rows_count").toString.toLong == 4L)
    // manifest paths fully qualified; entry field-ids present
    val mp = dataRow.get("manifest_path").toString
    assert(mp.startsWith("file:/"), mp)
    val (entrySchema, entries) = avro(new java.io.File(mp.stripPrefix("file:")))
    assert(entrySchema.getField("status").getObjectProp("field-id") == 0)
    val dfField = entrySchema.getField("data_file")
    assert(dfField.getObjectProp("field-id") == 2)
    assert(dfField.schema().getField("file_path").getObjectProp("field-id") == 100)
    // delete parquet's file_path byte-equals the manifest's data-file path
    val dataFilePath = entries.head.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord].get("file_path").toString
    val (_, delEntries) = avro(new java.io.File(
      delRow.get("manifest_path").toString.stripPrefix("file:")))
    val delParquet = delEntries.head.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord].get("file_path").toString
    val recorded = spark.read.parquet(delParquet.stripPrefix("file:"))
      .select("file_path").distinct().collect().map(_.getString(0)).toSet
    assert(recorded == Set(dataFilePath),
      s"delete paths $recorded != manifest path $dataFilePath")
    // and the table still reads correctly
    assert(catalog.IcebergRead.readTable(spark, path).count() == 36)
  }

  test("multi-field spec: identity + month + bucket in one partition tuple") {
    val path = fresh("ib_multi")
    val df = (0 until 120).map { i =>
      (i.toLong, s"g${i % 2}",
        java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1 + i % 4, 5)))
    }.toDF("k", "g", "d").repartition(1)
    catalog.IcebergWrite.writeSpec(df, path,
      Seq("g" -> "identity", "d" -> "month", "k" -> "bucket[4]"))
    // full replay
    val back = catalog.IcebergRead.readTable(spark, path)
    assert(back.count() == 120)
    assert(back.columns.toSet == Set("k", "g", "d")) // sources all retained
    // month pruning still works with the two sibling fields in the record:
    // 2 groups × 4 months × ≤4 buckets; [Feb] keeps only month files
    val lo = java.time.LocalDate.of(2023, 2, 1).toEpochDay
    val hi = java.time.LocalDate.of(2023, 2, 28).toEpochDay
    val feb = catalog.IcebergRead.readTable(spark, path,
      prune = Some(catalog.IcebergRead.Prune("d", Some(lo), Some(hi))))
    assert(feb.count() == 30)
    assert(catalog.IcebergRead.lastPruned.get() > 0)
    // append with a DIFFERENT spec arity fails loudly (metadata guard)
    val e = intercept[IllegalArgumentException] {
      catalog.IcebergWrite.writeSpec(df, path, Seq("g" -> "identity"))
    }
    assert(e.getMessage.contains("partitioning mismatch"))
    // append with the SAME spec lands a second snapshot
    assert(catalog.IcebergWrite.writeSpec(df, path,
      Seq("g" -> "identity", "d" -> "month", "k" -> "bucket[4]")) == 2L)
    assert(catalog.IcebergRead.readTable(spark, path).count() == 240)
  }
}
