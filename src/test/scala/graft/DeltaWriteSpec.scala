package graft

import java.io.File

import org.apache.spark.sql.functions._

/** graft.catalog.DeltaWrite: open-protocol Delta commits (CTAS + appends,
  * hive-partitioned) that DeltaRead — i.e. any Delta reader — replays. */
class DeltaWriteSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = new File(System.getProperty("java.io.tmpdir"), s"graft_deltaw_$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    root.getAbsolutePath
  }

  test("CTAS + two appends replay to the full row set") {
    val path = fresh("append")
    val nation = operators.table(spark, sfDir, "nation")
    assert(catalog.DeltaWrite.write(nation.filter($"n_nationkey" < 10), path) == 0L)
    assert(catalog.DeltaWrite.write(nation.filter($"n_nationkey" >= 10 && $"n_nationkey" < 20), path) == 1L)
    assert(catalog.DeltaWrite.write(nation.filter($"n_nationkey" >= 20), path) == 2L)
    val back = catalog.DeltaRead.readTable(spark, path)
    assert(back.count() == nation.count())
    assert(back.agg(sum($"n_nationkey")).head().getLong(0) ==
      nation.agg(sum($"n_nationkey")).head().getLong(0))
  }

  test("partitioned write carries typed partition values through the log") {
    val path = fresh("part")
    val nation = operators.table(spark, sfDir, "nation")
      .withColumn("n_regionkey", $"n_regionkey".cast("int"))
    catalog.DeltaWrite.write(nation, path, partitionBy = Seq("n_regionkey"))
    val back = catalog.DeltaRead.readTable(spark, path)
    assert(back.count() == nation.count())
    // partition column restored with its declared type and values
    val perRegion = back.groupBy($"n_regionkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = nation.groupBy($"n_regionkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRegion == expected)
    // data files do NOT contain the partition column (the protocol's layout)
    val aFile = new File(path).listFiles().find(_.getName.startsWith("n_regionkey=")).get
      .listFiles().find(_.getName.endsWith(".parquet")).get
    val raw = spark.read.parquet(aFile.getAbsolutePath)
    assert(!raw.columns.contains("n_regionkey"))
  }

  test("version race loses loudly, commit never half-applies") {
    val path = fresh("race")
    val one = Seq((1L, "a")).toDF("id", "v")
    catalog.DeltaWrite.write(one, path)
    // a competitor wins version 1 while our writer still believes it read
    // version 0: the CAS commit of version 1 must fail loudly
    val logDir = new File(path, "_delta_log")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(logDir.getAbsolutePath, "00000000000000000001.json"),
      "{}".getBytes)
    intercept[java.nio.file.FileAlreadyExistsException] {
      catalog.DeltaWrite.write(one, path, expectedVersion = Some(1L))
    }
    // the loser's data files are invisible: replay still returns ONE row
    assert(catalog.DeltaRead.readTable(spark, path).count() == 1)
  }

  test("lake TVFs reach open-format tables from SQL text") {
    val dpath = fresh("tvf_delta")
    val nation = operators.table(spark, sfDir, "nation")
    catalog.DeltaWrite.write(nation, dpath)
    val viaSql = sqlx.TrinoDialect.sql(spark, sfDir,
      s"SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS s " +
        s"FROM TABLE(delta_table('$dpath'))").head()
    assert(viaSql.getLong(0) == nation.count())

    val ipath = fresh("tvf_iceberg")
    catalog.IcebergWrite.write(nation.select(col("n_nationkey"), col("n_name")), ipath)
    val ice = sqlx.TrinoDialect.sql(spark, sfDir,
      s"SELECT count(*) AS n FROM TABLE(iceberg_table('$ipath'))").head()
    assert(ice.getLong(0) == nation.count())
    // snapshot argument flows through
    val ice1 = sqlx.TrinoDialect.sql(spark, sfDir,
      s"SELECT count(*) AS n FROM TABLE(iceberg_table('$ipath', 1))").head()
    assert(ice1.getLong(0) == nation.count())

    intercept[Exception] {
      sqlx.TrinoDialect.sql(spark, sfDir,
        "SELECT * FROM TABLE(hudi_table('/nonexistent/path'))").collect()
    }
  }

  test("deleteWhere marks rows in deletion vectors; second delete unions") {
    val path = fresh("dv_delete")
    val nation = operators.table(spark, sfDir, "nation")
    catalog.DeltaWrite.write(nation, path)
    val v1 = catalog.DeltaWrite.deleteWhere(spark, path,
      col("n_nationkey") % 5 === 0)
    assert(v1 == 1L)
    val after1 = catalog.DeltaRead.readTable(spark, path)
    assert(after1.count() == nation.filter(col("n_nationkey") % 5 =!= 0).count())
    // second delete UNIONS with the first vector
    val v2 = catalog.DeltaWrite.deleteWhere(spark, path,
      col("n_nationkey") % 5 === 1)
    assert(v2 == 2L)
    val after2 = catalog.DeltaRead.readTable(spark, path)
    val expect = nation.filter(col("n_nationkey") % 5 =!= 0 &&
      col("n_nationkey") % 5 =!= 1)
    assert(after2.count() == expect.count())
    assert(after2.agg(sum(col("n_nationkey"))).head().getLong(0) ==
      expect.agg(sum(col("n_nationkey"))).head().getLong(0))
    // no-match delete commits nothing
    assert(catalog.DeltaWrite.deleteWhere(spark, path,
      col("n_nationkey") === 9999) == -1L)
  }

  test("updateWhere rewrites matching rows through DV delete + append") {
    val path = fresh("dv_update")
    val base = (1L to 20L).toDF("id").withColumn("v", $"id" * 10)
    catalog.DeltaWrite.write(base, path)
    val v = catalog.DeltaWrite.updateWhere(spark, path,
      col("id") % 5 === 0, Map("v" -> (col("v") + 1)))
    assert(v == 1L) // ONE commit carries both the DV re-adds and the new adds
    val after = catalog.DeltaRead.readTable(spark, path)
    assert(after.count() == 20)
    val got = after.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 20L).foreach { id =>
      val expect = if (id % 5 == 0) id * 10 + 1 else id * 10
      assert(got(id) == expect, s"id $id: ${got(id)} != $expect")
    }
    // no-match update is a no-op
    assert(catalog.DeltaWrite.updateWhere(spark, path,
      col("id") === 999L, Map("v" -> lit(0L))) == -1L)
  }

  test("optimize compacts, materializes DVs; checkpoint enables suffix-only replay") {
    val path = fresh("opt_cp")
    val base = (1L to 300L).toDF("id").withColumn("v", $"id" * 3)
    // three commits → three+ files, then a DV delete
    catalog.DeltaWrite.write(base.filter($"id" <= 100), path)
    catalog.DeltaWrite.write(base.filter($"id" > 100 && $"id" <= 200), path)
    catalog.DeltaWrite.write(base.filter($"id" > 200), path)
    catalog.DeltaWrite.deleteWhere(spark, path, col("id") % 3 === 0)
    val expectIds = (1L to 300L).filter(_ % 3 != 0)
    // a checkpoint cut WHILE DVs are live carries their descriptors:
    // replay from checkpoint state alone applies the deletes
    val cpDv = catalog.DeltaWrite.checkpoint(spark, path)
    assert(cpDv == 3L)
    assert(catalog.DeltaRead.readTable(spark, path).count() == expectIds.length)

    // OPTIMIZE: one compacted file, deletes materialized, removes tombstone
    val optVersion = catalog.DeltaWrite.optimize(spark, path, targetFiles = 1)
    assert(optVersion == 4L)
    val after = catalog.DeltaRead.readTable(spark, path)
    assert(after.count() == expectIds.length)
    assert(after.agg(sum($"id")).head().getLong(0) == expectIds.sum)
    val log4 = new java.io.File(path, f"_delta_log/${4L}%020d.json")
    val text = new String(java.nio.file.Files.readAllBytes(log4.toPath))
    assert(text.contains("\"remove\""))

    // checkpoint now succeeds; readers replay the JSON SUFFIX only —
    // proven by deleting every commit file at or before the checkpoint
    val cpVersion = catalog.DeltaWrite.checkpoint(spark, path)
    assert(cpVersion == 4L)
    catalog.DeltaWrite.write(Seq((2000L, 6000L)).toDF("id", "v"), path)
    (0L to 4L).foreach { v =>
      val f = new java.io.File(path, f"_delta_log/$v%020d.json")
      assert(f.delete(), s"commit $v missing")
    }
    val replayed = catalog.DeltaRead.readTable(spark, path)
    assert(replayed.count() == expectIds.length + 1)
    assert(replayed.filter($"id" === 2000L).count() == 1)
  }

  test("v2 UUID checkpoint: self-written manifest+sidecar replays with the JSON prefix deleted") {
    val path = fresh("cp_v2")
    val base = (1L to 400L).toDF("id").withColumn("v", $"id" * 7)
    catalog.DeltaWrite.write(base.filter($"id" <= 200), path)
    catalog.DeltaWrite.write(base.filter($"id" > 200), path)
    // a live deletion vector must survive the checkpoint round-trip
    catalog.DeltaWrite.deleteWhere(spark, path, col("id") % 4 === 0)
    val expectIds = (1L to 400L).filter(_ % 4 != 0)
    val cp = catalog.DeltaWrite.checkpointV2(spark, path)
    assert(cp == 2L)
    // the layout is the v2 shape: UUID json manifest + _sidecars parquet
    val logDir = new java.io.File(path, "_delta_log")
    val manifest = logDir.listFiles().filter(_.getName.matches(
      "\\d{20}\\.checkpoint\\.[0-9a-f-]{36}\\.json"))
    assert(manifest.length == 1, logDir.listFiles().map(_.getName).mkString(","))
    assert(new java.io.File(logDir, "_sidecars").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    // a later commit rides the JSON suffix; then log-clean the prefix
    catalog.DeltaWrite.write(Seq((9000L, 1L)).toDF("id", "v"), path)
    (0L to 2L).foreach { v =>
      val f = new java.io.File(path, f"_delta_log/$v%020d.json")
      assert(f.delete(), s"commit $v missing")
    }
    val replayed = catalog.DeltaRead.readTable(spark, path)
    assert(replayed.count() == expectIds.length + 1)
    assert(replayed.filter($"id" === 9000L).count() == 1)
    assert(replayed.filter($"id" % 4 === 0 && $"id" =!= 9000L).count() == 0)
    assert(replayed.agg(sum($"id")).head().getLong(0) == expectIds.sum + 9000L)
  }

  test("CALL delta_optimize / delta_checkpoint from SQL text") {
    val path = fresh("call_optcp")
    catalog.DeltaWrite.write((1L to 50L).toDF("id"), path)
    catalog.DeltaWrite.write((51L to 90L).toDF("id"), path)
    val v = sqlx.TrinoDialect.sql(spark, sfDir,
      s"CALL system.delta_optimize('$path')").head().getLong(0)
    assert(v == 2L)
    val cp = sqlx.TrinoDialect.sql(spark, sfDir,
      s"CALL system.delta_checkpoint('$path')").head().getLong(0)
    assert(cp == 2L)
    assert(new java.io.File(path, "_delta_log/_last_checkpoint").isFile)
    assert(catalog.DeltaRead.readTable(spark, path).count() == 90)
  }

  test("CALL delta_delete / iceberg_delete from SQL text") {
    val dpath = fresh("call_dv")
    catalog.DeltaWrite.write((1L to 30L).toDF("id"), dpath)
    val ver = sqlx.TrinoDialect.sql(spark, sfDir,
      s"CALL system.delta_delete('$dpath', 'id % 3 = 0')").head().getLong(0)
    assert(ver == 1L)
    assert(catalog.DeltaRead.readTable(spark, dpath).count() == 20)

    val ipath = fresh("call_pos")
    catalog.IcebergWrite.write((1L to 30L).toDF("id"), ipath)
    val snap = sqlx.TrinoDialect.sql(spark, sfDir,
      s"CALL system.iceberg_delete('$ipath', 'id % 3 = 0')").head().getLong(0)
    assert(snap == 2L)
    assert(catalog.IcebergRead.readTable(spark, ipath).count() == 20)
  }
}
