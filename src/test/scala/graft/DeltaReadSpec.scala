package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Protocol-level spec for graft.catalog.DeltaRead: a hand-authored Delta
  * log (the public delta-io protocol) must replay adds/removes correctly,
  * attach typed partition values, and refuse the unsupported features
  * loudly instead of misreading. */
class DeltaReadSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(name: String): File = {
    val root = new File(System.getProperty("java.io.tmpdir"), s"graft_deltaspec_$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    new File(root, "_delta_log").mkdirs()
    root
  }

  private def writeParquet(root: File, rel: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = new File(root, "_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(root, rel)
    dest.getParentFile.mkdirs()
    Files.move(part.toPath, dest.toPath)
  }

  private def commit(root: File, version: Int, lines: Seq[String]): Unit =
    Files.write(Paths.get(root.getAbsolutePath, "_delta_log", f"$version%020d.json"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  test("delta log replay: remove supersedes add, partition values typed") {
    val root = newTable("basic")
    val data = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 20)).toDF("id", "name", "bucket")
    val schemaJson = data.schema.json.replace("\"", "\\\"")
    writeParquet(root, "bucket=10/f0.parquet",
      data.filter($"bucket" === 10).drop("bucket"))
    writeParquet(root, "bucket=20/f1.parquet",
      data.filter($"bucket" === 20).drop("bucket"))
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["bucket"],"configuration":{}}}""",
      """{"add":{"path":"bucket=10/f0.parquet","partitionValues":{"bucket":"10"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"bucket=20/f1.parquet","partitionValues":{"bucket":"20"},"size":1,"modificationTime":0,"dataChange":true}}"""))
    // v1: delete row id=1 by rewriting bucket=10's file
    writeParquet(root, "bucket=10/f2.parquet",
      data.filter($"bucket" === 10 && $"id" =!= 1).drop("bucket"))
    commit(root, 1, Seq(
      """{"remove":{"path":"bucket=10/f0.parquet","dataChange":true}}""",
      """{"add":{"path":"bucket=10/f2.parquet","partitionValues":{"bucket":"10"},"size":1,"modificationTime":0,"dataChange":true}}"""))

    val df = catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "bucket"))
    assert(df.schema("bucket").dataType.typeName == "integer") // typed from schemaString
    val rows = df.orderBy($"id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L)) // id=1 removed with its file
    assert(rows.map(_.getInt(2)).toSeq == Seq(10, 20))
    // filter on the partition column folds each group's literal → only the
    // matching group's files survive in the plan
    assert(df.filter($"bucket" === 20).collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("unsupported protocol features fail loudly") {
    val root = newTable("unsupported")
    intercept[IllegalArgumentException] { // no log at all
      catalog.DeltaRead.readTable(spark, root.getAbsolutePath + "_nope")
    }
    commit(root, 0, Seq("""{"protocol":{"minReaderVersion":1}}"""))
    intercept[IllegalArgumentException] { // no metaData action
      catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
    }
    Files.write(Paths.get(root.getAbsolutePath, "_delta_log",
      "00000000000000000000.checkpoint.parquet"), Array.emptyByteArray)
    intercept[IllegalArgumentException] { // checkpoints unsupported
      catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
    }
    // an UNKNOWN column mapping mode → refuse
    val cm = newTable("colmap")
    commit(cm, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":5}}""",
      """{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"banana"}}}"""))
    val e = intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, cm.getAbsolutePath)
    }
    assert(e.getMessage.contains("column mapping"))
    // reader version 3 with a feature we do not implement → refuse
    // (v2Checkpoint used to be the example here; it is now implemented)
    val dv = newTable("dvfeat")
    commit(dv, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"]}}"""))
    val e2 = intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, dv.getAbsolutePath)
    }
    assert(e2.getMessage.contains("typeWidening"))
  }

  test("column mapping mode 'id': parquet field ids resolve regardless of names") {
    import org.apache.spark.sql.types._
    val root = newTable("mapid")
    // parquet physical names differ from BOTH the logical names and the
    // recorded physicalName — only the field ids (7, 9) can match
    val writeSchema = StructType(Seq(
      StructField("px", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 7).build()),
      StructField("py", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 9).build())))
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, "a"), org.apache.spark.sql.Row(2L, "b")),
      writeSchema)
    writeParquet(root, "part-0.parquet", df)
    val schemaJson =
      """{\"type\":\"struct\",\"fields\":[
         {\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":7,\"delta.columnMapping.physicalName\":\"col-xyz\"}},
         {\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":9,\"delta.columnMapping.physicalName\":\"col-qrs\"}}]}"""
        .replaceAll("\\n\\s*", "")
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id"}}}""",
      """{"add":{"path":"part-0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val got = catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
    assert(got.columns.toSeq == Seq("k", "v"))
    assert(got.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("column mapping mode 'name': physical parquet names project to logical") {
    val root = newTable("colmap_name")
    // physical file columns col_aa / col_bb; logical schema id / name
    val phys = Seq((1L, "x"), (2L, "y")).toDF("col_aa", "col_bb")
    writeParquet(root, "f0.parquet", phys)
    val schemaJson =
      """{\"type\":\"struct\",\"fields\":[
         {\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":1,\"delta.columnMapping.physicalName\":\"col_aa\"}},
         {\"name\":\"name\",\"type\":\"string\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":2,\"delta.columnMapping.physicalName\":\"col_bb\"}}]}"""
        .replaceAll("\\n\\s*", "")
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val got = catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
    assert(got.schema.fieldNames.toSeq === Seq("id", "name"))
    assert(got.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "y")))
  }

  test("checkpoint artifacts, cleaned logs, and reader features all refuse") {
    def freshWithMeta(name: String, startVersion: Int = 0): File = {
      val t = newTable(name)
      commit(t, startVersion, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        """{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{}}}"""))
      t
    }
    // multi-part checkpoint (N.checkpoint.i.of.parquet)
    val mp = freshWithMeta("multipart_ckpt")
    Files.write(Paths.get(mp.getAbsolutePath, "_delta_log",
      "00000000000000000000.checkpoint.0000000001.0000000002.parquet"), Array.emptyByteArray)
    val e1 = intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, mp.getAbsolutePath)
    }
    assert(e1.getMessage.contains("checkpoint"))
    // v2 checkpoint (N.checkpoint.<uuid>.json)
    val v2 = freshWithMeta("v2_ckpt")
    Files.write(Paths.get(v2.getAbsolutePath, "_delta_log",
      "00000000000000000000.checkpoint.80a083e8.json"), Array.emptyByteArray)
    assert(intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, v2.getAbsolutePath)
    }.getMessage.contains("checkpoint"))
    // _last_checkpoint pointer alone (checkpoint file itself already cleaned)
    val lc = freshWithMeta("last_ckpt")
    Files.write(Paths.get(lc.getAbsolutePath, "_delta_log", "_last_checkpoint"),
      """{"version":0,"size":1}""".getBytes(StandardCharsets.UTF_8))
    assert(intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, lc.getAbsolutePath)
    }.getMessage.contains("checkpoint"))
    // log-cleaned table: JSON sequence starts after version 0
    val cleaned = freshWithMeta("cleaned", startVersion = 3)
    assert(intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, cleaned.getAbsolutePath)
    }.getMessage.contains("version 0"))
    // gap in the middle of the sequence
    val gapped = freshWithMeta("gapped")
    commit(gapped, 2, Seq("""{"commitInfo":{}}"""))
    assert(intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, gapped.getAbsolutePath)
    }.getMessage.contains("gap"))
    // reader features beyond the implemented set (deletionVectors and
    // columnMapping are now understood — use one that is not)
    val rf = newTable("readerfeatures")
    commit(rf, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}""",
      """{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{}}}"""))
    val e2 = intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, rf.getAbsolutePath)
    }
    assert(e2.getMessage.contains("timestampNtz"))
  }
  test("parquet checkpoints: state restored, cleaned log prefix, JSON suffix applied") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    def buildCheckpointed(name: String, parts: Option[Int]): File = {
      val root = newTable(name)
      val data = (1L to 9L).map(i => (i, s"r$i")).toDF("id", "name")
      val schemaJson = data.schema.json
      writeParquet(root, "d0.parquet", data.filter($"id" <= 3))
      writeParquet(root, "d1.parquet", data.filter($"id" > 3 && $"id" <= 6))
      writeParquet(root, "d2.parquet", data.filter($"id" > 6))

      // checkpoint at version 1 holding protocol + metaData + adds d0, d1
      val cpSchema = StructType(Seq(
        StructField("protocol", StructType(Seq(
          StructField("minReaderVersion", IntegerType)))),
        StructField("metaData", StructType(Seq(
          StructField("schemaString", StringType),
          StructField("partitionColumns", ArrayType(StringType)),
          StructField("configuration", MapType(StringType, StringType))))),
        StructField("add", StructType(Seq(
          StructField("path", StringType),
          StructField("partitionValues", MapType(StringType, StringType)))))))
      val cpRows = Seq(
        Row(Row(1), null, null),
        Row(null, Row(schemaJson, Seq.empty[String], Map.empty[String, String]), null),
        Row(null, null, Row("d0.parquet", Map.empty[String, String])),
        Row(null, null, Row("d1.parquet", Map.empty[String, String])))
      val cpDf = spark.createDataFrame(
        spark.sparkContext.parallelize(cpRows, 1), cpSchema)
      parts match {
        case None =>
          writeParquet(root, "_delta_log/00000000000000000001.checkpoint.parquet", cpDf)
          Files.write(Paths.get(root.getAbsolutePath, "_delta_log", "_last_checkpoint"),
            """{"version":1,"size":4}""".getBytes(StandardCharsets.UTF_8))
        case Some(p) =>
          writeParquet(root,
            f"_delta_log/00000000000000000001.checkpoint.${1}%010d.$p%010d.parquet",
            cpDf.filter($"add".isNull))
          writeParquet(root,
            f"_delta_log/00000000000000000001.checkpoint.${2}%010d.$p%010d.parquet",
            cpDf.filter($"add".isNotNull))
          Files.write(Paths.get(root.getAbsolutePath, "_delta_log", "_last_checkpoint"),
            s"""{"version":1,"size":4,"parts":$p}""".getBytes(StandardCharsets.UTF_8))
      }
      // the cleaned log has NO JSON at or before the checkpoint version —
      // a reader that needs version 0 cannot read this table at all
      commit(root, 2, Seq(
        """{"add":{"path":"d2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""",
        """{"remove":{"path":"d0.parquet","dataChange":true}}"""))
      root
    }

    for ((name, parts) <- Seq(("cp_single", None), ("cp_multi", Some(2)))) {
      val root = buildCheckpointed(name, parts)
      val got = graft.catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
        .select("id").collect().map(_.getLong(0)).sorted
      // checkpoint contributes d1 (4-6); suffix adds d2 (7-9), removes d0
      assert(got.toSeq === (4L to 9L), s"$name: ${got.toSeq}")
    }

    // a _last_checkpoint pointing at a missing classic file (the v2/UUID
    // layout) still refuses loudly
    val bad = newTable("cp_v2")
    Files.write(Paths.get(bad.getAbsolutePath, "_delta_log", "_last_checkpoint"),
      """{"version":1}""".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(bad.getAbsolutePath, "_delta_log",
      "00000000000000000001.checkpoint.0000aaaa-0000-0000-0000-000000000000.json"),
      "{}".getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      graft.catalog.DeltaRead.readTable(spark, bad.getAbsolutePath)
    }
    assert(e.getMessage.contains("not supported") || e.getMessage.contains("not found"))
  }

  test("deletion vectors: Z85 uuid naming and hand-built roaring payloads decode") {
    // known answer from a Databricks-written table (reference test resource
    // databricks122/deletion_vectors, commit 2's descriptor)
    assert(catalog.DeltaDeletionVectors.uuidFileName("R7QFX3rGXPFLhHGq&7g<") ==
      "deletion_vector_a52eda8c-0a57-4636-814b-9c165388f7ca.bin")

    // bytes hand-assembled from the PUBLIC formats (Delta portable envelope
    // + RoaringFormatSpec), not produced by any writer of ours:
    import java.nio.{ByteBuffer, ByteOrder}
    def payload(roaring: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(16 + roaring.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1681511377).putLong(1L).putInt(0) // magic, 1 bitmap, key 0
      bb.put(roaring)
      bb.array()
    }
    // no-run format: cookie 12346, 1 container, key 0 card 2, offset, [1, 3]
    val arr = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(12346).putInt(1)
      .putShort(0).putShort(1) // key, cardinality-1
      .putInt(16)              // container offset
      .putShort(1).putShort(3).array()
    assert(catalog.DeltaDeletionVectors.decodePortable(payload(arr)).toSeq ==
      Seq(1L, 3L))
    // run format: cookie 12347 | (count-1)<<16, run flag set, run [5, len 3]
    val run = ByteBuffer.allocate(15).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(12347) // 1 container → high 16 bits zero
      .put(1.toByte) // run flag bitset
      .putShort(0).putShort(3) // key, cardinality-1
      .putShort(1)             // one run
      .putShort(5).putShort(3) // start 5, length 3 → 5..8
      .array()
    assert(catalog.DeltaDeletionVectors.decodePortable(payload(run)).toSeq ==
      Seq(5L, 6L, 7L, 8L))
    // second bitmap key shifts by 2^32
    val two = ByteBuffer.allocate(16 + 20 + 4 + 20).order(ByteOrder.LITTLE_ENDIAN)
    two.putInt(1681511377).putLong(2L)
    two.putInt(0).put(arr)
    two.putInt(1).put(arr)
    assert(catalog.DeltaDeletionVectors.decodePortable(two.array()).toSeq ==
      Seq(1L, 3L, (1L << 32) | 1L, (1L << 32) | 3L))
  }

  test("deletion vectors: p-type file applied via position anti-join, superseded by re-add") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.util.zip.CRC32
    val root = newTable("dv")
    val ids = (0L until 10L)
    writeParquet(root, "f1.parquet", ids.toDF("id"))

    def dvFile(name: String, positions: Seq[Int]): (String, Int, Int) = {
      val roaring = ByteBuffer.allocate(16 + 4 * positions.length)
        .order(ByteOrder.LITTLE_ENDIAN)
        .putInt(12346).putInt(1)
        .putShort(0).putShort((positions.length - 1).toShort)
        .putInt(16)
      positions.foreach(v => roaring.putShort(v.toShort))
      val data = ByteBuffer.allocate(16 + roaring.array().length)
        .order(ByteOrder.LITTLE_ENDIAN)
        .putInt(1681511377).putLong(1L).putInt(0).put(roaring.array()).array()
      val crc = new CRC32; crc.update(data)
      val out = ByteBuffer.allocate(1 + 4 + data.length + 4) // BE framing
        .put(1.toByte).putInt(data.length).put(data).putInt(crc.getValue.toInt)
      val f = new File(root, name)
      Files.write(f.toPath, out.array())
      (f.getAbsolutePath, 1, data.length) // offset = after the version byte
    }

    val (dv1, off1, sz1) = dvFile("dv1.bin", Seq(0, 2))
    val schemaJson = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"p","pathOrInlineDv":"$dv1","offset":$off1,"sizeInBytes":$sz1,"cardinality":2}}}"""))
    val got = catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L), s"got $got")

    // a later re-add of the same file with a BIGGER vector supersedes
    val (dv2, off2, sz2) = dvFile("dv2.bin", Seq(0, 1, 2, 3, 4, 5))
    commit(root, 1, Seq(
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":false,"deletionVector":{"storageType":"p","pathOrInlineDv":"$dv2","offset":$off2,"sizeInBytes":$sz2,"cardinality":6}}}"""))
    val got2 = catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(6L, 7L, 8L, 9L), s"got2 $got2")

    // corrupted checksum fails loudly
    val f = new File(root, "dv1.bin")
    val bytes = Files.readAllBytes(f.toPath)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x01).toByte
    Files.write(f.toPath, bytes)
    commit(root, 2, Seq(
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":false,"deletionVector":{"storageType":"p","pathOrInlineDv":"$dv1","offset":$off1,"sizeInBytes":$sz1,"cardinality":2}}}"""))
    val e = intercept[IllegalArgumentException] {
      catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
    }
    assert(e.getMessage.contains("checksum"))
  }

  test("deletion vectors: INLINE 'i' storage decodes the z85 payload directly") {
    val root = newTable("dv_inline")
    writeParquet(root, "f1.parquet", (0L until 10L).toDF("id"))
    // spec: pathOrInlineDv IS the z85 of the portable bitmap (padded to
    // 4-byte groups for the codec; sizeInBytes names the true length)
    val data = catalog.DeltaDeletionVectors.encodePortable(Array(1L, 4L, 7L))
    val padded = data ++ Array.fill[Byte]((4 - data.length % 4) % 4)(0)
    val inline = catalog.DeltaDeletionVectors.z85Encode(padded)
    val schemaJson = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${data.length},"cardinality":3}}}"""))
    val got = catalog.DeltaRead.readTable(spark, root.getAbsolutePath)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 2L, 3L, 5L, 6L, 8L, 9L), s"got $got")
  }

  test("v2 UUID checkpoints: REAL Databricks fixtures (json/parquet/multipart manifests)") {
    // Non-circular validation: checkpoints written by Databricks itself,
    // expected live sets derived by an independent log replay.
    val base = "/root/reference/plugin/trino-delta-lake/src/test/resources/deltalake"
    assume(new File(base).isDirectory, "reference Delta fixtures not present")
    def rows(t: String): Seq[(Int, Int)] =
      catalog.DeltaRead.readTable(spark, s"$base/$t")
        .select("a", "b").collect().map(r => (r.getInt(0), r.getInt(1)))
        .toSeq.sorted
    assert(rows("v2_checkpoint_json") == Seq((1, 2)))
    assert(rows("v2_checkpoint_parquet") == Seq((1, 2)))
    assert(rows("multipart_v2_checkpoint") ==
      Seq((1, 2), (3, 4), (5, 6), (7, 8)))
    assert(rows("v2_checkpoint_parquet_using_temporal") ==
      Seq((1, 2), (3, 4), (5, 6)))
    assert(rows("v2_checkpoint_json_using_temporal") ==
      Seq((1, 2), (3, 4), (5, 6)))
  }
}
