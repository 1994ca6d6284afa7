package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta Lake WRITE path over the open protocol (the producer half of
  * [[DeltaRead]]; reference plugin/trino-delta-lake writes the same action
  * JSON through its TransactionLogWriter): CREATE (CTAS) and APPEND commits
  * on an optionally partitioned table, emitting `_delta_log/NNN.json` files
  * any Delta reader replays.
  *
  * Commit protocol: data files are written DISTRIBUTED by Spark's parquet
  * writer into a staging directory, moved to their table-relative names,
  * and the commit JSON (protocol + metaData on version 0, one `add` per
  * file with its partitionValues) is written LAST — readers only see files
  * the log names, and a crash before the JSON write leaves only invisible
  * orphans (the same visibility rule the reference's writer relies on).
  * Commit atomicity is CREATE_NEW on the version file: two racing writers
  * cannot both claim version N (optimistic concurrency, loudly failing the
  * loser rather than corrupting the log).
  *
  * Supported subset (documented): append commits at protocol 1/2,
  * Spark-schema JSON metadata, hive-style partition values; row-level
  * DELETE/UPDATE via [[deleteWhere]]/[[updateWhere]] deletion vectors
  * (protocol 3/7 upgrade). No checkpointing (readers replay the JSON
  * suffix; [[DeltaRead]] accepts logs without a checkpoint). */
object DeltaWrite {

  /** Row-level DELETE via deletion vectors (the modern Delta DELETE that
    * rewrites no data): rows matching the predicate are marked in per-file
    * roaring bitmaps ('u'-type files, Z85-named), each touched file is
    * re-added with its descriptor (merged with any existing vector — a
    * second delete unions positions), and the commit carries the
    * v3/deletionVectors protocol upgrade. Supported subset: unpartitioned,
    * mapping-mode-none tables — ENFORCED loudly below, because on a
    * partitioned table the re-add would null partition values and on a
    * column-mapped table the predicate would see physical columns (general
    * DML lives on CowTable).
    *
    * Scale: the bitmaps are built ON EXECUTORS (one shuffle keyed by file,
    * existing vectors unioned executor-side); the driver collects only the
    * per-file compressed bitmap bytes + descriptors, never row positions. */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val actions = dvReAddActions(spark, tablePath, predicate)
    if (actions.isEmpty) return -1L // nothing to delete, no commit
    val logDir = new File(new File(tablePath), "_delta_log")
    val version = nextVersion(logDir)
    Files.write(
      Paths.get(logDir.getAbsolutePath, f"$version%020d.json"),
      (dvProtocol +: actions).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    version
  }

  private val dvProtocol: String =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""

  /** Distributed deletion-vector build: returns one re-add action per file
    * holding matched rows (empty when the predicate matches nothing).
    * One Spark job: scan live files, filter, shuffle (file → positions),
    * encode the merged roaring bitmap per file on the executor. */
  private def dvReAddActions(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, predicate: org.apache.spark.sql.Column): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val st = DeltaRead.replayState(spark, tablePath)
    require(st.partCols.isEmpty,
      "deletion-vector DML on a PARTITIONED Delta table is not supported by this " +
        "writer (the re-add would need per-file partitionValues; use CowTable DML)")
    require(st.columnMappingMode == "none",
      s"deletion-vector DML on a column-mapped Delta table (mode '${st.columnMappingMode}') " +
        "is not supported by this writer: the predicate would be evaluated against " +
        "physical parquet columns")
    val schema = org.apache.spark.sql.types.DataType.fromJson(st.schemaJson.getOrElse(
      throw new IllegalArgumentException("Delta log has no metaData action")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val adds = st.active.values.toSeq
    if (adds.isEmpty) return Seq.empty
    val root = new File(tablePath)
    val rootAbs = root.getAbsolutePath
    val dvByRel = adds.map(a => a.path -> a.dv).toMap
    val dvB = spark.sparkContext.broadcast(dvByRel)
    val tp = tablePath

    import spark.implicits._
    // (rel path, portable bitmap bytes, merged cardinality) per touched file
    val perFile: Array[(String, Array[Byte], Long)] = spark.read.schema(schema)
      .parquet(adds.map(a => new File(root, a.path).getAbsolutePath): _*)
      .withColumn("_fp", col("_metadata.file_path"))
      .withColumn("_pos", col("_metadata.row_index"))
      .filter(predicate)
      .select(col("_fp"), col("_pos")).as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (fp, rows) =>
        val abs = fp.replaceFirst("^file:/*", "/")
        val rel = abs.stripPrefix(rootAbs).stripPrefix("/")
        // union with an existing vector ON THE EXECUTOR: a second delete
        // must not lose the first
        val existing = dvB.value.getOrElse(rel, None)
          .map(d => DeltaDeletionVectors.read(tp, d)).getOrElse(Array.empty[Long])
        val merged = (existing ++ rows.map(_._2)).distinct.sorted
        (rel, DeltaDeletionVectors.encodePortable(merged), merged.length.toLong)
      }.collect()

    perFile.toSeq.sortBy(_._1).map { case (rel, bytes, cardinality) =>
      require(dvByRel.contains(rel),
        s"matched file not in the live set: $rel")
      val d = DeltaDeletionVectors.writeUuidBytes(tablePath, bytes, cardinality)
      val dataFile = new File(root, rel)
      s"""{"add":{"path":${q(rel)},"partitionValues":{},"size":${dataFile.length()},""" +
        s""""modificationTime":${System.currentTimeMillis()},"dataChange":false,""" +
        s""""deletionVector":{"storageType":${q(d.storageType)},""" +
        s""""pathOrInlineDv":${q(d.pathOrInlineDv)},"offset":${d.offset.get},""" +
        s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}"""
    }
  }

  private def q(str: String): String =
    "\"" + str.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
  }

  /** Distributed data write into a stage dir under the table root, then
    * table-relative renames; returns (relPath, partitionValues, size) per
    * data file. Files moved here are INVISIBLE until a commit names them —
    * a crash leaves only orphans (the visibility rule every Delta writer
    * relies on). */
  private def stageDataFiles(df: DataFrame, root: File, version: Long,
      partitionBy: Seq[String]): Seq[(String, Map[String, String], Long)] = {
    val stage = new File(root, s"_stage_v$version")
    deleteTree(stage)
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(stage.getAbsolutePath)

    def partFiles(dir: File, rel: String): Seq[(String, File)] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory && f.getName.contains("="))
          partFiles(f, if (rel.isEmpty) f.getName else s"$rel/${f.getName}")
        else if (f.getName.endsWith(".parquet")) Seq((rel, f))
        else Seq.empty
      }

    val moved = partFiles(stage, "").zipWithIndex.map { case ((rel, f), i) =>
      val name = f"part-$version%05d-$i%05d.parquet"
      val relPath = if (rel.isEmpty) name else s"$rel/$name"
      val dest = new File(root, relPath)
      dest.getParentFile.mkdirs()
      Files.move(f.toPath, dest.toPath)
      // partition values from the hive-style path segments
      val pv = rel.split("/").filter(_.contains("=")).map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k -> PathCodec.unescape(v)
      }.toMap
      (relPath, pv, dest.length())
    }
    deleteTree(stage)
    moved
  }

  private def nextVersion(logDir: File): Long =
    Option(logDir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong)
      .sorted.lastOption.map(_ + 1).getOrElse(0L)

  /** Write one commit: stages the dataframe as parquet, moves the part
    * files under the table, appends the action JSON. Returns the committed
    * version. */
  def write(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Seq.empty,
      expectedVersion: Option[Long] = None): Long = {
    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    logDir.mkdirs()
    // optimistic concurrency: a caller that read at version V commits V+1
    // explicitly; if a competitor won the version, CREATE_NEW below fails
    // loudly instead of silently skipping ahead
    val version = expectedVersion.getOrElse(nextVersion(logDir))
    if (version > 0L) {
      // APPEND: the incoming frame must match the table's recorded schema
      // and partitioning — a mismatch would silently null columns on read
      val st = DeltaRead.replayState(df.sparkSession, tablePath)
      val existing = org.apache.spark.sql.types.DataType.fromJson(
        st.schemaJson.getOrElse(throw new IllegalArgumentException(
          s"append to $tablePath: log has no metaData action")))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val incoming = df.schema
      require(incoming.fields.map(f => (f.name, f.dataType)).toSeq ==
          existing.fields.map(f => (f.name, f.dataType)).toSeq,
        s"append schema mismatch for $tablePath:\n  table:    ${existing.simpleString}\n" +
          s"  incoming: ${incoming.simpleString}")
      require(partitionBy == st.partCols,
        s"append partitioning mismatch for $tablePath: table is partitioned by " +
          s"${st.partCols.mkString("[", ",", "]")}, append asked for " +
          s"${partitionBy.mkString("[", ",", "]")}")
    }
    val moved = stageDataFiles(df, root, version, partitionBy)

    val now = System.currentTimeMillis()
    val header: Seq[String] =
      if (version == 0L) {
        val dataSchema = df.schema // full schema incl. partition cols
        Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          s"""{"metaData":{"id":${q(java.util.UUID.randomUUID().toString)},""" +
            s""""format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":${q(dataSchema.json)},""" +
            s""""partitionColumns":[${partitionBy.map(q).mkString(",")}],""" +
            s""""configuration":{},"createdTime":$now}}""")
      } else Seq.empty
    val adds = moved.map { case (rel, pv, sz) =>
      val pvJson = pv.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString(",")
      s"""{"add":{"path":${q(rel)},"partitionValues":{$pvJson},""" +
        s""""size":$sz,"modificationTime":$now,"dataChange":true}}"""
    }
    // CREATE_NEW: the loser of a version race fails loudly
    Files.write(
      Paths.get(logDir.getAbsolutePath, f"$version%020d.json"),
      (header ++ adds).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    version
  }

  /** Write a CLASSIC parquet checkpoint of the current state (reference
    * plugin/trino-delta-lake/.../checkpoint/CheckpointWriter shape): one
    * row per action in columnar form — protocol, metaData (the table's
    * LAST metaData action replayed verbatim from the JSON log), and one
    * `add` per live file — then `_last_checkpoint` naming it. Readers
    * (including [[DeltaRead]]) replay checkpoint state + the JSON suffix
    * only, so log growth stops costing read time.
    *
    * Live adds carrying deletion vectors checkpoint WITH their descriptor
    * struct, replayed by [[DeltaRead]] exactly like JSON-commit vectors.
    * The action rows are driver-built — bounded by file-count metadata,
    * the state every checkpoint writer materializes. */
  def checkpoint(spark: org.apache.spark.sql.SparkSession, tablePath: String): Long = {
    import org.apache.spark.sql.types._
    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    val st = DeltaRead.replayState(spark, tablePath)
    val version = nextVersion(logDir) - 1
    require(version >= 0, s"no commits to checkpoint at $tablePath")

    // replay the raw JSON for the last protocol/metaData action objects, so
    // the checkpoint carries them verbatim (id, createdTime, configuration)
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    var lastMeta: Option[JValue] = None
    var lastProto: Option[JValue] = None
    Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.json")).sortBy(_.getName)
      .foreach { vf =>
        java.nio.file.Files.readAllLines(vf.toPath, StandardCharsets.UTF_8)
          .forEach { line =>
            if (line.trim.nonEmpty) {
              val j = JsonMethods.parse(line)
              (j \ "metaData") match { case m: JObject => lastMeta = Some(m); case _ => }
              (j \ "protocol") match { case p: JObject => lastProto = Some(p); case _ => }
            }
          }
      }
    val meta = lastMeta.getOrElse(
      throw new IllegalArgumentException(s"$tablePath has no metaData action"))
    def js(v: JValue, field: String): Option[String] = (v \ field) match {
      case JString(s0) => Some(s0); case _ => None
    }
    def ji(v: JValue, field: String, dflt: Int): Int = (v \ field) match {
      case JInt(i) => i.toInt; case _ => dflt
    }

    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", dvType)))
    val cpSchema = StructType(Seq(
      StructField("protocol", protoType),
      StructField("metaData", metaType),
      StructField("add", addType)))

    import org.apache.spark.sql.Row
    val protoRow = Row(Row(
      lastProto.map(ji(_, "minReaderVersion", 1)).getOrElse(1),
      lastProto.map(ji(_, "minWriterVersion", 2)).getOrElse(2)), null, null)
    val configuration: Map[String, String] = (meta \ "configuration") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
    val metaRow = Row(null, Row(
      js(meta, "id").getOrElse(java.util.UUID.nameUUIDFromBytes(
        tablePath.getBytes(StandardCharsets.UTF_8)).toString),
      Row("parquet", Map.empty[String, String]),
      st.schemaJson.orNull,
      st.partCols,
      configuration,
      (meta \ "createdTime") match { case JInt(t) => t.toLong; case _ => 0L }), null)
    val addRows = st.active.values.toSeq.map { a =>
      val f = new File(root, a.path)
      val dvRow = a.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
        d.offset.map(Integer.valueOf).orNull, d.sizeInBytes, d.cardinality)).orNull
      Row(null, null, Row(a.path, a.partitionValues, f.length(),
        f.lastModified(), false, dvRow))
    }

    val rows = protoRow +: metaRow +: addRows
    val cpDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), cpSchema).coalesce(1)
    val stage = new File(root, s"_stage_cp$version")
    deleteTree(stage)
    cpDf.write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = Option(stage.listFiles()).getOrElse(Array.empty)
      .find(_.getName.endsWith(".parquet")).getOrElse(
        throw new IllegalStateException("checkpoint stage produced no parquet"))
    Files.move(part.toPath,
      Paths.get(logDir.getAbsolutePath, f"$version%020d.checkpoint.parquet"))
    deleteTree(stage)
    // _last_checkpoint LAST: readers only trust a checkpoint it names
    Files.write(Paths.get(logDir.getAbsolutePath, "_last_checkpoint"),
      s"""{"version":$version,"size":${rows.length}}"""
        .getBytes(StandardCharsets.UTF_8))
    version
  }

  /** Write a V2 (UUID) checkpoint (reference plugin/trino-delta-lake
    * checkpoint writer's v2 counterpart; the read half —
    * [[DeltaRead]].applyV2Checkpoint — is validated against
    * Databricks-written fixtures): file actions go to a SIDECAR parquet
    * under `_delta_log/_sidecars/<uuid>.parquet`, the manifest
    * `N.checkpoint.<uuid>.json` carries the protocol/metaData lines plus
    * one `sidecar` action per sidecar file, and `_last_checkpoint` names
    * the manifest through its `v2Checkpoint` pointer. After this, readers
    * replay manifest + sidecars + JSON suffix — the version-0 JSON prefix
    * can be log-cleaned away. */
  def checkpointV2(spark: org.apache.spark.sql.SparkSession, tablePath: String): Long = {
    import org.apache.spark.sql.types._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    val st = DeltaRead.replayState(spark, tablePath)
    val version = nextVersion(logDir) - 1
    require(version >= 0, s"no commits to checkpoint at $tablePath")

    // last protocol/metaData actions verbatim from the JSON log
    var lastMeta: Option[JValue] = None
    var lastProto: Option[JValue] = None
    Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.json")).sortBy(_.getName)
      .foreach { vf =>
        java.nio.file.Files.readAllLines(vf.toPath, StandardCharsets.UTF_8)
          .forEach { line =>
            if (line.trim.nonEmpty) {
              val j = JsonMethods.parse(line)
              (j \ "metaData") match { case m: JObject => lastMeta = Some(m); case _ => }
              (j \ "protocol") match { case p: JObject => lastProto = Some(p); case _ => }
            }
          }
      }
    val meta = lastMeta.getOrElse(
      throw new IllegalArgumentException(s"$tablePath has no metaData action"))
    val proto = lastProto.getOrElse(JsonMethods.parse(
      """{"minReaderVersion":1,"minWriterVersion":2}"""))

    // ---- sidecar parquet: the file actions (add rows incl. DV structs)
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", dvType)))
    val sidecarSchema = StructType(Seq(StructField("add", addType)))
    import org.apache.spark.sql.Row
    val addRows = st.active.values.toSeq.map { a =>
      val f = new File(root, a.path)
      val dvRow = a.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
        d.offset.map(Integer.valueOf).orNull, d.sizeInBytes, d.cardinality)).orNull
      Row(Row(a.path, a.partitionValues, f.length(), f.lastModified(), false, dvRow))
    }
    val stage = new File(root, s"_stage_cpv2_$version")
    deleteTree(stage)
    spark.createDataFrame(java.util.Arrays.asList(addRows: _*), sidecarSchema)
      .coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = Option(stage.listFiles()).getOrElse(Array.empty)
      .find(_.getName.endsWith(".parquet")).getOrElse(
        throw new IllegalStateException("v2 checkpoint stage produced no parquet"))
    val sidecarName = s"${java.util.UUID.nameUUIDFromBytes(
      (tablePath + "#" + version).getBytes(StandardCharsets.UTF_8))}.parquet"
    val sidecarDir = new File(logDir, "_sidecars")
    sidecarDir.mkdirs()
    val sidecarFile = new File(sidecarDir, sidecarName)
    Files.move(part.toPath, sidecarFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteTree(stage)

    // ---- json manifest: protocol + metaData + sidecar action lines
    def line(field: String, v: JValue): String =
      JsonMethods.compact(JsonMethods.render(JObject(field -> v)))
    val manifestUuid = java.util.UUID.nameUUIDFromBytes(
      (tablePath + "#manifest#" + version).getBytes(StandardCharsets.UTF_8))
    val manifestName = f"$version%020d.checkpoint.$manifestUuid.json"
    val manifestLines = Seq(
      line("protocol", proto),
      line("metaData", meta),
      line("sidecar", JObject(
        "path" -> JString(sidecarName),
        "sizeInBytes" -> JInt(BigInt(sidecarFile.length())),
        "modificationTime" -> JInt(BigInt(sidecarFile.lastModified())))))
    Files.write(Paths.get(logDir.getAbsolutePath, manifestName),
      (manifestLines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))

    // _last_checkpoint LAST: readers only trust a checkpoint it names
    Files.write(Paths.get(logDir.getAbsolutePath, "_last_checkpoint"),
      (s"""{"version":$version,"size":${addRows.length + 2},""" +
        s""""v2Checkpoint":{"path":"$manifestName"}}""")
        .getBytes(StandardCharsets.UTF_8))
    version
  }

  /** OPTIMIZE on the open format (the reference's ALTER TABLE EXECUTE
    * optimize / bin-packing compaction): rewrites the live state into
    * `targetFiles` compacted data files, MATERIALIZING deletion vectors
    * (deleted rows vanish physically), and commits one log entry of
    * `remove` tombstones for every old file plus the new adds with
    * dataChange=false. Data movement is fully distributed. Supported
    * subset: unpartitioned, mapping-mode-none tables. */
  def optimize(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      targetFiles: Int = 1): Long = {
    val st = DeltaRead.replayState(spark, tablePath)
    require(st.partCols.isEmpty,
      "optimize on a partitioned Delta table is not supported by this writer")
    require(st.columnMappingMode == "none",
      "optimize on a column-mapped Delta table is not supported by this writer")
    val oldAdds = st.active.values.toSeq
    require(oldAdds.nonEmpty, s"optimize of $tablePath: no live files")
    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    val version = nextVersion(logDir)
    val now = System.currentTimeMillis()
    val compacted = DeltaRead.readTable(spark, tablePath)
      .repartition(math.max(1, targetFiles))
    val adds = stageDataFiles(compacted, root, version, Seq.empty)
      .map { case (rel, _, sz) =>
        s"""{"add":{"path":${q(rel)},"partitionValues":{},"size":$sz,""" +
          s""""modificationTime":$now,"dataChange":false}}"""
      }
    val removes = oldAdds.map { a =>
      s"""{"remove":{"path":${q(a.path)},"deletionTimestamp":$now,""" +
        s""""dataChange":false}}"""
    }
    Files.write(
      Paths.get(logDir.getAbsolutePath, f"$version%020d.json"),
      (removes ++ adds).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    version
  }

  /** Row-level UPDATE composed from the protocol primitives in ONE commit:
    * matching rows are re-written with the SET expressions applied and
    * staged as new data files (distributed — the driver never materializes
    * rows), the originals are marked deleted via executor-built deletion
    * vectors, and a single log entry carries both the DV re-adds and the
    * new-file adds — a reader sees either the old rows or the new, never
    * both/neither. Returns the commit version, or -1 when nothing matched. */
  def updateWhere(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column]): Long = {
    // DV pass first: both jobs read the PRE-commit snapshot; empty ⇒ no-op
    val dvActions = dvReAddActions(spark, tablePath, predicate)
    if (dvActions.isEmpty) return -1L

    val current = DeltaRead.readTable(spark, tablePath)
    // SET expressions can widen types (decimal + int, for one); the
    // appended rows must match the table schema exactly
    val updated = sets.foldLeft(current.filter(predicate)) {
      case (df, (c, e)) => df.withColumn(c, e)
    }.select(current.schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)).toIndexedSeq: _*)

    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    val version = nextVersion(logDir)
    // distributed staging: invisible until the commit JSON below names them
    val now = System.currentTimeMillis()
    val addActions = stageDataFiles(updated, root, version, Seq.empty)
      .map { case (rel, pv, sz) =>
        val pvJson = pv.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString(",")
        s"""{"add":{"path":${q(rel)},"partitionValues":{$pvJson},""" +
          s""""size":$sz,"modificationTime":$now,"dataChange":true}}"""
      }
    Files.write(
      Paths.get(logDir.getAbsolutePath, f"$version%020d.json"),
      (dvProtocol +: (dvActions ++ addActions)).mkString("\n")
        .getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    version
  }
}
