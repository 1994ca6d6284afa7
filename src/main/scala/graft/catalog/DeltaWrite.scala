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
    * mapping-mode-none tables (general DML lives on CowTable).
    *
    * Scale note: the matched (file, position) set is driver-collected to
    * build the bitmaps — bounded by the DELETED row count, the same state
    * any DV writer materializes per file. */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.col
    val (schema, adds) = DeltaRead.activeAdds(spark, tablePath)
    val root = new File(tablePath)
    val byPath: Map[String, Option[DeltaDeletionVectors.Descriptor]] =
      adds.map(a => a._1 -> a._3).toMap
    val absOf: Map[String, String] =
      adds.map(a => new File(root, a._1).getAbsolutePath -> a._1).toMap

    val matched = spark.read.schema(schema)
      .parquet(adds.map(a => new File(root, a._1).getAbsolutePath): _*)
      .withColumn("_fp", col("_metadata.file_path"))
      .withColumn("_pos", col("_metadata.row_index"))
      .filter(predicate)
      .select("_fp", "_pos").collect()
      .map(r => (r.getString(0).replaceFirst("^file:/*", "/"), r.getLong(1)))
      .groupBy(_._1).map { case (fp, ps) => fp -> ps.map(_._2).sorted }

    if (matched.isEmpty) return -1L // nothing to delete, no commit

    val logDir = new File(root, "_delta_log")
    val version = nextVersion(logDir)
    val actions = matched.toSeq.sortBy(_._1).map { case (absFp, positions) =>
      val rel = absOf.getOrElse(absFp,
        throw new IllegalStateException(s"matched file not in the live set: $absFp"))
      // union with an existing vector: a second delete must not lose the first
      val existing = byPath(rel).map(d => DeltaDeletionVectors.read(tablePath, d))
        .getOrElse(Array.empty[Long])
      val merged = (existing ++ positions).distinct.sorted
      val d = DeltaDeletionVectors.writeUuidFile(tablePath, merged)
      s"""{"add":{"path":${q(rel)},"partitionValues":{},"size":1,""" +
        s""""modificationTime":${System.currentTimeMillis()},"dataChange":false,""" +
        s""""deletionVector":{"storageType":${q(d.storageType)},""" +
        s""""pathOrInlineDv":${q(d.pathOrInlineDv)},"offset":${d.offset.get},""" +
        s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}"""
    }
    val protocol =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""
    Files.write(
      Paths.get(logDir.getAbsolutePath, f"$version%020d.json"),
      (protocol +: actions).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    version
  }

  private def q(str: String): String =
    "\"" + str.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
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

    // distributed data write into a stage dir, then table-relative moves
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
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      (relPath, pv, dest.length())
    }
    deleteTree(stage)

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

  /** Row-level UPDATE composed from the protocol primitives: matching rows
    * are re-written with the SET expressions applied and appended as a new
    * file, and the originals are marked deleted in the SAME deletion-vector
    * pass — two commits (delete, append), never a table rewrite. Returns
    * the append version, or -1 when nothing matched. */
  def updateWhere(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column]): Long = {
    val current = DeltaRead.readTable(spark, tablePath)
    // SET expressions can widen types (decimal + int, for one); the
    // appended rows must match the table schema exactly
    val updated = sets.foldLeft(current.filter(predicate)) {
      case (df, (c, e)) => df.withColumn(c, e)
    }.select(current.schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)).toIndexedSeq: _*)
    // materialize the new rows BEFORE the delete commit flips visibility
    val rows = updated.collect()
    if (rows.isEmpty) return -1L
    val snapshot = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), updated.schema)
    deleteWhere(spark, tablePath, predicate)
    write(snapshot, tablePath)
  }
}
