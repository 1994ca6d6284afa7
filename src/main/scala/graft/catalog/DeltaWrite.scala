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
  * Supported subset (documented): minReaderVersion 1 / minWriterVersion 2
  * features only — append-mode add actions, Spark-schema JSON metadata,
  * hive-style partition values. No checkpointing (readers replay the JSON
  * suffix; [[DeltaRead]] accepts logs without a checkpoint), no
  * remove-action rewrites (DELETE/UPDATE stay with CowTable). */
object DeltaWrite {

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
}
