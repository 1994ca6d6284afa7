package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hudi COPY_ON_WRITE write path over the open layout (the producer half
  * of [[HudiRead]]; reference plugin/trino-hudi reads what Hudi's
  * HoodieTableMetaClient/commit timeline writes): CREATE (bulk insert) and
  * UPSERT commits producing the `.hoodie` timeline + FSUtils-named base
  * files any read-optimized Hudi reader resolves.
  *
  * Scale shape: every commit is ONE distributed Spark job regardless of
  * partition count — `partitionBy` on a throwaway directory column stages
  * all partitions at once (the partition column itself stays in the data
  * files, as Hudi keeps it), then the staged files are renamed to FSUtils
  * names driver-side (a metadata-sized loop: one rename per file, no
  * per-partition job, no coalesce(1)). Each staged task file becomes its
  * own file group, so write parallelism is preserved end-to-end.
  *
  * Commit protocol: the instant passes through `.commit.requested` →
  * `.inflight` → `<instant>.commit`, with data files staged and moved
  * BEFORE the completed marker — uncommitted slices stay invisible to
  * timeline-filtering readers, and a crash mid-write leaves an inflight
  * instant whose files never become visible (Hudi's own rollback target).
  * The completed marker is written CREATE_NEW, so an instant collision
  * loses loudly.
  *
  * UPSERT semantics (CoW): a follow-up write REPLACES the file groups of
  * the partitions it touches. It commits as a `<instant>.replacecommit`
  * whose `partitionToReplaceFileIds` lists the shadowed groups — Hudi's
  * own insert_overwrite/clustering mechanism (HoodieReplaceCommitMetadata),
  * which [[HudiRead]] honors by dropping replaced groups from the
  * snapshot view; partitions not present in the upsert keep their
  * current slices.
  *
  * Supported subset: unpartitioned or single-column hive-style `col=value`
  * partitioning, `_hoodie_commit_time` stamped on every row. */
object HudiWrite {

  private def instantNow(seq: Int): String = f"202608140000$seq%02d000"

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
  }

  private def fileIdFor(partition: String, idx: Int, instant: String): String = {
    // fresh file GROUPS per commit (Hudi behavior): an upsert's replacement
    // groups must not collide with the ids its replacecommit retires
    val h = java.util.UUID.nameUUIDFromBytes(
      s"$partition#$idx#$instant".getBytes("UTF-8"))
    s"$h-0"
  }

  /** Write one commit; returns the completed instant. */
  def write(df: DataFrame, tablePath: String,
      partitionBy: Option[String] = None): String = {
    val root = new File(tablePath)
    val hoodie = new File(root, ".hoodie")
    hoodie.mkdirs()
    val props = new File(hoodie, "hoodie.properties")
    if (!props.isFile)
      Files.write(props.toPath,
        ("hoodie.table.name=" + root.getName + "\n" +
          "hoodie.table.type=COPY_ON_WRITE\n").getBytes(StandardCharsets.UTF_8))

    val priorCompleted = Option(hoodie.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => (n.endsWith(".commit") && !n.contains(".commit.")) ||
        (n.endsWith(".replacecommit") && !n.contains(".replacecommit.")))
    val isUpsert = priorCompleted.nonEmpty
    val instant = instantNow(priorCompleted.length)
    val action = if (isUpsert) "replacecommit" else "commit"

    // requested → inflight → (data) → completed
    Files.write(Paths.get(hoodie.getAbsolutePath, s"$instant.$action.requested"),
      Array.emptyByteArray)
    Files.write(Paths.get(hoodie.getAbsolutePath, s"$instant.inflight"),
      Array.emptyByteArray)

    // ---- data: ONE distributed job for all partitions. Hudi keeps the
    // partition column in the data files, so a throwaway duplicate column
    // (__hp) feeds Spark's partitionBy while every file retains the original.
    val stamped = df.withColumn("_hoodie_commit_time", lit(instant))
    val stage = new File(root, s"_stage_$instant")
    deleteTree(stage)
    partitionBy match {
      case None =>
        stamped.write.mode("overwrite").parquet(stage.getAbsolutePath)
      case Some(c) =>
        stamped.withColumn("__hp", col(c)).write.mode("overwrite")
          .partitionBy("__hp").parquet(stage.getAbsolutePath)
    }
    // staged layout: [__hp=v/]part-*.parquet → rename to FSUtils names,
    // one file GROUP per task file (metadata-sized driver loop)
    def stagedFiles(dir: File, part: String): Seq[(String, File)] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory && f.getName.startsWith("__hp="))
          stagedFiles(f, partitionBy.get + "=" + java.net.URLDecoder.decode(
            f.getName.stripPrefix("__hp="), "UTF-8"))
        else if (f.getName.endsWith(".parquet")) Seq((part, f))
        else Seq.empty
      }
    val byPartition = stagedFiles(stage, "").groupBy(_._1)
    byPartition.foreach { case (part, files) =>
      files.map(_._2).sortBy(_.getName).zipWithIndex.foreach { case (pf, idx) =>
        val dest = new File(root,
          (if (part.isEmpty) "" else s"$part/") +
            s"${fileIdFor(part, idx, instant)}_0-0-0_$instant.parquet")
        dest.getParentFile.mkdirs()
        Files.move(pf.toPath, dest.toPath)
      }
    }
    deleteTree(stage)

    // an upsert shadows every group currently VISIBLE in the partitions it
    // touched (replace semantics); the replaced ids are listed in the
    // completed metadata for the reader
    val replaceJson =
      if (!isUpsert) ""
      else {
        val touched = byPartition.keySet
        val replaced = visibleGroups(root).filter { case (part, _) => touched(part) }
        val perPart = replaced.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, ids) =>
          s""""${p}":[${ids.map(_._2).toSeq.sorted.map(i => s""""$i"""").mkString(",")}]"""
        }
        s""""partitionToReplaceFileIds":{${perPart.mkString(",")}},"""
      }
    // completed marker last; CREATE_NEW loses an instant race loudly
    Files.write(Paths.get(hoodie.getAbsolutePath, s"$instant.$action"),
      s"""{"partitionToWriteStats":{},$replaceJson"operationType":"${
        if (isUpsert) "INSERT_OVERWRITE" else "BULK_INSERT"}"}"""
        .getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    instant
  }

  /** (partition, fileId) groups currently visible to a snapshot read:
    * committed base files minus groups already replaced. Driver-side
    * metadata, bounded by file count. */
  private def visibleGroups(root: File): Set[(String, String)] = {
    val hoodie = new File(root, ".hoodie")
    val names = Option(hoodie.listFiles()).getOrElse(Array.empty).map(_.getName)
    val completed = names
      .filter(n => (n.endsWith(".commit") && !n.contains(".commit.")) ||
        (n.endsWith(".replacecommit") && !n.contains(".replacecommit.")))
      .map(_.stripSuffix(".replacecommit").stripSuffix(".commit")).toSet
    val replaced: Set[(String, String)] = names
      .filter(n => n.endsWith(".replacecommit") && !n.contains(".replacecommit."))
      .toSet[String]
      .flatMap { n =>
        HudiRead.parseReplacedFileIds(
          new String(Files.readAllBytes(
            Paths.get(hoodie.getAbsolutePath, n)), StandardCharsets.UTF_8))
      }
    val BaseFile = """(.+)_([0-9]+-[0-9]+-[0-9]+)_([0-9]+)\.parquet""".r
    def walk(dir: File, rel: String): Seq[(String, String)] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) {
          if (f.getName == ".hoodie" || f.getName.startsWith("_stage_")) Seq.empty
          else walk(f, if (rel.isEmpty) f.getName else s"$rel/${f.getName}")
        } else f.getName match {
          case BaseFile(fileId, _, instant) if completed(instant) =>
            Seq((rel, fileId))
          case _ => Seq.empty
        }
      }
    walk(root, "").toSet -- replaced
  }
}
