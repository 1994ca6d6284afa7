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
  * Commit protocol: the instant passes through `.commit.requested` →
  * `.inflight` → `<instant>.commit`, with data files staged and moved
  * BEFORE the completed marker — uncommitted slices stay invisible to
  * timeline-filtering readers, and a crash mid-write leaves an inflight
  * instant whose files never become visible (Hudi's own rollback target).
  * The completed marker is written CREATE_NEW, so an instant collision
  * loses loudly.
  *
  * UPSERT semantics (CoW): the new dataframe REPLACES the file groups of
  * the partitions it touches by writing later slices of the same fileId —
  * the whole-file-group rewrite that Hudi's copy-on-write merge performs;
  * partitions not present in the upsert keep their current slices.
  *
  * Supported subset: unpartitioned or hive-style `col=value` partition
  * dirs (partition columns stay in the data files, as Hudi keeps them),
  * one file group per partition per commit, `_hoodie_commit_time` stamped
  * on every row. */
object HudiWrite {

  private def instantNow(seq: Int): String = f"202608140000$seq%02d000"

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
  }

  private def fileIdFor(partition: String): String = {
    val h = java.util.UUID.nameUUIDFromBytes(partition.getBytes("UTF-8"))
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

    val prior = Option(hoodie.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".commit")).filterNot(_.contains(".commit."))
    val instant = instantNow(prior.length)

    // requested → inflight → (data) → completed
    Files.write(Paths.get(hoodie.getAbsolutePath, s"$instant.commit.requested"),
      Array.emptyByteArray)
    Files.write(Paths.get(hoodie.getAbsolutePath, s"$instant.inflight"),
      Array.emptyByteArray)

    val stamped = df.withColumn("_hoodie_commit_time", lit(instant))
    val partitions: Seq[(String, DataFrame)] = partitionBy match {
      case None => Seq(("", stamped))
      case Some(col0) =>
        stamped.select(col(col0)).distinct().collect().toSeq
          .map(_.get(0))
          .map(v => (s"$col0=$v", stamped.filter(col(col0) === v)))
    }
    partitions.foreach { case (part, slice) =>
      val stage = new File(root, s"_stage_$instant${part.replace('/', '_').replace('=', '_')}")
      deleteTree(stage)
      slice.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val pf = Option(stage.listFiles()).getOrElse(Array.empty)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new File(root,
        (if (part.isEmpty) "" else s"$part/") +
          s"${fileIdFor(part)}_0-0-0_$instant.parquet")
      dest.getParentFile.mkdirs()
      Files.move(pf.toPath, dest.toPath)
      deleteTree(stage)
    }
    // completed marker last; CREATE_NEW loses an instant race loudly
    Files.write(Paths.get(hoodie.getAbsolutePath, s"$instant.commit"),
      s"""{"partitionToWriteStats":{},"operationType":"${
        if (prior.isEmpty) "BULK_INSERT" else "UPSERT"}"}"""
        .getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    instant
  }
}
