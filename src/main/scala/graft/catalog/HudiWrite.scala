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

    // ---- data: ONE distributed job for all partitions
    val stamped = df.withColumn("_hoodie_commit_time", lit(instant))
    val touchedPartitions = stageBaseFiles(stamped, root, instant, partitionBy)

    // an upsert shadows every group currently VISIBLE in the partitions it
    // touched (replace semantics); the replaced ids are listed in the
    // completed metadata for the reader
    val replaceJson =
      if (!isUpsert) ""
      else {
        val touched = touchedPartitions
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

  /** Stage `df` (meta columns already stamped) in ONE distributed job —
    * `partitionBy` on a throwaway duplicate column (__hp), so the
    * partition column itself stays in the data files as Hudi keeps it —
    * then rename task files to FSUtils base-file names under `instant`,
    * one file GROUP per task file (metadata-sized driver loop). Returns
    * the hive-style partition paths written. */
  private def stageBaseFiles(df: DataFrame, root: File, instant: String,
      partitionBy: Option[String]): Set[String] = {
    val stage = new File(root, s"_stage_$instant")
    deleteTree(stage)
    partitionBy match {
      case None =>
        df.write.mode("overwrite").parquet(stage.getAbsolutePath)
      case Some(c) =>
        df.withColumn("__hp", col(c)).write.mode("overwrite")
          .partitionBy("__hp").parquet(stage.getAbsolutePath)
    }
    def stagedFiles(dir: File, part: String): Seq[(String, File)] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory && f.getName.startsWith("__hp="))
          stagedFiles(f, partitionBy.get + "=" + PathCodec.unescape(
            f.getName.stripPrefix("__hp=")))
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
    byPartition.keySet
  }

  // ---- MERGE_ON_READ write path --------------------------------------
  //
  // Reference scope: plugin/trino-hudi reads what Hudi's deltacommit
  // timeline + HoodieLogFormat writers produce; this is that writer half.
  // An upsert is a LOG APPEND, never a file-group rewrite: updates route
  // to the file group currently owning their record key (HudiRead
  // .keyToGroup — the record-index role) and append one avro-data log
  // block per group; unmatched keys are inserts and become NEW base file
  // groups inside the same deltacommit (Hudi's insert path). Deletes
  // append DELETE log blocks the same way. Snapshot readers (ours and
  // Hudi's) merge per key with latest-action-wins.
  //
  // Scale shape: routing is a distributed join (base meta columns scan ×
  // incoming batch); per-group log rows shuffle once (bounded by the
  // upsert batch, i.e. the compaction interval, never the table); each
  // group's log file is written by the executor holding its rows.
  //
  // Subset (documented): single-column hive-style partitioning, unique
  // record keys per upsert batch, single writer (an instant collision
  // loses loudly on the completed marker's CREATE_NEW).

  /** Hudi meta-column names, in Hudi's canonical order. */
  private val MetaCols = Seq("_hoodie_commit_time", "_hoodie_commit_seqno",
    "_hoodie_record_key", "_hoodie_partition_path", "_hoodie_file_name")

  /** Stamp the five Hudi meta columns (file name stays "" — staging names
    * are assigned after the write; queries never consult it). */
  private def withMeta(df: DataFrame, instant: String, recordKeyField: String,
      partitionBy: Option[String]): DataFrame = {
    val partPath = partitionBy match {
      case Some(p) => concat(lit(p + "="), col(p).cast("string"))
      case None => lit("")
    }
    val dataCols = df.columns.filterNot(MetaCols.contains)
    df.select((Seq(
      lit(instant).as("_hoodie_commit_time"),
      concat_ws("_", lit(instant),
        monotonically_increasing_id().cast("string")).as("_hoodie_commit_seqno"),
      col(recordKeyField).cast("string").as("_hoodie_record_key"),
      partPath.as("_hoodie_partition_path"),
      lit("").as("_hoodie_file_name")) ++ dataCols.map(col)): _*)
  }

  private def nextInstant(hoodie: File): String = {
    val n = Option(hoodie.listFiles()).getOrElse(Array.empty).map(_.getName)
      .count(nm => (nm.endsWith(".commit") && !nm.contains(".commit.")) ||
        (nm.endsWith(".replacecommit") && !nm.contains(".replacecommit.")) ||
        (nm.endsWith(".deltacommit") && !nm.contains(".deltacommit.")))
    instantNow(n)
  }

  private def writeMarker(hoodie: File, name: String, body: String = ""): Unit =
    Files.write(Paths.get(hoodie.getAbsolutePath, name),
      body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  private def completeInstant(hoodie: File, instant: String, op: String): Unit =
    Files.write(Paths.get(hoodie.getAbsolutePath, s"$instant.deltacommit"),
      s"""{"partitionToWriteStats":{},"operationType":"$op"}"""
        .getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)

  /** Create a MERGE_ON_READ table: base files under deltacommit #1, meta
    * columns stamped, key/partition fields recorded in hoodie.properties
    * (Hudi's own property names) so later upserts can route. */
  def createMor(df: DataFrame, tablePath: String, recordKeyField: String,
      partitionBy: Option[String] = None): String = {
    val root = new File(tablePath)
    val hoodie = new File(root, ".hoodie")
    require(!new File(hoodie, "hoodie.properties").isFile,
      s"$tablePath already exists — use upsertMor")
    hoodie.mkdirs()
    Files.write(new File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=" + root.getName + "\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        s"hoodie.table.recordkey.fields=$recordKeyField\n" +
        partitionBy.map(p => s"hoodie.table.partition.fields=$p\n").getOrElse(""))
        .getBytes(StandardCharsets.UTF_8))
    val instant = instantNow(0)
    writeMarker(hoodie, s"$instant.deltacommit.requested")
    writeMarker(hoodie, s"$instant.deltacommit.inflight")
    stageBaseFiles(withMeta(df, instant, recordKeyField, partitionBy),
      root, instant, partitionBy)
    completeInstant(hoodie, instant, "BULK_INSERT")
    instant
  }

  /** MOR upsert: one deltacommit whose updates append log blocks and whose
    * inserts (keys not in the table) become new base file groups. */
  def upsertMor(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      tablePath: String): String = {
    val root = new File(tablePath)
    val hoodie = new File(root, ".hoodie")
    val props = HudiRead.loadProps(root)
    require(props.getProperty("hoodie.table.type") == "MERGE_ON_READ",
      s"$tablePath is not MERGE_ON_READ — use write() for CoW upserts")
    val recordKeyField = props.getProperty("hoodie.table.recordkey.fields")
    require(recordKeyField != null,
      s"$tablePath has no hoodie.table.recordkey.fields — cannot route an upsert")
    val partitionBy = Option(props.getProperty("hoodie.table.partition.fields"))
      .filter(_.nonEmpty)
    val baseCols = HudiRead.readTable(spark, tablePath).columns.toSet
    val instant = nextInstant(hoodie)
    writeMarker(hoodie, s"$instant.deltacommit.requested")
    writeMarker(hoodie, s"$instant.deltacommit.inflight")

    val stamped = withMeta(df, instant, recordKeyField, partitionBy)
    require(stamped.columns.toSet == baseCols,
      s"upsert columns ${stamped.columns.sorted.mkString(",")} do not match " +
        s"table columns ${baseCols.toSeq.sorted.mkString(",")}")
    val routing = HudiRead.keyToGroup(spark, tablePath)
    val joined = stamped.join(routing,
      stamped("_hoodie_record_key") === routing("__k") &&
        stamped("_hoodie_partition_path") === routing("__p"), "left")
      .drop("__k", "__p")
    joined.persist()
    try {
      val updates = joined.filter(col("__fid").isNotNull)
      val inserts = joined.filter(col("__fid").isNull)
        .select(stamped.columns.map(col).toIndexedSeq: _*)
      appendLogFiles(spark, root, instant, updates, stamped.schema)
      if (!inserts.isEmpty)
        stageBaseFiles(inserts, root, instant, partitionBy)
    } finally joined.unpersist()
    completeInstant(hoodie, instant, "UPSERT")
    instant
  }

  /** MOR delete: tombstone every snapshot row matching `predicate` via
    * DELETE log blocks routed to the owning file group. */
  def deleteMor(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): String = {
    val root = new File(tablePath)
    val hoodie = new File(root, ".hoodie")
    val props = HudiRead.loadProps(root)
    require(props.getProperty("hoodie.table.type") == "MERGE_ON_READ",
      s"$tablePath is not MERGE_ON_READ")
    val instant = nextInstant(hoodie)
    writeMarker(hoodie, s"$instant.deltacommit.requested")
    writeMarker(hoodie, s"$instant.deltacommit.inflight")
    val victims = HudiRead.readTableSnapshot(spark, tablePath)
      .filter(predicate)
      .select(col("_hoodie_record_key").as("__k"),
        col("_hoodie_partition_path").as("__p"))
    val routed = victims.join(HudiRead.keyToGroup(spark, tablePath)
      .select(col("__k"), col("__p"), col("__fid"), col("__bi")),
      Seq("__k", "__p"))
    val view = HudiRead.tableView(root, None)
    val verB = spark.sparkContext.broadcast(nextLogVersions(view))
    val rootPath = root.getAbsolutePath
    routed.rdd
      .groupBy(r => (r.getString(1), r.getString(2), r.getString(3)))
      .foreach { case ((part, fid, bi), rows) =>
        val dir = if (part.isEmpty) new File(rootPath) else new File(rootPath, part)
        dir.mkdirs()
        HudiLogFormat.writeDeleteLogFile(dir, fid, bi,
          verB.value.getOrElse((part, fid), 1), "0-1-0", instant,
          rows.map(r => (part, r.getString(0))).toSeq)
      }
    completeInstant(hoodie, instant, "DELETE")
    instant
  }

  /** Next log version per file group (driver metadata, broadcast). */
  private def nextLogVersions(
      view: HudiRead.TableView): Map[(String, String), Int] =
    view.logFiles.groupBy(l => (l.partition, l.fileId))
      .map { case (k, ls) => k -> (ls.map(_.version).max + 1) }

  /** Write one avro-data log file per touched file group, on the executor
    * holding that group's rows (the shuffle is bounded by the upsert
    * batch). `updates` carries the full row plus routing columns
    * `__fid`/`__bi`. */
  private def appendLogFiles(spark: org.apache.spark.sql.SparkSession,
      root: File, instant: String,
      updates: DataFrame, rowSchema: org.apache.spark.sql.types.StructType): Unit = {
    val view = HudiRead.tableView(root, None)
    val verB = spark.sparkContext.broadcast(nextLogVersions(view))
    val rootPath = root.getAbsolutePath
    val n = rowSchema.length
    val logSchema = org.apache.spark.sql.types.StructType(
      rowSchema.fields.map(_.copy(nullable = true)))
    updates.rdd
      .groupBy(r => (r.getAs[String]("_hoodie_partition_path"),
        r.getAs[String]("__fid"), r.getAs[String]("__bi")))
      .foreach { case ((part, fid, bi), rows) =>
        val dir = if (part.isEmpty) new File(rootPath) else new File(rootPath, part)
        dir.mkdirs()
        val logRows = rows.map(r =>
          org.apache.spark.sql.Row.fromSeq((0 until n).map(r.get))).toSeq
        HudiLogFormat.writeLogFile(dir, fid, bi,
          verB.value.getOrElse((part, fid), 1), "0-1-0", instant,
          logSchema, logRows)
      }
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
