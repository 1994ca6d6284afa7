package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hudi COPY_ON_WRITE interop queries (see graft.catalog.HudiRead for the
  * layout reader; reference plugin/trino-hudi). The fixture IS a real Hudi
  * CoW layout written file-by-file against the public naming rules: commit 0
  * writes one file group per `pk` partition; commit 1 upserts file group 0
  * (a NEW SLICE of the same fileId — the old base file stays on disk); an
  * INFLIGHT instant leaves an uncommitted base file behind. A naive
  * "read all parquet under the directory" scan double-counts group 0 AND
  * leaks the uncommitted file; the snapshot read must pick exactly the
  * latest completed slice per file group. */
object HudiQueries {

  private val C0 = "20260814000000"
  private val C1 = "20260814000100"
  private val INFLIGHT = "20260814000200"

  /** Build (idempotently) a partitioned Hudi CoW table from the supplier
    * fixture. Partition: pk = s_suppkey % 3 (hive-style dirs, partition
    * field kept in the data files like Hudi does); upsert at C1 deletes
    * s_suppkey % 7 = 0 rows from group 0 and doubles their s_acctbal. */
  private def buildHudiSupplier(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_hudi_supplier_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new File(root, s".hoodie/$C1.commit")
    if (marker.exists()) return root.getAbsolutePath
    def deleteTree(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
      f.delete()
    }
    deleteTree(root)
    new File(root, ".hoodie").mkdirs()

    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", "hoodie.properties"),
      ("hoodie.table.name=supplier_hudi\n" +
        "hoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=6\n").getBytes(StandardCharsets.UTF_8))

    val supplier = table(s, dir, "supplier")
      .withColumn("pk", ($"s_suppkey" % 3).cast("int"))

    def fileId(g: Int) = f"00000000-0000-0000-0000-${g}%012d-0"

    /** Write one base file for a file group; returns nothing (name fixed). */
    def writeSlice(df: DataFrame, g: Int, token: String, instant: String): Unit = {
      val stage = new File(root, s"_stage_${g}_$instant")
      df.withColumn("_hoodie_commit_time", lit(instant))
        .coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = Option(stage.listFiles()).getOrElse(Array.empty)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new File(root, s"pk=$g/${fileId(g)}_${token}_$instant.parquet")
      dest.getParentFile.mkdirs()
      Files.move(part.toPath, dest.toPath)
      deleteTree(stage)
    }

    // commit 0: one file group per partition
    for (g <- 0 until 3)
      writeSlice(supplier.filter($"pk" === g), g, "0-0-0", C0)
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$C0.commit"),
      s"""{"partitionToWriteStats":{},"operationType":"BULK_INSERT"}"""
        .getBytes(StandardCharsets.UTF_8))

    // commit 1: upsert rewrites file group 0 as a NEW SLICE (same fileId,
    // later instant) — the C0 base file is left on disk, as Hudi leaves it
    // until a clean
    writeSlice(
      supplier.filter($"pk" === 0 && $"s_suppkey" % 7 =!= 0)
        .withColumn("s_acctbal", $"s_acctbal" * 2),
      g = 0, token = "0-1-0", instant = C1)
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$C1.commit"),
      s"""{"partitionToWriteStats":{},"operationType":"UPSERT"}"""
        .getBytes(StandardCharsets.UTF_8))

    // an inflight instant with its base file already on disk: must stay
    // invisible (filterCompletedInstants)
    writeSlice(supplier.filter($"pk" === 1).limit(3), g = 1, token = "0-2-0",
      instant = INFLIGHT)
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$INFLIGHT.inflight"),
      Array.empty[Byte])
    root.getAbsolutePath
  }

  /** Snapshot read after the upsert: group 0 comes from the C1 slice only. */
  def q_fed_hudi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildHudiSupplier(s, dir)
    graft.catalog.HudiRead.readTable(s, path)
      .groupBy($"pk", $"_hoodie_commit_time")
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"s_acctbal"))).as("bal"),
        sum($"s_suppkey").as("key_sum"))
      .orderBy($"pk")
  }
  val qFedHudiSql: String =
    """WITH sup AS (SELECT *, CAST(s_suppkey % 3 AS INT) AS pk FROM supplier),
       snap AS (
         SELECT pk, '20260814000100' AS _hoodie_commit_time,
                s_suppkey, s_acctbal * 2 AS s_acctbal
         FROM sup WHERE pk = 0 AND s_suppkey % 7 <> 0
         UNION ALL
         SELECT pk, '20260814000000', s_suppkey, s_acctbal
         FROM sup WHERE pk <> 0)
       SELECT pk, _hoodie_commit_time, count(*) AS n,
              CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
              CAST(sum(s_suppkey) AS BIGINT) AS key_sum
       FROM snap GROUP BY pk, _hoodie_commit_time ORDER BY pk"""

  /** Time travel to the first commit: the upsert and the inflight file are
    * both invisible. */
  def q_fed_hudi_timetravel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildHudiSupplier(s, dir)
    graft.catalog.HudiRead.readTable(s, path, asOf = Some(C0))
      .groupBy($"pk")
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"s_acctbal"))).as("bal"),
        countDistinct($"_hoodie_commit_time").as("commits"))
      .orderBy($"pk")
  }
  val qFedHudiTimetravelSql: String =
    """SELECT CAST(s_suppkey % 3 AS INT) AS pk, count(*) AS n,
              CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
              CAST(1 AS BIGINT) AS commits
       FROM supplier GROUP BY 1 ORDER BY pk"""

  /** Build (idempotently) a MERGE_ON_READ layout: compacted base slices
    * under deltacommit instants plus an unmerged log file that a
    * read-optimized scan must ignore. */
  private def buildHudiMorNation(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_hudi_mor_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new File(root, s".hoodie/$C1.deltacommit")
    if (marker.exists()) return root.getAbsolutePath
    def deleteTree(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
      f.delete()
    }
    deleteTree(root)
    new File(root, ".hoodie").mkdirs()
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", "hoodie.properties"),
      ("hoodie.table.name=nation_mor\n" +
        "hoodie.table.type=MERGE_ON_READ\n").getBytes(StandardCharsets.UTF_8))
    val nation = table(s, dir, "nation")
    val fid = "00000000-0000-0000-0000-00000000000a-0"
    def writeSlice(df: DataFrame, token: String, instant: String): Unit = {
      val stage = new File(root, s"_stage_$instant")
      df.withColumn("_hoodie_commit_time", lit(instant))
        .coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = Option(stage.listFiles()).getOrElse(Array.empty)
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new File(root, s"${fid}_${token}_$instant.parquet").toPath)
      deleteTree(stage)
    }
    // base slice at C0, compacted slice at C1 (drops region 4's rows the
    // way a compaction folding a delete log would)
    writeSlice(nation, "0-0-0", C0)
    writeSlice(nation.filter($"n_regionkey" =!= 4), "0-1-0", C1)
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$C0.deltacommit"),
      "{}".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$C1.deltacommit"),
      "{}".getBytes(StandardCharsets.UTF_8))
    // an unmerged log file beside the base — must be invisible
    Files.write(Paths.get(root.getAbsolutePath, s".${fid}_$C1.log.1_0-1-0"),
      Array[Byte](1, 2, 3))
    root.getAbsolutePath
  }

  /** Read-optimized MOR scan: the latest compacted slice only, log ignored. */
  def q_fed_hudi_mor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildHudiMorNation(s, dir)
    graft.catalog.HudiRead.readTable(s, path)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"),
        CAST_SUM_KEY($"n_nationkey").as("key_sum"),
        countDistinct($"_hoodie_commit_time").as("commits"))
      .orderBy($"n_regionkey")
  }
  private def CAST_SUM_KEY(c: org.apache.spark.sql.Column) = sum(c).cast("long")
  val qFedHudiMorSql: String =
    """SELECT n_regionkey, count(*) AS n,
              CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
              CAST(1 AS BIGINT) AS commits
       FROM nation WHERE n_regionkey <> 4
       GROUP BY n_regionkey ORDER BY n_regionkey"""

  private val C2 = "20260814000300"

  private val C3 = "20260814000400"

  /** Build (idempotently) a MOR table whose latest state lives partly in
    * LOG files: base slice at C0, an avro log block at C1 (updates + two
    * inserts, written in Hudi's binary block format by [[graft.catalog
    * .HudiLogFormat]]), a DELETE log block at C3 (tombstoning the
    * n_nationkey % 7 = 3 keys — including one the C1 log had updated, so
    * latest-action-wins is exercised), and an UNCOMMITTED log at C2 that
    * must stay invisible. Read-optimized provably returns the stale C0
    * rows; only the snapshot read merges the logs. The 25-row nation
    * collect is fixture building, not query execution. */
  private def buildHudiMorSnapNation(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_hudi_morsnap_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new File(root, s".hoodie/$C3.deltacommit")
    if (marker.exists()) return root.getAbsolutePath
    def deleteTree(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
      f.delete()
    }
    deleteTree(root)
    new File(root, ".hoodie").mkdirs()
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", "hoodie.properties"),
      ("hoodie.table.name=nation_morsnap\n" +
        "hoodie.table.type=MERGE_ON_READ\n").getBytes(StandardCharsets.UTF_8))
    val fid = "00000000-0000-0000-0000-00000000000b-0"
    val base = table(s, dir, "nation")
      .select(
        lit(C0).as("_hoodie_commit_time"),
        $"n_nationkey".cast("string").as("_hoodie_record_key"),
        lit("").as("_hoodie_partition_path"),
        $"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
        $"n_regionkey".cast("long").as("n_regionkey"))
    val stage = new File(root, s"_stage_$C0")
    base.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val pf = Option(stage.listFiles()).getOrElse(Array.empty)
      .find(_.getName.endsWith(".parquet")).get
    Files.move(pf.toPath, new File(root, s"${fid}_0-0-0_$C0.parquet").toPath)
    deleteTree(stage)
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$C0.deltacommit"),
      "{}".getBytes(StandardCharsets.UTF_8))

    val schema = org.apache.spark.sql.types.StructType(base.schema.fields.map(
      _.copy(nullable = true)))
    def logRow(key: Long, name: String, region: Long): org.apache.spark.sql.Row =
      org.apache.spark.sql.Row(C1, key.toString, "", key, name, region)
    val updates = table(s, dir, "nation")
      .filter($"n_nationkey" % 5 === 0)
      .select($"n_nationkey".cast("long"), $"n_name", $"n_regionkey".cast("long"))
      .collect().toSeq // 5 rows of the 25-row nation: fixture building
      .map(r => logRow(r.getLong(0), "upd:" + r.getString(1), r.getLong(2)))
    val inserts = Seq(logRow(900L, "ins:alpha", 2L), logRow(901L, "ins:beta", 2L))
    graft.catalog.HudiLogFormat.writeLogFile(root, fid, C0,
      logVersion = 1, writeToken = "0-1-0", instant = C1, schema,
      updates ++ inserts)
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$C1.deltacommit"),
      "{}".getBytes(StandardCharsets.UTF_8))
    // a log under an instant that never completed: must stay invisible
    graft.catalog.HudiLogFormat.writeLogFile(root, fid, C0,
      logVersion = 2, writeToken = "0-2-0", instant = C2, schema,
      Seq(logRow(999L, "ghost", 9L)))
    // C3: DELETE block tombstones the %7=3 keys; key 10 was updated at C1
    // — the later delete must win and remove the base row entirely
    graft.catalog.HudiLogFormat.writeDeleteLogFile(root, fid, C0,
      logVersion = 3, writeToken = "0-3-0", instant = C3,
      keys = Seq(3L, 10L, 17L, 24L).map(k => ("", k.toString)))
    Files.write(Paths.get(root.getAbsolutePath, ".hoodie", s"$C3.deltacommit"),
      "{}".getBytes(StandardCharsets.UTF_8))
    root.getAbsolutePath
  }

  /** MOR SNAPSHOT read: the C1 log's updates and inserts are visible (a
    * read-optimized scan of the same table returns the stale C0 state —
    * proven in HudiReadSpec). */
  def q_fed_hudi_mor_snapshot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildHudiMorSnapNation(s, dir)
    graft.catalog.HudiRead.readTableSnapshot(s, path)
      .groupBy($"n_regionkey".as("region_bucket"))
      .agg(count(lit(1)).as("n"),
        CAST_SUM_KEY($"n_nationkey").as("key_sum"),
        sum(when($"n_name".startsWith("upd:"), 1L).otherwise(0L)).as("updated_n"))
      .orderBy($"region_bucket")
  }
  val qFedHudiMorSnapshotSql: String =
    """WITH merged AS (
         SELECT CAST(n_nationkey AS BIGINT) AS k, CAST(n_regionkey AS BIGINT) AS r,
                CASE WHEN n_nationkey % 5 = 0 THEN 'upd:' || n_name ELSE n_name END AS nm
         FROM nation WHERE n_nationkey % 7 <> 3
         UNION ALL SELECT 900, 2, 'ins:alpha'
         UNION ALL SELECT 901, 2, 'ins:beta')
       SELECT r AS region_bucket, count(*) AS n,
              CAST(sum(k) AS BIGINT) AS key_sum,
              CAST(sum(CASE WHEN starts_with(nm, 'upd:') THEN 1 ELSE 0 END) AS BIGINT)
                AS updated_n
       FROM merged GROUP BY r ORDER BY region_bucket"""

  /** Build (idempotently) a PARTITIONED MOR table entirely through the
    * [[graft.catalog.HudiWrite]] MOR writer — createMor (base deltacommit),
    * upsertMor (updates append avro log blocks routed per file group + two
    * inserted keys becoming new base groups), deleteMor (DELETE log
    * blocks) — then snapshot-read it back. Key 0 is updated then deleted:
    * latest-action-wins across self-written deltacommits. */
  private def buildHudiMorWriterNation(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_hudi_morwrite_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    // instants are count-based: create=00, upsert=01, delete=02
    val marker = new File(root, ".hoodie/20260814000002000.deltacommit")
    if (marker.exists()) return root.getAbsolutePath
    def deleteTree(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
      f.delete()
    }
    deleteTree(root)
    val base = table(s, dir, "nation").select(
      $"n_nationkey".cast("long").as("k"), $"n_name".as("nm"),
      $"n_regionkey".cast("long").as("r"))
    graft.catalog.HudiWrite.createMor(base, root.getAbsolutePath, "k",
      partitionBy = Some("r"))
    val updates = base.filter($"k" % 4 === 0)
      .select($"k", concat(lit("upd:"), $"nm").as("nm"), $"r")
    val inserts = Seq((800L, "ins:a", 1L), (801L, "ins:b", 1L)).toDF("k", "nm", "r")
    graft.catalog.HudiWrite.upsertMor(s, updates.unionByName(inserts),
      root.getAbsolutePath)
    graft.catalog.HudiWrite.deleteMor(s, root.getAbsolutePath, col("k") % 6 === 0)
    root.getAbsolutePath
  }

  /** Snapshot over a table written end-to-end by the MOR writer. */
  def q_fed_hudi_mor_write(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildHudiMorWriterNation(s, dir)
    graft.catalog.HudiRead.readTableSnapshot(s, path)
      .groupBy($"r".as("region_bucket"))
      .agg(count(lit(1)).as("n"),
        CAST_SUM_KEY($"k").as("key_sum"),
        sum(when($"nm".startsWith("upd:"), 1L).otherwise(0L)).as("updated_n"))
      .orderBy($"region_bucket")
  }
  val qFedHudiMorWriteSql: String =
    """WITH merged AS (
         SELECT CAST(n_nationkey AS BIGINT) AS k, CAST(n_regionkey AS BIGINT) AS r,
                CASE WHEN n_nationkey % 4 = 0 THEN 'upd:' || n_name ELSE n_name END AS nm
         FROM nation
         UNION ALL SELECT 800, 1, 'ins:a'
         UNION ALL SELECT 801, 1, 'ins:b')
       SELECT r AS region_bucket, count(*) AS n,
              CAST(sum(k) AS BIGINT) AS key_sum,
              CAST(sum(CASE WHEN starts_with(nm, 'upd:') THEN 1 ELSE 0 END) AS BIGINT)
                AS updated_n
       FROM merged WHERE k % 6 <> 0 GROUP BY r ORDER BY region_bucket"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q_fed_hudi" -> q_fed_hudi _,
    "q_fed_hudi_timetravel" -> q_fed_hudi_timetravel _,
    "q_fed_hudi_mor" -> q_fed_hudi_mor _,
    "q_fed_hudi_mor_snapshot" -> q_fed_hudi_mor_snapshot _,
    "q_fed_hudi_mor_write" -> q_fed_hudi_mor_write _)
  val oracles: Map[String, String] = Map(
    "q_fed_hudi" -> qFedHudiSql,
    "q_fed_hudi_timetravel" -> qFedHudiTimetravelSql,
    "q_fed_hudi_mor" -> qFedHudiMorSql,
    "q_fed_hudi_mor_snapshot" -> qFedHudiMorSnapshotSql,
    "q_fed_hudi_mor_write" -> qFedHudiMorWriteSql)
}
