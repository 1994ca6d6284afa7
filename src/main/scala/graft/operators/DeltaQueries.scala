package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta Lake interop query (see graft.catalog.DeltaRead for the protocol
  * reader). The fixture IS a real Delta table layout written action-by-action
  * against the public protocol: commit 0 adds one parquet file per
  * n_regionkey partition; commit 1 replaces region 0's file with a filtered
  * rewrite (the remove+add shape a DELETE produces). The reader must honor
  * the remove — a naive "read all parquet under the directory" scan would
  * double-count region 0 and fail the oracle. */
object DeltaQueries {

  /** Build (idempotently) a partitioned Delta table from the nation fixture. */
  private def buildDeltaNation(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_delta_nation_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new File(root, "_delta_log/00000000000000000001.json")
    if (marker.exists()) return root.getAbsolutePath
    def deleteTree(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
      f.delete()
    }
    deleteTree(root)
    new File(root, "_delta_log").mkdirs()

    val nation = table(s, dir, "nation")
    val schemaJson = nation.schema.json
    def q(str: String): String = "\"" + str.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    /** Write one data file for a region slice; returns its table-relative path. */
    def writeSlice(df: DataFrame, region: Int, name: String): String = {
      val stage = new File(root, s"_stage_$name")
      df.drop("n_regionkey").coalesce(1).write.mode("overwrite")
        .parquet(stage.getAbsolutePath)
      val part = Option(stage.listFiles()).getOrElse(Array.empty)
        .find(_.getName.endsWith(".parquet")).get
      val rel = s"n_regionkey=$region/$name.parquet"
      val dest = new File(root, rel)
      dest.getParentFile.mkdirs()
      Files.move(part.toPath, dest.toPath)
      deleteTree(stage)
      rel
    }
    def addAction(rel: String, region: Int): String =
      s"""{"add":{"path":${q(rel)},"partitionValues":{"n_regionkey":"$region"},"size":1,"modificationTime":0,"dataChange":true}}"""

    val regions = nation.select($"n_regionkey".cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted // 5 rows: bounded metadata collect

    // commit 0: metaData + protocol + one add per region partition
    val c0 = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-nation","format":{"provider":"parquet","options":{}},"schemaString":${q(schemaJson)},"partitionColumns":["n_regionkey"],"configuration":{},"createdTime":0}}""") ++
      regions.map { r =>
        addAction(writeSlice(nation.filter($"n_regionkey" === r), r, "part-00000"), r)
      }
    Files.write(Paths.get(root.getAbsolutePath, "_delta_log", "00000000000000000000.json"),
      c0.mkString("\n").getBytes(StandardCharsets.UTF_8))

    // commit 1: DELETE FROM nation WHERE n_regionkey = 0 AND n_nationkey >= 20
    // → remove the region-0 file, add its filtered rewrite
    val rewritten = writeSlice(
      nation.filter($"n_regionkey" === 0 && $"n_nationkey" < 20), 0, "part-00001")
    val c1 = Seq(
      s"""{"remove":{"path":${q("n_regionkey=0/part-00000.parquet")},"dataChange":true}}""",
      addAction(rewritten, 0))
    Files.write(Paths.get(root.getAbsolutePath, "_delta_log", "00000000000000000001.json"),
      c1.mkString("\n").getBytes(StandardCharsets.UTF_8))
    root.getAbsolutePath
  }

  /** Read the Delta table (post-DELETE state) and join a fixture dimension —
    * the open-format half of the federation story. */
  def q_fed_delta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildDeltaNation(s, dir)
    val delta = graft.catalog.DeltaRead.readTable(s, path)
    delta
      .join(broadcast(table(s, dir, "region").select($"r_regionkey", $"r_name")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name", $"n_regionkey".cast("long").as("n_regionkey"), $"r_name")
      .orderBy($"n_nationkey")
  }
  val qFedDeltaSql: String =
    """SELECT n_nationkey, n_name, n_regionkey, r_name
       FROM nation JOIN region ON n_regionkey = r_regionkey
       WHERE n_regionkey <> 0 OR n_nationkey < 20
       ORDER BY n_nationkey"""

  /** Deletion-vector DML through the open protocol (catalog.DeltaWrite
    * deleteWhere/updateWhere): build a fresh Delta supplier table, DELETE
    * every 7th supplier via a roaring deletion vector, UPDATE every 5th's
    * balance via DV-delete + append; the oracle replays the net effect. */
  def q_fed_delta_dv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_delta_dv_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    // updateWhere commits DV re-adds + new adds in ONE log entry → v2 last
    val marker = new File(root, "_delta_log/00000000000000000002.json")
    if (!marker.exists()) {
      def rm(f: File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val sup = table(s, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey", dec($"s_acctbal").as("s_acctbal"))
      graft.catalog.DeltaWrite.write(sup, root.getAbsolutePath)       // v0
      graft.catalog.DeltaWrite.deleteWhere(s, root.getAbsolutePath,   // v1
        $"s_suppkey" % 7 === 0)
      graft.catalog.DeltaWrite.updateWhere(s, root.getAbsolutePath,   // v2+v3
        $"s_suppkey" % 5 === 0, Map("s_acctbal" -> ($"s_acctbal" + 100)))
    }
    graft.catalog.DeltaRead.readTable(s, root.getAbsolutePath)
      .groupBy(($"s_suppkey" % 3).as("band"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum($"s_acctbal")).as("bal"),
        sum($"s_suppkey").cast("long").as("key_sum"))
      .orderBy($"band")
  }
  val qFedDeltaDvSql: String =
    """WITH net AS (
         SELECT s_suppkey,
           CAST(s_acctbal AS DECIMAL(12,2))
             + CASE WHEN s_suppkey % 5 = 0 THEN 100 ELSE 0 END AS bal
         FROM supplier WHERE s_suppkey % 7 <> 0)
       SELECT s_suppkey % 3 AS band, count(*) AS n,
              CAST(sum(bal) AS DOUBLE) AS bal,
              CAST(sum(s_suppkey) AS BIGINT) AS key_sum
       FROM net GROUP BY 1 ORDER BY band"""

  /** OPTIMIZE + checkpoint lifecycle under the driver gate: appends + a DV
    * delete are compacted (deletes materialized, removes tombstoned), a
    * classic parquet checkpoint is cut, and the read replays CHECKPOINT +
    * SUFFIX; the oracle replays the net row set. */
  def q_fed_delta_optimize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_delta_opt_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new File(root, "_delta_log/_last_checkpoint")
    if (!marker.exists()) {
      def rm(f: File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val cust = table(s, dir, "customer")
        .select($"c_custkey".cast("long").as("c_custkey"),
          $"c_nationkey".cast("long").as("c_nationkey"))
      val p = root.getAbsolutePath
      graft.catalog.DeltaWrite.write(cust.filter($"c_custkey" % 2 === 0), p) // v0
      graft.catalog.DeltaWrite.write(cust.filter($"c_custkey" % 2 === 1), p) // v1
      graft.catalog.DeltaWrite.deleteWhere(s, p, $"c_custkey" % 9 === 0)     // v2
      graft.catalog.DeltaWrite.optimize(s, p)                                // v3
      graft.catalog.DeltaWrite.checkpoint(s, p)
    }
    graft.catalog.DeltaRead.readTable(s, root.getAbsolutePath)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"), sum($"c_custkey").cast("long").as("key_sum"))
      .orderBy($"c_nationkey")
  }
  val qFedDeltaOptimizeSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n,
              CAST(sum(c_custkey) AS BIGINT) AS key_sum
       FROM customer WHERE c_custkey % 9 <> 0
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  val queries: Map[String, Q] = Map(
    "q_fed_delta" -> q_fed_delta _,
    "q_fed_delta_dv" -> q_fed_delta_dv _,
    "q_fed_delta_optimize" -> q_fed_delta_optimize _)
  val oracles: Map[String, String] = Map(
    "q_fed_delta" -> qFedDeltaSql,
    "q_fed_delta_dv" -> qFedDeltaDvSql,
    "q_fed_delta_optimize" -> qFedDeltaOptimizeSql)
}
