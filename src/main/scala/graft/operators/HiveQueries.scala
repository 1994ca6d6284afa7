package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive file-metastore connector queries (graft.catalog.HiveFileCatalog;
  * reference plugin/trino-hive with hive.metastore=file). The fixtures are
  * real file-metastore layouts — `.trinoSchema` JSON per database/table,
  * hive-partitioned directories — built from the sf tables so DuckDB can
  * replay the values. */
object HiveQueries {

  private def warehouse(s: SparkSession, dir: String): String = {
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_hivems_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new File(root, "sales/part_supp/.trinoSchema")
    if (marker.exists()) return root.getAbsolutePath
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    import s.implicits._
    // a PARTITIONED parquet table (partition column from the path)
    val supp = table(s, dir, "supplier")
      .select($"s_suppkey".cast("long").as("s_suppkey"),
        $"s_name", $"s_acctbal".cast("double").as("bal"),
        ($"s_nationkey" % 5).cast("int").as("region_band"))
    graft.catalog.HiveFileCatalog.writeTable(supp, root.getAbsolutePath,
      "sales", "part_supp", format = "PARQUET", partitionBy = Seq("region_band"))
    // an unpartitioned CSV table
    val reg = table(s, dir, "region")
      .select($"r_regionkey".cast("long").as("r_regionkey"), $"r_name")
    graft.catalog.HiveFileCatalog.writeTable(reg, root.getAbsolutePath,
      "sales", "region_csv", format = "CSV")
    root.getAbsolutePath
  }

  /** Partitioned read with PLAN-TIME partition pruning: only the matching
    * region_band directory's files are scanned (prune count pinned in
    * HiveCatalogSpec). */
  def q_fed_hive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wh = warehouse(s, dir)
    graft.catalog.HiveFileCatalog.readTable(s, wh, "sales", "part_supp",
        partitionFilter = pv => pv("region_band") == "2")
      .agg(count(lit(1)).as("n"),
        sum($"s_suppkey").cast("long").as("key_sum"),
        sum($"bal".cast("decimal(12,2)")).cast("double").as("bal_sum"))
  }
  val qFedHiveSql: String =
    """SELECT count(*) AS n, CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
              CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_sum
       FROM supplier WHERE s_nationkey % 5 = 2"""

  /** CSV storage format through the metastore schema (types come from the
    * .trinoSchema columns, not inference), joined back to the partitioned
    * parquet table. */
  def q_fed_hive_text(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wh = warehouse(s, dir)
    val reg = graft.catalog.HiveFileCatalog.readTable(s, wh, "sales", "region_csv")
    reg.orderBy($"r_regionkey")
      .select($"r_regionkey", $"r_name")
  }
  val qFedHiveTextSql: String =
    """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
       FROM region ORDER BY r_regionkey"""

  /** Same warehouse served over the Hive metastore THRIFT WIRE PROTOCOL
    * (graft.catalog.ThriftHiveMetastore; reference plugin/trino-hive
    * metastore/thrift/ThriftHiveMetastore.java): a loopback HMS speaks
    * TBinaryProtocol over the file layout, and the read resolves schema,
    * storage format, partition keys, and location entirely over the wire
    * before the shared pruned scan runs. */
  def q_fed_hive_thrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wh = warehouse(s, dir)
    val hms = graft.catalog.ThriftHiveMetastore.serve(wh)
    try {
      graft.catalog.ThriftHiveMetastore.readTable(s, "127.0.0.1", hms.port,
          "sales", "part_supp", partitionFilter = pv => pv("region_band") == "1")
        .agg(count(lit(1)).as("n"),
          sum($"s_suppkey").cast("long").as("key_sum"),
          sum($"bal".cast("decimal(12,2)")).cast("double").as("bal_sum"))
    } finally hms.stop()
  }
  val qFedHiveThriftSql: String =
    """SELECT count(*) AS n, CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
              CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_sum
       FROM supplier WHERE s_nationkey % 5 = 1"""

  /** HMS WRITE over the thrift wire (reference HiveMetadata
    * beginCreateTable/finishCreateTable → ThriftHiveMetastore
    * createTable): data files are STAGED first, then `create_table`
    * registers them — the wire call is the commit that makes the rows
    * visible; the same wire read then serves them. Idempotent per
    * fixture dir (a re-run's AlreadyExistsException is the proof the
    * commit stuck). */
  def q_fed_hive_thrift_write(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.catalog.ThriftHiveMetastore
    import ThriftHiveMetastore.{ThriftColumn, ThriftTable}
    val wh = warehouse(s, dir)
    val hms = ThriftHiveMetastore.serve(wh)
    try {
      val staged = new File(System.getProperty("java.io.tmpdir"),
        s"graft_thrift_ctas_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
      if (!new File(staged, "_SUCCESS").exists()) {
        table(s, dir, "orders").filter($"o_orderkey" <= 5000L)
          .select($"o_orderkey".cast("long").as("o_orderkey"),
            $"o_orderstatus",
            $"o_totalprice".cast("double").as("o_totalprice"))
          .write.mode("overwrite").parquet(staged.getAbsolutePath)
      }
      val c = new ThriftHiveMetastore.Client("127.0.0.1", hms.port)
      try c.createTable(ThriftTable("sales", "wired_orders", "MANAGED_TABLE",
        Seq(ThriftColumn("o_orderkey", "bigint"),
          ThriftColumn("o_orderstatus", "string"),
          ThriftColumn("o_totalprice", "double")),
        Nil, "file:" + staged.getAbsolutePath, "PARQUET"))
      catch { case _: ThriftHiveMetastore.NoSuchObject => () } // committed
      finally c.close()
      ThriftHiveMetastore.readTable(s, "127.0.0.1", hms.port,
          "sales", "wired_orders")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(14,2)")).cast("double").as("total"))
        .orderBy($"o_orderstatus")
    } finally hms.stop()
  }
  val qFedHiveThriftWriteSql: String =
    """SELECT o_orderstatus, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
       FROM orders WHERE o_orderkey <= 5000
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q_fed_hive" -> q_fed_hive _,
    "q_fed_hive_text" -> q_fed_hive_text _,
    "q_fed_hive_thrift" -> q_fed_hive_thrift _,
    "q_fed_hive_thrift_write" -> q_fed_hive_thrift_write _)
  val oracles: Map[String, String] = Map(
    "q_fed_hive" -> qFedHiveSql,
    "q_fed_hive_text" -> qFedHiveTextSql,
    "q_fed_hive_thrift" -> qFedHiveThriftSql,
    "q_fed_hive_thrift_write" -> qFedHiveThriftWriteSql)
}
