package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.catalog.{HiveFileCatalog, ThriftHiveMetastore}

/** Hive metastore thrift wire protocol: a loopback HMS serving a
  * file-metastore warehouse, driven end-to-end by the wire client —
  * database/table listings, Table/StorageDescriptor/partition decoding,
  * NoSuchObjectException, unknown-method TApplicationException, and a
  * full read resolving every piece of metadata over the wire. */
class ThriftMetastoreSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val warehouse: String = {
    val root = new File("/tmp/graft_thrift_hms_spec")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    import spark.implicits._
    val supp = graft.sources.Tables.load(spark, sfDir, "supplier")
      .select($"s_suppkey".cast("long").as("s_suppkey"), $"s_name",
        $"s_acctbal".cast("double").as("bal"),
        ($"s_nationkey" % 3).cast("int").as("band"))
    HiveFileCatalog.writeTable(supp, root.getAbsolutePath, "wh", "supp_part",
      format = "PARQUET", partitionBy = Seq("band"))
    val reg = graft.sources.Tables.load(spark, sfDir, "region")
      .select($"r_regionkey".cast("long").as("r_regionkey"), $"r_name")
    HiveFileCatalog.writeTable(reg, root.getAbsolutePath, "wh", "region_csv",
      format = "CSV")
    root.getAbsolutePath
  }

  private lazy val hms = ThriftHiveMetastore.serve(warehouse)

  override def afterAll(): Unit = hms.stop()

  private def client = new ThriftHiveMetastore.Client("127.0.0.1", hms.port)

  test("listings round-trip over the wire") {
    val c = client
    try {
      assert(c.getAllDatabases() == Seq("wh"))
      assert(c.getAllTables("wh") == Seq("region_csv", "supp_part"))
    } finally c.close()
  }

  test("get_table decodes Table/StorageDescriptor/partitionKeys/serde") {
    val c = client
    try {
      val t = c.getTable("wh", "supp_part")
      assert(t.dbName == "wh" && t.tableName == "supp_part")
      assert(t.tableType == "MANAGED_TABLE")
      assert(t.dataColumns.map(_.name) == Seq("s_suppkey", "s_name", "bal"))
      assert(t.dataColumns.map(_.hiveType) == Seq("bigint", "string", "double"))
      assert(t.partitionKeys.map(c => (c.name, c.hiveType)) == Seq(("band", "int")))
      assert(t.storageFormat == "PARQUET")
      assert(t.location.startsWith("file:/"))
      val csv = c.getTable("wh", "region_csv")
      assert(csv.storageFormat == "CSV" && csv.partitionKeys.isEmpty)
    } finally c.close()
  }

  test("get_partitions lists every partition with values and locations") {
    val c = client
    try {
      val parts = c.getPartitions("wh", "supp_part")
      assert(parts.map(_.values) == Seq(Seq("0"), Seq("1"), Seq("2")))
      assert(parts.forall(p => new File(
        p.location.stripPrefix("file:")).isDirectory))
    } finally c.close()
  }

  test("missing objects raise the declared exception; unknown methods the app exception") {
    val c = client
    try {
      intercept[ThriftHiveMetastore.NoSuchObject] { c.getTable("wh", "nope") }
      // several calls on the same connection still work after the error
      assert(c.getAllDatabases() == Seq("wh"))
    } finally c.close()
  }

  test("hive_thrift_table TVF reaches the wire client from SQL text") {
    val df = sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT count(*) AS n, count(DISTINCT band) AS bands
          FROM TABLE(hive_thrift_table('127.0.0.1', ${hms.port}, 'wh', 'supp_part'))""")
    val r = df.collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) == 3)
  }

  test("create_table over the wire commits staged files (CTAS shape)") {
    import spark.implicits._
    import ThriftHiveMetastore.{ThriftColumn, ThriftTable}
    // stage data files FIRST (reference HiveMetadata.beginCreateTable),
    // then register them through the wire — registration is the commit
    val staged = new File("/tmp/graft_thrift_ctas_stage")
    val nat = graft.sources.Tables.load(spark, sfDir, "nation")
      .select($"n_nationkey".cast("long").as("k"), $"n_name".as("name"))
    nat.write.mode("overwrite").parquet(staged.getAbsolutePath)
    val c = new ThriftHiveMetastore.Client("127.0.0.1", hms.port)
    try {
      c.createTable(ThriftTable("wh", "wired_nation", "MANAGED_TABLE",
        Seq(ThriftColumn("k", "bigint"), ThriftColumn("name", "string")),
        Nil, "file:" + staged.getAbsolutePath, "PARQUET"))
      // visible in listings; metadata round-trips
      assert(c.getAllTables("wh").contains("wired_nation"))
      val t = c.getTable("wh", "wired_nation")
      assert(t.dataColumns.map(_.name) == Seq("k", "name"))
      assert(t.storageFormat == "PARQUET")
      assert(t.tableType == "EXTERNAL_TABLE") // staged-location commit
      // the wire read path sees the committed rows
      val back = ThriftHiveMetastore.readTable(spark, "127.0.0.1", hms.port,
        "wh", "wired_nation")
      assert(back.count() == 25L)
      assert(back.agg(sum($"k")).head().getLong(0) == (0L until 25L).sum)
      // duplicate create raises the declared exception
      val dup = intercept[ThriftHiveMetastore.NoSuchObject](
        c.createTable(ThriftTable("wh", "wired_nation", "MANAGED_TABLE",
          Seq(ThriftColumn("k", "bigint")), Nil,
          "file:" + staged.getAbsolutePath, "PARQUET")))
      assert(dup.getMessage.contains("AlreadyExists"), dup.getMessage)
    } finally c.close()
  }

  test("full read resolves all metadata over the wire and matches the file path") {
    import spark.implicits._
    val wire = ThriftHiveMetastore.readTable(spark, "127.0.0.1", hms.port,
      "wh", "supp_part", partitionFilter = pv => pv("band") == "1")
    val direct = HiveFileCatalog.readTable(spark, warehouse, "wh", "supp_part",
      partitionFilter = pv => pv("band") == "1")
    val a = wire.agg(count(lit(1)), sum($"s_suppkey"), sum($"bal")).collect().head
    val b = direct.agg(count(lit(1)), sum($"s_suppkey"), sum($"bal")).collect().head
    assert(a == b)
    assert(a.getLong(0) > 0)
  }
}
