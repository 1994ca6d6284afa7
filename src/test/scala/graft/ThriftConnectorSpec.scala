package graft

import org.apache.spark.sql.functions._

import graft.sources.ThriftConnector
import graft.sources.ThriftConnector.{Col, TableData}

/** Generic thrift data-source protocol: the five TrinoThriftService
  * methods over strict TBinaryProtocol, batched splits with nextToken,
  * per-split typed-column-block pages, and the DSv2 read path with
  * wire-level column pruning (reference plugin/trino-thrift +
  * plugin/trino-thrift-api). */
class ThriftConnectorSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new ThriftConnector.Server(rowsPerSplit = 100, pageRows = 37)
  override def afterAll(): Unit = srv.close()

  srv.register(TableData("web", "clicks",
    Seq(Col("click_id", "bigint"), Col("url", "varchar"), Col("dwell", "double"),
      Col("converted", "boolean"), Col("hour", "integer")),
    (1 to 350).map(i => Array[Any](i.toLong,
      if (i % 50 == 0) null else s"/page/$i", i * 0.1, i % 7 == 0, i % 24)).toVector))
  srv.register(TableData("web", "tiny",
    Seq(Col("k", "bigint")), Vector(Array[Any](1L))))

  test("schema discovery: listSchemaNames / listTables / tableMetadata") {
    val c = new ThriftConnector.Client("127.0.0.1", srv.port)
    try {
      assert(c.listSchemaNames() == Seq("web"))
      assert(c.listTables(Some("web")).toSet == Set(("web", "clicks"), ("web", "tiny")))
      val cols = c.tableMetadata("web", "clicks")
      assert(cols.map(_.name) == Seq("click_id", "url", "dwell", "converted", "hour"))
      assert(cols.map(_.tpe) == Seq("bigint", "varchar", "double", "boolean", "integer"))
      val e = intercept[IllegalArgumentException](c.tableMetadata("web", "nope"))
      assert(e.getMessage.contains("no such table"))
    } finally c.close()
  }

  test("split batches page through nextToken; pages drain each split once") {
    val c = new ThriftConnector.Client("127.0.0.1", srv.port)
    try {
      val splits = c.splits("web", "clicks", maxPerBatch = 2) // 4 splits → 2 batches
      assert(splits.size == 4)
      val cols = c.tableMetadata("web", "clicks")
      val all = splits.flatMap(id => c.rows(id, cols).toVector)
      assert(all.size == 350)
      assert(all.map(_.head).distinct.size == 350)
      // null mask round-trips through the varchar block
      assert(all.count(_(1) == null) == 7)
    } finally c.close()
  }

  test("spark read: metadata schema, split partitions, typed decode") {
    val df = ThriftConnector.read(spark, "127.0.0.1", srv.port, "web", "clicks")
    assert(df.schema.fieldNames.toSeq ==
      Seq("click_id", "url", "dwell", "converted", "hour"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 350)
    val r = df.filter(col("click_id") === 7L).collect().head
    assert(r.getAs[String]("url") == "/page/7")
    assert(r.getAs[Boolean]("converted"))
    assert(r.getAs[Int]("hour") == 7)
  }

  test("column pruning reaches the wire: unprojected columns never travel") {
    srv.columnsRequested.clear()
    val df = ThriftConnector.read(spark, "127.0.0.1", srv.port, "web", "clicks")
      .select("click_id", "dwell")
    assert(df.collect().length == 350)
    import scala.jdk.CollectionConverters._
    val asked = srv.columnsRequested.asScala.toVector.filter(_.nonEmpty)
    assert(asked.nonEmpty)
    assert(asked.forall(_.toSet == Set("click_id", "dwell")),
      s"wire saw: ${asked.distinct}")
  }

  test("thrift_table TVF from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"SELECT k FROM TABLE(thrift_table('127.0.0.1', ${srv.port}, 'web', 'tiny'))")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
