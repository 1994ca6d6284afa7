package graft

import org.apache.spark.sql.functions._

import graft.sources.MongoWire
import graft.catalog.MongoCatalog

/** MongoDB wire protocol: BSON round trips, OP_MSG command loop,
  * find/getMore cursor paging, filter-document evaluation, and the DSv2
  * read path with `$`-operator pushdown (reference plugin/trino-mongodb). */
class MongoWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new MongoWire.Server()
  override def afterAll(): Unit = srv.close()

  srv.insert("shop", "products", (1 to 250).map { i =>
    Seq[(String, Any)]("sku" -> s"sku-$i", "qty" -> i.toLong,
      "price" -> i * 1.25, "active" -> (i % 3 == 0))
  })

  test("BSON codec round-trips every mapped type, order preserved") {
    val doc: MongoWire.Doc = Seq("s" -> "héllo", "i" -> 42, "l" -> 9999999999L,
      "d" -> 2.5, "b" -> true, "n" -> null,
      "sub" -> Seq[(String, Any)]("x" -> 1), "arr" -> Seq(1, 2, 3))
    val back = MongoWire.decodeDoc(MongoWire.encodeDoc(doc))
    assert(back.map(_._1) == doc.map(_._1))
    assert(MongoWire.get(back, "s").contains("héllo"))
    assert(MongoWire.get(back, "l").contains(9999999999L))
    assert(MongoWire.get(back, "sub").contains(Seq("x" -> 1)))
    assert(MongoWire.get(back, "arr").contains(Vector(1, 2, 3)))
    assert(MongoWire.get(back, "n").contains(null))
  }

  test("hello handshake and find with filter over the wire") {
    val c = new MongoWire.Client("127.0.0.1", srv.port)
    try {
      assert(MongoWire.get(c.hello(), "maxWireVersion").contains(17))
      val hits = c.find("shop", "products",
        filter = Seq("qty" -> Seq("$gt" -> 245L))).toVector
      assert(hits.size == 5)
      assert(hits.forall(d => MongoWire.get(d, "qty").get.asInstanceOf[Long] > 245))
    } finally c.close()
  }

  test("getMore pages the cursor: every document exactly once") {
    val c = new MongoWire.Client("127.0.0.1", srv.port)
    try {
      val all = c.find("shop", "products", batchSize = 40).toVector
      assert(all.size == 250)
      assert(all.map(d => MongoWire.get(d, "sku").get).distinct.size == 250)
    } finally c.close()
  }

  test("filter operators: $in, $or, implicit equality, $exists") {
    val c = new MongoWire.Client("127.0.0.1", srv.port)
    try {
      assert(c.find("shop", "products",
        Seq("qty" -> Seq("$in" -> Seq(1L, 2L, 3L)))).size == 3)
      assert(c.find("shop", "products",
        Seq("$or" -> Seq(Seq("qty" -> Seq("$lt" -> 3L)),
          Seq("qty" -> Seq("$gt" -> 248L))))).size == 4)
      assert(c.find("shop", "products", Seq("sku" -> "sku-7")).size == 1)
      assert(c.find("shop", "products",
        Seq("missing" -> Seq("$exists" -> true))).isEmpty)
    } finally c.close()
  }

  test("null operators: $eq:null matches null/missing, $ne:null excludes") {
    srv.insert("shop", "maybe", Seq(
      Seq[(String, Any)]("k" -> 1L, "v" -> "x"),
      Seq[(String, Any)]("k" -> 2L, "v" -> null),
      Seq[(String, Any)]("k" -> 3L))) // v missing entirely
    val c = new MongoWire.Client("127.0.0.1", srv.port)
    try {
      assert(c.find("shop", "maybe", Seq("v" -> Seq("$eq" -> null)))
        .map(d => MongoWire.get(d, "k").get).toSet == Set(2L, 3L))
      assert(c.find("shop", "maybe", Seq("v" -> Seq("$ne" -> null)))
        .map(d => MongoWire.get(d, "k").get).toSet == Set(1L))
    } finally c.close()
    // the pushed IsNull/IsNotNull filters ride these operators
    import org.apache.spark.sql.functions.col
    val df = MongoCatalog.read(spark, "127.0.0.1", srv.port, "shop", "maybe",
      schemaDdl = Some("k LONG, v STRING"))
    assert(df.filter(col("v").isNull).count() == 2)
    assert(df.filter(col("v").isNotNull).count() == 1)
  }

  test("spark read: sampled schema, pushdown filter + projection + limit") {
    val df = MongoCatalog.read(spark, "127.0.0.1", srv.port, "shop", "products")
    assert(df.schema.fieldNames.toSet == Set("sku", "qty", "price", "active"))
    assert(df.count() == 250)
    val filtered = df.filter(col("qty") > 200L && col("active") === true)
      .select("sku", "qty")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("MongoScan"), plan)
    assert(plan.contains("$gt"), plan)
    assert(filtered.count() === (201 to 250).count(_ % 3 == 0))
    assert(df.limit(7).collect().length == 7)
  }

  test("declared-schema read skips sampling") {
    val df = MongoCatalog.read(spark, "127.0.0.1", srv.port, "shop", "products",
      schemaDdl = Some("sku STRING, qty LONG"))
    assert(df.schema.fieldNames.toSeq == Seq("sku", "qty"))
    assert(df.agg(sum("qty")).collect().head.getLong(0) == (1 to 250).map(_.toLong).sum)
  }
}
