package graft

import org.apache.spark.sql.functions._

import graft.sources.EsWire
import graft.catalog.EsCatalog

/** Elasticsearch REST wire protocol: mapping/shard discovery, per-shard
  * scroll paging, query-DSL evaluation, and the DSv2 read path with
  * filter/column/limit pushdown (reference plugin/trino-elasticsearch:
  * ElasticsearchClient + ElasticsearchQueryBuilder + ScanQueryPageSource). */
class EsWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new EsWire.Server()
  override def afterAll(): Unit = srv.close()

  srv.createIndex("docs", Seq("title" -> "keyword", "score" -> "long",
    "price" -> "double", "live" -> "boolean"), shards = 3)
  (1 to 100).foreach { i =>
    srv.index("docs", i.toString, Map(
      "title" -> s"doc-$i", "score" -> i.toLong,
      "price" -> i * 1.5, "live" -> (i % 2 == 0)))
  }

  test("mapping and shard discovery over the wire") {
    val c = new EsWire.Client("127.0.0.1", srv.port)
    assert(c.mapping("docs").toMap == Map("title" -> "keyword",
      "score" -> "long", "price" -> "double", "live" -> "boolean"))
    assert(c.searchShards("docs") == Seq(0, 1, 2))
  }

  test("per-shard scroll pages the whole shard exactly once") {
    val c = new EsWire.Client("127.0.0.1", srv.port)
    val ids = (0 until 3).flatMap { shard =>
      var page = c.openScroll("docs", shard, """{"match_all":{}}""", None, 7)
      val got = scala.collection.mutable.ArrayBuffer[String]()
      got ++= page.hits.map(_._1)
      var more = page.hits.nonEmpty
      while (more) {
        page = c.nextPage(page.scrollId.get)
        got ++= page.hits.map(_._1)
        more = page.hits.nonEmpty
      }
      page.scrollId.foreach(c.clearScroll)
      got
    }
    assert(ids.size == 100)
    assert(ids.distinct.size == 100)
  }

  test("query DSL: term, terms, range, exists, bool compose server-side") {
    val c = new EsWire.Client("127.0.0.1", srv.port)
    def total(q: String): Long =
      (0 until 3).map(s => c.count("docs", s, q)).sum
    assert(total("""{"term":{"title":"doc-7"}}""") == 1)
    assert(total("""{"terms":{"score":[1,2,3]}}""") == 3)
    assert(total("""{"range":{"score":{"gte":10,"lt":20}}}""") == 10)
    assert(total("""{"exists":{"field":"price"}}""") == 100)
    assert(total(
      """{"bool":{"filter":[{"range":{"score":{"gt":50}}},{"term":{"live":true}}]}}""") == 25)
    assert(total("""{"bool":{"must_not":[{"term":{"live":true}}]}}""") == 50)
  }

  test("string ranges compare lexicographically, not by compareTo magnitude") {
    val c = new EsWire.Client("127.0.0.1", srv.port)
    // '1-URGENT' < '3-MEDIUM' has a first-char gap of 2: a sign-normalized
    // comparator must still match it (regression: -2 was a sentinel)
    srv.createIndex("prio", Seq("p" -> "keyword"), shards = 1)
    srv.index("prio", "a", Map("p" -> "1-URGENT"))
    srv.index("prio", "b", Map("p" -> "3-MEDIUM"))
    srv.index("prio", "c", Map("p" -> "5-LOW"))
    def total(q: String): Long = c.count("prio", 0, q)
    assert(total("""{"range":{"p":{"lt":"3-MEDIUM"}}}""") == 1)
    assert(total("""{"range":{"p":{"lte":"3-MEDIUM"}}}""") == 2)
    assert(total("""{"range":{"p":{"gt":"1-URGENT"}}}""") == 2)
  }

  test("spark read: schema from _mapping plus builtin _id; values decode") {
    val df = EsCatalog.read(spark, "127.0.0.1", srv.port, "docs")
    assert(df.schema.fieldNames.toSet ==
      Set("_id", "title", "score", "price", "live"))
    assert(df.count() == 100)
    val r = df.filter(col("_id") === "42").collect().head
    assert(r.getAs[String]("title") == "doc-42")
    assert(r.getAs[Long]("score") == 42L)
    assert(r.getAs[Double]("price") == 63.0)
    assert(r.getAs[Boolean]("live"))
  }

  test("filter pushdown reaches the query DSL and prunes server-side") {
    val before = srv.hitsServed.get()
    val df = EsCatalog.read(spark, "127.0.0.1", srv.port, "docs")
      .filter(col("score") > 90L && col("live") === true)
      .select("title", "score")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EsScan"), plan)
    assert(plan.contains("range") && plan.contains("term"), plan)
    assert(df.count() == 5)
    // only the 5 matching documents crossed the wire, not all 100
    assert(srv.hitsServed.get() - before <= 10,
      s"server served ${srv.hitsServed.get() - before} hits for a 5-hit query")
  }

  test("analyzed text fields are never pushed; keyword fields are") {
    // `body` is analyzed (`text`): a server-side term query on it would
    // match tokens, not the stored value — the filter must stay in Spark.
    srv.createIndex("posts", Seq("tag" -> "keyword", "body" -> "text",
      "n" -> "long"), shards = 1)
    (1 to 10).foreach(i => srv.index("posts", i.toString, Map(
      "tag" -> s"t${i % 3}", "body" -> s"hello world $i", "n" -> i.toLong)))
    val df = EsCatalog.read(spark, "127.0.0.1", srv.port, "posts")
      .filter(col("body") === "hello world 4" && col("tag") === "t1")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("""{"term":{"tag":"t1"}}"""), plan)
    assert(!plan.contains(""""body""""), plan) // text filter stays residual
    assert(df.count() == 1) // Spark evaluates the residual exactly
  }

  test("NaN comparison is not pushed as invalid query-DSL JSON") {
    val df = EsCatalog.read(spark, "127.0.0.1", srv.port, "docs")
    assert(df.filter(col("price") === Double.NaN).count() == 0)
    assert(df.filter(col("price") < Double.PositiveInfinity).count() == 100)
  }

  test("limit pushdown caps the scroll") {
    val before = srv.hitsServed.get()
    val df = EsCatalog.read(spark, "127.0.0.1", srv.port, "docs").limit(4)
    assert(df.collect().length == 4)
    // 3 shards × at most one page of size ≤ 4
    assert(srv.hitsServed.get() - before <= 12)
  }

  test("es_search TVF with raw_query passthrough") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT title FROM TABLE(es_search('127.0.0.1', ${srv.port}, 'docs',
          '{"range":{"score":{"lte":2}}}')) ORDER BY title""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("doc-1", "doc-2"))
  }
}
