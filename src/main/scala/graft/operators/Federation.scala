package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.DerbyCatalog

/** Connector federation (SURVEY.md §2.1): queries spanning the parquet catalog
  * and a second, embedded-JDBC (Derby) catalog.
  *
  * Reference mapping:
  *  - JDBC connector family → `graft.catalog.DerbyCatalog` on `spark.read.jdbc`
  *    (reference: plugin/trino-base-jdbc/src/main/java/io/trino/plugin/jdbc/BaseJdbcClient.java).
  *  - Predicate/projection pushdown into the connector
  *    (reference: core/trino-main/src/main/java/io/trino/sql/planner/iterative/rule/PushPredicateIntoTableScan.java:78)
  *    → the JDBC relation's PushedFilters + pruned remote SELECT, asserted in
  *    FederationSpec.
  *  - Index join (reference: core/trino-main/src/main/java/io/trino/sql/planner/plan/IndexJoinNode.java)
  *    → `DerbyCatalog.indexLookupJoin` — bounded key-set lookup pushed remote.
  *  - `TABLE(system.query(...))` pass-through → `DerbyCatalog.query`.
  *
  * The DuckDB oracle runs the same SQL against the parquet `orders` fixture —
  * valid because the JDBC catalog is populated from exactly that fixture.
  *
  * Scale: the federated side reads as 4 range-disjoint splits (split enumeration
  * via one bounds query); the parquet fact side keeps its native partitioning;
  * the join shuffles on the join key only after remote-side filtering.
  */
object Federation {

  /** Federated join: parquet lineitem (fact) ⋈ jdbc orders (filtered remote). */
  def q_fed_join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val remoteOrders = DerbyCatalog.ordersPartitioned(s, dir)
      .filter($"o_totalprice" > 200000.0)
      .select($"o_orderkey", $"o_orderpriority")
    val l = table(s, dir, "lineitem")
    l.join(remoteOrders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("line_count"),
        asDouble(sum(dec($"l_extendedprice"))).as("total_price"))
      .orderBy($"o_orderpriority")
  }
  val qFedJoinSql: String =
    """SELECT o_orderpriority,
              count(*) AS line_count,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_totalprice > 200000.0
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Pushdown probe: filter + 2-column projection must reach the remote SELECT. */
  def q_fed_pushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    DerbyCatalog.orders(s, dir)
      .filter($"o_orderstatus" === "F" && $"o_totalprice" < 2000.0)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }
  val qFedPushdownSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderstatus = 'F' AND o_totalprice < 2000.0
       ORDER BY o_orderkey"""

  /** Index join: a small probe set of hot orderkeys looked up remotely by key. */
  def q_fed_index_join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probe = table(s, dir, "lineitem")
      .filter($"l_quantity" >= 50.0 && $"l_discount" >= 0.09)
      .select($"l_orderkey", $"l_extendedprice")
    DerbyCatalog.indexLookupJoin(s, dir, probe, "l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("hits"),
        asDouble(sum(dec($"l_extendedprice"))).as("probe_price"))
      .orderBy($"o_orderpriority")
  }
  val qFedIndexJoinSql: String =
    """SELECT o_orderpriority,
              count(*) AS hits,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS probe_price
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_quantity >= 50.0 AND l_discount >= 0.09
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Remote pass-through: the aggregate runs entirely inside Derby (exact
    * DECIMAL sum so the result is order-independent and engine-exact). */
  def q_fed_query_passthrough(s: SparkSession, dir: String): DataFrame = {
    // Derby-side SQL: identifiers quoted (Derby folds unquoted names to upper
    // case; the JDBC writer created case-sensitive lower-case columns).
    val remote = DerbyCatalog.query(s, dir,
      """SELECT "o_orderpriority",
                COUNT(*) AS "order_count",
                CAST(SUM(CAST("o_totalprice" AS DECIMAL(12,2))) AS DOUBLE) AS "total"
         FROM orders GROUP BY "o_orderpriority"""")
    remote.orderBy(col("o_orderpriority"))
      .select(
        col("o_orderpriority"),
        col("order_count").cast("long").as("order_count"),
        col("total"))
  }
  val qFedQueryPassthroughSql: String =
    """SELECT o_orderpriority,
              count(*) AS order_count,
              CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** THREE-catalog federated join through multi-catalog SQL names: the JDBC
    * catalog (`graft_jdbc.orders`, Spark's JDBCTableCatalog over embedded
    * Derby), the declared-schema CSV catalog (`graft_csv.default.customer`,
    * graft.catalog.CsvFileCatalog), and the default parquet catalog
    * (`nation`) — resolved in ONE SQL statement like the reference's
    * `catalog.schema.table` names (reference: core/trino-main/src/main/java/
    * io/trino/metadata/MetadataManager.java:298). Filters push into each
    * connector independently (FederationSpec asserts the CSV and JDBC scans);
    * only filtered rows shuffle for the joins. */
  def q_fed_three_catalogs(s: SparkSession, dir: String): DataFrame = {
    graft.catalog.CsvFileCatalog.ensure(s, dir)
    graft.catalog.CsvFileCatalog.ensureJdbcCatalog(s, dir)
    graft.sqlx.TrinoDialect.sql(s, dir,
      """SELECT n_name,
         count(*) AS order_cnt,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
         FROM graft_jdbc.APP.ORDERS o
         JOIN graft_csv.default.customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE c.c_mktsegment = 'BUILDING' AND o.o_totalprice > 100000.0
         GROUP BY n_name ORDER BY n_name""")
  }
  val qFedThreeCatalogsSql: String =
    """SELECT n_name,
       count(*) AS order_cnt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 100000.0
       GROUP BY n_name ORDER BY n_name"""

  /** CREATE CATALOG DDL end to end (reference SqlBase.g4:58 +
    * CreateCatalogTask over CatalogStore): the catalog named `ddlcat` is
    * created FROM SQL TEXT with connector properties, becomes a live Spark
    * CatalogPlugin, and the very same statement session queries through it
    * with multi-part names — no programmatic registration anywhere. The
    * registration is also persisted to the catalog-store directory, the
    * restart contract (CatalogDdlSpec covers reload + DROP + the unknown-
    * connector error shape). */
  def q_sqlx_create_catalog(s: SparkSession, dir: String): DataFrame = {
    graft.catalog.CsvFileCatalog.ensure(s, dir) // stages the CSV files
    val root = s.conf.get("spark.sql.catalog.graft_csv.path")
    graft.sqlx.TrinoDialect.sql(s, dir,
      s"CREATE CATALOG IF NOT EXISTS ddlcat USING csv WITH (path = '$root')")
    graft.sqlx.TrinoDialect.sql(s, dir,
      """SELECT c_mktsegment,
         count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS balance
         FROM ddlcat.default.customer
         WHERE c_acctbal > 0.0
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }
  val qSqlxCreateCatalogSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS balance
       FROM customer
       WHERE c_acctbal > 0.0
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Generated TPC-H catalog (reference plugin/trino-tpch): revenue by
    * region over five GENERATED tables — the whole pipeline runs with zero
    * input I/O; dims broadcast off the source's reported statistics. The
    * oracle replays the generator formulas over DuckDB range() (the 1:1
    * formula contract in catalog.TpchGen.oracleCte). sf is fixed at 0.01
    * (independent of `dir`: the source generates, it does not read). */
  def q_fed_tpch_generated(s: SparkSession, dir: String): DataFrame = {
    graft.catalog.TpchGen.ensure(s, 0.01)
    s.sql(
      """SELECT r.r_name,
           count(*) AS n_lines,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM graft_tpch.default.lineitem l
         JOIN graft_tpch.default.orders o ON l.l_orderkey = o.o_orderkey
         JOIN graft_tpch.default.customer c ON o.o_custkey = c.c_custkey
         JOIN graft_tpch.default.nation n ON c.c_nationkey = n.n_nationkey
         JOIN graft_tpch.default.region r ON n.n_regionkey = r.r_regionkey
         WHERE o.o_orderstatus = 'F'
         GROUP BY r.r_name ORDER BY r.r_name""")
  }
  val qFedTpchGeneratedSql: String = {
    import graft.catalog.TpchGen
    s"""WITH lineitem_g AS (${TpchGen.oracleCte("lineitem", 0.01)}),
         orders_g AS (${TpchGen.oracleCte("orders", 0.01)}),
         customer_g AS (${TpchGen.oracleCte("customer", 0.01)}),
         nation_g AS (${TpchGen.oracleCte("nation", 0.01)}),
         region_g AS (${TpchGen.oracleCte("region", 0.01)})
       SELECT r.r_name,
         count(*) AS n_lines,
         CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem_g l
       JOIN orders_g o ON l.l_orderkey = o.o_orderkey
       JOIN customer_g c ON o.o_custkey = c.c_custkey
       JOIN nation_g n ON c.c_nationkey = n.n_nationkey
       JOIN region_g r ON n.n_regionkey = r.r_regionkey
       WHERE o.o_orderstatus = 'F'
       GROUP BY r.r_name ORDER BY r.r_name"""
  }

  /** Memory connector end-to-end (reference plugin/trino-memory): CTAS a
    * band of orders into `graft_mem.default`, INSERT a second disjoint band
    * (append), then run a federated join of the RAM table against the
    * parquet lineitem fact. The oracle replays the union of both bands
    * straight from parquet — any lost/duplicated block (a commit bug)
    * changes the counts. The fact side shuffles once on the join key; the
    * memory side re-parallelizes into its writer-task blocks. */
  def q_fed_memory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.catalog.MemoryStore.register(s)
    s.sql("DROP TABLE IF EXISTS graft_mem.default.top_orders")
    val orders = table(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
    orders.filter($"o_totalprice" > 300000.0)
      .writeTo("graft_mem.default.top_orders").create()
    orders.filter($"o_totalprice" > 250000.0 && $"o_totalprice" <= 300000.0)
      .writeTo("graft_mem.default.top_orders").append()
    val mem = s.table("graft_mem.default.top_orders")
    table(s, dir, "lineitem")
      .join(mem, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("line_count"),
        countDistinct($"o_orderkey").as("order_count"),
        asDouble(sum(dec($"l_extendedprice"))).as("revenue"))
      .orderBy($"o_orderpriority")
  }
  val qFedMemorySql: String =
    """SELECT o_orderpriority,
              count(*) AS line_count,
              count(DISTINCT o_orderkey) AS order_count,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_totalprice > 250000.0
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** Avro-format connector end-to-end (reference lib/trino-hive-formats
    * avro readers — `STORED AS AVRO` hive tables): the orders fixture is
    * materialized as avro container files (distributed write, one file per
    * partition), the catalog resolves the table schema from the avro file
    * HEADER (self-describing, no declared schema), scans split on sync
    * markers, and the result joins the parquet fact. Oracle replays from
    * parquet — any decode or split-boundary bug changes counts/sums. */
  def q_fed_avro(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.catalog.AvroIO.ensure(s, dir)
    val av = s.table("graft_avro.default.orders")
      .filter(year($"o_orderdate") === 1996)
      .select($"o_orderkey", $"o_orderpriority")
    table(s, dir, "lineitem")
      .join(av, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("line_count"),
        asDouble(sum(dec($"l_extendedprice"))).as("revenue"))
      .orderBy($"o_orderpriority")
  }
  val qFedAvroSql: String =
    """SELECT o_orderpriority,
              count(*) AS line_count,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE year(o_orderdate) = 1996
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** One loopback Redis node per testdata dir, seeded once: customers with
    * account balance > 0 as STRING values (JSON, key `customer:<key>`) and
    * nations as HASH values (key `nation:<key>`). Bounded fixture build —
    * sf0.01 customer is 1.5k rows here; a real deployment points the same
    * wire client at real nodes. */
  private val redisNodes = scala.collection.mutable.Map[String, graft.sources.RedisWire.Server]()
  private def ensureRedis(s: SparkSession, dir: String): Int = synchronized {
    redisNodes.getOrElseUpdate(dir, {
      import s.implicits._
      val srv = new graft.sources.RedisWire.Server()
      table(s, dir, "customer")
        .filter($"c_acctbal" > 0.0)
        .select($"c_custkey", to_json(struct($"c_custkey", $"c_name",
          $"c_nationkey", $"c_acctbal")))
        .collect()
        .foreach(r => srv.set(s"customer:${r.getLong(0)}", r.getString(1)))
      table(s, dir, "nation").collect().foreach { r =>
        srv.hset(s"nation:${r.getAs[Long]("n_nationkey")}", Map(
          "n_nationkey" -> r.getAs[Long]("n_nationkey").toString,
          "n_name" -> r.getAs[String]("n_name"),
          "n_regionkey" -> r.getAs[Long]("n_regionkey").toString))
      }
      srv
    }).port
  }

  /** Redis key/value connector over the RESP WIRE PROTOCOL
    * (graft.sources.RedisWire; reference plugin/trino-redis —
    * RedisSplitManager's node splits + RedisRecordCursor's SCAN/MGET/
    * HGETALL consumption, internal columns `_key`/`_value`/lengths).
    * STRING values decode as declared JSON; HASH values arrive as the
    * field map (re-encoded JSON here) — both decode with from_json and
    * join. The SCAN MATCH prefix prunes server-side, like the reference's
    * `schema:table:*` key-prefix scan. */
  def q_fed_redis(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureRedis(s, dir)
    val nodes = Seq(("127.0.0.1", port))
    val customers = graft.sources.RedisWire
      .read(s, nodes, keyPattern = Some("customer:*"))
      .withColumn("m", from_json($"_value", org.apache.spark.sql.types.StructType.fromDDL(
        "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE")))
      .select($"m.*", $"_value_length")
    // hash fields arrive as JSON string values — parse as strings, then cast
    val nations = graft.sources.RedisWire
      .read(s, nodes, keyPattern = Some("nation:*"))
      .withColumn("m", from_json($"_value", org.apache.spark.sql.types.StructType.fromDDL(
        "n_nationkey STRING, n_name STRING, n_regionkey STRING")))
      .select($"m.n_nationkey".cast("long").as("n_nationkey"), $"m.n_name".as("n_name"))
    customers
      .join(broadcast(nations), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"),
        asDouble(sum(dec($"c_acctbal"))).as("total_balance"),
        sum($"_value_length").as("value_bytes"))
      .filter($"n_customers" > 0)
      .select($"n_name", $"n_customers", $"total_balance")
      .orderBy($"n_name")
  }
  val qFedRedisSql: String =
    """SELECT n_name, count(*) AS n_customers,
              CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       WHERE c_acctbal > 0.0
       GROUP BY n_name
       ORDER BY n_name"""

  /** One loopback Elasticsearch node per testdata dir, seeded once from
    * orders (3 shards, hash-routed by _id). Bounded fixture build; a real
    * deployment points the same wire client at a live cluster. */
  private val esNodes = scala.collection.mutable.Map[String, graft.sources.EsWire.Server]()
  private def ensureEs(s: SparkSession, dir: String): Int = synchronized {
    esNodes.getOrElseUpdate(dir, {
      val srv = new graft.sources.EsWire.Server()
      srv.createIndex("orders_idx", Seq(
        "o_orderkey" -> "long", "o_custkey" -> "long",
        "o_orderstatus" -> "keyword", "o_orderpriority" -> "keyword",
        "o_totalprice" -> "double"), shards = 3)
      table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
          "o_totalprice")
        .collect()
        .foreach { r =>
          srv.index("orders_idx", r.getLong(0).toString, Map(
            "o_orderkey" -> r.getLong(0), "o_custkey" -> r.getLong(1),
            "o_orderstatus" -> r.getString(2), "o_orderpriority" -> r.getString(3),
            "o_totalprice" -> r.getDouble(4)))
        }
      srv
    }).port
  }

  /** Elasticsearch connector over the REST wire protocol
    * (graft.catalog.EsCatalog; reference plugin/trino-elasticsearch —
    * split per shard from `_search_shards`, per-shard scroll, query-DSL
    * pushdown). The status filter and the totalprice range below are
    * PUSHED into the bool/filter query and evaluated server-side; the
    * aggregation runs in Spark over only the matching documents. */
  def q_fed_es(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureEs(s, dir)
    graft.catalog.EsCatalog.read(s, "127.0.0.1", port, "orders_idx")
      .filter($"o_orderstatus" === "F" && $"o_totalprice" > 150000.0)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec($"o_totalprice"))).as("total"))
      .orderBy($"o_orderpriority")
  }
  val qFedEsSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM orders
       WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** One loopback PostgreSQL node per testdata dir, seeded once from part.
    * Bounded fixture build; a real deployment points the wire client at a
    * live server. */
  private val pgNodes = scala.collection.mutable.Map[String, graft.sources.PgWire.Server]()
  private def ensurePg(s: SparkSession, dir: String): Int = synchronized {
    pgNodes.getOrElseUpdate(dir, {
      import graft.sources.PgWire
      val srv = new PgWire.Server()
      val rows = table(s, dir, "part")
        .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
        .collect()
        .map(r => Array[Any](r.getLong(0), r.getString(1), r.getString(2),
          r.getInt(3), r.getDouble(4)))
        .toVector
      srv.createTable("part", Seq(
        PgWire.Column("p_partkey", PgWire.OidInt8),
        PgWire.Column("p_brand", PgWire.OidVarchar),
        PgWire.Column("p_type", PgWire.OidVarchar),
        PgWire.Column("p_size", PgWire.OidInt4),
        PgWire.Column("p_retailprice", PgWire.OidFloat8)), rows)
      srv
    }).port
  }

  /** PostgreSQL connector over wire protocol v3 (graft.catalog.PgCatalog;
    * reference plugin/trino-postgresql over trino-base-jdbc). The size and
    * brand predicates are rendered into each split's remote SQL and
    * evaluated in the remote engine; splits are p_partkey ranges from one
    * MIN/MAX metadata query, each streamed on its own executor socket. */
  def q_fed_pg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensurePg(s, dir)
    graft.catalog.PgCatalog.read(s, "127.0.0.1", port, "part",
      partitionColumn = Some("p_partkey"), numPartitions = 4)
      .filter($"p_size" >= 20 && $"p_brand" =!= "Brand#45")
      .groupBy($"p_type")
      .agg(count(lit(1)).as("n_parts"),
        asDouble(sum(dec($"p_retailprice"))).as("retail"))
      .filter($"n_parts" > 1)
      .orderBy($"p_type")
  }
  val qFedPgSql: String =
    """SELECT p_type, count(*) AS n_parts,
              CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS retail
       FROM part
       WHERE p_size >= 20 AND p_brand <> 'Brand#45'
       GROUP BY p_type
       HAVING count(*) > 1
       ORDER BY p_type"""

  /** Aggregate pushdown into the SQL-speaking connector (reference
    * core/trino-main PushAggregationIntoTableScan.java:65; Spark DSv2
    * SupportsPushDownAggregates). The whole GROUP BY executes REMOTELY:
    * each p_partkey-range split ships `SELECT p_brand, COUNT(*), SUM(…),
    * MIN(…), MAX(…) … GROUP BY p_brand` to its socket and only |brands|
    * rows cross the wire per split — at 100 TB federation scale this is
    * the difference between moving the table and moving the answer. All
    * pushed aggregates here are EXACT in any evaluation order (count,
    * integer sum, min/max), so the hash oracle holds. */
  def q_fed_pg_agg_pushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensurePg(s, dir)
    graft.catalog.PgCatalog.read(s, "127.0.0.1", port, "part",
      partitionColumn = Some("p_partkey"), numPartitions = 4)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum($"p_size").as("size_sum"),
        min($"p_retailprice").as("lo_price"),
        max($"p_retailprice").as("hi_price"))
      .orderBy($"p_brand")
  }
  val qFedPgAggPushdownSql: String =
    """SELECT p_brand, count(*) AS n_parts,
              CAST(sum(p_size) AS BIGINT) AS size_sum,
              min(p_retailprice) AS lo_price,
              max(p_retailprice) AS hi_price
       FROM part
       GROUP BY p_brand
       ORDER BY p_brand"""

  /** One loopback Prometheus node per testdata dir: one series per nation
    * (`graft_customers{n_name=…}`), DENSE minute-grid samples at
    * base + slot·60s where value = COUNT of that nation's customers with
    * c_custkey % 60 == slot (zeros included, so range evaluation returns
    * exactly the seeded grid — no staleness interpolation ambiguity). */
  private val promBase = 1700000000L
  private val promNodes = scala.collection.mutable.Map[String, graft.sources.PromWire.Server]()
  private def ensureProm(s: SparkSession, dir: String): Int = synchronized {
    promNodes.getOrElseUpdate(dir, {
      import s.implicits._
      val srv = new graft.sources.PromWire.Server()
      val counts = table(s, dir, "customer")
        .join(table(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name", ($"c_custkey" % 60).as("slot"))
        .count()
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2).toDouble))
      val byNation = counts.groupBy(_._1)
      byNation.foreach { case (nation, cells) =>
        val bySlot = cells.map(c => c._2 -> c._3).toMap
        srv.addSeries(graft.sources.PromWire.Series("graft_customers",
          Map("n_name" -> nation),
          (0L until 60L).map(m =>
            (promBase + m * 60L, bySlot.getOrElse(m, 0.0))).toVector))
      }
      srv
    }).port
  }

  /** Prometheus connector over the HTTP API (graft.sources.PromWire;
    * reference plugin/trino-prometheus — query_range matrix responses,
    * TIME-CHUNK SPLITS so each executor fetches its own sub-range, rows =
    * (labels, timestamp, value)). The selector is the pushed "table";
    * zero-count grid cells are filtered in Spark. */
  def q_fed_prom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureProm(s, dir)
    graft.sources.PromWire.read(s, "127.0.0.1", port, "graft_customers",
      start = promBase, end = promBase + 59 * 60L, step = 60L, chunks = 6)
      .filter($"value" > 0.0)
      .select($"labels".getItem("n_name").as("n_name"),
        (($"ts" - promBase) / 60L).cast("long").as("slot"),
        $"value")
      .orderBy($"n_name", $"slot")
  }
  val qFedPromSql: String =
    """SELECT n_name, CAST(c_custkey % 60 AS BIGINT) AS slot,
              CAST(count(*) AS DOUBLE) AS value
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name, c_custkey % 60
       ORDER BY n_name, slot"""

  /** One loopback MongoDB node per testdata dir, seeded once from
    * supplier. Bounded fixture build; a real deployment points the wire
    * client at a live replica set. */
  private val mongoNodes = scala.collection.mutable.Map[String, graft.sources.MongoWire.Server]()
  private def ensureMongo(s: SparkSession, dir: String): Int = synchronized {
    mongoNodes.getOrElseUpdate(dir, {
      val srv = new graft.sources.MongoWire.Server()
      val docs = table(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .collect()
        .map(r => Seq[(String, Any)]("s_suppkey" -> r.getLong(0),
          "s_name" -> r.getString(1), "s_nationkey" -> r.getInt(2).toLong,
          "s_acctbal" -> r.getDouble(3)))
      srv.insert("graft", "supplier", docs.toSeq)
      srv
    }).port
  }

  /** MongoDB connector over the OP_MSG wire protocol
    * (graft.catalog.MongoCatalog; reference plugin/trino-mongodb). The
    * balance predicate is pushed as a `$gt` filter document and evaluated
    * server-side; the projection document prunes to the three used fields;
    * the cursor streams batches through O(batch) executor memory. */
  def q_fed_mongo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureMongo(s, dir)
    graft.catalog.MongoCatalog.read(s, "127.0.0.1", port, "graft", "supplier",
      schemaDdl = Some("s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE"))
      .filter($"s_acctbal" > 1000.0)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        asDouble(sum(dec($"s_acctbal"))).as("total_balance"))
      .orderBy($"s_nationkey")
  }
  val qFedMongoSql: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n_suppliers,
              CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
       FROM supplier
       WHERE s_acctbal > 1000.0
       GROUP BY s_nationkey
       ORDER BY s_nationkey"""

  /** One loopback ClickHouse node per testdata dir, seeded once from
    * lineitem's first 20k rows by orderkey (bounded fixture build). */
  private val chNodes = scala.collection.mutable.Map[String, graft.sources.ClickHouseWire.Server]()
  private def ensureCh(s: SparkSession, dir: String): Int = synchronized {
    chNodes.getOrElseUpdate(dir, {
      import s.implicits._
      import graft.sources.PgWire
      val srv = new graft.sources.ClickHouseWire.Server()
      val rows = table(s, dir, "lineitem")
        .filter($"l_orderkey" <= 20000L)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
          "l_extendedprice")
        .collect()
        .map(r => Array[Any](r.getLong(0), r.getInt(1).toLong, r.getString(2),
          r.getDouble(3), r.getDouble(4)))
        .toVector
      srv.createTable("lineitem", Seq(
        PgWire.Column("l_orderkey", PgWire.OidInt8),
        PgWire.Column("l_linenumber", PgWire.OidInt8),
        PgWire.Column("l_returnflag", PgWire.OidVarchar),
        PgWire.Column("l_quantity", PgWire.OidFloat8),
        PgWire.Column("l_extendedprice", PgWire.OidFloat8)), rows)
      srv
    }).port
  }

  /** ClickHouse connector over the HTTP interface
    * (graft.catalog.ChCatalog; reference plugin/trino-clickhouse). The
    * quantity filter renders into each split's remote SQL; splits are
    * l_orderkey ranges; each split STREAMS its TSV response line by line
    * on its executor. */
  def q_fed_clickhouse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureCh(s, dir)
    graft.catalog.ChCatalog.read(s, "127.0.0.1", port, "lineitem",
      partitionColumn = Some("l_orderkey"), numPartitions = 4)
      .filter($"l_quantity" >= 45.0)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        asDouble(sum(dec($"l_extendedprice"))).as("revenue"))
      .orderBy($"l_returnflag")
  }
  val qFedClickhouseSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_orderkey <= 20000 AND l_quantity >= 45.0
       GROUP BY l_returnflag
       ORDER BY l_returnflag"""

  /** One loopback Cassandra node per testdata dir, seeded once from
    * customer (partition key c_custkey → murmur3 ring placement). */
  private val cassNodes = scala.collection.mutable.Map[String, graft.sources.CassandraWire.Server]()
  private def ensureCassandra(s: SparkSession, dir: String): Int = synchronized {
    cassNodes.getOrElseUpdate(dir, {
      import graft.sources.CassandraWire
      val srv = new CassandraWire.Server()
      val rows = table(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
        .collect()
        .map(r => Array[Any](r.getLong(0), r.getString(1), r.getInt(2),
          r.getDouble(3)))
        .toVector
      srv.createTable("graft", "customer", Seq(
        CassandraWire.CqlColumn("c_custkey", CassandraWire.TBigint),
        CassandraWire.CqlColumn("c_mktsegment", CassandraWire.TVarchar),
        CassandraWire.CqlColumn("c_nationkey", CassandraWire.TInt),
        CassandraWire.CqlColumn("c_acctbal", CassandraWire.TDouble)), rows)
      srv
    }).port
  }

  /** Cassandra connector over the CQL native protocol
    * (graft.catalog.CassandraCatalog; reference plugin/trino-cassandra).
    * Splits are MURMUR3 TOKEN RANGES — each executor drives its own paged
    * QUERY for one ring slice, so every customer row crosses the wire in
    * exactly one split; the balance predicate rides each split's CQL. */
  def q_fed_cassandra(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureCassandra(s, dir)
    graft.catalog.CassandraCatalog.read(s, "127.0.0.1", port,
      "graft", "customer", splits = 4)
      .filter($"c_acctbal" < 0.0)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        asDouble(sum(dec($"c_acctbal"))).as("debt"))
      .orderBy($"c_mktsegment")
  }
  val qFedCassandraSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
              CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS debt
       FROM customer
       WHERE c_acctbal < 0.0
       GROUP BY c_mktsegment
       ORDER BY c_mktsegment"""

  /** One loopback Pinot broker per testdata dir, seeded once from orders. */
  private val pinotNodes = scala.collection.mutable.Map[String, graft.sources.PinotWire.Server]()
  private def ensurePinot(s: SparkSession, dir: String): Int = synchronized {
    pinotNodes.getOrElseUpdate(dir, {
      import graft.sources.PgWire
      val srv = new graft.sources.PinotWire.Server()
      val rows = table(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
        .map(r => Array[Any](r.getLong(0), r.getString(1), r.getDouble(2)))
        .toVector
      srv.createTable("orders", Seq(
        PgWire.Column("o_orderkey", PgWire.OidInt8),
        PgWire.Column("o_orderstatus", PgWire.OidVarchar),
        PgWire.Column("o_totalprice", PgWire.OidFloat8)), rows)
      srv
    }).port
  }

  /** Pinot connector over the broker API (graft.catalog.PinotCatalog;
    * reference plugin/trino-pinot). The price range renders into the
    * broker SQL — Pinot's own servers do the segment fan-out, Spark sees
    * only matching rows. */
  def q_fed_pinot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensurePinot(s, dir)
    graft.catalog.PinotCatalog.read(s, "127.0.0.1", port, "orders")
      .filter($"o_totalprice" >= 100000.0 && $"o_totalprice" < 200000.0)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec($"o_totalprice"))).as("total"))
      .orderBy($"o_orderstatus")
  }
  val qFedPinotSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM orders
       WHERE o_totalprice >= 100000.0 AND o_totalprice < 200000.0
       GROUP BY o_orderstatus
       ORDER BY o_orderstatus"""

  /** One loopback Loki node per testdata dir: one stream per order
    * priority, entry ts = base + o_orderkey nanos, line carrying the
    * status + price. */
  private val lokiBase = 1700000000000000000L
  private val lokiNodes = scala.collection.mutable.Map[String, graft.sources.LokiWire.Server]()
  private def ensureLoki(s: SparkSession, dir: String): (Int, Long) = synchronized {
    val srv = lokiNodes.getOrElseUpdate(dir, {
      val node = new graft.sources.LokiWire.Server()
      val rows = table(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .collect()
      rows.groupBy(_.getString(1)).foreach { case (prio, rs) =>
        node.addStream(graft.sources.LokiWire.Stream(
          Map("app" -> "orders", "priority" -> prio),
          rs.map(r => (lokiBase + r.getLong(0),
            s"order key=${r.getLong(0)} status=${r.getString(2)}")).toVector))
      }
      node
    })
    (srv.port, lokiBase)
  }

  /** Loki connector over the HTTP API (graft.sources.LokiWire; reference
    * plugin/trino-loki — LogQL streams, time-chunk splits). The
    * `status=F` line filter is part of the pushed LogQL and evaluated
    * server-side; Spark only counts the surviving lines per stream. */
  def q_fed_loki(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (port, base) = ensureLoki(s, dir)
    graft.sources.LokiWire.read(s, "127.0.0.1", port,
      """{app="orders"} |= "status=F"""",
      base, base + 10000000000L, chunks = 6) // orderkeys < 10^10
      .select($"labels".getItem("priority").as("o_orderpriority"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_f_orders"))
      .orderBy($"o_orderpriority")
  }
  val qFedLokiSql: String =
    """SELECT o_orderpriority, count(*) AS n_f_orders
       FROM orders
       WHERE o_orderstatus = 'F'
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** One loopback Druid broker per testdata dir, seeded once from
    * customer. */
  private val druidNodes = scala.collection.mutable.Map[String, graft.sources.DruidWire.Server]()
  private def ensureDruid(s: SparkSession, dir: String): Int = synchronized {
    druidNodes.getOrElseUpdate(dir, {
      import graft.sources.PgWire
      val srv = new graft.sources.DruidWire.Server()
      val rows = table(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
        .collect()
        .map(r => Array[Any](r.getLong(0), r.getString(1), r.getInt(2).toLong,
          r.getDouble(3)))
        .toVector
      srv.createTable("customer", Seq(
        PgWire.Column("c_custkey", PgWire.OidInt8),
        PgWire.Column("c_mktsegment", PgWire.OidVarchar),
        PgWire.Column("c_nationkey", PgWire.OidInt8),
        PgWire.Column("c_acctbal", PgWire.OidFloat8)), rows)
      srv
    }).port
  }

  /** Druid connector over the SQL HTTP API (graft.catalog.DruidCatalog;
    * reference plugin/trino-druid). The segment predicate renders into
    * the pushed SQL; Druid's own broker does the fan-out. */
  def q_fed_druid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureDruid(s, dir)
    graft.catalog.DruidCatalog.read(s, "127.0.0.1", port, "customer")
      .filter($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 0.0)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        asDouble(sum(dec($"c_acctbal"))).as("total_balance"))
      .orderBy($"c_nationkey")
  }
  val qFedDruidSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_customers,
              CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
       FROM customer
       WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0
       GROUP BY c_nationkey
       ORDER BY c_nationkey"""

  /** One loopback thrift data-source node per testdata dir, serving
    * supplier through the five TrinoThriftService methods. */
  private val thriftNodes = scala.collection.mutable.Map[String, graft.sources.ThriftConnector.Server]()
  private def ensureThrift(s: SparkSession, dir: String): Int = synchronized {
    thriftNodes.getOrElseUpdate(dir, {
      import graft.sources.ThriftConnector.{Col, Server, TableData}
      val srv = new Server(rowsPerSplit = 40)
      val rows = table(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .collect()
        .map(r => Array[Any](r.getLong(0), r.getString(1),
          r.getInt(2).toLong, r.getDouble(3)))
        .toVector
      srv.register(TableData("tpch", "supplier", Seq(
        Col("s_suppkey", "bigint"), Col("s_name", "varchar"),
        Col("s_nationkey", "bigint"), Col("s_acctbal", "double")), rows))
      srv
    }).port
  }

  /** Generic thrift connector (graft.sources.ThriftConnector; reference
    * plugin/trino-thrift): suppliers arrive through per-split
    * typed-column-block pages and join a broadcast parquet nation —
    * column pruning travels on the wire (only the three used columns are
    * requested), splits are the server's opaque ids. */
  def q_fed_thrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureThrift(s, dir)
    val suppliers = graft.sources.ThriftConnector
      .read(s, "127.0.0.1", port, "tpch", "supplier")
      .select("s_nationkey", "s_acctbal")
    suppliers
      .join(broadcast(table(s, dir, "nation")),
        $"s_nationkey" === $"n_nationkey")
      .filter($"s_acctbal" > 2000.0)
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        asDouble(sum(dec($"s_acctbal"))).as("total_balance"))
      .orderBy($"n_name")
  }
  val qFedThriftSql: String =
    """SELECT n_name, count(*) AS n_suppliers,
              CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       WHERE s_acctbal > 2000.0
       GROUP BY n_name
       ORDER BY n_name"""

  val queries: Map[String, Q] = Map(
    "q_fed_loki" -> q_fed_loki _,
    "q_fed_druid" -> q_fed_druid _,
    "q_fed_thrift" -> q_fed_thrift _,
    "q_fed_redis" -> q_fed_redis _,
    "q_fed_es" -> q_fed_es _,
    "q_fed_pg" -> q_fed_pg _,
    "q_fed_pg_agg_pushdown" -> q_fed_pg_agg_pushdown _,
    "q_fed_prom" -> q_fed_prom _,
    "q_fed_mongo" -> q_fed_mongo _,
    "q_fed_clickhouse" -> q_fed_clickhouse _,
    "q_fed_cassandra" -> q_fed_cassandra _,
    "q_fed_pinot" -> q_fed_pinot _,
    "q_fed_avro" -> q_fed_avro _,
    "q_fed_memory" -> q_fed_memory _,
    "q_fed_tpch_generated" -> q_fed_tpch_generated _,
    "q_fed_three_catalogs" -> q_fed_three_catalogs _,
    "q_sqlx_create_catalog" -> q_sqlx_create_catalog _,
    "q_fed_join" -> q_fed_join _,
    "q_fed_pushdown" -> q_fed_pushdown _,
    "q_fed_index_join" -> q_fed_index_join _,
    "q_fed_query_passthrough" -> q_fed_query_passthrough _)

  val oracles: Map[String, String] = Map(
    "q_fed_loki" -> qFedLokiSql,
    "q_fed_druid" -> qFedDruidSql,
    "q_fed_thrift" -> qFedThriftSql,
    "q_fed_redis" -> qFedRedisSql,
    "q_fed_es" -> qFedEsSql,
    "q_fed_pg" -> qFedPgSql,
    "q_fed_pg_agg_pushdown" -> qFedPgAggPushdownSql,
    "q_fed_prom" -> qFedPromSql,
    "q_fed_mongo" -> qFedMongoSql,
    "q_fed_clickhouse" -> qFedClickhouseSql,
    "q_fed_cassandra" -> qFedCassandraSql,
    "q_fed_pinot" -> qFedPinotSql,
    "q_fed_avro" -> qFedAvroSql,
    "q_fed_memory" -> qFedMemorySql,
    "q_fed_tpch_generated" -> qFedTpchGeneratedSql,
    "q_fed_three_catalogs" -> qFedThreeCatalogsSql,
    "q_sqlx_create_catalog" -> qSqlxCreateCatalogSql,
    "q_fed_join" -> qFedJoinSql,
    "q_fed_pushdown" -> qFedPushdownSql,
    "q_fed_index_join" -> qFedIndexJoinSql,
    "q_fed_query_passthrough" -> qFedQueryPassthroughSql)
}
