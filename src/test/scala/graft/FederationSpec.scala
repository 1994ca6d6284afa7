package graft

import org.apache.spark.sql.functions._

/** Federation (second JDBC catalog) — correctness + the pushdown plan contract
  * the reference enforces for its JDBC connectors
  * (reference: core/trino-main/.../iterative/rule/PushPredicateIntoTableScan.java:78,
  * plugin/trino-base-jdbc/.../BaseJdbcClient.java). */
class FederationSpec extends SparkSpec {

  test("jdbc scan pushes filters into the remote query") {
    import spark.implicits._
    val df = graft.catalog.DerbyCatalog.orders(spark, sfDir)
      .filter($"o_totalprice" > 100000.0 && $"o_orderstatus" === "F")
      .select($"o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(o_totalprice,100000.0)"),
      s"filter not pushed to JDBC scan:\n$plan")
    // plan string truncates the filter list at 100 chars; the `*` prefix marks
    // a filter handled remotely, so the truncated "*Equal" suffices
    assert(plan.contains("*Equal"), s"string filter not pushed:\n$plan")
  }

  test("jdbc scan prunes the remote SELECT to referenced columns") {
    import spark.implicits._
    val df = graft.catalog.DerbyCatalog.orders(spark, sfDir)
      .select($"o_orderkey", $"o_totalprice")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("o_comment") && !plan.contains("o_custkey"),
      s"unused remote columns not pruned:\n$plan")
  }

  test("partitioned jdbc read enumerates range splits and preserves row count") {
    val df = graft.catalog.DerbyCatalog.ordersPartitioned(spark, sfDir, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4, "expected 4 range splits")
    val parquetCount = graft.sources.Tables.load(spark, sfDir, "orders").count()
    assert(df.count() == parquetCount, "federated catalog must mirror the fixture")
  }

  test("dialect family: quoted and fold-to-upper dialects generate different " +
      "remote SQL with identical results and pushdown") {
    import spark.implicits._
    import graft.catalog.JdbcSqlDialect.{AnsiUnquoted, Quoted}
    val dialects = Seq(Quoted, AnsiUnquoted)
    // pushdown holds under BOTH identifier stylings (the Ansi table's
    // physical columns are upper-case; the filter still reaches the scan)
    for (d <- dialects) {
      val df = graft.catalog.DerbyCatalog.orders(spark, sfDir, d)
        .filter($"o_totalprice" > 100000.0).select($"o_orderkey")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.toLowerCase.contains("greaterthan(o_totalprice,100000.0)"),
        s"filter not pushed under dialect ${d.name}:\n$plan")
    }
    // identical numeric results across dialects (string columns differ by
    // the type map on purpose: CHAR(4) pads — that IS the dialect proof)
    val sums = dialects.map { d =>
      graft.catalog.DerbyCatalog.orders(spark, sfDir, d)
        .agg(count(lit(1)).cast("long"), sum($"o_orderkey").cast("long"))
        .collect().head
    }
    assert(sums.distinct.size == 1, s"dialects disagree: $sums")
    // index lookup join renders the IN-list in each dialect's quoting
    val probe = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter($"l_orderkey" < 60).select($"l_orderkey").distinct()
    val counts = dialects.map(d => graft.catalog.DerbyCatalog
      .indexLookupJoin(spark, sfDir, probe, "l_orderkey", dialect = d).count())
    assert(counts.distinct.size == 1 && counts.head > 0, counts.toString)
    // split enumeration (bounds metadata query) works unquoted too
    val parts = graft.catalog.DerbyCatalog
      .ordersPartitioned(spark, sfDir, numPartitions = 3, dialect = AnsiUnquoted)
    assert(parts.rdd.getNumPartitions == 3)
    assert(parts.count() ==
      graft.sources.Tables.load(spark, sfDir, "orders").count())
  }

  test("federated join matches the same join done purely on parquet") {
    val fed = operators.Federation.q_fed_join(spark, sfDir).collect()
    import spark.implicits._
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
      .filter($"o_totalprice" > 200000.0)
      .select($"o_orderkey", $"o_orderpriority")
    val pure = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("line_count"),
        operators.asDouble(sum(operators.dec($"l_extendedprice"))).as("total_price"))
      .orderBy($"o_orderpriority")
      .collect()
    assert(fed.toSeq == pure.toSeq)
  }

  test("index lookup join pushes the probe key set into the remote WHERE clause") {
    import spark.implicits._
    val probe = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter($"l_quantity" >= 49.0).select($"l_orderkey")
    val joined = graft.catalog.DerbyCatalog.indexLookupJoin(spark, sfDir, probe, "l_orderkey")
    // lookup-side schema is full orders; result rows = probe rows (fk always resolves)
    assert(joined.count() == probe.count())
    // above the cap it must degrade to a scan join, not explode the IN-list
    val big = graft.sources.Tables.load(spark, sfDir, "lineitem").select($"l_orderkey")
    val fallback = graft.catalog.DerbyCatalog.indexLookupJoin(spark, sfDir, big, "l_orderkey", maxKeys = 10)
    assert(fallback.count() == big.count())
  }

  test("csv catalog tables resolve by multi-catalog name with pushdown and pruning") {
    graft.catalog.CsvFileCatalog.ensure(spark, sfDir)
    val df = spark.sql(
      "SELECT c_custkey FROM graft_csv.default.customer WHERE c_mktsegment = 'BUILDING'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("EqualTo(c_mktsegment,BUILDING)"),
      s"filter not pushed into csv scan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("c_acctbal"),
      s"unused csv columns not pruned:\n$plan")
    // declared schema, not inference: key is bigint
    assert(df.schema("c_custkey").dataType == org.apache.spark.sql.types.LongType)
    val parquetCount = graft.sources.Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(df.count() == parquetCount)
  }

  test("three-catalog join reads jdbc + csv + parquet in one statement") {
    val out = operators.Federation.q_fed_three_catalogs(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation") || plan.toLowerCase.contains("jdbc"),
      s"jdbc catalog scan missing:\n$plan")
    assert(plan.contains("csv") || plan.contains("CSVScan") || plan.contains("Csv"),
      s"csv catalog scan missing:\n$plan")
    assert(out.count() > 0)
  }

  test("generated tpch catalog: pruning at generation, stats-driven broadcast, range splits") {
    graft.catalog.TpchGen.ensure(spark, 0.01)
    // pruning: a 2-column projection of the 11-column lineitem reaches the
    // generator — unprojected columns are never computed
    val pruned = spark.sql(
      "SELECT l_orderkey, l_quantity FROM graft_tpch.default.lineitem")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("tpchgen[lineitem") &&
      scanDesc.contains("cols=l_orderkey,l_quantity"),
      s"generation-time pruning missing:\n$scanDesc")
    assert(pruned.count() == 4 * 15000)
    // stats: generated dims report row counts/bytes → broadcast join
    val joined = spark.sql(
      """SELECT n.n_name, count(*) AS c FROM graft_tpch.default.customer c
         JOIN graft_tpch.default.nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name""")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
    assert(joined.count() == 25)
    // splits are row ranges (catalog options pin split_rows at
    // initialization, so drive the Scan directly): 60k rows / 10k per split
    val scan = new graft.catalog.TpchGenScan("lineitem", 0.01, 10000,
      graft.catalog.TpchGen.schemas("lineitem"))
    val splits = scan.planInputPartitions()
    assert(splits.length == 6, s"expected 6 range splits, got ${splits.length}")
    val ranges = splits.map(_.asInstanceOf[graft.catalog.TpchGenPartition])
    assert(ranges.head.start == 0 && ranges.last.end == 60000 &&
      ranges.sliding(2).forall(p => p(0).end == p(1).start),
      "splits must tile [0, rows) contiguously")
  }

  test("remote pass-through query executes the aggregate in the remote engine") {
    val out = operators.Federation.q_fed_query_passthrough(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    // no Spark-side HashAggregate: aggregation happened inside Derby
    assert(!plan.contains("HashAggregate"), s"aggregate not pushed remote:\n$plan")
    assert(out.count() == 5)
  }
  test("DSv2 jdbc catalog pushes aggregates into the remote query") {
    graft.catalog.CsvFileCatalog.ensureJdbcCatalog(spark, sfDir)
    val df = spark.sql(
      "SELECT count(*) AS n, max(o_totalprice) AS mx FROM graft_jdbc.APP.ORDERS")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") || plan.contains("PushedAggregation"),
      s"aggregate not pushed to the JDBC source:\n$plan")
    assert(df.head.getLong(0) > 0)
  }
}
