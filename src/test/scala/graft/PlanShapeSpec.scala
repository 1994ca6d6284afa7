package graft

/** Plan-shape assertions for the pushdown/partitioning-critical rewrites
  * (≈ reference core/trino-main/src/test/java/io/trino/sql/planner plan tests).
  * These guard the 100 TB properties: filters reaching the parquet scan, column
  * pruning, broadcast joins on dims, partial top-N before shuffles. */
class PlanShapeSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan+filter+project pushes predicate and prunes columns") {
    val plan = operators.Relational.q_scan_project(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"predicate not pushed:\n$plan")
    assert(!plan.contains("l_suppkey"), "unused column not pruned from scan")
  }

  test("q5 multi-join broadcasts the dimension tables") {
    val plan = physicalPlan(operators.Relational.q5_multi_join(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("window top-N uses WindowGroupLimit (partial top-N before shuffle)") {
    val plan = physicalPlan(operators.Windows.q_window_topn(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), s"missing WindowGroupLimit:\n$plan")
  }

  test("orderBy+limit compiles to TakeOrderedAndProject, not a global sort") {
    val plan = physicalPlan(operators.Sorts.q_topn_offset(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), s"missing TakeOrderedAndProject:\n$plan")
  }

  test("scalar-subquery comparison broadcasts the 1-row aggregate") {
    val plan = physicalPlan(operators.Relational.q_subq_scalar(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"scalar subquery not broadcast:\n$plan")
  }

  test("stacked windows with one partition key share a single hash exchange") {
    // q_window_groups runs dense_rank + two framed aggregates, all partitioned
    // by o_orderstatus — Catalyst must plan ONE hashpartitioning exchange, not
    // one per window (at 100 TB a redundant shuffle dominates the query).
    val plan = physicalPlan(operators.Windows.q_window_groups(spark, sfDir))
    val hashExchanges = "hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$plan")
  }

  test("function queries prune the scan to referenced columns") {
    val plan = physicalPlan(operators.Functions2.q_fn_url(spark, sfDir))
    assert(!plan.contains("c_acctbal") && !plan.contains("c_address"),
      s"unused customer columns not pruned:\n$plan")
  }

  test("TPC-H Q10 broadcasts nation; Q4 plans a semi join") {
    val q10 = physicalPlan(operators.Tpch.q10_returns(spark, sfDir))
    assert(q10.contains("BroadcastHashJoin"), s"nation not broadcast in q10:\n$q10")
    val q4 = physicalPlan(operators.Tpch.q4_order_priority(spark, sfDir))
    assert(q4.contains("LeftSemi"), s"no semi join in q4:\n$q4")
  }

  test("partial aggregation precedes the shuffle in q1") {
    val plan = physicalPlan(operators.Relational.q1_agg(spark, sfDir))
    // two HashAggregate nodes (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, s"no partial agg:\n$plan")
  }

  test("TPC-DS shapes: broadcast dims, Expand for rollups, semi joins for EXISTS") {
    // q76 shape: part dim broadcast above the 3-channel union, partial agg
    val mc = physicalPlan(operators.Tpcds.q_ds_multichannel(spark, sfDir))
    assert(mc.contains("BroadcastHashJoin"), s"part not broadcast:\n$mc")
    assert(mc.contains("Union"), s"no union of channel slices:\n$mc")
    assert("HashAggregate".r.findAllIn(mc).length >= 2, s"no partial agg:\n$mc")
    // q5 shape: ROLLUP plans an Expand; customer/nation broadcast
    val rc = physicalPlan(operators.Tpcds.q_ds_rollup_channels(spark, sfDir))
    assert(rc.contains("Expand"), s"no Expand for rollup:\n$rc")
    assert(rc.contains("BroadcastHashJoin"), s"dims not broadcast:\n$rc")
    // q35 shape: both EXISTS gates become semi joins
    val ce = physicalPlan(operators.Tpcds.q_ds_correlated_exists(spark, sfDir))
    assert("LeftSemi".r.findAllIn(ce).length >= 2, s"EXISTS not semi joins:\n$ce")
    // q74 shape: the year_total self-joins shuffle on the customer key with
    // partial aggregation below
    val yy = physicalPlan(operators.Tpcds.q_ds_yoy(spark, sfDir))
    assert("HashAggregate".r.findAllIn(yy).length >= 2, s"no partial agg:\n$yy")
    // q67 shape: rollup Expand feeding a ranked window
    val rr = physicalPlan(operators.Tpcds.q_ds_rollup_rank(spark, sfDir))
    assert(rr.contains("Expand") && rr.contains("RunningWindowFunction") || rr.contains("Window"),
      s"no rollup+window pipeline:\n$rr")
  }

  test("TPC-DS shapes part 2: intersects as joins, scalar broadcasts, full outer + windows") {
    // q14 shape: both INTERSECTs plan as joins (no quadratic set op), the
    // 1-row totals broadcast, part dim broadcast
    val cc = physicalPlan(operators.Tpcds2.q_ds_cross_channel(spark, sfDir))
    assert("LeftSemi".r.findAllIn(cc).length >= 2, s"INTERSECT not a semi-join plan:\n$cc")
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r.findAllIn(cc).nonEmpty,
      s"scalar totals / part dim not broadcast:\n$cc")
    // q23 shape: max-spend scalar is a 1-row broadcast, both derived filters
    // plan as semi joins
    val fb = physicalPlan(operators.Tpcds2.q_ds_frequent_best(spark, sfDir))
    assert("LeftSemi".r.findAllIn(fb).length >= 2, s"derived filters not semi joins:\n$fb")
    assert(fb.contains("BroadcastNestedLoopJoin") || fb.contains("BroadcastHashJoin"),
      s"max-spend scalar not broadcast:\n$fb")
    // q51 shape: a genuine full outer join feeding running windows
    val cu = physicalPlan(operators.Tpcds2.q_ds_cumulative(spark, sfDir))
    assert(cu.contains("FullOuter"), s"no full outer join:\n$cu")
    assert(cu.contains("Window"), s"no running window:\n$cu")
    // q47 shape: two window specs (year frame + sequence lag/lead) over ONE
    // aggregated input, partial agg below the shuffle
    val md = physicalPlan(operators.Tpcds2.q_ds_moving_dev(spark, sfDir))
    assert(md.contains("Window"), s"no window:\n$md")
    assert("HashAggregate".r.findAllIn(md).length >= 2, s"no partial agg:\n$md")
  }

  test("TPC-DS shapes part 3: single-scan wide buckets, no join explosion, banded having") {
    // q66 shape: 12 CASE buckets + totals in ONE aggregate over ONE fact
    // scan — not 12 self-joins
    val wb = physicalPlan(operators.Tpcds3.q_ds_wide_buckets(spark, sfDir))
    assert("Scan parquet".r.findAllIn(wb).length <= 2, // lineitem + orders
      s"wide buckets must not multiply scans:\n$wb")
    assert("HashAggregate".r.findAllIn(wb).length >= 2, s"no partial agg:\n$wb")
    // q41 shape: the OR-battery IN-subquery plans as ONE semi join of two
    // scans of the same dim, not a distributed disjunction of joins
    val ob = physicalPlan(operators.Tpcds3.q_ds_or_battery(spark, sfDir))
    assert("LeftSemi".r.findAllIn(ob).length == 1, s"OR battery exploded:\n$ob")
    // q73 shape: HAVING band applies on the aggregated counts BEFORE the
    // dimension joins (filter above agg, below joins)
    val tb = physicalPlan(operators.Tpcds3.q_ds_ticket_band(spark, sfDir))
    assert("HashAggregate".r.findAllIn(tb).length >= 2, s"no partial agg:\n$tb")
    assert(tb.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$tb")
  }

  test("spatial-join optimizer rule: naive distance join becomes a banded equi-join") {
    // the SparkSessionExtensions-injected SpatialJoinRewrite must turn the
    // nested-loop st_within_distance_km join into a band-keyed equi-join
    val plan = physicalPlan(operators.Relational2.q_join_spatial_rule(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"distance join not rewritten:\n$plan")
    assert(plan.contains("__graft_band"), s"band keys missing from the join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no equi-join operator:\n$plan")
  }

  test("TPC-DS shapes parts 4-5: set ops as joins, full-outer overlap, decorrelated averages") {
    // q38 shape: both INTERSECTs lower to LeftSemi joins over distinct sets
    val hc = physicalPlan(operators.Tpcds4.q_ds_hot_cust(spark, sfDir))
    assert("LeftSemi".r.findAllIn(hc).length >= 2, s"INTERSECT chain not semi joins:\n$hc")
    // q87 shape: the EXCEPT chain lowers to LeftAnti joins
    val cc = physicalPlan(operators.Tpcds4.q_ds_cool_cust(spark, sfDir))
    assert("LeftAnti".r.findAllIn(cc).length >= 2, s"EXCEPT chain not anti joins:\n$cc")
    // q62 shape: one fact pass, supplier/nation dims broadcast
    val sl = physicalPlan(operators.Tpcds4.q_ds_ship_latency(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(sl).length >= 2, s"dims not broadcast:\n$sl")
    assert("HashAggregate".r.findAllIn(sl).length >= 2, s"no partial agg:\n$sl")
    // q97 shape: a genuine FullOuter equi-join on the composite key
    val ov = physicalPlan(operators.Tpcds5.q_ds_channel_overlap(spark, sfDir))
    assert(ov.contains("FullOuter"), s"no full outer join:\n$ov")
    assert(!ov.contains("CartesianProduct"), s"composite key degraded to cartesian:\n$ov")
    // q30 shape: the correlated state average decorrelates to ONE broadcast
    // aggregate joined back — no per-row subquery
    val ar = physicalPlan(operators.Tpcds5.q_ds_above_avg_returns(spark, sfDir))
    assert(ar.contains("BroadcastHashJoin"), s"state average not broadcast:\n$ar")
    assert("HashAggregate".r.findAllIn(ar).length >= 2, s"no partial agg:\n$ar")
  }

  test("TPC-DS shapes part 6: semi joins over the derived self-join set, rank pushdown") {
    // q95 shape: both IN-subqueries plan as semi joins; the warehouse
    // self-join is an equi-join on the order key, never a cartesian
    val mw = physicalPlan(operators.Tpcds6.q_ds_multi_warehouse(spark, sfDir))
    assert("LeftSemi".r.findAllIn(mw).length >= 2, s"IN-subqueries not semi joins:\n$mw")
    assert(!mw.contains("CartesianProduct"), s"self-join degraded to cartesian:\n$mw")
    // q49 shape: rank() <= 10 pushes a WindowGroupLimit below the shuffle
    val rr = physicalPlan(operators.Tpcds6.q_ds_return_rank(spark, sfDir))
    assert(rr.contains("WindowGroupLimit"), s"top-N rank not pushed down:\n$rr")
    // q29 shape: the three-way chain stays composite-key equi-joins
    val rp = physicalPlan(operators.Tpcds6.q_ds_repeat_purchase(spark, sfDir))
    assert(!rp.contains("CartesianProduct"), s"fact chain degraded to cartesian:\n$rp")
    assert(rp.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$rp")
  }

  test("match-recognize annotate pipeline shares ONE exchange between DEFINE windows and the matcher") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // DEFINE bool via lag window + annotateMatches over the same spec: the
    // matcher's internal row_number window must reuse the lag window's
    // exchange+sort, so the whole pipeline plans a single shuffle
    val e = graft.sources.Tables.load(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"value")
      .withColumn("__def_S",
        expr("value > lag(value) OVER (PARTITION BY user_id ORDER BY event_id)"))
    val annotated = graft.plans.MatchRecognize.annotateMatches(
      e, Seq("user_id"), Seq("event_id"), "S+", Map("S" -> "__def_S"))
    val plan = physicalPlan(annotated)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts == 1, s"expected 1 sort, got $sorts:\n$plan")
  }

  test("polygon-containment spatial join is an equi-join on grid cells") {
    val plan = physicalPlan(operators.Relational2.q_join_geo_contains(spark, sfDir))
    // the join must key on the (gx, gy) cells — a hash-partitionable
    // equi-join (broadcast at this size), never a nested-loop cross product
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"spatial join fell back to a cross product:\n$plan")
    assert(plan.contains("Join") && (plan.contains("gx") && plan.contains("gy")),
      s"no cell-keyed equi-join:\n$plan")
  }

  test("KDB-tree spatial join is a leaf-keyed equi-join with adaptive leaves") {
    val plan = physicalPlan(operators.Relational2.q_join_spatial_kdb(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"KDB spatial join fell back to a cross product:\n$plan")
    assert(plan.contains("leaf"), s"no leaf-keyed equi-join:\n$plan")
    // the sampled tree must actually split: >1 leaf for the 1500-point fixture
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pts = operators.table(spark, sfDir, "customer").limit(500)
      .select((col("c_custkey") % 60 - 30).cast("double").as("lat"),
        (col("c_custkey") * 11 % 120 - 60).cast("double").as("lon"))
      .collect().map(r => (r.getDouble(1), r.getDouble(0))).toSeq
    val leaves = functions.KdbTree.build(pts, leafCap = 16)
    assert(leaves.size > 8, s"tree did not split: ${leaves.size} leaves")
    // leaves tile the plane: every sample point lands in exactly one leaf
    pts.foreach { case (x, y) =>
      val owners = leaves.filter(r => x >= r.xmin && x < r.xmax && y >= r.ymin && y < r.ymax)
      assert(owners.size == 1, s"point ($x,$y) in ${owners.size} leaves")
    }
  }

  test("row-pattern window spec costs exactly one exchange (DEFINE lag/lead reuses it)") {
    // the internal row_number pin + the DEFINE boolean's lag/lead windows
    // share one hash exchange on the partition keys (EnsureRequirements
    // reuse) — the minimum for ANY order-sensitive per-key computation
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      """SELECT user_id, event_id, m OVER w AS m
         FROM events
         WINDOW w AS (
           PARTITION BY user_id ORDER BY event_id
           MEASURES COUNT(D.*) AS m
           PATTERN (D+)
           DEFINE D AS value < PREV(value))""")
    val plan = physicalPlan(df)
    def countOf(needle: String): Int = plan.sliding(needle.length).count(_ == needle)
    assert(countOf("Exchange hashpartitioning") == 1,
      s"window row-pattern should shuffle once on the partition key:\n$plan")
  }

  test("round-8 pipeline shapes: no Expand in distinct split, broadcast contamination, map-only chunking") {
    // q_agg_distinct (round-12 plan): the fact is reduced to its distinct
    // (flag, supp, part) PAIR SET first — Expand may apply only ABOVE that
    // reduction (pair-set-sized rows), never to the fact scan. The shape
    // evidence: the scan feeds a plain hash aggregate (the reduction)
    // BEFORE any Expand appears in the plan text.
    val distinctPlan = physicalPlan(operators.Aggregates.q_agg_distinct(spark, sfDir))
    val expandIx = distinctPlan.indexOf("Expand")
    val scanIx = distinctPlan.lastIndexOf("Scan parquet")
    assert(scanIx >= 0, distinctPlan)
    // plan text prints top-down: the scan (bottom) must come AFTER the
    // Expand (top) — i.e. Expand consumes the aggregated pair set, and
    // between them sits the reducing HashAggregate
    assert(expandIx >= 0 && expandIx < scanIx,
      s"distinct plan shape unexpected:\n$distinctPlan")
    val between = distinctPlan.substring(expandIx, scanIx)
    assert(between.contains("HashAggregate"),
      s"Expand applies directly to the fact scan (no pair-set reduction):\n$distinctPlan")
    // contamination (round-14 shape): the bench shingle-hash set is
    // driver-collected and probed IN-ROW — the corpus is never exploded,
    // joined, or hash-shuffled; the only exchange is the presentation sort
    val contamPlan = physicalPlan(operators.TextPipeline.q_text_contamination(spark, sfDir))
    assert(contamPlan.contains("array_long_set_count_distinct"),
      s"in-row contamination probe missing:\n$contamPlan")
    assert(!contamPlan.contains("Join"),
      s"contamination should not join at all:\n$contamPlan")
    def countOf(plan: String, needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    assert(countOf(contamPlan, "Exchange hashpartitioning") == 0,
      s"contamination corpus side must not hash-shuffle:\n$contamPlan")
    // chunking: a pure map + in-row explode — the only exchange is the
    // range partition of the final ORDER BY
    val chunkPlan = physicalPlan(operators.TextPipeline.q_text_chunking(spark, sfDir))
    assert(countOf(chunkPlan, "Exchange hashpartitioning") == 0,
      s"chunking shuffled before the presentation sort:\n$chunkPlan")
    // stratified sampling: exactly one hash exchange (the stratum key),
    // shared by both window functions
    val stratPlan = physicalPlan(operators.Sampling.q_sample_stratified(spark, sfDir))
    assert(countOf(stratPlan, "Exchange hashpartitioning") == 1,
      s"stratified sampling should shuffle once on the stratum:\n$stratPlan")
    // hash-Bernoulli sampling: zero hash shuffles — map-only
    val bernPlan = physicalPlan(operators.Sampling.q_sample_hash_bernoulli(spark, sfDir))
    assert(countOf(bernPlan, "Exchange hashpartitioning") == 0,
      s"hash-Bernoulli sampling must be map-only:\n$bernPlan")
    // the composed C4 pipeline: quality/norm/probe are in-row; exactly TWO
    // hash exchanges total — the dedup norm key and the per-lang aggregate
    val c4Plan = physicalPlan(operators.TextPipeline.q_text_c4_pipeline(spark, sfDir))
    assert(countOf(c4Plan, "Exchange hashpartitioning") == 2,
      s"C4 pipeline should shuffle exactly twice (dedup key + final agg):\n$c4Plan")
    assert(!c4Plan.contains("Join"), s"C4 pipeline must not join:\n$c4Plan")
    // URL canonicalization: in-row kernels + ONE aggregate exchange
    val urlPlan = physicalPlan(operators.TextAnalysis.q_text_url_canonical(spark, sfDir))
    assert(countOf(urlPlan, "Exchange hashpartitioning") == 1,
      s"URL dedup should shuffle once on the canonical key:\n$urlPlan")
  }

  test("bucketed warehouse table: join + agg on the bucket key plan zero exchanges") {
    import graft.sqlx.TrinoDialect
    def countOf(plan: String, needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    TrinoDialect.sql(spark, sfDir, "DROP TABLE IF EXISTS ps_bkt")
    TrinoDialect.sql(spark, sfDir,
      """CREATE TABLE ps_bkt WITH (bucketed_by = ARRAY['cust'],
           bucket_count = 8, sorted_by = ARRAY['cust']) AS
         SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS price
         FROM orders""")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // non-broadcast self-join on the bucket key, then an aggregation on
      // the same key: both ride the scan's HashPartitioning(cust, 8) —
      // the plan must contain a real join and ZERO hash exchanges
      val j = TrinoDialect.sql(spark, sfDir,
        """SELECT a.cust, count(*) AS n
           FROM ps_bkt a JOIN ps_bkt b ON a.cust = b.cust
           GROUP BY a.cust ORDER BY a.cust""")
      val plan = physicalPlan(j)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join over bucketed scans:\n$plan")
      assert(countOf(plan, "Exchange hashpartitioning") == 0,
        s"bucketed join + agg must not shuffle:\n$plan")
      // both sides are DSv2 CoW scans reporting KeyGroupedPartitioning
      assert(countOf(plan, "GraftCowScan") == 2,
        s"both sides should be bucket-aware CoW scans:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("incremental dedup probes the bucketed signature index without shuffling it") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // force shuffle-family joins: at fixture scale the planner would
    // broadcast the index, hiding the layout property under test — at
    // corpus scale the index is far beyond any broadcast threshold
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df =
      try operators.Dedup.q_dedup_incremental(spark, sfDir)
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      df.collect() // materialize so AQE finalizes the stages
      val plan = df.queryExecution.executedPlan
      // walk INTO adaptive plans and materialized AQE stages (both are
      // leaf-like wrappers hiding their subtree from `children`)
      def descend(p: SparkPlan): Seq[SparkPlan] =
        p +: (p.children ++ (p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => Seq.empty
        })).flatMap(descend)
      def indexScans(p: SparkPlan): Seq[BatchScanExec] =
        descend(p).collect {
          case f: BatchScanExec
            if f.scan.description().contains("graft_dedup_idx") => f
        }
      // the index IS read (twice: band buckets + doc shingles)...
      assert(indexScans(plan).size >= 2, s"expected bucketed index scans in:\n$plan")
      // ...and NO shuffle exchange sits BETWEEN an index scan and the join
      // that consumes it: the probe side shuffles to the index's bucketing,
      // never the index itself (post-join shuffles above the join are the
      // probe pipeline's own and don't touch this property)
      def scanPaths(p: SparkPlan, anc: List[SparkPlan]): Seq[List[SparkPlan]] = {
        val here = p match {
          case f: BatchScanExec
            if f.scan.description().contains("graft_dedup_idx") =>
            Seq(anc)
          case _ => Seq.empty
        }
        val kids = p.children ++ (p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => Seq.empty
        })
        here ++ kids.flatMap(scanPaths(_, p :: anc))
      }
      scanPaths(plan, Nil).foreach { anc =>
        val belowJoin = anc.takeWhile(
          !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
        assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeLike]),
          s"bucketed index scan reached its join through a shuffle:\n$plan")
      }
      // the index scans report their bucket layout (KeyGroupedPartitioning
      // resolved from the manifest-backed DSv2 scan)
      indexScans(plan).foreach { f =>
        assert(f.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.KeyGroupedPartitioning],
          s"index scan lost its bucket layout: $f -> ${f.outputPartitioning}")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
