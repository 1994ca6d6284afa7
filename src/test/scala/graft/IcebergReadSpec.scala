package graft

/** Spec for graft.catalog.IcebergRead over the v2 fixture authored by
  * IcebergQueries: snapshot isolation, time travel, status-2 manifest-entry
  * filtering, and loud failures on the unsupported protocol surface. */
class IcebergReadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path: String = {
    // the fixture builder is private to the query object; run the query once
    // (it builds idempotently) and recompute the root it used
    operators.IcebergQueries.q_fed_iceberg(spark, sfDir).collect()
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_nation_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}").getAbsolutePath
  }

  test("snapshot 2 drops the rewritten file (status=2) — no double read") {
    val cur = catalog.IcebergRead.readTable(spark, path, snapshotId = Some(2L))
    val nation = operators.table(spark, sfDir, "nation")
    val expect = nation.filter(!($"n_regionkey" === 2 && $"n_nationkey" >= 10)).count()
    assert(cur.count() == expect)
    // the stale full region-2 file is still on disk — snapshot isolation,
    // not deletion, is what keeps it out of the scan
    val staleOnDisk = new java.io.File(path, "data").listFiles()
      .exists(_.getName.startsWith("r2-full"))
    assert(staleOnDisk)
    assert(cur.filter($"n_regionkey" === 2 && $"n_nationkey" >= 10).count() == 0)
  }

  test("current snapshot applies v2 position deletes via broadcast anti-join") {
    val cur = catalog.IcebergRead.readTable(spark, path)
    val snap2 = catalog.IcebergRead.readTable(spark, path, snapshotId = Some(2L))
    assert(cur.count() == snap2.count() - 2)
    assert(cur.filter($"n_nationkey".isin(1L, 5L)).count() == 0)
    // plan shape: the delete set broadcasts; the data side never shuffles
    val plan = cur.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "delete filter must not shuffle the data side")
  }

  test("time travel: snapshot 1 sees the pre-rewrite table") {
    val prev = catalog.IcebergRead.readTable(spark, path, snapshotId = Some(1L))
    assert(prev.count() == operators.table(spark, sfDir, "nation").count())
    // schema from the metadata JSON, not parquet inference
    assert(prev.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("equality deletes scope by sequence number: re-appended rows survive") {
    // snapshot 4: eq-delete forbids n_name ∈ {CANADA, KENYA} (seq 4)
    // snapshot 5: re-appends a CANADA row at seq 5 → the delete must NOT
    // apply to it (v2 spec: delete seq must be STRICTLY above data seq)
    val s4 = catalog.IcebergRead.readTable(spark, path, snapshotId = Some(4L))
    assert(s4.filter($"n_name" === "CANADA").count() == 0)
    val s5 = catalog.IcebergRead.readTable(spark, path, snapshotId = Some(5L))
    val canada = s5.filter($"n_name" === "CANADA").collect()
    assert(canada.length == 1, "re-appended CANADA row wrongly deleted")
    assert(canada.head.getAs[Long]("n_nationkey") == 100L)
    // the ORIGINAL CANADA row (seq 2 < delete seq 4) stays deleted
    assert(s5.filter($"n_name" === "KENYA").count() == 0)
    assert(s5.count() == s4.count() + 1)
  }

  test("REST catalog: config, listings, LoadTableResult, 404 shape") {
    val srv = new catalog.IcebergRestCatalog.Server()
    try {
      srv.register("graft", "nation", path)
      val R = catalog.IcebergRestCatalog
      assert(R.config("127.0.0.1", srv.port) == Map.empty)
      assert(R.listNamespaces("127.0.0.1", srv.port) == Seq("graft"))
      assert(R.listTables("127.0.0.1", srv.port, "graft") == Seq("nation"))
      val (metaLoc, root) = R.loadTable("127.0.0.1", srv.port, "graft", "nation")
      assert(metaLoc.endsWith(".metadata.json"))
      assert(root == path) // the metadata's own location field
      // read THROUGH the catalog == direct read (same snapshot)
      val viaRest = R.read(spark, "127.0.0.1", srv.port, "graft", "nation")
      val direct = catalog.IcebergRead.readTable(spark, path)
      assert(viaRest.count() == direct.count())
      // the catalog is consulted once per load, not per split
      val before = srv.requests.get()
      R.read(spark, "127.0.0.1", srv.port, "graft", "nation").count()
      assert(srv.requests.get() - before == 1L)
      // spec error envelope for unknown tables
      val e = intercept[IllegalArgumentException](
        R.loadTable("127.0.0.1", srv.port, "graft", "nope"))
      assert(e.getMessage.contains("NoSuchTableException"), e.getMessage)
    } finally srv.close()
  }

  test("unsupported surface fails loudly") {
    intercept[IllegalArgumentException] {
      catalog.IcebergRead.readTable(spark, path + "_nope")
    }
    intercept[IllegalArgumentException] { // unknown snapshot
      catalog.IcebergRead.readTable(spark, path, snapshotId = Some(99L))
    }
  }
  test("manifest bounds prune data files at plan time; residual filter stays exact") {
    import org.apache.spark.sql.functions._
    val path2 = path
    val R = graft.catalog.IcebergRead
    // region files hold disjoint n_nationkey sets; a tight range must skip
    // every file whose bounds miss it
    val all = R.readTable(spark, path2, snapshotId = Some(2L))
    val prunedNone = R.lastPruned.get().toInt
    assert(prunedNone === 0, "no prune hint must skip nothing")
    val keys = all.select("n_nationkey").collect().map(_.getLong(0)).sorted

    val narrow = R.readTable(spark, path2, snapshotId = Some(2L),
      prune = Some(R.Prune("n_nationkey", Some(20L), None)))
    val prunedSome = R.lastPruned.get().toInt
    assert(prunedSome > 0, "bounded range should prune at least one file")
    // pruning is plan-level only: surviving files + residual filter = exact
    val got = narrow.filter(col("n_nationkey") >= 20)
      .select("n_nationkey").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === keys.filter(_ >= 20L).toSeq)

    // a range outside every file's bounds prunes everything → empty, no error
    val none = R.readTable(spark, path2, snapshotId = Some(2L),
      prune = Some(R.Prune("n_nationkey", Some(1000L), None)))
    assert(none.count() === 0 && R.lastPruned.get().toInt > 0)
  }
}
