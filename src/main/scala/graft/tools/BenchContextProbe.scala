package graft.tools

/** A/B probe for the bench-vs-DistinctBench gap (VERDICT r13 what's-wrong
  * #2): same query, same session config, measured (a) back-to-back like
  * DistinctBench and (b) with the bench harness's forced System.gc() +
  * 200 ms pause before each sample. r14's per-query gc_sec/storage columns
  * ruled out in-suite GC time and storage-memory squeeze; the remaining
  * candidate is the forced full GC itself — G1 uncommits heap regions
  * after a full collection, so the next allocation-heavy query (two hash
  * aggregations) pays region re-commit and TLAB warm-up that never shows
  * up as GC time inside the measured window. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *  SPARK_GRAFT_SHUFFLE=8 sbt "runMain graft.tools.BenchContextProbe"`. */
object BenchContextProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8").toInt
    val spark = graft.engine.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = shuffle)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.operators.Aggregates.q_agg_distinct(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(ts: Seq[Double]): String =
      ts.map(t => String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
        .mkString(",")
    (1 to 2).foreach(_ => run()) // warm
    val plain = (1 to 3).map(_ => run())
    val withGc = (1 to 3).map { _ => System.gc(); Thread.sleep(200); run() }
    val plain2 = (1 to 3).map(_ => run())
    // DistinctBench sequence effect: it times preagg AFTER five runs of the
    // allocation-heavy Expand plan — does that prior work (committed-heap
    // expansion, JIT profile) flatter the preagg number?
    (1 to 5).foreach(_ => DistinctBench.expandPlan(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val afterExpand = (1 to 3).map(_ => run())
    // decisive same-JVM A/B: the tool's preaggPlan vs the bench entry —
    // if these disagree HERE, the plans differ; if they agree, the JVMs did
    def runTool(): Double = {
      val t0 = System.nanoTime()
      DistinctBench.preaggPlan(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach(_ => runTool())
    val toolSame = (1 to 3).map(_ => runTool())
    val benchSame = (1 to 3).map(_ => run())
    println(s"[bench-context] plain=${fmt(plain)} withGc=${fmt(withGc)} " +
      s"plainAgain=${fmt(plain2)} afterExpand=${fmt(afterExpand)} " +
      s"toolPlanSameJvm=${fmt(toolSame)} benchPlanSameJvm=${fmt(benchSame)}")
    spark.stop()
    sys.exit(0)
  }
}
