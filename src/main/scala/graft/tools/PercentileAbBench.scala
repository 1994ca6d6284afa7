package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18 verdict #7: q_agg_percentile_approx scans lineitem twice (sketch pass
  * + exact (flag, value) histogram pass). A/B a single-scan variant that
  * persists the narrow (l_returnflag, l_quantity) projection INSIDE the
  * timed region and feeds both aggregations from it. r17 measured the fold
  * into one aggregation slower (ObjectHashAggregate de-codegens the
  * conditional sums); this measures the cache-the-projection alternative so
  * the two-scan shape is either beaten or retired with a number. Baseline
  * runs first and last (JIT order bias — trust the last). */
object PercentileAbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shuffle = math.max(8, math.min(cpus.toInt, (inputBytes / (8L << 20)).toInt))
    val spark = graft.engine.GraftSession.withExtras(
      graft.engine.GraftSession
        .builder(master = s"local[$cpus]", shufflePartitions = shuffle)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def current(): DataFrame =
      graft.operators.Aggregates2.q_agg_percentile_approx(spark, sfDir)

    /** Single-scan variant: one narrow projection persisted in-region. */
    def singleScan(): DataFrame = {
      val narrow = graft.sources.Tables.load(spark, sfDir, "lineitem")
        .select($"l_returnflag", $"l_quantity").persist()
      try {
        val apx = narrow.groupBy($"l_returnflag")
          .agg(percentile_approx($"l_quantity",
            array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("aq"),
            count(lit(1)).as("n"))
        val hist = narrow.groupBy($"l_returnflag", $"l_quantity")
          .agg(count(lit(1)).as("cnt"))
        def below(q: org.apache.spark.sql.Column, strict: Boolean) =
          sum(when(if (strict) $"l_quantity" < q else $"l_quantity" <= q, $"cnt")
            .otherwise(0L))
        def ok(lo: String, hi: String, p: Double) = {
          val eps = 0.0015
          col(lo) < (lit(p) + eps) * $"n" && col(hi) >= (lit(p) - eps) * $"n"
        }
        val out = hist.join(broadcast(apx), "l_returnflag")
          .groupBy($"l_returnflag", $"aq", $"n")
          .agg(
            below(element_at($"aq", 1), strict = true).as("b1"),
            below(element_at($"aq", 1), strict = false).as("a1"),
            below(element_at($"aq", 2), strict = true).as("b2"),
            below(element_at($"aq", 2), strict = false).as("a2"),
            below(element_at($"aq", 3), strict = true).as("b3"),
            below(element_at($"aq", 3), strict = false).as("a3"))
          .select($"l_returnflag", $"n".as("n_rows"),
            ok("b1", "a1", 0.25).as("q1_ok"),
            ok("b2", "a2", 0.50).as("med_ok"),
            ok("b3", "a3", 0.75).as("q3_ok"))
          .orderBy($"l_returnflag")
        out.write.format("noop").mode("overwrite").save()
        out
      } finally { narrow.unpersist(blocking = true); () }
    }

    def timed(name: String, run: () => Unit): Unit = {
      run(); run()
      val best = (1 to 6).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[pctlab] $name%-18s $best%.3f s")
    }

    require(current().collect().map(_.toString).toSeq ==
      singleScan().collect().map(_.toString).toSeq, "variant rows diverge")

    timed("two_scan(first)", () => {
      current().write.format("noop").mode("overwrite").save() })
    timed("single_scan", () => { singleScan(); () })
    timed("two_scan(last)", () => {
      current().write.format("noop").mode("overwrite").save() })
    spark.stop()
  }
}
