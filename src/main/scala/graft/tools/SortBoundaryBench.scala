package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, RepartitionByExpression}
import org.apache.spark.sql.graft.ColumnBridge

/** Suite-wide A/B of the final-orderBy range-sample recompute (r19).
  *
  * Every declared query ends in a total-order ORDER BY (oracle contract).
  * Exchange(rangepartitioning) runs a SAMPLE job over its child before the
  * sort job; upstream shuffle stages are reused between the two jobs, but
  * the operators of the stage directly feeding the sort (final aggregation,
  * joins, windows, NFAs) run TWICE. Inserting a hash-repartition exchange
  * right below the sort makes both jobs read that exchange's shuffle files,
  * so the tail computes once — at the price of one extra exchange of the
  * (usually tiny) result.
  *
  * This tool rewrites each bench query's analyzed plan generically
  * (Sort → Sort(Repartition(child))), proves result identity in-run, and
  * times declared vs rewritten under the bench's own config. Winners get
  * the spelling applied in their operator source (never here).
  */
object SortBoundaryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shuffle = math.max(8, math.min(cpus.toInt, (inputBytes / (8L << 20)).toInt))
    val spark = graft.engine.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = shuffle)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })

    /** Sort(child) → Sort(RepartitionByExpression(sort-prefix, child)).
      * Handles an optional Project above the Sort. None = no top-level Sort. */
    def presortExchange(df: DataFrame): Option[DataFrame] = {
      def rewrite(p: LogicalPlan): Option[LogicalPlan] = p match {
        case s @ Sort(order, true, child, _) =>
          val keys = order.map(_.child)
          Some(s.copy(child = RepartitionByExpression(keys, child, None)))
        case pr @ Project(_, child) => rewrite(child).map(c => pr.copy(child = c))
        case _ => None
      }
      rewrite(df.queryExecution.analyzed)
        .map(ColumnBridge.ofRows(df.sparkSession, _))
    }

    def timed(mk: () => DataFrame, n: Int = 6): (Double, Double) = {
      def run(): (Double, Double) = {
        spark.sharedState.cacheManager.clearCache()
        val c0 = cpuNs.get()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        Thread.sleep(30)
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get() - c0) / 1e9)
      }
      run(); run()
      val rs = (1 to n).map(_ => run())
      (rs.map(_._1).min, rs.map(_._2).min)
    }

    /** Sort(child) → Sort(materialized(child)) — the persist spelling:
      * the sample job fills the cache, the sort job reads it. */
    def presortPersist(df: DataFrame, key: String): Option[DataFrame] = {
      import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst, NullsLast}
      def rewrite(p: LogicalPlan): Option[DataFrame] = p match {
        case Sort(order, true, child, _) =>
          val base = graft.operators.materialized(
            ColumnBridge.ofRows(df.sparkSession, child), key)
          val cols = order.map { so =>
            val c = ColumnBridge.column(so.child)
            (so.direction, so.nullOrdering) match {
              case (Ascending, NullsFirst) => c.asc_nulls_first
              case (Ascending, NullsLast) => c.asc_nulls_last
              case (_, NullsFirst) => c.desc_nulls_first
              case (_, NullsLast) => c.desc_nulls_last
            }
          }
          Some(base.orderBy(cols: _*))
        case Project(exprs, child) =>
          rewrite(child).map(_.select(exprs.map(e => ColumnBridge.column(e)): _*))
        case _ => None
      }
      rewrite(df.queryExecution.analyzed)
    }

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val names = graft.Bench.headline.filter(n => only.forall(_.findFirstIn(n).isDefined))
    for (name <- names) {
      val mk = () => graft.SparkEntry.queries(name)(spark, sfDir)
      // Queries that SHIP sortedResult (q_dedup_ngram, q_dedup_substring_spans
      // as of r19) already persist their pre-sort tail in the "declared" arm:
      // for them this tool no longer isolates the range-sample recompute and
      // all arms will read ~x1.00. Flag it so a future reader doesn't take
      // that as evidence the shipped persist buys nothing.
      val declaredAlreadyPersists = mk().queryExecution.withCachedData.collectFirst {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }.isDefined
      if (declaredAlreadyPersists)
        println(s"[sb] $name: declared plan already contains an InMemoryRelation " +
          "(ships sortedResult/materialized) — arms below do NOT isolate the sample recompute")
      presortExchange(mk()) match {
        case None => println(s"[sb] $name: no top-level global Sort — skipped")
        case Some(_) =>
          val a = mk().collect().map(_.toString).toSeq
          val b = presortExchange(mk()).get.collect().map(_.toString).toSeq
          val c = presortPersist(mk(), s"$name.ab").get.collect().map(_.toString).toSeq
          if (a != b || a != c) { println(s"[sb] $name: REWRITE CHANGED RESULT — skipped"); }
          else {
            val (wd, cd) = timed(mk)
            val (wr, cr) = timed(() => presortExchange(mk()).get)
            val (wp, cp) = timed(() => presortPersist(mk(), s"$name.ab").get)
            println(f"[sb] $name%-26s declared $wd%.3f/$cd%.3f   exch $wr%.3f/$cr%.3f (x${wd / wr}%.2f/x${cd / cr}%.2f)   persist $wp%.3f/$cp%.3f (x${wd / wp}%.2f/x${cd / cp}%.2f)")
          }
      }
    }
    spark.stop()
  }
}
