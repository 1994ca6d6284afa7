package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantifies the final-orderBy range-sample recompute (r19): a global sort
  * inserts Exchange(rangepartitioning) whose RangePartitioner runs a SAMPLE
  * job over the child — upstream shuffle outputs are reused, but every
  * operator of the final stage feeding the sort (joins, final aggregation,
  * rescoring) runs TWICE. A/B per query: declared / sort dropped /
  * in-region persist before the sort. Inlined bodies mirror
  * operators.Dedup exactly (cross-checked for identical results in-run). */
object SortTailProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = 16)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions._

    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })

    def timed(name: String, mk: () => DataFrame, n: Int = 4): Unit = {
      def run(): (Double, Double) = {
        // r13 lesson (DistinctBench): identical canonicalized plans are
        // silently served from any still-live cache entry — clear between
        // runs so every sample recomputes from parquet, like the bench's
        // per-pass unpersist does
        spark.sharedState.cacheManager.clearCache()
        val c0 = cpuNs.get()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        Thread.sleep(50)
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get() - c0) / 1e9)
      }
      run(); run()
      val rs = (1 to n).map(_ => run())
      println(f"[st] $name%-32s wall ${rs.map(_._1).min}%.3f s   task-cpu ${rs.map(_._2).min}%.3f s")
    }

    def docs: DataFrame = {
      val n = spark.sparkContext.defaultParallelism
      graft.sources.Tables.load(spark, sfDir, "documents").repartition(n, $"doc_id")
    }

    // ---- q_dedup_ngram body, parameterized by final-sort spelling
    def ngramBody(): DataFrame = {
      val d = graft.operators.materialized(
        docs.select($"doc_id", shingleHashes3(tokens($"text")).as("shs")))
      def sh = d.select($"doc_id", explode($"shs").as("sh"))
      val commonArr: Array[Long] = {
        val nd = d.agg(count(lit(1)).as("ndocs"))
        sh.groupBy($"sh").agg(count(lit(1)).as("dfreq"))
          .crossJoin(broadcast(nd))
          .filter($"dfreq" > greatest(lit(16.0), lit(0.02) * $"ndocs"))
          .select($"sh").as[Long].collect().sorted
      }
      def index = sh.filter(!longInSet($"sh", commonArr))
      val pairsRare = index.as("a").join(index.as("b"), Seq("sh"))
        .filter($"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .agg(count(lit(1)).as("inter_rare"))
      def sideInfo = d.select($"doc_id",
        size($"shs").cast("long").as("sz"),
        arraySetIntersect($"shs", commonArr).as("cshs"))
      pairsRare
        .join(sideInfo.select($"doc_id".as("doc_a"), $"sz".as("sz_a"), $"cshs".as("cshs_a")), "doc_a")
        .join(sideInfo.select($"doc_id".as("doc_b"), $"sz".as("sz_b"), $"cshs".as("cshs_b")), "doc_b")
        .withColumn("inter", $"inter_rare" +
          size(array_intersect($"cshs_a", $"cshs_b")).cast("long"))
        .withColumn("jaccard", $"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter"))
        .filter($"jaccard" >= 0.8)
        .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
    }

    // ---- q_dedup_minhash body (fused kernel, as shipped)
    def minhashBody(): DataFrame = {
      val k = 64; val bands = 16; val r = 4
      val d0 = graft.operators.materialized(docs.select($"doc_id",
        minhashShinglesSig(tokens($"text"), k).as("ss")))
      val d = d0.select($"doc_id", $"ss.shs".as("shs"), $"ss.sig".as("sig"))
      val sigs = d.select($"doc_id", $"sig")
      val buckets = sigs.select($"doc_id",
        posexplode(minhashBands($"sig", bands, r)).as(Seq("band", "bkey")))
      val cand = buckets.as("a").join(buckets.as("b"), Seq("band", "bkey"))
        .filter($"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, $"doc_a")
      cand
        .join(d.select($"doc_id".as("doc_a"), $"shs".as("shs_a")), "doc_a")
        .join(d.select($"doc_id".as("doc_b"), $"shs".as("shs_b")), "doc_b")
        .withColumn("inter", size(array_intersect($"shs_a", $"shs_b")).cast("long"))
        .withColumn("jaccard", $"inter".cast("double") /
          (size($"shs_a") + size($"shs_b") - $"inter"))
        .filter($"jaccard" >= 0.8)
        .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
    }

    val variants: Seq[(String, () => DataFrame, Seq[Column])] = Seq(
      ("ngram", ngramBody _, Seq($"doc_a", $"doc_b")),
      ("minhash", minhashBody _, Seq($"doc_a", $"doc_b")))

    for ((name, body, keys) <- variants) {
      // result identity cross-check for the persist spelling
      val declared = body().orderBy(keys: _*).collect().map(_.toString).toSeq
      val persisted = graft.operators.materialized(body()).orderBy(keys: _*).collect().map(_.toString).toSeq
      require(declared == persisted, s"$name persist spelling changed the result!")
      println(s"[st] $name rows=${declared.size} (identity OK)")

      timed(s"$name declared (sort)", () => body().orderBy(keys: _*))
      timed(s"$name no final sort", () => body())
      timed(s"$name persist+sort", () => graft.operators.materialized(body()).orderBy(keys: _*))
      // shuffle boundary before the sort: the range-sample job reads the
      // repartition exchange's shuffle files instead of re-running the tail
      timed(s"$name repart+sort", () => body().repartition(keys.head).orderBy(keys: _*))
    }
    spark.stop()
  }
}
