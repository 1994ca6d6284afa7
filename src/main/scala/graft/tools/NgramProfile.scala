package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of q_dedup_ngram's task CPU (r19): which of the
  * kernel (shingleHashes3), the dfreq pass, the inverted-index self-join,
  * and the rescoring joins owns the ~5.9 cpu-task-sec the bench reports. */
object NgramProfile {
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

    def docs: DataFrame = {
      val n = spark.sparkContext.defaultParallelism
      graft.sources.Tables.load(spark, sfDir, "documents").repartition(n, $"doc_id")
    }

    def timed(name: String, act: () => Unit, n: Int = 4): Unit = {
      def run(): (Double, Double) = {
        val c0 = cpuNs.get()
        val t0 = System.nanoTime()
        act()
        Thread.sleep(50)
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get() - c0) / 1e9)
      }
      run(); run()
      val rs = (1 to n).map(_ => run())
      println(f"[ng] $name%-26s wall ${rs.map(_._1).min}%.3f s   task-cpu ${rs.map(_._2).min}%.3f s")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // stage 1: kernel only
    timed("kernel shs", () => noop(docs.select($"doc_id", shingleHashes3(tokens($"text")).as("shs"))))

    // full pipeline pieces (fresh, un-materialized, to attribute CPU)
    def d: DataFrame = docs.select($"doc_id", shingleHashes3(tokens($"text")).as("shs"))
    def sh: DataFrame = d.select($"doc_id", explode($"shs").as("sh"))
    timed("explode only", () => noop(sh))
    timed("dfreq groupBy", () => noop(sh.groupBy($"sh").agg(count(lit(1)).as("dfreq"))))

    val commonArr: Array[Long] = {
      val nd = d.agg(count(lit(1)).as("ndocs"))
      sh.groupBy($"sh").agg(count(lit(1)).as("dfreq"))
        .crossJoin(broadcast(nd))
        .filter($"dfreq" > greatest(lit(16.0), lit(0.02) * $"ndocs"))
        .select($"sh").as[Long].collect().sorted
    }
    println(s"[ng] commonArr size = ${commonArr.length}")
    def index: DataFrame = sh.filter(!longInSet($"sh", commonArr))
    timed("index filter", () => noop(index))
    def pairsRare: DataFrame = index.as("a").join(index.as("b"), Seq("sh"))
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter_rare"))
    timed("pair self-join", () => noop(pairsRare))
    def sideInfo: DataFrame = d.select($"doc_id",
      size($"shs").cast("long").as("sz"),
      arraySetIntersect($"shs", commonArr).as("cshs"))
    timed("sideInfo", () => noop(sideInfo))

    // cache-build + cache-read attribution: the real query materializes d
    timed("d cache build+read", () => {
      val dm = graft.operators.materialized(d)
      noop(dm)           // build
      noop(dm)           // read
      noop(dm.select($"doc_id", explode($"shs").as("sh"))) // read + explode
      dm.unpersist(blocking = true)
      ()
    }, n = 2)

    // rescore tail: pairs + sideInfo joins over a materialized d (real shape)
    timed("rescore tail (real shape)", () => {
      val dm = graft.operators.materialized(d)
      def shm = dm.select($"doc_id", explode($"shs").as("sh"))
      def idx = shm.filter(!longInSet($"sh", commonArr))
      val pr = idx.as("a").join(idx.as("b"), Seq("sh"))
        .filter($"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .agg(count(lit(1)).as("inter_rare"))
      def si = dm.select($"doc_id",
        size($"shs").cast("long").as("sz"),
        arraySetIntersect($"shs", commonArr).as("cshs"))
      val out = pr
        .join(si.select($"doc_id".as("doc_a"), $"sz".as("sz_a"), $"cshs".as("cshs_a")), "doc_a")
        .join(si.select($"doc_id".as("doc_b"), $"sz".as("sz_b"), $"cshs".as("cshs_b")), "doc_b")
        .withColumn("inter", $"inter_rare" +
          size(array_intersect($"cshs_a", $"cshs_b")).cast("long"))
        .withColumn("jaccard", $"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter"))
        .filter($"jaccard" >= 0.8)
        .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
        .orderBy($"doc_a", $"doc_b")
      noop(out)
      dm.unpersist(blocking = true)
      ()
    }, n = 2)

    timed("ngram full", () => noop(graft.operators.Dedup.q_dedup_ngram(spark, sfDir)))

    val nDocs = docs.count()
    val nSh = sh.count()
    println(s"[ng] docs=$nDocs exploded_shingles=$nSh")
    spark.stop()
  }
}
