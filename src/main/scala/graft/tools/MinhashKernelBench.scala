package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the r19 fused minhash kernel: legacy two-expression signature
  * stage (shingleHashes3 + minhashSignature∘shingles3) vs the fused
  * MinHashShinglesAndSig struct, measured standalone (noop sink) and
  * end-to-end on q_dedup_minhash. Baseline runs FIRST and LAST (JIT order
  * bias — trust the last); min-of-N after prewarm. Reports wall AND summed
  * executor task CPU per variant via a stage listener. */
object MinhashKernelBench {
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

    def timed(name: String, mk: () => DataFrame, n: Int = 5): Unit = {
      def run(): (Double, Double) = {
        val c0 = cpuNs.get()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        Thread.sleep(50) // listener bus drain (same residual as Bench.scala)
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get() - c0) / 1e9)
      }
      run(); run() // prewarm
      val rs = (1 to n).map(_ => run())
      val wall = rs.map(_._1).min
      val cpu = rs.map(_._2).min
      println(f"[mh] $name%-22s wall $wall%.3f s   task-cpu $cpu%.3f s")
    }

    def legacySig(): DataFrame = docs.select($"doc_id",
      shingleHashes3(tokens($"text")).as("shs"),
      minhashSignature(shingles3(tokens($"text")), 64).as("sig"))
    def fusedSig(): DataFrame = docs.select($"doc_id",
      minhashShinglesSig(tokens($"text"), 64).as("ss"))

    def minhashFull(): DataFrame = graft.operators.Dedup.q_dedup_minhash(spark, sfDir)

    timed("sig_legacy(first)", legacySig _)
    timed("sig_fused", fusedSig _)
    timed("minhash_full", minhashFull _)
    timed("sig_legacy(last)", legacySig _)
    spark.stop()
  }
}
