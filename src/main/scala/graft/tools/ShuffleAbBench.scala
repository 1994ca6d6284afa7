package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r18 verdict #2: put a NUMBER on the q5/q7 join-order argument. At sf0.1
  * with the default 64 MB broadcast threshold everything broadcasts, so the
  * r18 reorder measured flat; the at-scale claim is about SHUFFLE VOLUME
  * once orders/customer are too big to broadcast. This A/B runs both orders
  * under AQE ON with autoBroadcastJoinThreshold=10KB (nation/region — the
  * dims the reorder cuts with — still broadcast; supplier/customer/orders/
  * lineitem shuffle, the 100 TB regime), and reports per-variant wall time
  * plus TOTAL SHUFFLE RECORDS/BYTES WRITTEN from task metrics. Baselines run
  * first AND last (JIT order bias — trust the last). */
object ShuffleAbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shuffle = math.max(8, math.min(cpus.toInt, (inputBytes / (8L << 20)).toInt))
    val spark = graft.engine.GraftSession.withExtras(
      graft.engine.GraftSession
        .builder(master = s"local[$cpus]", shufflePartitions = shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", (10L * 1024).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shufBytes = new AtomicLong(0L)
    val shufRecs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    })

    def table(name: String): DataFrame = graft.sources.Tables.load(spark, sfDir, name)
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    def discPrice = (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
      .cast(DecimalType(18, 4))

    def timed(name: String, mk: () => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // prewarm
      val best = (1 to 6).map(_ => run()).min
      // metrics from ONE clean run (listener bus drained by the sleep)
      Thread.sleep(300)
      shufBytes.set(0L); shufRecs.set(0L)
      run()
      Thread.sleep(300)
      println(f"[shuffleab] $name%-16s best=$best%.3f s  " +
        f"shuffle_records=${shufRecs.get()}%,d  shuffle_mb=${shufBytes.get() / 1e6}%.1f")
    }

    // ---- q7: OLD order (nation cut last) vs SHIPPED (nation cut before
    // orders/customer)
    def q7old(): DataFrame = {
      val n1 = table("nation").select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
      val n2 = table("nation").select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
      table("lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(table("orders"), $"l_orderkey" === $"o_orderkey")
        .join(table("supplier"), $"l_suppkey" === $"s_suppkey")
        .join(table("customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(n1), $"s_nationkey" === $"s_nk")
        .join(broadcast(n2), $"c_nationkey" === $"c_nk")
        .filter(($"supp_nation" === "NATION_12" && $"cust_nation" === "NATION_10") ||
          ($"supp_nation" === "NATION_10" && $"cust_nation" === "NATION_12"))
        .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("l_year"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }
    def q7new(): DataFrame = graft.operators.Tpch.q7_volume(spark, sfDir)

    // ---- q5: OLD order (customer join before the nation/region cut)
    def q5old(): DataFrame = {
      val r = table("region").filter($"r_name" === "ASIA")
      val n = table("nation")
      val o = table("orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      table("lineitem").join(o, $"l_orderkey" === $"o_orderkey")
        .join(table("supplier"), $"l_suppkey" === $"s_suppkey")
        .join(table("customer"), $"o_custkey" === $"c_custkey" && $"s_nationkey" === $"c_nationkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }
    def q5new(): DataFrame = graft.operators.Relational.q5_multi_join(spark, sfDir)

    // result equivalence under the shuffle regime (same rows, both orders)
    def canon(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq
    require(canon(q7old()) == canon(q7new()), "q7 old/new rows diverge")
    require(canon(q5old()) == canon(q5new()), "q5 old/new rows diverge")

    timed("q7_old(first)", q7old _)
    timed("q7_new", q7new _)
    timed("q5_old(first)", q5old _)
    timed("q5_new", q5new _)
    timed("q7_old(last)", q7old _)
    timed("q5_old(last)", q5old _)
    spark.stop()
  }
}
