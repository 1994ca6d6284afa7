package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Same-JVM A/B for the r18 q5/q7 join-order change: the OLD order (dim
  * cut at the end of the chain) vs the SHIPPED order (nation/region cut
  * right after the supplier join). Baseline runs first AND last (JIT order
  * bias — trust the last); each variant prewarms then min-of-6, the bench
  * methodology. */
object JoinOrderBench {
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

    def table(name: String): DataFrame = graft.sources.Tables.load(spark, sfDir, name)
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    def discPrice = (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
      .cast(DecimalType(18, 4))

    def timed(name: String, mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run()
      val best = (1 to 6).map(_ => run()).min
      println(f"[joinorder] $name%-16s $best%.3f s")
      best
    }

    // ---- q7 old order: facts first, nation cut at the end
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
    def q7new(): DataFrame =
      graft.operators.Tpch.q7_volume(spark, sfDir)

    // ---- q5 old order: customer join before nation/region
    def q5old(): DataFrame = {
      val r = table("region").filter($"r_name" === "ASIA")
      val n = table("nation")
      val c = table("customer")
      val o = table("orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      table("lineitem").join(o, $"l_orderkey" === $"o_orderkey")
        .join(table("supplier"), $"l_suppkey" === $"s_suppkey")
        .join(c, $"o_custkey" === $"c_custkey" && $"s_nationkey" === $"c_nationkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }
    def q5new(): DataFrame =
      graft.operators.Relational.q5_multi_join(spark, sfDir)

    timed("q7_old(first)", q7old _)
    timed("q7_new", q7new _)
    timed("q5_old(first)", q5old _)
    timed("q5_new", q5new _)
    timed("q7_old(last)", q7old _)
    timed("q5_old(last)", q5old _)
    spark.stop()
  }
}
