package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase breakdown for the q_http_statement front door (r18 verdict #3:
  * profile parse/plan vs execute vs pagination before optimizing). Times,
  * each prewarmed and min-of-6 like the bench:
  *
  *   register  — Tables.registerAll + Registry.registerAll (runs per
  *               statement inside TrinoDialect.sqlDirect)
  *   plan      — TrinoDialect.sql → analyzed DataFrame (includes register)
  *   execute   — toLocalIterator drain of a pre-planned DataFrame
  *   roundtrip — full StatementClient.execute over loopback HTTP
  *
  * roundtrip − plan − execute ≈ HTTP + paging + JSON encode/decode.
  */
object StatementProfile {
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

    val sql =
      """SELECT n_regionkey AS region_bucket, count(*) AS n,
                CAST(sum(c_custkey) AS BIGINT) AS key_sum
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_regionkey ORDER BY region_bucket"""

    def best(n: Int)(f: () => Unit): Double = {
      f(); f()
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    def p(name: String, sec: Double): Unit =
      println(f"[stmtprof] $name%-12s ${sec}%.4f s")

    p("register", best(6) { () =>
      graft.sources.Tables.registerAll(spark, sfDir)
      graft.functions.Registry.registerAll(spark)
    })
    p("plan", best(6) { () =>
      graft.sqlx.TrinoDialect.sql(spark, sfDir, sql); ()
    })
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir, sql)
    p("execute", best(6) { () =>
      import scala.jdk.CollectionConverters._
      df.toLocalIterator().asScala.length; ()
    })
    val h = graft.server.StatementServer.start(spark, sfDir)
    p("roundtrip", best(6) { () =>
      graft.client.StatementClient.execute(h.uri, sql); ()
    })
    // plan-each-time + execute (what the server does today, minus HTTP)
    p("plan+exec", best(6) { () =>
      import scala.jdk.CollectionConverters._
      graft.sqlx.TrinoDialect.sql(spark, sfDir, sql)
        .toLocalIterator().asScala.length; ()
    })
    h.stop()
    spark.stop()
  }
}
