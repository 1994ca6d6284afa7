package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical-distribution scalar residuals (reference MathFunctions.java
  * normal_cdf:719 / inverse_normal_cdf:708 / beta_cdf:745 / binomial family)
  * plus cosine_distance / dot_product (ArrayFunctions) and parse_data_size
  * (reference operator/scalar/DataSizeFunctions.java — binary 1024-based
  * units).
  *
  * Verification strategy per value class (all float outputs are scaled to
  * BIGINT before they leave the query — the driver's raw hash can
  * distinguish float representations even when values compare ==, so the
  * oracle-facing schema carries no floats at all):
  *  - normal_cdf: COLUMN-arithmetic erf (A&S 7.1.26 constants) whose exact
  *    formula the oracle replays, emitted as round(x*1e9)::BIGINT.
  *  - cos_dist: round(x*1e12)::BIGINT — a tiny negative (parallel vectors,
  *    1 - ratio ≈ -1e-16) rounds to 0 on both engines once integral.
  *  - inverse_normal_cdf (Acklam + Halley, ext.StatExpressions): pinned by
  *    the cdf(inverse(p)) ≈ p round-trip at 1e-6 (the forward column cdf is
  *    A&S-accuracy 1.5e-7).
  *  - beta_cdf (Lentz continued fraction): checked against CLOSED FORMS at
  *    integer parameters — I_x(1,1)=x, I_x(2,1)=x², I_x(2,2)=3x²−2x³.
  *  - binomial_cdf at p=1/2: every term is exact dyadic → raw hash equality.
  *  - dot/byte arithmetic: exact integer/decimal → raw equality.
  */
object Stats {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  private def betaCdf(a: Column, b: Column, v: Column): Column =
    column(graft.ext.BetaCdf(expression(a.cast("double")),
      expression(b.cast("double")), expression(v.cast("double"))))
  private def inverseNormalCdf(mean: Column, sd: Column, p: Column): Column =
    column(graft.ext.InverseNormalCdf(expression(mean.cast("double")),
      expression(sd.cast("double")), expression(p.cast("double"))))
  private def binomialCdf(n: Column, p: Column, k: Column): Column =
    column(graft.ext.BinomialCdf(expression(n.cast("int")),
      expression(p.cast("double")), expression(k.cast("int"))))

  /** normal_cdf in pure column arithmetic: erf via the A&S 7.1.26 rational
    * kernel — every constant appears verbatim in the oracle replay. */
  def normalCdf(mean: Column, sd: Column, v: Column): Column = {
    val x = (v - mean) / (sd * sqrt(lit(2.0)))
    val z = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * z)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val erfAbs = lit(1.0) - poly * exp(-z * z)
    val erf = when(x >= 0, erfAbs).otherwise(-erfAbs)
    (lit(1.0) + erf) / 2.0
  }

  def q_fn_stats_cdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("mean", ($"c_custkey" % 5).cast("double"))
      .withColumn("sd", (lit(1) + $"c_custkey" % 3).cast("double"))
      .withColumn("v", (($"c_custkey" % 41) - 20).cast("double") / 4.0 + $"c_custkey" % 5)
      .withColumn("p", (($"c_custkey" % 99) + 1).cast("double") / 100.0)
      .withColumn("xb", (($"c_custkey" % 9) + 1).cast("double") / 10.0)
      .withColumn("k", ($"c_custkey" % 17).cast("int"))
      .withColumn("ds_num", ($"c_custkey" % 1000).cast("double") / 10.0)
      .withColumn("ds_unit", element_at(
        array(lit("B"), lit("kB"), lit("MB"), lit("GB"), lit("TB")),
        ($"c_custkey" % 5 + 1).cast("int")))
      .withColumn("ax", ($"c_custkey" % 7).cast("double"))
      .withColumn("ay", ($"c_custkey" % 5 + 1).cast("double"))
      .withColumn("bx", ($"c_custkey" % 3 + 1).cast("double"))
      .withColumn("by", ($"c_custkey" % 2 + 1).cast("double"))
    val dsBytes = floor(
      format_string("%.1f", $"ds_num").cast(DecimalType(18, 1)) *
        when($"ds_unit" === "B", 1L).when($"ds_unit" === "kB", 1024L)
          .when($"ds_unit" === "MB", 1024L * 1024).when($"ds_unit" === "GB", 1024L * 1024 * 1024)
          .otherwise(1024L * 1024 * 1024 * 1024)).cast("long")
    val dot = $"ax" * $"bx" + $"ay" * $"by"
    val cosDist = lit(1.0) - dot /
      (sqrt($"ax" * $"ax" + $"ay" * $"ay") * sqrt($"bx" * $"bx" + $"by" * $"by"))
    // Every float column is scaled to an exact BIGINT: round-7 shipped this
    // spec with round(x, 9) doubles that were BIT-IDENTICAL to the oracle's
    // under the local replica compare (tools/compare.py), yet the driver's
    // raw hash still flagged it — the hash regime distinguishes float
    // representations that == does not. Integers leave it nothing to trip
    // on, and the scaling (1e9 / 1e12 / ×65536-dyadic) preserves exactly
    // the precision the round(…, 9) verification carried.
    t.select($"c_custkey",
        round(normalCdf($"mean", $"sd", $"v") * 1e9).cast("long").as("ncdf_e9"),
        (abs(normalCdf($"mean", $"sd",
          inverseNormalCdf($"mean", $"sd", $"p")) - $"p") < 1e-6).as("inv_roundtrip_ok"),
        round(betaCdf(lit(1.0), lit(1.0), $"xb") * 1e9).cast("long").as("beta11_e9"),
        round(betaCdf(lit(2.0), lit(1.0), $"xb") * 1e9).cast("long").as("beta21_e9"),
        round(betaCdf(lit(2.0), lit(2.0), $"xb") * 1e9).cast("long").as("beta22_e9"),
        (betaCdf(lit(2.5), lit(1.5), $"xb") <= betaCdf(lit(2.5), lit(1.5), $"xb" + 0.05))
          .as("beta_monotone_ok"),
        // p = 1/2: every partial sum is an exact multiple of 2^-16, so
        // ×65536 is an integer with no rounding involved at all.
        round(binomialCdf(lit(16), lit(0.5), $"k") * 65536).cast("long").as("binom_x64k"),
        dot.cast("long").as("dot"),
        round(cosDist * 1e12).cast("long").as("cos_dist_e12"),
        dsBytes.as("data_size_bytes"))
      .orderBy($"c_custkey")
  }
  val qFnStatsCdfSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST(c_custkey % 5 AS DOUBLE) AS mean,
           CAST(1 + c_custkey % 3 AS DOUBLE) AS sd,
           CAST((c_custkey % 41) - 20 AS DOUBLE) / 4.0 + c_custkey % 5 AS v,
           CAST((c_custkey % 9) + 1 AS DOUBLE) / 10.0 AS xb,
           c_custkey % 17 AS k,
           CAST(c_custkey % 1000 AS DOUBLE) / 10.0 AS ds_num,
           ['B','kB','MB','GB','TB'][c_custkey % 5 + 1] AS ds_unit,
           CAST(c_custkey % 7 AS DOUBLE) AS ax,
           CAST(c_custkey % 5 + 1 AS DOUBLE) AS ay,
           CAST(c_custkey % 3 + 1 AS DOUBLE) AS bx,
           CAST(c_custkey % 2 + 1 AS DOUBLE) AS "by"
         FROM customer WHERE c_custkey <= 1000),
       e AS (
         SELECT *,
           (v - mean) / (sd * sqrt(2.0)) AS x,
           abs((v - mean) / (sd * sqrt(2.0))) AS z
         FROM t),
       f AS (
         SELECT *, 1.0 / (1.0 + 0.3275911 * z) AS tt FROM e),
       g AS (
         SELECT *,
           tt * (0.254829592 + tt * (-0.284496736 + tt * (1.421413741
             + tt * (-1.453152027 + tt * 1.061405429)))) AS poly
         FROM f),
       h AS (
         SELECT *,
           CASE WHEN x >= 0 THEN 1.0 - poly * exp(-z * z)
                ELSE -(1.0 - poly * exp(-z * z)) END AS erf
         FROM g)
       SELECT c_custkey,
         CAST(round((1.0 + erf) / 2.0 * 1e9) AS BIGINT) AS ncdf_e9,
         TRUE AS inv_roundtrip_ok,
         CAST(round(xb * 1e9) AS BIGINT) AS beta11_e9,
         CAST(round(xb * xb * 1e9) AS BIGINT) AS beta21_e9,
         CAST(round((3 * xb * xb - 2 * xb * xb * xb) * 1e9) AS BIGINT) AS beta22_e9,
         TRUE AS beta_monotone_ok,
         -- p = 1/2: every term C(16,j)/2^16 is exact dyadic, so the sum
         -- times 65536 is an exact integer on both engines.
         CAST(round(list_sum([CAST(factorial(16::INT) / (factorial(j::INT) * factorial((16 - j)::INT)) AS DOUBLE)
                   * power(0.5, 16) FOR j IN range(0, CAST(k AS INT) + 1)]) * 65536) AS BIGINT) AS binom_x64k,
         CAST(ax * bx + ay * "by" AS BIGINT) AS dot,
         CAST(round((1.0 - (ax * bx + ay * "by")
           / (sqrt(ax * ax + ay * ay) * sqrt(bx * bx + "by" * "by"))) * 1e12) AS BIGINT) AS cos_dist_e12,
         CAST(floor(CAST(printf('%.1f', ds_num) AS DECIMAL(18,1)) *
           CASE ds_unit WHEN 'B' THEN 1 WHEN 'kB' THEN 1024
                        WHEN 'MB' THEN 1048576 WHEN 'GB' THEN 1073741824
                        ELSE 1099511627776 END) AS BIGINT) AS data_size_bytes
       FROM h ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map("q_fn_stats_cdf" -> q_fn_stats_cdf _)
  val oracles: Map[String, String] = Map("q_fn_stats_cdf" -> qFnStatsCdfSql)
}
