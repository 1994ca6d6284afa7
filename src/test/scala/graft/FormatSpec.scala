package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-format coverage (SURVEY.md §2.1: ORC reader/writer lib/trino-orc,
  * Hive text formats lib/trino-hive-formats — csv/json line readers):
  * schema-pinned roundtrips through csv, json-lines, orc, and text. */
class FormatSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_fmt").toFile.getAbsolutePath

  private def nationDf = operators.table(spark, sfDir, "nation")

  test("csv roundtrip with declared schema (no inference)") {
    val out = tmp()
    nationDf.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.orderBy($"n_nationkey").collect().toSeq ==
      nationDf.orderBy($"n_nationkey").collect().toSeq)
  }

  test("json-lines roundtrip preserves values") {
    val out = tmp()
    nationDf.write.mode("overwrite").json(out)
    val back = spark.read.schema(nationDf.schema).json(out)
    assert(back.orderBy($"n_nationkey").collect().toSeq ==
      nationDf.orderBy($"n_nationkey").collect().toSeq)
  }

  test("orc roundtrip preserves values and types") {
    val out = tmp()
    val src = operators.table(spark, sfDir, "customer")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val ck = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(bit_xor(xxhash64($"c_custkey", $"c_name", $"c_acctbal"))).collect()(0).getLong(0)
    assert(ck(back) == ck(src))
  }

  test("text format reads lines as a single column") {
    val out = tmp()
    nationDf.select(concat_ws("|", $"n_nationkey", $"n_name", $"n_regionkey"))
      .write.mode("overwrite").text(out)
    val back = spark.read.text(out)
      .select(split($"value", "\\|").as("f"))
      .select($"f".getItem(0).cast("long").as("k"), $"f".getItem(1).as("n"))
    assert(back.count() == nationDf.count())
    assert(back.filter($"n".startsWith("NATION_")).count() == nationDf.count())
  }
}
