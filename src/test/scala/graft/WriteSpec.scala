package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Write-path / DML specs (SURVEY.md §2.1 TableWriterOperator,
  * MergeWriterOperator, TableMutationOperator; reference:
  * operator/TableWriterOperator.java:69, MergeWriterOperator.java:48,
  * TableMutationOperator.java:30).
  *
  * Spark's commit protocol plays TableFinishOperator's role; these specs
  * exercise CTAS, partitioned writes with partition pruning (the layout
  * decision that matters at 100 TB), INSERT-append, DELETE-where rewrite, and
  * MERGE via outer join — the operation set the reference routes to Delta/Hive
  * connectors. */
class WriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_write").toFile.getAbsolutePath

  test("CTAS parquet roundtrip preserves rows and content checksum") {
    val out = tmp()
    val src = operators.table(spark, sfDir, "lineitem").filter($"l_orderkey" < 1000)
    src.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    def ck(df: org.apache.spark.sql.DataFrame) =
      df.agg(bit_xor(xxhash64($"l_orderkey", $"l_linenumber", $"l_quantity"))).collect()(0).getLong(0)
    assert(ck(back) == ck(src))
  }

  test("partitioned write prunes partitions on read") {
    val out = tmp()
    operators.table(spark, sfDir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val en = spark.read.parquet(out).filter($"lang" === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$plan")
    val exact = operators.table(spark, sfDir, "documents").filter($"lang" === "en").count()
    assert(en.count() == exact)
  }

  test("INSERT INTO appends atomically") {
    val out = tmp()
    val docs = operators.table(spark, sfDir, "documents")
    docs.filter($"doc_id" < 20).write.mode("overwrite").parquet(out)
    docs.filter($"doc_id" >= 20 && $"doc_id" < 30).write.mode("append").parquet(out)
    assert(spark.read.parquet(out).count() == docs.filter($"doc_id" < 30).count())
  }

  test("DELETE WHERE via filtered rewrite") {
    val out = tmp()
    val docs = operators.table(spark, sfDir, "documents")
    docs.write.mode("overwrite").parquet(out)
    // DELETE FROM t WHERE lang = 'de'  → rewrite keeping the complement
    val kept = spark.read.parquet(out).filter($"lang" =!= "de")
    val out2 = tmp()
    kept.write.mode("overwrite").parquet(out2)
    val back = spark.read.parquet(out2)
    assert(back.filter($"lang" === "de").count() == 0)
    assert(back.count() == docs.filter($"lang" =!= "de").count())
  }

  test("MERGE INTO via full outer join upsert") {
    val out = tmp()
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    target.write.mode("overwrite").parquet(out)
    val source = Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    // WHEN MATCHED UPDATE SET *  WHEN NOT MATCHED INSERT *
    val merged = spark.read.parquet(out).as("t")
      .join(source.as("s"), Seq("id"), "full_outer")
      .select($"id",
        coalesce($"s.name", $"t.name").as("name"),
        coalesce($"s.v", $"t.v").as("v"))
    val out2 = tmp()
    merged.write.mode("overwrite").parquet(out2)
    val got = spark.read.parquet(out2).orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }
}
