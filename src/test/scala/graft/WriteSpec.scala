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

  test("bucketed tables co-locate a fact-fact join with NO shuffle exchange") {
    // The 100 TB layout decision the reference expresses through connector
    // bucketing/partitioned exchanges (SURVEY §2.10, AddExchanges.java:145):
    // two tables bucketed on the join key satisfy HashClusteredDistribution
    // from the scan, so the join plans with zero Exchange nodes — at scale
    // this removes the dominant cost of every repeated fact-fact join.
    val db = spark.catalog.currentDatabase
    val li = operators.table(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val or = operators.table(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    or.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("or_bucketed")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("or_bucketed").hint("merge"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), s"expected a join in the plan:\n$plan")
      val exchangesBeforeAgg = "Exchange hashpartitioning".r
        .findAllIn(plan.substring(plan.indexOf("Join"))).length
      assert(exchangesBeforeAgg == 0,
        s"bucketed join still shuffles ($exchangesBeforeAgg exchanges under the join):\n$plan")
      // and the result matches the unbucketed join
      val expected = li.join(or, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      assert(joined.orderBy($"l_orderkey").collect().toSeq ==
        expected.orderBy($"l_orderkey").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS or_bucketed")
    }
  }
}
