package graft

import org.apache.spark.sql.functions._
import graft.functions.AggregateFunctions._

/** Custom-aggregate properties (reduce_agg / checksum — SURVEY §2.4). */
class AggregateSpec extends SparkSpec {
  import spark.implicits._

  test("reduce_agg sum fold equals built-in sum") {
    val df = operators.table(spark, sfDir, "lineitem")
    val a = df.agg(reduceAggLong($"l_linenumber".cast("long"), 0L, _ + _)).collect()(0).getLong(0)
    val b = df.agg(sum($"l_linenumber")).collect()(0).getLong(0)
    assert(a == b)
  }

  test("xor fold equals built-in bit_xor and is order-independent") {
    val df = operators.table(spark, sfDir, "lineitem")
    val a = df.agg(xorAgg($"l_suppkey".cast("long"))).collect()(0).getLong(0)
    val b = df.agg(bit_xor($"l_suppkey")).collect()(0).getLong(0)
    val c = df.orderBy($"l_extendedprice") // different physical order
      .agg(xorAgg($"l_suppkey".cast("long"))).collect()(0).getLong(0)
    assert(a == b && a == c)
  }

  test("checksum is order-independent and collision-sensitive") {
    val df = Seq("a", "b", "c").toDF("x")
    val fwd = df.agg(checksum($"x")).collect()(0).getLong(0)
    val rev = Seq("c", "a", "b").toDF("x").agg(checksum($"x")).collect()(0).getLong(0)
    val other = Seq("a", "b", "d").toDF("x").agg(checksum($"x")).collect()(0).getLong(0)
    assert(fwd == rev)
    assert(fwd != other)
  }

  test("modular product fold matches direct computation") {
    val xs = Seq(3L, 5L, 7L, 11L)
    val expected = xs.foldLeft(1L)((a, b) => a * b % ModP)
    val got = xs.toDF("x").agg(modProduct($"x")).collect()(0).getLong(0)
    assert(got == expected)
  }
}
