package graft

import org.apache.spark.sql.functions._

/** graft.catalog.FakerCatalog (reference plugin/trino-faker): synthetic
  * tables declared by CREATE TABLE, generated deterministically in the
  * tasks. Covers default_limit, LIMIT pushdown, ranges/step,
  * allowed_values, null_probability, per-column properties, determinism
  * across scans, and projection pruning. */
class FakerSpec extends SparkSpec {

  graft.catalog.FakerCatalog.register(spark)

  test("default_limit rows, deterministic across scans, ranges respected") {
    spark.sql("""CREATE TABLE graft_faker.default.users (
        id BIGINT, age INT, score DOUBLE, name STRING, active BOOLEAN)
      TBLPROPERTIES (
        'default_limit' = '500', 'seed' = '42',
        'col.age.min' = '18', 'col.age.max' = '90',
        'col.score.min' = '0', 'col.score.max' = '100')""")
    val df = spark.table("graft_faker.default.users")
    assert(df.count() == 500)
    val ages = df.agg(min("age"), max("age")).head()
    assert(ages.getInt(0) >= 18 && ages.getInt(1) <= 90)
    val scores = df.agg(min("score"), max("score")).head()
    assert(scores.getDouble(0) >= 0.0 && scores.getDouble(1) <= 100.0)
    // deterministic: the same table reads identically twice
    val a = df.orderBy("id").collect().toSeq
    val b = spark.table("graft_faker.default.users").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("allowed_values, step, null_probability") {
    spark.sql("""CREATE TABLE graft_faker.default.events (
        kind STRING, bucket INT, note STRING)
      TBLPROPERTIES (
        'default_limit' = '1000', 'seed' = '7',
        'col.kind.allowed_values' = 'click, view, purchase',
        'col.bucket.min' = '0', 'col.bucket.max' = '100', 'col.bucket.step' = '10',
        'col.note.null_probability' = '0.5')""")
    val df = spark.table("graft_faker.default.events")
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("click", "view", "purchase")) && kinds.size == 3)
    val buckets = df.select("bucket").distinct().collect().map(_.getInt(0))
    assert(buckets.forall(b => b % 10 == 0 && b >= 0 && b <= 100))
    val nulls = df.filter(col("note").isNull).count()
    assert(nulls > 350 && nulls < 650, s"null fraction $nulls/1000 far from 0.5")
  }

  test("LIMIT is pushed into the generators") {
    spark.sql("""CREATE TABLE graft_faker.default.big (x BIGINT)
      TBLPROPERTIES ('default_limit' = '1000000000', 'split_count' = '8')""")
    // a bounded preview of a billion-row synthetic table must not generate
    // a billion rows: the pushed limit caps generation
    val t0 = System.nanoTime()
    assert(spark.table("graft_faker.default.big").limit(10).count() == 10)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30, s"LIMIT pushdown missing: preview took $secs s")
    val plan = spark.table("graft_faker.default.big").limit(10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FakerScan"))
  }

  test("joins against parquet fixtures and date/decimal generation") {
    spark.sql("""CREATE TABLE graft_faker.default.dims (
        region_id INT, weight DECIMAL(10,2), born DATE)
      TBLPROPERTIES (
        'default_limit' = '200', 'seed' = '1',
        'col.region_id.min' = '0', 'col.region_id.max' = '4',
        'col.weight.min' = '1', 'col.weight.max' = '9',
        'col.born.min' = '2021-01-01', 'col.born.max' = '2021-12-31')""")
    val dims = spark.table("graft_faker.default.dims")
    val region = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "region")
    val joined = dims.join(region, dims("region_id") === region("r_regionkey"))
    assert(joined.count() == 200) // every generated id hits a region
    val borns = dims.agg(min("born"), max("born")).head()
    assert(borns.getDate(0).toString >= "2021-01-01" &&
      borns.getDate(1).toString <= "2021-12-31")
    val w = dims.agg(min("weight"), max("weight")).head()
    assert(w.getDecimal(0).doubleValue >= 1.0 && w.getDecimal(1).doubleValue <= 9.0)
  }

  test("invalid properties are refused") {
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_faker.default.badp (x INT)
        TBLPROPERTIES ('null_probability' = '1.5')""")
    }
    assert(e.getMessage.contains("null_probability"))
    val e2 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_faker.default.badl (x INT)
        TBLPROPERTIES ('default_limit' = '0')""")
    }
    assert(e2.getMessage.contains("default_limit"))
  }
}
