package graft

import org.apache.spark.sql.functions._

/** graft.catalog.JmxCatalog (reference plugin/trino-jmx): MBeans as tables
  * in the `current` namespace, addressed by ObjectName with wildcard
  * support, columns typed from MBeanAttributeInfo. */
class JmxSpec extends SparkSpec {

  graft.catalog.JmxCatalog.register(spark)

  test("memory MBean reads as one row with typed attribute columns") {
    val df = spark.table("graft_jmx.current.`java.lang:type=Memory`")
    assert(df.columns.contains("node") && df.columns.contains("object_name"))
    assert(df.count() == 1)
    val row = df.select("node", "object_name", "objectpendingfinalizationcount").head()
    assert(row.getString(0) == "local")
    assert(row.getString(1).toLowerCase.contains("type=memory"))
    assert(row.getInt(2) >= 0)
    // heap usage arrives as the string form of CompositeData — non-empty
    val heap = df.select("heapmemoryusage").head().getString(0)
    assert(heap != null && heap.nonEmpty)
  }

  test("wildcard ObjectName yields one row per matching MBean") {
    val df = spark.table("graft_jmx.current.`java.lang:type=MemoryPool,name=*`")
    assert(df.count() >= 2) // every JVM has several pools
    val names = df.select("object_name").collect().map(_.getString(0)).toSet
    assert(names.size == df.count())
    // SQL aggregation over the connector works end to end
    val used = spark.sql(
      """SELECT count(*) AS pools FROM graft_jmx.current.`java.lang:type=MemoryPool,name=*`"""
    ).head().getLong(0)
    assert(used == df.count())
  }

  test("runtime MBean exposes uptime as a LONG column") {
    val df = spark.table("graft_jmx.current.`java.lang:type=Runtime`")
    val uptime = df.select("uptime").head().getLong(0)
    assert(uptime > 0)
  }

  test("unknown MBean and writes are refused") {
    intercept[Exception] {
      spark.table("graft_jmx.current.`graft.nothere:type=Missing`").collect()
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE graft_jmx.current.t (x INT)")
    }
  }
}
