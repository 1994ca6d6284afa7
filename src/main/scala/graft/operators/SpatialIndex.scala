package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-task R-tree spatial join — the reference's two-layer spatial join
  * design completed: the KDB/grid layer routes rows to tasks (see
  * Relational2.q_join_spatial_kdb), and INSIDE each task an STR-packed
  * R-tree over the build side replaces the per-key cross-product scan
  * (reference: SpatialIndexBuilderOperator builds PagesRTreeIndex.java:53,
  * SpatialJoinOperator.java:41 probes it per input row).
  *
  * Spark-first shape: both sides shuffle once on the grid cell via
  * `KeyValueGroupedDataset.cogroup` — the same single exchange the
  * equi-join variant pays — then each (cell, builds, probes) group bulk
  * loads one `functions.RTree` and streams probes through it. Per-probe
  * cost is O(log k + answers) instead of O(k); at 100 TB the partitioning
  * layer bounds k per task and the index bounds per-row work, so neither
  * the shuffle nor the refine is quadratic. Build rows land in a cell only
  * when their bbox covers it and a point probes exactly one cell, so every
  * candidate pair arises once — no distinct pass.
  */
object SpatialIndex {

  /** One diamond (L1 ball) on the build side, replicated per covered cell
    * (public: Spark codegen instantiates encoders for these). */
  final case class Poly(cell: Long, id: Long, cx: Double, cy: Double, r: Double)
  final case class Pt(cell: Long, id: Long, px: Double, py: Double)
  final case class Hit(c_custkey: Long, p_partkey: Long, l1: Double)

  /** Points-in-diamonds via grid + per-cell R-tree + exact ray-cast refine.
    * Diamonds from `part` (vertices (cx±r,cy),(cx,cy∓r)), points from
    * `customer`; all coordinates dyadic-safe multiples of 0.1 with ±0.03/
    * ±0.07 point offsets and radii ending in .05, so no L1 value ever ties
    * a radius and the oracle's analytic containment |dx|+|dy| < r states
    * the same truth the ray-casting kernel computes. */
  def q_join_spatial_rtree(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cell = 5.0
    val polys = table(s, dir, "part").filter($"p_partkey" <= 4000)
      .select($"p_partkey".cast("long").as("id"),
        (($"p_partkey" * 7 % 500) / 10.0).as("cx"),
        (($"p_partkey" * 13 % 500) / 10.0).as("cy"),
        (($"p_partkey" % 4) / 2.0 + 0.55).as("r"))
    val pts = table(s, dir, "customer").filter($"c_custkey" <= 3000)
      .select($"c_custkey".cast("long").as("id"),
        (($"c_custkey" % 500) / 10.0 + 0.03).as("px"),
        (($"c_custkey" * 7 % 500) / 10.0 + 0.07).as("py"))
    // build side: one row per covered cell (bbox cover of the diamond)
    val buildDs = polys
      .withColumn("gx", explode(sequence(
        floor(($"cx" - $"r") / cell).cast("long"), floor(($"cx" + $"r") / cell).cast("long"))))
      .withColumn("gy", explode(sequence(
        floor(($"cy" - $"r") / cell).cast("long"), floor(($"cy" + $"r") / cell).cast("long"))))
      .select(($"gx" * 1000 + $"gy").as("cell"), $"id", $"cx", $"cy", $"r")
      .as[Poly]
    val probeDs = pts
      .select((floor($"px" / cell).cast("long") * 1000 +
        floor($"py" / cell).cast("long")).as("cell"), $"id", $"px", $"py")
      .as[Pt]
    val joined = buildDs.groupByKey(_.cell).cogroup(probeDs.groupByKey(_.cell)) {
      (_, builds, probes) =>
        val b = builds.toArray
        if (b.isEmpty) Iterator.empty
        else {
          val tree = graft.functions.RTree.pack(
            b.map(p => p.cx - p.r), b.map(p => p.cy - p.r),
            b.map(p => p.cx + p.r), b.map(p => p.cy + p.r))
          probes.flatMap { q =>
            tree.query(q.px, q.py, q.px, q.py).iterator.map(b(_)).filter { p =>
              // exact refine: the general ray-casting kernel over the
              // diamond's vertex ring (same kernel as st_contains)
              graft.ext.GeoOps.pointInRingArr(q.px, q.py,
                Array(p.cx - p.r, p.cx, p.cx + p.r, p.cx),
                Array(p.cy, p.cy - p.r, p.cy, p.cy + p.r), 0, 4)
            }.map(p => Hit(q.id, p.id,
              math.abs(q.px - p.cx) + math.abs(q.py - p.cy)))
          }
        }
    }
    joined.toDF().withColumn("l1", round($"l1", 6))
      .orderBy($"c_custkey", $"p_partkey")
  }
  val qJoinSpatialRtreeSql: String =
    """WITH p AS (
         SELECT CAST(p_partkey AS BIGINT) AS id,
           (p_partkey * 7 % 500) / 10.0 AS cx,
           (p_partkey * 13 % 500) / 10.0 AS cy,
           (p_partkey % 4) / 2.0 + 0.55 AS r
         FROM part WHERE p_partkey <= 4000),
       c AS (
         SELECT CAST(c_custkey AS BIGINT) AS id,
           (c_custkey % 500) / 10.0 + 0.03 AS px,
           (c_custkey * 7 % 500) / 10.0 + 0.07 AS py
         FROM customer WHERE c_custkey <= 3000)
       SELECT c.id AS c_custkey, p.id AS p_partkey,
         round(abs(px - cx) + abs(py - cy), 6) AS l1
       FROM c JOIN p ON abs(px - cx) + abs(py - cy) < r
       ORDER BY c_custkey, p_partkey"""

  val queries: Map[String, Q] = Map(
    "q_join_spatial_rtree" -> q_join_spatial_rtree _)
  val oracles: Map[String, String] = Map(
    "q_join_spatial_rtree" -> qJoinSpatialRtreeSql)
}
