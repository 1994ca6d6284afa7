package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sample-built KDB-tree spatial partitioning (reference:
  * lib/trino-geospatial-toolkit/src/main/java/io/trino/geospatial/KdbTree.java:39
  * buildKdbTree/findIntersectingLeaves, surfaced as the spatial_partitioning
  * aggregate + spatial_partitions scalar in plugin/trino-geospatial/
  * GeoFunctions.java:2000, and consumed by the partitioned spatial join rule
  * core/trino-main/.../iterative/rule/ExtractSpatialJoins.java:152).
  *
  * Spark-first shape: the tree is built on the driver from a BOUNDED sample
  * (exactly how Spark's own RangePartitioner samples for range exchange),
  * then compiled into literal column expressions — leaf assignment happens
  * executor-side inside whole-stage codegen, no broadcast variable or UDF.
  *
  * Leaves partition the plane with right-open [min, max) intervals, so a
  * POINT belongs to exactly ONE leaf. A radius/bbox PROBE intersects
  * possibly-many leaves. Replicating only the probe side keeps join pairs
  * unique by construction — the dedup `distinct()` a naive grid join needs
  * disappears (the reference gets the same uniqueness from single-assignment
  * of the build side).
  */
object KdbTree {

  /** A leaf rectangle: [xmin, xmax) × [ymin, ymax). */
  final case class Rect(id: Int, xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  private val Inf = 1e9 // open edges of the root extent

  /** Build leaves from a sample of (x, y) points: recursive median split on
    * the wider axis until ≤ leafCap sample points per leaf (reference
    * KdbTree.buildKdbTree's maxItemsPerNode). Deterministic for a
    * deterministic sample. */
  def build(sample: Seq[(Double, Double)], leafCap: Int): Seq[Rect] = {
    val ids = Iterator.from(0)
    def go(pts: Seq[(Double, Double)], xmin: Double, ymin: Double, xmax: Double, ymax: Double): Seq[Rect] = {
      if (pts.size <= leafCap) Seq(Rect(ids.next(), xmin, ymin, xmax, ymax))
      else {
        val xs = pts.map(_._1)
        val ys = pts.map(_._2)
        val splitX = (xs.max - xs.min) >= (ys.max - ys.min)
        if (splitX) {
          val sorted = xs.sorted
          val mid = sorted(sorted.size / 2)
          // degenerate sample (all same x): cut the box instead
          val cut = if (mid > xmin && mid < xmax) mid else (math.max(xmin, -Inf) + math.min(xmax, Inf)) / 2
          val (l, r) = pts.partition(_._1 < cut)
          if (l.isEmpty || r.isEmpty) Seq(Rect(ids.next(), xmin, ymin, xmax, ymax))
          else go(l, xmin, ymin, cut, ymax) ++ go(r, cut, ymin, xmax, ymax)
        }
        else {
          val sorted = ys.sorted
          val mid = sorted(sorted.size / 2)
          val cut = if (mid > ymin && mid < ymax) mid else (math.max(ymin, -Inf) + math.min(ymax, Inf)) / 2
          val (l, r) = pts.partition(_._2 < cut)
          if (l.isEmpty || r.isEmpty) Seq(Rect(ids.next(), xmin, ymin, xmax, ymax))
          else go(l, xmin, ymin, xmax, cut) ++ go(r, xmin, cut, xmax, ymax)
        }
      }
    }
    go(sample, -Inf, -Inf, Inf, Inf)
  }

  /** Leaf id containing a point — exactly one by the right-open convention
    * (reference KdbTree.findIntersectingLeaves on a point envelope). Compiled
    * to a chain of codegen'd conditionals. */
  def pointLeaf(leaves: Seq[Rect], x: Column, y: Column): Column =
    leaves.foldLeft(lit(-1)) { (acc, r) =>
      when(x >= r.xmin && x < r.xmax && y >= r.ymin && y < r.ymax, lit(r.id)).otherwise(acc)
    }

  /** All leaf ids whose rectangle intersects the closed query bbox
    * [xlo, xhi] × [ylo, yhi] — the probe-side multi-assignment
    * (spatial_partitions with a distance argument, GeoFunctions.java:2041).
    * Returns a compact int array ready to explode. */
  def bboxLeaves(leaves: Seq[Rect], xlo: Column, xhi: Column, ylo: Column, yhi: Column): Column =
    array_compact(array(leaves.map { r =>
      when(xhi >= r.xmin && xlo < r.xmax && yhi >= r.ymin && ylo < r.ymax, lit(r.id))
        .otherwise(lit(null).cast("int"))
    }: _*))
}
