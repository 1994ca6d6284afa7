package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.ext.{GeoOps, Wkt}

/** Geometry aggregates (reference plugin/trino-geospatial/aggregation/
  * GeometryUnionAgg.java and ConvexHullAggregation.java — SURVEY.md §2.8
  * geometry breadth step 2).
  *
  * Both return canonical WKT text (parse back with stGeometryFromText for
  * further measures) rather than the internal struct, so results are
  * directly comparable in the oracle.
  *
  * Scale design: convex_hull_agg state is the running hull only — points
  * interior to the partial hull are discarded on every prune, so the state
  * is O(hull size) no matter how many rows flow through (hull(A ∪ B) =
  * hull(hull(A) ∪ hull(B))). geometry_union_agg state is the merged
  * disjoint boundary, the same bound the reference's ESRI-backed aggregate
  * carries; partial aggregation (Spark's two-phase agg) merges per-partition
  * unions before the final merge, exactly like the reference's
  * combine(state, otherState).
  */
object GeoAggregates {

  /** Geometry as 4 plain columns, the udaf-encodable form of the struct. */
  private type GeomTuple = (String, Seq[Double], Seq[Double], Seq[Int])

  private def toGeom(g: GeomTuple): Wkt.Geom =
    if (g == null || g._1 == null) null
    else Wkt.Geom(g._1, g._2.toArray, g._3.toArray, g._4.toArray)

  // ------------------------------------------------------ geometry_union_agg

  private class GeometryUnionAgg
      extends Aggregator[GeomTuple, List[(Array[Double], Array[Double])], String] {
    def zero: List[(Array[Double], Array[Double])] = Nil
    def reduce(acc: List[(Array[Double], Array[Double])], g: GeomTuple):
        List[(Array[Double], Array[Double])] =
      GeoOps.mergeInto(acc, GeoOps.shellsOf(toGeom(g)))
    def merge(a: List[(Array[Double], Array[Double])],
        b: List[(Array[Double], Array[Double])]): List[(Array[Double], Array[Double])] =
      GeoOps.mergeInto(a, b)
    def finish(acc: List[(Array[Double], Array[Double])]): String =
      if (acc.isEmpty) null
      else {
        val g = GeoOps.shellsToGeom(acc)
        Wkt.format(g.kind, g.xs, g.ys, g.rings)
      }
    def bufferEncoder: Encoder[List[(Array[Double], Array[Double])]] =
      Encoders.kryo[List[(Array[Double], Array[Double])]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** geometry_union_agg(geom) → WKT of the union of all hole-free polygonal
    * inputs (unsupported rows are skipped like SQL NULLs). */
  def geometryUnionAgg(g: Column): Column =
    udaf(new GeometryUnionAgg, ExpressionEncoder[GeomTuple]())
      .apply(g("kind"), g("xs"), g("ys"), g("rings"))

  // -------------------------------------------------------- convex_hull_agg

  /** State: flat (x0, y0, x1, y1, …) candidate points, pruned to the running
    * hull whenever it grows past the threshold. */
  private class ConvexHullAgg extends Aggregator[GeomTuple, Array[Double], String] {
    private val pruneAt = 512
    private def prune(flat: Array[Double], force: Boolean): Array[Double] =
      if (!force && flat.length <= pruneAt) flat
      else {
        val pts = Array.tabulate(flat.length / 2)(i => (flat(2 * i), flat(2 * i + 1)))
        GeoOps.hull(pts).flatMap(p => Array(p._1, p._2))
      }
    def zero: Array[Double] = Array.empty
    def reduce(acc: Array[Double], g: GeomTuple): Array[Double] = {
      val geom = toGeom(g)
      if (geom == null) acc
      else prune(acc ++ geom.xs.indices.flatMap(i => Seq(geom.xs(i), geom.ys(i))), force = false)
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      prune(a ++ b, force = false)
    def finish(acc: Array[Double]): String = {
      if (acc.isEmpty) return null
      val h = prune(acc, force = true)
      val n = h.length / 2
      val xs = Array.tabulate(n)(i => h(2 * i))
      val ys = Array.tabulate(n)(i => h(2 * i + 1))
      n match {
        case 1 => Wkt.format("POINT", xs, ys, Array(1))
        case 2 => Wkt.format("LINESTRING", xs, ys, Array(2))
        case _ =>
          Wkt.format("POLYGON", xs :+ xs(0), ys :+ ys(0), Array(n + 1))
      }
    }
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** convex_hull_agg(geom) → WKT hull of all input vertices (CCW from the
    * lexicographic minimum, collinear points dropped; degenerate inputs
    * yield POINT/LINESTRING like the reference). */
  def convexHullAgg(g: Column): Column =
    udaf(new ConvexHullAgg, ExpressionEncoder[GeomTuple]())
      .apply(g("kind"), g("xs"), g("ys"), g("rings"))

  // --------------------------------------------------- geometry_collect_agg

  /** State: the collected members' canonical WKTs. The reference leaves the
    * collection order unspecified; aggregation order here is
    * partition-dependent, so `finish` CANONICALIZES by sorting the member
    * WKTs — deterministic output for the same input set (our geometry model
    * is SRID-less 2D, so the reference's SRID/Z carry rules do not apply). */
  private class GeometryCollectAgg extends Aggregator[GeomTuple, List[String], String] {
    def zero: List[String] = Nil
    def reduce(acc: List[String], g: GeomTuple): List[String] = {
      val geom = toGeom(g)
      if (geom == null) acc
      else Wkt.format(geom.kind, geom.xs, geom.ys, geom.rings) :: acc
    }
    def merge(a: List[String], b: List[String]): List[String] = a ::: b
    def finish(acc: List[String]): String = {
      if (acc.isEmpty) return null
      val wkts = acc.sorted
      def kindOf(w: String): String = w.takeWhile(c => c.isLetter)
      def bodyOf(w: String): String = w.drop(kindOf(w).length).trim
      val kinds = wkts.map(kindOf).distinct
      kinds match {
        // homogeneous simple kinds collapse to their MULTI form
        // (reference geospatial.md geometry_collect_agg: "a multi-geometry
        // or geometry collection containing all input geometries")
        case List("POINT") =>
          // POINT (x y) → x y
          "MULTIPOINT (" + wkts.map(w => bodyOf(w).stripPrefix("(").stripSuffix(")"))
            .mkString(", ") + ")"
        case List("LINESTRING") =>
          "MULTILINESTRING (" + wkts.map(bodyOf).mkString(", ") + ")"
        case List("POLYGON") =>
          "MULTIPOLYGON (" + wkts.map(bodyOf).mkString(", ") + ")"
        case _ =>
          "GEOMETRYCOLLECTION (" + wkts.mkString(", ") + ")"
      }
    }
    def bufferEncoder: Encoder[List[String]] = ExpressionEncoder[List[String]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** geometry_collect_agg(geom) → WKT multi-geometry (homogeneous inputs) or
    * GEOMETRYCOLLECTION (mixed), members canonically sorted. */
  def geometryCollectAgg(g: Column): Column =
    udaf(new GeometryCollectAgg, ExpressionEncoder[GeomTuple]())
      .apply(g("kind"), g("xs"), g("ys"), g("rings"))
}
