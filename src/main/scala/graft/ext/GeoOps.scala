package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planar geometry operations over the [[Wkt]] ringed model (SURVEY.md §2.8
  * geometry breadth step 2; reference plugin/trino-geospatial/GeoFunctions
  * .java — ST_Distance:1697, ST_Buffer:736, ST_Union:1122).
  *
  * - distance(a, b): minimum planar Euclidean distance — 0 when the
  *   geometries intersect or one contains the other, else the min over all
  *   vertex/edge pairs (points are degenerate segments). Only the final
  *   result takes a sqrt, so dyadic-coordinate fixtures with axis-aligned or
  *   corner-to-corner nearest features are bit-replayable in the oracle.
  * - buffer(g, d): Minkowski dilation by a regular octagon of circumradius d
  *   (offsets (±d,0), (0,±d), (±d·√½,±d·√½)), realized as the convex hull of
  *   all vertex-plus-offset points. The octagon replaces the reference's
  *   round (arc) join — every offset is a product of d with 0, 1, or √½, so
  *   the vertex coordinates (and any shoelace over them) replay exactly in
  *   the oracle, which a trig-sampled arc would not. Exact Minkowski result
  *   for convex inputs; the convex hull of the true buffer otherwise.
  *   Negative distances (the reference's erosion case) are not supported →
  *   NULL.
  * - union(a, b): true boolean union for simple hole-free polygons whose
  *   boundaries cross properly, via the classic augmented-boundary walk
  *   (insert pairwise edge intersections into both vertex cycles, start at a
  *   vertex outside the other polygon, switch cycles at every crossing).
  *   Disjoint parts collect into a canonically-sorted MULTIPOLYGON;
  *   containment collapses to the container. Touching-but-not-crossing
  *   boundaries stay separate parts (the reference dissolves shared edges);
  *   point/line inputs collect into MULTI kinds. Holes or mixed kinds → NULL.
  *
  * All kernels are pure double arithmetic on flat arrays — no JTS/ESRI/GEOS
  * involvement anywhere (zero-dependency rule), which is why the supported
  * surface is stated per-case instead of delegating to a library.
  */
object GeoOps {
  import Wkt.Geom

  // ------------------------------------------------------------- plumbing

  /** (offset, length, isHole) triples over the rings array. */
  def parts(g: Geom): Array[(Int, Int, Boolean)] = {
    val out = new Array[(Int, Int, Boolean)](g.rings.length)
    var off = 0
    var i = 0
    while (i < g.rings.length) {
      val len = g.rings(i)
      out(i) = (off, math.abs(len), len < 0)
      off += math.abs(len)
      i += 1
    }
    out
  }

  def fromRow(row: InternalRow): Geom = {
    if (row == null) return null
    Geom(row.getUTF8String(0).toString,
      row.getArray(1).toDoubleArray(),
      row.getArray(2).toDoubleArray(),
      row.getArray(3).toIntArray())
  }

  def toRow(g: Geom): InternalRow =
    if (g == null) null
    else InternalRow(UTF8String.fromString(g.kind),
      new GenericArrayData(g.xs), new GenericArrayData(g.ys),
      new GenericArrayData(g.rings))

  private def isPolygonal(g: Geom): Boolean =
    g.kind == "POLYGON" || g.kind == "MULTIPOLYGON"

  /** Point-in-polygon over all rings: inside iff inside an odd number of
    * rings (shells minus holes — correct for non-nested shell sets). */
  def containsPoint(g: Geom, px: Double, py: Double): Boolean = {
    if (!isPolygonal(g)) return false
    var in = false
    for ((off, len, _) <- parts(g))
      if (pointInRingArr(px, py, g.xs, g.ys, off, len)) in = !in
    in
  }

  def pointInRingArr(px: Double, py: Double,
      xs: Array[Double], ys: Array[Double], off: Int, len: Int): Boolean = {
    var in = false
    var i = 0
    var j = len - 1
    while (i < len) {
      val xi = xs(off + i); val yi = ys(off + i)
      val xj = xs(off + j); val yj = ys(off + j)
      if (((yi > py) != (yj > py)) &&
        (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) in = !in
      j = i
      i += 1
    }
    in
  }

  // ------------------------------------------------------------- distance

  /** Squared distance from point to segment; t clamps to the endpoints, so
    * corner-nearest fixtures stay division-free. */
  def ptSegDist2(px: Double, py: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val l2 = dx * dx + dy * dy
    val t =
      if (l2 == 0.0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
    val qx = ax + t * dx; val qy = ay + t * dy
    (px - qx) * (px - qx) + (py - qy) * (py - qy)
  }

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  def properCross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    o1 * o2 < 0 && o3 * o4 < 0
  }

  private def segSegDist2(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Double = {
    if (properCross(ax, ay, bx, by, cx, cy, dx, dy)) return 0.0
    math.min(
      math.min(ptSegDist2(ax, ay, cx, cy, dx, dy), ptSegDist2(bx, by, cx, cy, dx, dy)),
      math.min(ptSegDist2(cx, cy, ax, ay, bx, by), ptSegDist2(dx, dy, ax, ay, bx, by)))
  }

  /** Edges of a part: rings wrap, linestrings don't, points are degenerate. */
  private def edges(g: Geom, off: Int, len: Int): Iterator[(Double, Double, Double, Double)] = {
    val closedRing = isPolygonal(g)
    if (len == 1) Iterator((g.xs(off), g.ys(off), g.xs(off), g.ys(off)))
    else (0 until (if (closedRing) len else len - 1)).iterator.map { i =>
      val j = (i + 1) % len
      (g.xs(off + i), g.ys(off + i), g.xs(off + j), g.ys(off + j))
    }
  }

  /** ST_Distance (GeoFunctions.java:1697): min planar distance, 0 on
    * intersection/containment. O(edges(a)·edges(b)). */
  def distance(a: Geom, b: Geom): Double = {
    // containment: any vertex of one inside the polygonal other
    if (isPolygonal(a) && b.xs.indices.exists(i => containsPoint(a, b.xs(i), b.ys(i)))) return 0.0
    if (isPolygonal(b) && a.xs.indices.exists(i => containsPoint(b, a.xs(i), a.ys(i)))) return 0.0
    var best = Double.PositiveInfinity
    for ((offA, lenA, _) <- parts(a); ea <- edges(a, offA, lenA);
         (offB, lenB, _) <- parts(b); eb <- edges(b, offB, lenB)) {
      val d2 = segSegDist2(ea._1, ea._2, ea._3, ea._4, eb._1, eb._2, eb._3, eb._4)
      if (d2 < best) best = d2
      if (best == 0.0) return 0.0
    }
    math.sqrt(best)
  }

  // ------------------------------------------------------------- hull/buffer

  /** Andrew's monotone chain: CCW hull starting at the lexicographic min,
    * collinear points dropped, no closing duplicate. */
  def hull(points: Array[(Double, Double)]): Array[(Double, Double)] = {
    val ps = points.distinct.sorted
    if (ps.length <= 2) return ps
    def cross(o: (Double, Double), p: (Double, Double), q: (Double, Double)): Double =
      (p._1 - o._1) * (q._2 - o._2) - (p._2 - o._2) * (q._1 - o._1)
    def chain(src: Seq[(Double, Double)]): List[(Double, Double)] = {
      var st = List.empty[(Double, Double)]
      for (p <- src) {
        while (st.size >= 2 && cross(st.tail.head, st.head, p) <= 0) st = st.tail
        st = p :: st
      }
      st.reverse
    }
    val lower = chain(ps)
    val upper = chain(ps.reverse)
    (lower.dropRight(1) ++ upper.dropRight(1)).toArray
  }

  /** ST_Buffer (GeoFunctions.java:736): exact Minkowski dilation by a
    * regular OCTAGON of circumradius d — concave inputs included (closing
    * the former convex-hull over-cover for concave shapes).
    *
    * Construction (the support-function offset): every edge is translated
    * by d times the octagon vertex maximizing the dot product with the
    * edge's outward normal; at boundary turns that OPEN a gap (cross > 0
    * under outward traversal, or a line-cap U-turn) the intervening octagon
    * vertices are inserted around the corner (the octagonal "arc join");
    * at turns that OVERLAP (reflex corners) the two offset edge lines are
    * intersected (the exact Minkowski miter). This is the boundary of
    * `P ⊕ octagon(d)` whenever that boundary is a simple curve; a GLOBAL
    * interference (a narrow neck or cavity mouth closing at distance < 2d,
    * where dilation changes topology) makes the offset cycle
    * self-intersect, which is detected and → NULL — never a wrong answer.
    * Octagon vs the reference's round join keeps every output coordinate a
    * product of inputs with {0, 1, √½} (oracle-replayable, as with every
    * kernel in this file).
    *
    * Holes are ERODED with the same construction (the support offset of the
    * hole boundary under dilation is the Minkowski erosion of the hole);
    * a hole whose offset ring flips orientation has been swallowed and is
    * dropped. Multi-part inputs buffer part-wise; disjoint part buffers
    * (original distance > 2d) concatenate exactly, interacting ones MERGE
    * through the overlay union kernel (the topology change constructed,
    * not refused) — NULL only on a degenerate-contact union walk.
    * NULL for negative distance. d == 0 → the input unchanged. */
  def buffer(g: Geom, d: Double): Geom = {
    if (d.isNaN || d < 0) return null
    if (d == 0.0) return g
    val s = math.sqrt(0.5)
    val octX = Array(1.0, s, 0.0, -s, -1.0, -s, 0.0, s)
    val octY = Array(0.0, s, 1.0, s, 0.0, -s, -1.0, -s)

    def supportIdx(nx: Double, ny: Double): Int = {
      var best = 0; var bd = octX(0) * nx + octY(0) * ny
      var i = 1
      while (i < 8) {
        val dd = octX(i) * nx + octY(i) * ny
        if (dd > bd) { bd = dd; best = i }
        i += 1
      }
      best
    }

    /** Offset a closed traversal cycle (edges end-to-start linked) outward
      * (right of travel) by the octagon support; None on degenerate or
      * globally self-intersecting results. */
    def offsetCycle(eax: Array[Double], eay: Array[Double],
        ebx: Array[Double], eby: Array[Double]): Option[(Array[Double], Array[Double])] = {
      val m = eax.length
      if (m < 1) return None
      val ux = new Array[Double](m); val uy = new Array[Double](m)
      val si = new Array[Int](m)
      var i = 0
      while (i < m) {
        val dx = ebx(i) - eax(i); val dy = eby(i) - eay(i)
        val len = math.sqrt(dx * dx + dy * dy)
        if (len == 0.0) return None // zero edges filtered by callers
        ux(i) = dx / len; uy(i) = dy / len
        si(i) = supportIdx(uy(i), -ux(i)) // right normal of travel
        i += 1
      }
      // effective endpoints, possibly replaced by miters; arc points per joint
      val sX = Array.tabulate(m)(i => eax(i) + d * octX(si(i)))
      val sY = Array.tabulate(m)(i => eay(i) + d * octY(si(i)))
      val eX = Array.tabulate(m)(i => ebx(i) + d * octX(si(i)))
      val eY = Array.tabulate(m)(i => eby(i) + d * octY(si(i)))
      val arcs = Array.fill(m)(List.empty[(Double, Double)])
      var k = 0
      while (k < m) {
        val i = k; val j = (k + 1) % m
        if (si(i) != si(j)) {
          val cr = ux(i) * uy(j) - uy(i) * ux(j)
          val dot = ux(i) * ux(j) + uy(i) * uy(j)
          if (cr > 0 || (cr == 0 && dot < 0)) {
            // gap: walk octagon vertices CCW from si(i) to si(j) (exclusive)
            var idx = (si(i) + 1) % 8
            var pts = List.empty[(Double, Double)]
            var guard = 0
            while (idx != si(j) && guard < 8) {
              pts ::= ((ebx(i) + d * octX(idx), eby(i) + d * octY(idx)))
              idx = (idx + 1) % 8; guard += 1
            }
            arcs(i) = pts.reverse
          } else if (cr < 0) {
            // overlap: miter = intersection of the two offset edge lines
            val px = sX(i); val py = sY(i); val qx = sX(j); val qy = sY(j)
            val denom = cr
            if (math.abs(denom) < 1e-14) return None
            val t = ((qx - px) * uy(j) - (qy - py) * ux(j)) / denom
            val ix = px + t * ux(i); val iy = py + t * uy(i)
            eX(i) = ix; eY(i) = iy; sX(j) = ix; sY(j) = iy
          }
          // cr == 0 && dot > 0 with distinct supports cannot happen
          // (identical normals have identical argmax support)
        }
        k += 1
      }
      // assemble, dropping consecutive duplicates
      val outX = scala.collection.mutable.ArrayBuffer[Double]()
      val outY = scala.collection.mutable.ArrayBuffer[Double]()
      def push(x: Double, y: Double): Unit =
        if (outX.isEmpty || outX.last != x || outY.last != y) { outX += x; outY += y }
      i = 0
      while (i < m) {
        push(sX(i), sY(i)); push(eX(i), eY(i))
        arcs(i).foreach { case (x, y) => push(x, y) }
        i += 1
      }
      if (outX.length >= 2 && outX.head == outX.last && outY.head == outY.last) {
        outX.remove(outX.length - 1); outY.remove(outY.length - 1)
      }
      // drop exactly-collinear intermediate vertices (strip continuations)
      val n0 = outX.length
      val keep = Array.tabulate(n0) { v =>
        val p = (v + n0 - 1) % n0; val q = (v + 1) % n0
        val o = (outX(v) - outX(p)) * (outY(q) - outY(p)) -
          (outY(v) - outY(p)) * (outX(q) - outX(p))
        o != 0.0
      }
      val rx = (0 until n0).filter(keep).map(outX).toArray
      val ry = (0 until n0).filter(keep).map(outY).toArray
      if (rx.length < 3) return None
      // global interference guard: any proper crossing between
      // non-adjacent result segments → topology change → give up loudly
      val n = rx.length
      var a = 0
      while (a < n) {
        val a2 = (a + 1) % n
        var b = a + 2
        while (b < n) {
          val b2 = (b + 1) % n
          if (!(a == 0 && b2 == 0) &&
              Wkt.segmentsCross(rx(a), ry(a), rx(a2), ry(a2), rx(b), ry(b), rx(b2), ry(b2)))
            return None
          b += 1
        }
        a += 1
      }
      Some((rx, ry))
    }

    def ringSignedArea(xs: Array[Double], ys: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < xs.length) {
        val j = (i + 1) % xs.length
        acc += xs(i) * ys(j) - xs(j) * ys(i)
        i += 1
      }
      acc / 2
    }

    /** Closed ring traversal (open vertex list in travel order) → edges. */
    def cycleEdges(xs: Array[Double], ys: Array[Double]):
        (Array[Double], Array[Double], Array[Double], Array[Double]) = {
      val keep = xs.indices.filter { i =>
        val j = (i + 1) % xs.length
        xs(i) != xs(j) || ys(i) != ys(j)
      }.toArray
      (keep.map(xs), keep.map(ys),
        keep.map(i => xs((i + 1) % xs.length)), keep.map(i => ys((i + 1) % xs.length)))
    }

    /** Canonical rotation: lexicographic min first, closed ring appended. */
    def closedCanonical(xs: Array[Double], ys: Array[Double]): (Array[Double], Array[Double]) = {
      var mi = 0
      for (i <- xs.indices)
        if (xs(i) < xs(mi) || (xs(i) == xs(mi) && ys(i) < ys(mi))) mi = i
      val n = xs.length
      val ox = new Array[Double](n + 1); val oy = new Array[Double](n + 1)
      for (i <- 0 until n) { ox(i) = xs((mi + i) % n); oy(i) = ys((mi + i) % n) }
      ox(n) = ox(0); oy(n) = oy(0)
      (ox, oy)
    }

    def octagonDisc(cx: Double, cy: Double): (Array[Double], Array[Double]) = {
      val xs = Array.tabulate(8)(i => cx + d * octX(i))
      val ys = Array.tabulate(8)(i => cy + d * octY(i))
      closedCanonical(xs, ys)
    }

    val kind = g.kind.toUpperCase
    // decompose into per-part Geoms for the pairwise disjointness check
    def partGeoms: Seq[Geom] = {
      val ps = parts(g)
      kind match {
        case "POINT" | "MULTIPOINT" =>
          g.xs.indices.map(i => Geom("POINT", Array(g.xs(i)), Array(g.ys(i)), Array(1)))
        case "LINESTRING" => Seq(g)
        case "MULTILINESTRING" =>
          ps.map { case (off, len, _) =>
            Geom("LINESTRING", g.xs.slice(off, off + len), g.ys.slice(off, off + len), Array(len)) }.toSeq
        case _ => // POLYGON/MULTIPOLYGON: shell + its holes per part
          val out = scala.collection.mutable.ArrayBuffer[Geom]()
          var i = 0
          while (i < g.rings.length) {
            if (g.rings(i) > 0) {
              var j = i + 1
              while (j < g.rings.length && g.rings(j) < 0) j += 1
              val off = ps(i)._1
              val end = if (j < g.rings.length) ps(j)._1 else g.xs.length
              out += Geom("POLYGON", g.xs.slice(off, end), g.ys.slice(off, end),
                g.rings.slice(i, j))
              i = j
            } else i += 1
          }
          out.toSeq
      }
    }
    val pgs = partGeoms
    if (pgs.isEmpty) return null

    // each part buffers to one POLYGON; parts whose buffers can meet are
    // MERGED afterwards with the overlay union kernel (topology change via
    // union, not refusal) — null only on a degenerate-contact union walk
    val buffered = scala.collection.mutable.ArrayBuffer[Geom]()
    val outXs = scala.collection.mutable.ArrayBuffer[Double]()
    val outYs = scala.collection.mutable.ArrayBuffer[Double]()
    val outRings = scala.collection.mutable.ArrayBuffer[Int]()
    def flushPart(): Unit = {
      buffered += Geom("POLYGON", outXs.toArray, outYs.toArray, outRings.toArray)
      outXs.clear(); outYs.clear(); outRings.clear()
    }

    for (p <- pgs) {
      p.kind match {
        case "POINT" =>
          val (xs, ys) = octagonDisc(p.xs(0), p.ys(0))
          outXs ++= xs; outYs ++= ys; outRings += xs.length
        case "LINESTRING" =>
          // forward edges then backward edges: a closed traversal whose
          // offset is the two-sided strip with octagonal end caps
          val keep = (0 until p.xs.length - 1).filter(i =>
            p.xs(i) != p.xs(i + 1) || p.ys(i) != p.ys(i + 1))
          if (keep.isEmpty) { // degenerate line: a point
            val (xs, ys) = octagonDisc(p.xs(0), p.ys(0))
            outXs ++= xs; outYs ++= ys; outRings += xs.length
          } else {
            val fa = keep.map(p.xs).toArray; val fb = keep.map(i => p.xs(i + 1)).toArray
            val ga = keep.map(p.ys).toArray; val gb = keep.map(i => p.ys(i + 1)).toArray
            val eax = fa ++ fb.reverse
            val eay = ga ++ gb.reverse
            val ebx = fb ++ fa.reverse
            val eby = gb ++ ga.reverse
            offsetCycle(eax, eay, ebx, eby) match {
              case Some((xs, ys)) =>
                val (cx, cy) = closedCanonical(xs, ys)
                outXs ++= cx; outYs ++= cy; outRings += cx.length
              case None => return null
            }
          }
        case _ => // POLYGON part: shell outward, holes eroded
          val pparts = parts(p)
          val (ox, oy) = normRing(p.xs, p.ys, pparts(0)._1, pparts(0)._2)
          val (a1, a2, a3, a4) = cycleEdges(ox, oy)
          offsetCycle(a1, a2, a3, a4) match {
            case None => return null
            case Some((sxs, sys)) =>
              if (ringSignedArea(sxs, sys) <= 0) return null // shell degenerate
              val (cx, cy) = closedCanonical(sxs, sys)
              outXs ++= cx; outYs ++= cy; outRings += cx.length
          }
          for (h <- 1 until pparts.length) {
            val (hx0, hy0) = normRing(p.xs, p.ys, pparts(h)._1, pparts(h)._2)
            val hx = hx0.reverse; val hy = hy0.reverse // CW traversal = erode
            val (b1, b2, b3, b4) = cycleEdges(hx, hy)
            offsetCycle(b1, b2, b3, b4) match {
              case Some((rxs, rys)) =>
                // Vanish test. A symmetric over-collapse can produce an
                // INVERTED ring with unchanged orientation (a square hole
                // past its inradius), so orientation alone cannot decide.
                // Exact criterion: the erosion is non-empty iff some point
                // keeps a whole octagon(d) inside the hole; for a valid
                // simple eroded ring its centroid is such a point.
                val holeClosed = Geom("POLYGON",
                  hx0 :+ hx0(0), hy0 :+ hy0(0), Array(hx0.length + 1))
                val cx0 = rxs.sum / rxs.length; val cy0 = rys.sum / rys.length
                val octInside = (0 until 8).forall { oi =>
                  containsPoint(holeClosed, cx0 + d * octX(oi), cy0 + d * octY(oi))
                } && {
                  var ok = true
                  var oi = 0
                  while (ok && oi < 8) {
                    val oj = (oi + 1) % 8
                    var e = 0
                    while (ok && e < hx0.length) {
                      val e2 = (e + 1) % hx0.length
                      if (Wkt.segmentsCross(
                          cx0 + d * octX(oi), cy0 + d * octY(oi),
                          cx0 + d * octX(oj), cy0 + d * octY(oj),
                          hx0(e), hy0(e), hx0(e2), hy0(e2))) ok = false
                      e += 1
                    }
                    oi += 1
                  }
                  ok
                }
                if (octInside && ringSignedArea(rxs, rys) < 0) { // still a hole (CW)
                  val (ccx, ccy) = closedCanonical(rxs, rys)
                  outXs ++= ccx; outYs ++= ccy; outRings += -ccx.length
                } // else: the dilation swallowed the hole
              case None => return null // concave hole mid-collapse
            }
          }
      }
      flushPart()
    }
    if (buffered.length == 1) return buffered(0)
    // fast path: provably disjoint buffers (octagonal buffers of parts
    // farther than 2d apart can never meet) concatenate exactly
    val anyClose = pgs.indices.exists(i => ((i + 1) until pgs.length).exists(j =>
      distance(pgs(i), pgs(j)) <= 2 * d))
    if (!anyClose) {
      val xs = buffered.flatMap(_.xs).toArray
      val ys = buffered.flatMap(_.ys).toArray
      val rings = buffered.flatMap(_.rings).toArray
      Geom("MULTIPOLYGON", xs, ys, rings)
    } else
      buffered.reduce[Geom]((a, b) =>
        if (a == null || b == null) null else union(a, b))
  }

  // ------------------------------------------------------------- union

  /** Open CCW normalization of a ring slice: drop closing duplicate, reverse
    * clockwise rings. */
  private[ext] def normRing(xs: Array[Double], ys: Array[Double], off: Int, len0: Int):
      (Array[Double], Array[Double]) = {
    var len = len0
    if (len > 1 && xs(off) == xs(off + len - 1) && ys(off) == ys(off + len - 1)) len -= 1
    var area = 0.0
    for (i <- 0 until len) {
      val j = (i + 1) % len
      area += xs(off + i) * ys(off + j) - xs(off + j) * ys(off + i)
    }
    val ix = Array.tabulate(len)(i => i)
    val order = if (area >= 0) ix else ix.reverse
    (order.map(i => xs(off + i)), order.map(i => ys(off + i)))
  }

  /** Intersection boundary walk for two simple CCW rings with proper
    * crossings (the dual of [[ringUnion]]): from a crossing, follow the ring
    * whose forward sub-segment runs INSIDE the other polygon, switching at
    * every crossing. Non-convex operands can intersect in k>1 disjoint
    * regions; each region's boundary is a disjoint cycle over the crossing
    * nodes, so the walk restarts from any crossing the previous components
    * did not visit until all crossings are consumed. Returns all component
    * rings; None when the boundaries don't cross, or when any walk fails to
    * close (degenerate contact — caller yields NULL, never a wrong answer). */
  def ringIntersection(ax: Array[Double], ay: Array[Double],
      bx: Array[Double], by: Array[Double]): Option[List[(Array[Double], Array[Double])]] = {
    val nA = ax.length; val nB = bx.length
    val interA = Array.fill(nA)(List.empty[(Double, Double, Double, Int)])
    val interB = Array.fill(nB)(List.empty[(Double, Double, Double, Int)])
    var nextId = 0
    for (i <- 0 until nA; j <- 0 until nB) {
      val (x1, y1) = (ax(i), ay(i)); val (x2, y2) = (ax((i + 1) % nA), ay((i + 1) % nA))
      val (x3, y3) = (bx(j), by(j)); val (x4, y4) = (bx((j + 1) % nB), by((j + 1) % nB))
      if (properCross(x1, y1, x2, y2, x3, y3, x4, y4)) {
        val denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        val tA = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / denom
        val px = x1 + tA * (x2 - x1); val py = y1 + tA * (y2 - y1)
        val tB =
          if (math.abs(x4 - x3) >= math.abs(y4 - y3)) (px - x3) / (x4 - x3)
          else (py - y3) / (y4 - y3)
        interA(i) ::= ((tA, px, py, nextId))
        interB(j) ::= ((tB, px, py, nextId))
        nextId += 1
      }
    }
    if (nextId == 0) return None
    def augment(xs: Array[Double], ys: Array[Double],
        inter: Array[List[(Double, Double, Double, Int)]]): Array[(Double, Double, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Double, Double, Int)]()
      for (i <- xs.indices) {
        out += ((xs(i), ys(i), -1))
        for ((_, px, py, id) <- inter(i).sortBy(_._1)) out += ((px, py, id))
      }
      out.toArray
    }
    val cycA = augment(ax, ay, interA)
    val cycB = augment(bx, by, interB)
    val posInB = cycB.zipWithIndex.collect { case ((_, _, id), k) if id >= 0 => id -> k }.toMap
    val posInA = cycA.zipWithIndex.collect { case ((_, _, id), k) if id >= 0 => id -> k }.toMap
    val visited = new java.util.BitSet(nextId)
    val rings = scala.collection.mutable.ListBuffer[(Array[Double], Array[Double])]()
    // each intersection component's boundary is a disjoint cycle over the
    // crossing nodes: walk one from the first unvisited crossing, repeat
    var startA = cycA.indexWhere(_._3 >= 0)
    while (startA >= 0) {
      val startId = cycA(startA)._3
      visited.set(startId)
      // the forward branch that runs inside B decides which cycle the walk enters on
      val afterA = cycA((startA + 1) % cycA.length)
      val midX = (cycA(startA)._1 + afterA._1) / 2
      val midY = (cycA(startA)._2 + afterA._2) / 2
      var onA = pointInRingArr(midX, midY, bx, by, 0, nB)
      var pos = if (onA) (startA + 1) % cycA.length else (posInB(startId) + 1) % cycB.length
      val outX = scala.collection.mutable.ArrayBuffer[Double](cycA(startA)._1)
      val outY = scala.collection.mutable.ArrayBuffer[Double](cycA(startA)._2)
      val maxSteps = 2 * (cycA.length + cycB.length) + 4
      var steps = 0
      var done = false
      while (!done && steps <= maxSteps) {
        val cyc = if (onA) cycA else cycB
        val (x, y, id) = cyc(pos)
        if (id == startId) done = true
        else {
          outX += x; outY += y
          if (id >= 0) {
            visited.set(id)
            pos = if (onA) posInB(id) else posInA(id)
            onA = !onA
          }
          pos = (pos + 1) % (if (onA) cycA.length else cycB.length)
        }
        steps += 1
      }
      if (!done) return None
      rings += ((outX.toArray, outY.toArray))
      startA = cycA.indexWhere(t => t._3 >= 0 && !visited.get(t._3))
    }
    Some(rings.toList)
  }

  /** Difference boundary walk A∖B for two simple CCW rings with proper
    * crossings (Weiler–Atherton / Greiner–Hormann difference rules over the
    * same augmented cycles as [[ringIntersection]]): classify each crossing
    * as entry (A's forward sub-segment runs INTO B) or exit; from each
    * unvisited exit, follow A FORWARD while outside B and B BACKWARD while
    * inside A, switching at every crossing, until the walk closes. One
    * component per exit-seeded cycle. None when the boundaries don't cross
    * (caller resolves containment/disjointness) or when any walk fails to
    * close / leaves crossings unvisited (degenerate contact — caller yields
    * NULL rather than a wrong answer). */
  def ringDifference(ax: Array[Double], ay: Array[Double],
      bx: Array[Double], by: Array[Double]): Option[List[(Array[Double], Array[Double])]] = {
    val nA = ax.length; val nB = bx.length
    val interA = Array.fill(nA)(List.empty[(Double, Double, Double, Int)])
    val interB = Array.fill(nB)(List.empty[(Double, Double, Double, Int)])
    var nextId = 0
    for (i <- 0 until nA; j <- 0 until nB) {
      val (x1, y1) = (ax(i), ay(i)); val (x2, y2) = (ax((i + 1) % nA), ay((i + 1) % nA))
      val (x3, y3) = (bx(j), by(j)); val (x4, y4) = (bx((j + 1) % nB), by((j + 1) % nB))
      if (properCross(x1, y1, x2, y2, x3, y3, x4, y4)) {
        val denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        val tA = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / denom
        val px = x1 + tA * (x2 - x1); val py = y1 + tA * (y2 - y1)
        val tB =
          if (math.abs(x4 - x3) >= math.abs(y4 - y3)) (px - x3) / (x4 - x3)
          else (py - y3) / (y4 - y3)
        interA(i) ::= ((tA, px, py, nextId))
        interB(j) ::= ((tB, px, py, nextId))
        nextId += 1
      }
    }
    if (nextId == 0) return None
    def augment(xs: Array[Double], ys: Array[Double],
        inter: Array[List[(Double, Double, Double, Int)]]): Array[(Double, Double, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Double, Double, Int)]()
      for (i <- xs.indices) {
        out += ((xs(i), ys(i), -1))
        for ((_, px, py, id) <- inter(i).sortBy(_._1)) out += ((px, py, id))
      }
      out.toArray
    }
    val cycA = augment(ax, ay, interA)
    val cycB = augment(bx, by, interB)
    val posInB = cycB.zipWithIndex.collect { case ((_, _, id), k) if id >= 0 => id -> k }.toMap
    val posInA = cycA.zipWithIndex.collect { case ((_, _, id), k) if id >= 0 => id -> k }.toMap
    // entry(id): A's forward sub-segment after the crossing runs inside B
    // (between consecutive augmented nodes inside/outside is constant)
    val entry = new Array[Boolean](nextId)
    for (k <- cycA.indices if cycA(k)._3 >= 0) {
      val nxt = cycA((k + 1) % cycA.length)
      val mx = (cycA(k)._1 + nxt._1) / 2; val my = (cycA(k)._2 + nxt._2) / 2
      entry(cycA(k)._3) = pointInRingArr(mx, my, bx, by, 0, nB)
    }
    val visited = new java.util.BitSet(nextId)
    val rings = scala.collection.mutable.ListBuffer[(Array[Double], Array[Double])]()
    def nextSeed(): Int = cycA.indexWhere(t => t._3 >= 0 && !entry(t._3) && !visited.get(t._3))
    var seedPos = nextSeed()
    while (seedPos >= 0) {
      val startId = cycA(seedPos)._3
      visited.set(startId)
      val outX = scala.collection.mutable.ArrayBuffer[Double](cycA(seedPos)._1)
      val outY = scala.collection.mutable.ArrayBuffer[Double](cycA(seedPos)._2)
      var onA = true
      var pos = (seedPos + 1) % cycA.length
      val maxSteps = 2 * (cycA.length + cycB.length) + 4
      var steps = 0
      var done = false
      while (!done && steps <= maxSteps) {
        if (onA) {
          val (x, y, id) = cycA(pos)
          if (id == startId) done = true
          else {
            outX += x; outY += y
            if (id >= 0) { // an entry: continue on B, traversed backward
              visited.set(id)
              onA = false
              pos = (posInB(id) - 1 + cycB.length) % cycB.length
            } else pos = (pos + 1) % cycA.length
          }
        } else {
          val (x, y, id) = cycB(pos)
          if (id == startId) done = true
          else {
            outX += x; outY += y
            if (id >= 0) { // an exit: rejoin A, forward
              visited.set(id)
              onA = true
              pos = (posInA(id) + 1) % cycA.length
            } else pos = (pos - 1 + cycB.length) % cycB.length
          }
        }
        steps += 1
      }
      if (!done) return None
      rings += ((outX.toArray, outY.toArray))
      seedPos = nextSeed()
    }
    // every crossing lies on exactly one difference component's boundary;
    // anything unvisited means a shape this walk cannot handle
    if ((0 until nextId).exists(!visited.get(_))) return None
    Some(rings.toList)
  }

  /** One closed canonical ring (lexicographic-min start, first vertex
    * repeated) from an open ring. */
  private def closedRing(xs: Array[Double], ys: Array[Double]):
      (Array[Double], Array[Double]) = {
    val start = xs.indices.minBy(i => (xs(i), ys(i)))
    val n = xs.length
    val ox = new Array[Double](n + 1); val oy = new Array[Double](n + 1)
    for (k <- 0 to n) { val i = (start + k) % n; ox(k) = xs(i); oy(k) = ys(i) }
    (ox, oy)
  }

  /** POLYGON with one hole (outer CCW shell, inner ring negated) — the
    * containment case of difference/symmetric difference. */
  private def holedPolygon(outerX: Array[Double], outerY: Array[Double],
      holeX: Array[Double], holeY: Array[Double]): Geom = {
    val (sx, sy) = closedRing(outerX, outerY)
    val (hx, hy) = closedRing(holeX, holeY)
    Geom("POLYGON", sx ++ hx, sy ++ hy, Array(sx.length, -hx.length))
  }

  /** ST_Difference (GeoFunctions.java:1685 delegation to the overlay):
    * supported for hole-free single-shell polygons — proper-crossing
    * difference walk (k>1 regions → MULTIPOLYGON), B-inside-A → A with hole,
    * disjoint → A, A-inside-B → NULL (empty; this model has no empty
    * geometry), degenerate contact → NULL. */
  def difference(a: Geom, b: Geom): Geom = {
    if (a == null || b == null) return null
    if (a.kind != "POLYGON" || b.kind != "POLYGON") return null
    if (a.rings.length != 1 || b.rings.length != 1) return null
    val (ax, ay) = normRing(a.xs, a.ys, 0, math.abs(a.rings(0)))
    val (bx, by) = normRing(b.xs, b.ys, 0, math.abs(b.rings(0)))
    ringDifference(ax, ay, bx, by) match {
      case Some(shells) => shellsToGeom(shells)
      case None =>
        if (pointInRingArr(bx(0), by(0), ax, ay, 0, ax.length))
          holedPolygon(ax, ay, bx, by) // B strictly inside A
        else if (pointInRingArr(ax(0), ay(0), bx, by, 0, bx.length))
          null // A inside B: empty difference
        else shellsToGeom(List((ax, ay))) // disjoint: A unchanged
    }
  }

  /** ST_SymDifference (GeoFunctions.java:1754): (A∖B) ∪ (B∖A) as disjoint
    * parts (shared single-point corners stay separate parts — the reference
    * dissolves them; areas agree). Containment → container with a hole;
    * disjoint → both operands as a MULTIPOLYGON. */
  def symDifference(a: Geom, b: Geom): Geom = {
    if (a == null || b == null) return null
    if (a.kind != "POLYGON" || b.kind != "POLYGON") return null
    if (a.rings.length != 1 || b.rings.length != 1) return null
    val (ax, ay) = normRing(a.xs, a.ys, 0, math.abs(a.rings(0)))
    val (bx, by) = normRing(b.xs, b.ys, 0, math.abs(b.rings(0)))
    (ringDifference(ax, ay, bx, by), ringDifference(bx, by, ax, ay)) match {
      case (Some(s1), Some(s2)) => shellsToGeom(s1 ++ s2)
      case (None, None) =>
        if (pointInRingArr(bx(0), by(0), ax, ay, 0, ax.length))
          holedPolygon(ax, ay, bx, by)
        else if (pointInRingArr(ax(0), ay(0), bx, by, 0, bx.length))
          holedPolygon(bx, by, ax, ay)
        else shellsToGeom(List((ax, ay), (bx, by))) // disjoint: both parts
      case _ => null // one walk degenerate → NULL, never a wrong answer
    }
  }

  /** ST_Intersection (GeoFunctions.java delegation to the ESRI/JTS overlay):
    * supported for hole-free single-shell polygons — proper-crossing walk
    * (k>1 disjoint regions → MULTIPOLYGON), containment collapse to the
    * inner operand; disjoint → NULL (this model has no empty geometry;
    * documented). */
  def intersection(a: Geom, b: Geom): Geom = {
    if (a == null || b == null) return null
    if (a.kind != "POLYGON" || b.kind != "POLYGON") return null
    if (a.rings.length != 1 || b.rings.length != 1) return null
    val (ax, ay) = normRing(a.xs, a.ys, 0, math.abs(a.rings(0)))
    val (bx, by) = normRing(b.xs, b.ys, 0, math.abs(b.rings(0)))
    ringIntersection(ax, ay, bx, by) match {
      case Some(shells) => shellsToGeom(shells)
      case None =>
        if (pointInRingArr(ax(0), ay(0), bx, by, 0, bx.length)) shellsToGeom(List((ax, ay)))
        else if (pointInRingArr(bx(0), by(0), ax, ay, 0, ax.length)) shellsToGeom(List((bx, by)))
        else null // disjoint: no empty-geometry representation
    }
  }

  /** Normalized open-CCW shells of a hole-free polygonal geometry; empty for
    * unsupported inputs (non-polygonal kinds, holes). */
  def shellsOf(g: Geom): Seq[(Array[Double], Array[Double])] =
    if (g == null || !isPolygonal(g) || g.rings.exists(_ < 0)) Seq.empty
    else parts(g).toSeq.map { case (off, len, _) => normRing(g.xs, g.ys, off, len) }

  /** Union boundary walk for two simple CCW rings with ≥1 proper boundary
    * crossing. Returns the union's outer ring, or None when the boundaries
    * don't properly cross (caller resolves containment/disjointness), or
    * when the walk fails to close (degenerate contact — caller yields NULL
    * rather than a wrong answer). */
  def ringUnionFull(ax: Array[Double], ay: Array[Double],
      bx: Array[Double], by: Array[Double]):
      Option[((Array[Double], Array[Double]), List[(Array[Double], Array[Double])])] = {
    val nA = ax.length; val nB = bx.length
    // nodes per edge: (t, x, y, id)
    val interA = Array.fill(nA)(List.empty[(Double, Double, Double, Int)])
    val interB = Array.fill(nB)(List.empty[(Double, Double, Double, Int)])
    var nextId = 0
    for (i <- 0 until nA; j <- 0 until nB) {
      val (x1, y1) = (ax(i), ay(i)); val (x2, y2) = (ax((i + 1) % nA), ay((i + 1) % nA))
      val (x3, y3) = (bx(j), by(j)); val (x4, y4) = (bx((j + 1) % nB), by((j + 1) % nB))
      if (properCross(x1, y1, x2, y2, x3, y3, x4, y4)) {
        val denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        val tA = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / denom
        val px = x1 + tA * (x2 - x1); val py = y1 + tA * (y2 - y1)
        val tB =
          if (math.abs(x4 - x3) >= math.abs(y4 - y3)) (px - x3) / (x4 - x3)
          else (py - y3) / (y4 - y3)
        interA(i) ::= ((tA, px, py, nextId))
        interB(j) ::= ((tB, px, py, nextId))
        nextId += 1
      }
    }
    if (nextId == 0) return None
    // augmented cycles: (x, y, interId | -1)
    def augment(xs: Array[Double], ys: Array[Double],
        inter: Array[List[(Double, Double, Double, Int)]]): Array[(Double, Double, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Double, Double, Int)]()
      for (i <- xs.indices) {
        out += ((xs(i), ys(i), -1))
        for ((_, px, py, id) <- inter(i).sortBy(_._1)) out += ((px, py, id))
      }
      out.toArray
    }
    val cycA = augment(ax, ay, interA)
    val cycB = augment(bx, by, interB)
    val posInB: Map[Int, Int] = cycB.zipWithIndex.collect { case ((_, _, id), k) if id >= 0 => id -> k }.toMap
    val posInA: Map[Int, Int] = cycA.zipWithIndex.collect { case ((_, _, id), k) if id >= 0 => id -> k }.toMap
    // start: a vertex of A strictly outside B
    val start = cycA.indexWhere { case (x, y, id) =>
      id < 0 && !pointInRingArr(x, y, bx, by, 0, nB)
    }
    if (start < 0) return None
    val visited = new java.util.BitSet(nextId)
    val outX = scala.collection.mutable.ArrayBuffer[Double]()
    val outY = scala.collection.mutable.ArrayBuffer[Double]()
    var onA = true
    var pos = start
    val maxSteps = 2 * (cycA.length + cycB.length) + 4
    var steps = 0
    var done = false
    while (!done && steps <= maxSteps) {
      val cyc = if (onA) cycA else cycB
      val (x, y, id) = cyc(pos)
      if (steps > 0 && onA && pos == start) done = true
      else {
        outX += x; outY += y
        if (id >= 0) { // switch cycles at every crossing
          visited.set(id)
          pos = if (onA) posInB(id) else posInA(id)
          onA = !onA
        }
        pos = (pos + 1) % (if (onA) cycA.length else cycB.length)
      }
      steps += 1
    }
    if (!done) return None
    val outer = (outX.toArray, outY.toArray)
    // crossings the outer walk never met lie on POCKET boundaries —
    // exterior regions the two boundaries enclose (think a strip across a
    // U shape). Each pocket cycle follows both rings BACKWARD (union
    // interior on the A/B-interior side ⇒ pocket-on-left = reversed
    // travel), switching cycles at every crossing.
    val pockets = scala.collection.mutable.ListBuffer[(Array[Double], Array[Double])]()
    var seed = (0 until nextId).find(!visited.get(_))
    while (seed.isDefined) {
      val sid = seed.get
      visited.set(sid)
      val cpos = posInA(sid)
      // start on the cycle whose BACKWARD branch from the seed runs outside
      // the other polygon (that branch borders the pocket)
      val prev = cycA((cpos - 1 + cycA.length) % cycA.length)
      val mx = (cycA(cpos)._1 + prev._1) / 2
      val my = (cycA(cpos)._2 + prev._2) / 2
      var pOnA = !pointInRingArr(mx, my, bx, by, 0, nB)
      var pp = if (pOnA) cpos else posInB(sid)
      val px = scala.collection.mutable.ArrayBuffer[Double](cycA(cpos)._1)
      val py = scala.collection.mutable.ArrayBuffer[Double](cycA(cpos)._2)
      var psteps = 0
      var pdone = false
      while (!pdone && psteps <= maxSteps) {
        val len = if (pOnA) cycA.length else cycB.length
        pp = (pp - 1 + len) % len
        val (x, y, id) = (if (pOnA) cycA else cycB)(pp)
        if (id == sid) pdone = true
        else {
          px += x; py += y
          if (id >= 0) {
            visited.set(id)
            pp = if (pOnA) posInB(id) else posInA(id)
            pOnA = !pOnA
          }
        }
        psteps += 1
      }
      if (!pdone) return None
      pockets += ((px.toArray, py.toArray))
      seed = (0 until nextId).find(!visited.get(_))
    }
    Some((outer, pockets.toList))
  }

  /** Hole-free union outer ring only — None when the union would need holes
    * (pockets), so no caller can silently overcount. */
  def ringUnion(ax: Array[Double], ay: Array[Double],
      bx: Array[Double], by: Array[Double]): Option[(Array[Double], Array[Double])] =
    ringUnionFull(ax, ay, bx, by) match {
      case Some((outer, Nil)) => Some(outer)
      case _ => None
    }

  /** Iteratively merge new open CCW shells into an accumulated list of
    * pairwise-disjoint parts: each new shell unions with any overlapping /
    * containing existing part until none overlaps. Also the reduce step of
    * geometry_union_agg — state size is bounded by the merged boundary, the
    * same bound the reference's aggregate state carries. */
  def mergeInto(acc0: List[(Array[Double], Array[Double])],
      shells: Seq[(Array[Double], Array[Double])]): List[(Array[Double], Array[Double])] = {
    var acc = acc0
    for (s0 <- shells) {
      var cur = s0
      var merged = true
      while (merged) {
        merged = false
        acc.find { case (qx, qy) =>
          ringUnion(cur._1, cur._2, qx, qy).isDefined ||
            pointInRingArr(qx(0), qy(0), cur._1, cur._2, 0, cur._1.length) ||
            pointInRingArr(cur._1(0), cur._2(0), qx, qy, 0, qx.length)
        } match {
          case Some(q) =>
            acc = acc.filterNot(_ eq q)
            ringUnion(cur._1, cur._2, q._1, q._2) match {
              case Some(u) => cur = u
              case None =>
                // no proper crossing: pure containment — keep the container
                cur =
                  if (pointInRingArr(q._1(0), q._2(0), cur._1, cur._2, 0, cur._1.length)) cur
                  else q
            }
            merged = true
          case None =>
        }
      }
      acc ::= cur
    }
    acc
  }

  /** Canonical geometry from merged shells: parts sorted by (min x, min y),
    * each ring closed, single part → POLYGON. */
  def shellsToGeom(shells: List[(Array[Double], Array[Double])]): Geom = {
    val sorted = shells.sortBy { case (xs, ys) => (xs.min, ys.min) }
    val bx = scala.collection.mutable.ArrayBuffer[Double]()
    val by = scala.collection.mutable.ArrayBuffer[Double]()
    val lens = scala.collection.mutable.ArrayBuffer[Int]()
    for ((xs, ys) <- sorted) {
      // canonical start: lexicographic min vertex
      val start = xs.indices.minBy(i => (xs(i), ys(i)))
      val n = xs.length
      for (k <- 0 to n) { // 0..n closes the ring
        val i = (start + k) % n
        bx += xs(i); by += ys(i)
      }
      lens += n + 1
    }
    Geom(if (sorted.length == 1) "POLYGON" else "MULTIPOLYGON",
      bx.toArray, by.toArray, lens.toArray)
  }

  /** Components of r1 ∖ r2 over simple rings. "r2 strictly inside r1" is
    * the caller-excluded island case (annulus — unrepresentable as a flat
    * hole) → None. */
  private def regionDiff(r1: (Array[Double], Array[Double]),
      r2: (Array[Double], Array[Double])): Option[List[(Array[Double], Array[Double])]] =
    ringDifference(r1._1, r1._2, r2._1, r2._2) match {
      case some @ Some(_) => some
      case None =>
        if (pointInRingArr(r1._1(0), r1._2(0), r2._1, r2._2, 0, r2._1.length))
          Some(Nil) // r1 inside r2: empty difference
        else if (pointInRingArr(r2._1(0), r2._2(0), r1._1, r1._2, 0, r1._1.length))
          None // annulus — caller rules this flow out; refuse, never misstate
        else Some(List(r1)) // disjoint
    }

  /** Components of r1 ∩ r2 over simple rings. */
  private def regionIntersect(r1: (Array[Double], Array[Double]),
      r2: (Array[Double], Array[Double])): Option[List[(Array[Double], Array[Double])]] =
    ringIntersection(r1._1, r1._2, r2._1, r2._2) match {
      case some @ Some(_) => some
      case None =>
        if (pointInRingArr(r1._1(0), r1._2(0), r2._1, r2._2, 0, r2._1.length))
          Some(List(r1))
        else if (pointInRingArr(r2._1(0), r2._2(0), r1._1, r1._2, 0, r1._1.length))
          Some(List(r2))
        else Some(Nil) // disjoint
    }

  /** One canonical part (shell + holes, closed rings, holes negated). */
  private def partGeom(shell: (Array[Double], Array[Double]),
      holes: List[(Array[Double], Array[Double])]):
      (Array[Double], Array[Double], Array[Int]) = {
    val bx = scala.collection.mutable.ArrayBuffer[Double]()
    val by = scala.collection.mutable.ArrayBuffer[Double]()
    val lens = scala.collection.mutable.ArrayBuffer[Int]()
    def put(r: (Array[Double], Array[Double]), hole: Boolean): Unit = {
      val start = r._1.indices.minBy(i => (r._1(i), r._2(i)))
      val n = r._1.length
      for (k <- 0 to n) { val i = (start + k) % n; bx += r._1(i); by += r._2(i) }
      lens += (if (hole) -(n + 1) else n + 1)
    }
    put(shell, hole = false)
    holes.sortBy(h => (h._1.min, h._2.min)).foreach(put(_, hole = true))
    (bx.toArray, by.toArray, lens.toArray)
  }

  private def assembleParts(
      ps: List[((Array[Double], Array[Double]), List[(Array[Double], Array[Double])])]): Geom = {
    val sorted = ps.sortBy { case (shell, _) => (shell._1.min, shell._2.min) }
    val built = sorted.map { case (s, hs) => partGeom(s, hs) }
    Geom(if (built.length == 1) "POLYGON" else "MULTIPOLYGON",
      built.flatMap(_._1).toArray, built.flatMap(_._2).toArray,
      built.flatMap(_._3).toArray)
  }

  /** Union of two single-shell polygons, holes allowed (GeoFunctions.java
    * :1122 general overlay case). Result holes are exactly the regions of
    * the merged shell covered by NEITHER interior:
    * pockets ∪ (hA∖sB) ∪ (hB∖sA) ∪ (hA∩hB) — a disjoint decomposition.
    * B-inside-a-hole-of-A (and vice versa) is the island case → two
    * MULTIPOLYGON parts. Any degenerate kernel walk → NULL. */
  def unionHoled(a: Geom, b: Geom): Geom = {
    val pa = parts(a); val pb = parts(b)
    val sA = normRing(a.xs, a.ys, pa(0)._1, pa(0)._2)
    val sB = normRing(b.xs, b.ys, pb(0)._1, pb(0)._2)
    val hA = pa.toList.drop(1).map { case (off, len, _) => normRing(a.xs, a.ys, off, len) }
    val hB = pb.toList.drop(1).map { case (off, len, _) => normRing(b.xs, b.ys, off, len) }
    def inside(p: (Array[Double], Array[Double]), q: (Array[Double], Array[Double])): Boolean =
      pointInRingArr(p._1(0), p._2(0), q._1, q._2, 0, q._1.length)
    def noCross(p: (Array[Double], Array[Double]), q: (Array[Double], Array[Double])): Boolean = {
      val n = p._1.length; val m = q._1.length
      !(0 until n).exists { i =>
        val (x1, y1) = (p._1(i), p._2(i)); val (x2, y2) = (p._1((i + 1) % n), p._2((i + 1) % n))
        (0 until m).exists { j =>
          properCross(x1, y1, x2, y2, q._1(j), q._2(j), q._1((j + 1) % m), q._2((j + 1) % m))
        }
      }
    }
    // island cases: one operand ENTIRELY within a hole of the other (a
    // vertex inside is only conclusive when the boundaries don't cross)
    def entirelyInside(p: (Array[Double], Array[Double]), q: (Array[Double], Array[Double])): Boolean =
      noCross(p, q) && inside(p, q)
    if (hA.exists(h => entirelyInside(sB, h))) return assembleParts(List((sA, hA), (sB, hB)))
    if (hB.exists(h => entirelyInside(sA, h))) return assembleParts(List((sA, hA), (sB, hB)))
    // merged shell (+ pockets) or containment/disjoint. With NO proper
    // crossings, classification must be boundary-aware: a single-vertex
    // parity test silently mis-unions boundary-touching shells (B sticking
    // out of A along a collinear edge would collapse to A), and
    // vertex-only tests miss overlaps whose every contact is collinear —
    // edge MIDPOINTS probe those (dyadic coords stay exact). Anything
    // still ambiguous → NULL, never a wrong area.
    val (shell, pockets): ((Array[Double], Array[Double]), List[(Array[Double], Array[Double])]) =
      ringUnionFull(sA._1, sA._2, sB._1, sB._2) match {
        case Some(sp) => sp
        case None =>
          type Ring = (Array[Double], Array[Double])
          def onBoundary(px: Double, py: Double, r: Ring): Boolean = {
            val n = r._1.length
            (0 until n).exists { i =>
              val (x1, y1) = (r._1(i), r._2(i))
              val (x2, y2) = (r._1((i + 1) % n), r._2((i + 1) % n))
              (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) == 0.0 &&
                px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
                py >= math.min(y1, y2) && py <= math.max(y1, y2)
            }
          }
          def strictIn(px: Double, py: Double, r: Ring): Boolean =
            !onBoundary(px, py, r) && pointInRingArr(px, py, r._1, r._2, 0, r._1.length)
          def strictOut(px: Double, py: Double, r: Ring): Boolean =
            !onBoundary(px, py, r) && !pointInRingArr(px, py, r._1, r._2, 0, r._1.length)
          def counts(p: Ring, q: Ring): (Int, Int) =
            (p._1.indices.count(i => strictIn(p._1(i), p._2(i), q)),
             p._1.indices.count(i => strictOut(p._1(i), p._2(i), q)))
          def midpointDipsInto(p: Ring, q: Ring): Boolean = {
            val n = p._1.length
            (0 until n).exists { i =>
              strictIn((p._1(i) + p._1((i + 1) % n)) / 2,
                (p._2(i) + p._2((i + 1) % n)) / 2, q)
            }
          }
          val (bSI, bSO) = counts(sB, sA)
          val (aSI, aSO) = counts(sA, sB)
          if (bSO == 0 && aSI == 0 && !midpointDipsInto(sA, sB)) (sA, Nil)
          else if (aSO == 0 && bSI == 0 && !midpointDipsInto(sB, sA)) (sB, Nil)
          else if (bSI == 0 && aSI == 0 &&
              !midpointDipsInto(sA, sB) && !midpointDipsInto(sB, sA))
            return assembleParts(List((sA, hA), (sB, hB))) // disjoint (at most touching)
          else return null // collinear-contact overlap without proper crossings
      }
    val holes = scala.collection.mutable.ListBuffer[(Array[Double], Array[Double])]()
    holes ++= pockets
    for (h <- hA) regionDiff(h, sB) match {
      case Some(ps) => holes ++= ps
      case None => return null
    }
    for (h <- hB) regionDiff(h, sA) match {
      case Some(ps) => holes ++= ps
      case None => return null
    }
    for (h1 <- hA; h2 <- hB) regionIntersect(h1, h2) match {
      case Some(ps) => holes ++= ps
      case None => return null
    }
    assembleParts(List((shell, holes.toList)))
  }

  /** Split a polygonal geom into per-part single-shell Geoms: each shell
    * ring with its trailing holes (the WKT/ring-model part grouping). */
  private def splitParts(g: Geom): List[Geom] = {
    val ps = parts(g)
    val out = scala.collection.mutable.ListBuffer[Geom]()
    var i = 0
    while (i < ps.length) {
      val xs = scala.collection.mutable.ArrayBuffer[Double]()
      val ys = scala.collection.mutable.ArrayBuffer[Double]()
      val rs = scala.collection.mutable.ArrayBuffer[Int]()
      def add(off: Int, len: Int, hole: Boolean): Unit = {
        xs ++= g.xs.slice(off, off + len); ys ++= g.ys.slice(off, off + len)
        rs += (if (hole) -len else len)
      }
      add(ps(i)._1, ps(i)._2, hole = false)
      i += 1
      while (i < ps.length && ps(i)._3) { add(ps(i)._1, ps(i)._2, hole = true); i += 1 }
      out += Geom("POLYGON", xs.toArray, ys.toArray, rs.toArray)
    }
    out.toList
  }

  private def shellRing(g: Geom): (Array[Double], Array[Double]) = {
    val p = parts(g)(0); normRing(g.xs, g.ys, p._1, p._2)
  }
  private def holeRings(g: Geom): List[(Array[Double], Array[Double])] =
    parts(g).toList.drop(1).map { case (off, len, _) => normRing(g.xs, g.ys, off, len) }

  private def ringsCross(p: (Array[Double], Array[Double]),
      q: (Array[Double], Array[Double])): Boolean = {
    val n = p._1.length; val m = q._1.length
    (0 until n).exists { i =>
      val (x1, y1) = (p._1(i), p._2(i)); val (x2, y2) = (p._1((i + 1) % n), p._2((i + 1) % n))
      (0 until m).exists { j =>
        properCross(x1, y1, x2, y2, q._1(j), q._2(j), q._1((j + 1) % m), q._2((j + 1) % m))
      }
    }
  }
  private def vertexInside(p: (Array[Double], Array[Double]),
      q: (Array[Double], Array[Double])): Boolean =
    pointInRingArr(p._1(0), p._2(0), q._1, q._2, 0, q._1.length)

  /** Two parts interact (must be pairwise-unioned) iff their shells cross,
    * or one shell sits inside the other WITHOUT being entirely inside one
    * of its holes (the inside-a-hole island case keeps both parts). */
  private def partsInteract(p: Geom, q: Geom): Boolean = {
    val sp = shellRing(p); val sq = shellRing(q)
    def entirelyInHole(s: (Array[Double], Array[Double]), host: Geom): Boolean =
      holeRings(host).exists(h => !ringsCross(s, h) && vertexInside(s, h))
    if (ringsCross(sp, sq)) true
    else if (!ringsCross(sp, sq) && vertexInside(sq, sp)) !entirelyInHole(sq, p)
    else if (vertexInside(sp, sq)) !entirelyInHole(sp, q)
    else false
  }

  /** Union with MULTI-SHELL HOLED operands (the round-8 closure of the
    * documented gap): decompose both sides into single-shell parts, then
    * fold interacting pairs through [[unionHoled]] until no pair interacts.
    * Each merge strictly reduces the part count (interacting pairs cannot
    * produce island/disjoint two-part results), so the fold terminates; a
    * degenerate kernel walk inside any pairwise union → NULL for the whole
    * union, never a wrong area. */
  def unionMulti(a: Geom, b: Geom): Geom = {
    var ps: Vector[Geom] = (splitParts(a) ++ splitParts(b)).toVector
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < ps.length && !changed) {
        var j = i + 1
        while (j < ps.length && !changed) {
          if (partsInteract(ps(i), ps(j))) {
            val u = unionHoled(ps(i), ps(j))
            if (u == null) return null
            val merged = splitParts(u)
            if (merged.length >= 2) return null // interacting pair must fuse
            ps = ps.zipWithIndex.collect { case (g, k) if k != i && k != j => g } ++ merged
            changed = true
          }
          j += 1
        }
        i += 1
      }
    }
    assembleParts(ps.toList.map(p => (shellRing(p), holeRings(p))))
  }

  /** ST_Union (GeoFunctions.java:1122) — see object doc for the supported
    * surface. NULL on a degenerate-contact walk; holed operands may be
    * single-shell (unionHoled) or multi-shell (unionMulti). */
  def union(a: Geom, b: Geom): Geom = {
    if (a == null || b == null) return null
    if (isPolygonal(a) && isPolygonal(b)) {
      if (a.rings.count(_ > 0) == 1 && b.rings.count(_ > 0) == 1)
        return unionHoled(a, b)
      if (a.rings.exists(_ < 0) || b.rings.exists(_ < 0))
        return unionMulti(a, b)
      val shells = (parts(a).map { case (off, len, _) => normRing(a.xs, a.ys, off, len) } ++
        parts(b).map { case (off, len, _) => normRing(b.xs, b.ys, off, len) }).toSeq
      shellsToGeom(mergeInto(Nil, shells))
    } else if ((a.kind == "POINT" || a.kind == "MULTIPOINT") &&
        (b.kind == "POINT" || b.kind == "MULTIPOINT")) {
      val pts = (a.xs.zip(a.ys) ++ b.xs.zip(b.ys)).distinct.sorted
      Geom("MULTIPOINT", pts.map(_._1), pts.map(_._2), Array.fill(pts.length)(1))
    } else if ((a.kind == "LINESTRING" || a.kind == "MULTILINESTRING") &&
        (b.kind == "LINESTRING" || b.kind == "MULTILINESTRING")) {
      nodedLineUnion(a, b)
    } else null
  }

  /** Noded union of linework (the reference's overlay nodes crossings and
    * dissolves duplicates): every segment is split at (a) proper crossings
    * with other segments and (b) other segments' endpoints lying on it
    * (T-junctions; collinear overlaps fall out of the same device — each
    * overlapping segment splits at the other's interior endpoints and the
    * shared middle pieces dedup). Output is the canonical set of minimal
    * 2-point parts, sorted — a different decomposition than JTS's merged
    * linestrings but the same point set, with equal total length.
    * On-segment tests are exact (zero cross product), matching the dyadic
    * supported surface documented on this object. */
  def nodedLineUnion(a: Geom, b: Geom): Geom = {
    // collect directed segments from both inputs
    val segs = scala.collection.mutable.ArrayBuffer[(Double, Double, Double, Double)]()
    for (g <- Seq(a, b); (off, len, _) <- parts(g); i <- 0 until len - 1)
      segs += ((g.xs(off + i), g.ys(off + i), g.xs(off + i + 1), g.ys(off + i + 1)))
    val n = segs.length
    val cuts = Array.fill(n)(scala.collection.mutable.TreeSet.empty[Double])
    def onSegmentT(x1: Double, y1: Double, x2: Double, y2: Double,
        px: Double, py: Double): Double = {
      // exact collinearity + interior containment → parameter t, else NaN
      if ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) != 0.0) return Double.NaN
      val t =
        if (math.abs(x2 - x1) >= math.abs(y2 - y1)) {
          if (x2 == x1) return Double.NaN
          (px - x1) / (x2 - x1)
        } else (py - y1) / (y2 - y1)
      if (t > 0.0 && t < 1.0) t else Double.NaN
    }
    for (i <- 0 until n; j <- 0 until n if i != j) {
      val (x1, y1, x2, y2) = segs(i)
      val (x3, y3, x4, y4) = segs(j)
      if (properCross(x1, y1, x2, y2, x3, y3, x4, y4)) {
        val denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / denom
        cuts(i) += t
      } else {
        val t3 = onSegmentT(x1, y1, x2, y2, x3, y3)
        if (!t3.isNaN) cuts(i) += t3
        val t4 = onSegmentT(x1, y1, x2, y2, x4, y4)
        if (!t4.isNaN) cuts(i) += t4
      }
    }
    // split, canonicalize direction, dedup, sort
    val pieces = scala.collection.mutable.SortedSet.empty[(Double, Double, Double, Double)]
    for (i <- 0 until n) {
      val (x1, y1, x2, y2) = segs(i)
      if (x1 != x2 || y1 != y2) { // degenerate zero-length segments drop
        val ts = (Iterator(0.0) ++ cuts(i).iterator ++ Iterator(1.0)).toSeq
        for (k <- 0 until ts.length - 1) {
          val (ta, tb) = (ts(k), ts(k + 1))
          val ax = x1 + ta * (x2 - x1); val ay = y1 + ta * (y2 - y1)
          val bx = x1 + tb * (x2 - x1); val by = y1 + tb * (y2 - y1)
          if (ax != bx || ay != by)
            pieces += (if (ax < bx || (ax == bx && ay <= by)) (ax, ay, bx, by)
              else (bx, by, ax, ay))
        }
      }
    }
    val ps = pieces.toSeq
    Geom("MULTILINESTRING",
      ps.flatMap(s => Seq(s._1, s._3)).toArray,
      ps.flatMap(s => Seq(s._2, s._4)).toArray,
      Array.fill(ps.length)(2))
  }
}

// --------------------------------------------------------------- expressions

/** Geometry accessors (GeoFunctions.java — ST_X:1511 / ST_Y:1524 /
  * ST_Dimension:814 / ST_IsClosed:823 / ST_IsRing:1378 / ST_IsEmpty:842 /
  * ST_GeometryType:1989). The reference throws on kind mismatches
  * (validateType); this engine's TRY-friendly lax form returns NULL. */
case class GeomAccessor(child: Expression, what: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"st_$what expects a geometry struct")
  override def dataType: DataType = what match {
    case "x" | "y" => DoubleType
    case "dimension" => IntegerType
    case "is_closed" | "is_ring" | "is_empty" => BooleanType
    case "geometry_type" => StringType
  }
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_$what"

  private def isClosedPart(g: Wkt.Geom, off: Int, len: Int): Boolean =
    g.xs(off) == g.xs(off + len - 1) && g.ys(off) == g.ys(off + len - 1)

  /** JTS isSimple for a closed linestring: no proper crossing between any
    * edge pair (adjacent edges share an endpoint, so the strict orientation
    * test already excludes them). */
  private def isSimpleRing(g: Wkt.Geom): Boolean = {
    val n = g.xs.length - 1 // closed: last duplicates first
    val crossings = for {
      i <- 0 until n
      j <- (i + 1) until n
      if GeoOps.properCross(g.xs(i), g.ys(i), g.xs(i + 1), g.ys(i + 1),
        g.xs(j), g.ys(j), g.xs(j + 1), g.ys(j + 1))
    } yield (i, j)
    crossings.isEmpty
  }

  override def nullSafeEval(input: Any): Any = {
    val g = GeoOps.fromRow(input.asInstanceOf[InternalRow])
    what match {
      case "x" => if (g.kind == "POINT") g.xs(0) else null
      case "y" => if (g.kind == "POINT") g.ys(0) else null
      case "dimension" =>
        // a collection's dimension is its members' maximum (JTS), recursing
        // through MULTI kinds and nested collections
        def dimOf(p: graft.ext.Wkt.Geom): Int = p.kind match {
          case "POINT" | "MULTIPOINT" => 0
          case "LINESTRING" | "MULTILINESTRING" => 1
          case "POLYGON" | "MULTIPOLYGON" => 2
          case "GEOMETRYCOLLECTION" => graft.ext.Wkt.gcParts(p).map(dimOf).max
        }
        dimOf(g)
      case "is_empty" => false // the parser rejects empty geometries
      case "is_closed" =>
        if (g.kind != "LINESTRING" && g.kind != "MULTILINESTRING") null
        else {
          var off = 0
          g.rings.forall { len => val ok = isClosedPart(g, off, len); off += len; ok }
        }
      case "is_ring" =>
        if (g.kind != "LINESTRING") null
        else isClosedPart(g, 0, g.xs.length) && isSimpleRing(g)
      case "geometry_type" => UTF8String.fromString(g.kind match {
        case "POINT" => "ST_Point"
        case "MULTIPOINT" => "ST_MultiPoint"
        case "LINESTRING" => "ST_LineString"
        case "MULTILINESTRING" => "ST_MultiLineString"
        case "POLYGON" => "ST_Polygon"
        case "MULTIPOLYGON" => "ST_MultiPolygon"
        case "GEOMETRYCOLLECTION" => "ST_GeomCollection"
      })
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simplify_geometry(geom, tolerance) (GeoFunctions.java simplifyGeometry —
  * JTS TopologyPreservingSimplifier there; classic Douglas–Peucker here,
  * PAPERS.md): vertices farther than `tolerance` from the chord survive,
  * recursively. LINESTRING paths and polygon rings (closure preserved, ring
  * split at its first vertex); tolerance < 0 → NULL. */
case class GeomSimplify(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("simplify_geometry expects (geometry, double)")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "simplify_geometry"

  private def dp(xs: Array[Double], ys: Array[Double], tol: Double): (Array[Double], Array[Double]) = {
    val n = xs.length
    if (n <= 2) return (xs, ys)
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    def rec(lo: Int, hi: Int): Unit = {
      if (hi - lo < 2) return
      var best = -1
      var bestD = tol
      for (i <- lo + 1 until hi) {
        val d = math.sqrt(GeoOps.ptSegDist2(xs(i), ys(i), xs(lo), ys(lo), xs(hi), ys(hi)))
        if (d > bestD) { bestD = d; best = i }
      }
      if (best >= 0) { keep(best) = true; rec(lo, best); rec(best, hi) }
    }
    rec(0, n - 1)
    val ix = (0 until n).filter(keep)
    (ix.map(xs).toArray, ix.map(ys).toArray)
  }

  override def nullSafeEval(g0: Any, t0: Any): Any = {
    val g = GeoOps.fromRow(g0.asInstanceOf[InternalRow])
    val tol = t0.asInstanceOf[Double]
    if (tol.isNaN || tol < 0) return null
    g.kind match {
      case "LINESTRING" | "MULTILINESTRING" | "POLYGON" | "MULTIPOLYGON" =>
        val outX = scala.collection.mutable.ArrayBuffer[Double]()
        val outY = scala.collection.mutable.ArrayBuffer[Double]()
        val outLens = scala.collection.mutable.ArrayBuffer[Int]()
        var off = 0
        for (len0 <- g.rings) {
          val len = math.abs(len0)
          val xs = java.util.Arrays.copyOfRange(g.xs, off, off + len)
          val ys = java.util.Arrays.copyOfRange(g.ys, off, off + len)
          val (sx, sy) = dp(xs, ys, tol)
          // a ring simplified below 4 points (3 + closure) would degenerate;
          // keep the original ring then (the topology-preserving contract)
          val (fx, fy) = if (g.kind.endsWith("POLYGON") && sx.length < 4) (xs, ys) else (sx, sy)
          outX ++= fx; outY ++= fy
          outLens += (if (len0 < 0) -fx.length else fx.length)
          off += len
        }
        GeoOps.toRow(Wkt.Geom(g.kind, outX.toArray, outY.toArray, outLens.toArray))
      case _ => GeoOps.toRow(g) // points are already minimal
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Part/ring decomposition (GeoFunctions.java — ST_GeometryN, ST_ExteriorRing,
  * ST_InteriorRingN, ST_Envelope): 1-based indices, out-of-range or
  * kind-mismatch → NULL (the reference's null-or-error contract). */
case class GeomPart(left: Expression, right: Expression, what: String)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"st_$what expects (geometry, int)")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_$what"

  private def slice(g: Wkt.Geom, kind: String, off: Int, lens: Seq[Int]): InternalRow = {
    val total = lens.map(math.abs).sum
    GeoOps.toRow(Wkt.Geom(kind,
      java.util.Arrays.copyOfRange(g.xs, off, off + total),
      java.util.Arrays.copyOfRange(g.ys, off, off + total),
      lens.toArray))
  }

  override def nullSafeEval(g0: Any, n0: Any): Any = {
    val g = GeoOps.fromRow(g0.asInstanceOf[InternalRow])
    val n = n0.asInstanceOf[Int]
    what match {
      case "geometry_n" =>
        val singular = Map("MULTIPOINT" -> "POINT", "MULTILINESTRING" -> "LINESTRING",
          "MULTIPOLYGON" -> "POLYGON")
        if (g.kind == "GEOMETRYCOLLECTION") {
          val parts = graft.ext.Wkt.gcParts(g)
          if (n < 1 || n > parts.length) null else GeoOps.toRow(parts(n - 1))
        } else if (!singular.contains(g.kind)) {
          // singular geometry: itself at n=1 (fresh copy — the input row may
          // be a reused UnsafeRow buffer)
          if (n == 1) GeoOps.toRow(g) else null
        } else {
          // group rings into parts: a shell plus its trailing holes
          val groups = scala.collection.mutable.ArrayBuffer[(Int, Seq[Int])]()
          var off = 0
          for (len <- g.rings) {
            if (len > 0 || groups.isEmpty) groups += ((off, Seq(len)))
            else {
              val (o, ls) = groups.last
              groups(groups.length - 1) = (o, ls :+ len)
            }
            off += math.abs(len)
          }
          if (n < 1 || n > groups.length) null
          else slice(g, singular(g.kind), groups(n - 1)._1, groups(n - 1)._2)
        }
      case "exterior_ring" =>
        if (g.kind != "POLYGON") null
        else slice(g, "LINESTRING", 0, Seq(g.rings(0)))
      case "interior_ring_n" =>
        if (g.kind != "POLYGON") null
        else {
          val holes = g.rings.zipWithIndex.filter(_._1 < 0)
          if (n < 1 || n > holes.length) null
          else {
            val idx = holes(n - 1)._2
            val off = g.rings.take(idx).map(math.abs).sum
            slice(g, "LINESTRING", off, Seq(-g.rings(idx)))
          }
        }
      case "envelope" =>
        if (g.xs.isEmpty) null
        else {
          val (x0, x1) = (g.xs.min, g.xs.max)
          val (y0, y1) = (g.ys.min, g.ys.max)
          GeoOps.toRow(Wkt.Geom("POLYGON",
            Array(x0, x1, x1, x0, x0), Array(y0, y0, y1, y1, y0), Array(5)))
        }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** line_locate_point(line, point) (GeoFunctions.java:2135 via JTS
  * LengthIndexedLine): fraction of total 2D length at the closest point on
  * the LINESTRING; NULL for other kinds. */
case class LineLocatePoint(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("line_locate_point expects (geometry, geometry)")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "line_locate_point"
  override def nullSafeEval(l0: Any, p0: Any): Any = {
    val line = GeoOps.fromRow(l0.asInstanceOf[InternalRow])
    val pt = GeoOps.fromRow(p0.asInstanceOf[InternalRow])
    if (line.kind != "LINESTRING" || pt.kind != "POINT") return null
    val (px, py) = (pt.xs(0), pt.ys(0))
    val n = line.xs.length
    var total = 0.0
    val segLens = new Array[Double](n - 1)
    for (i <- 0 until n - 1) {
      val dx = line.xs(i + 1) - line.xs(i); val dy = line.ys(i + 1) - line.ys(i)
      segLens(i) = math.sqrt(dx * dx + dy * dy)
      total += segLens(i)
    }
    if (total == 0.0) return 0.0
    var best = Double.PositiveInfinity
    var bestIndex = 0.0
    var cum = 0.0
    for (i <- 0 until n - 1) {
      val ax = line.xs(i); val ay = line.ys(i)
      val bx = line.xs(i + 1); val by = line.ys(i + 1)
      val dx = bx - ax; val dy = by - ay
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0) 0.0
        else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
      val qx = ax + t * dx; val qy = ay + t * dy
      val d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
      if (d2 < best) { best = d2; bestIndex = cum + t * segLens(i) }
      cum += segLens(i)
    }
    bestIndex / total
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** line_interpolate_point(line, fraction) (GeoFunctions.java
  * lineInterpolatePoint): the POINT at the given fraction of total length;
  * fraction outside [0,1] or non-LINESTRING → NULL (reference errors). */
case class LineInterpolatePoint(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("line_interpolate_point expects (geometry, double)")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "line_interpolate_point"
  override def nullSafeEval(l0: Any, f0: Any): Any = {
    val line = GeoOps.fromRow(l0.asInstanceOf[InternalRow])
    val f = f0.asInstanceOf[Double]
    if (line.kind != "LINESTRING" || f.isNaN || f < 0 || f > 1) return null
    val n = line.xs.length
    var total = 0.0
    for (i <- 0 until n - 1) {
      val dx = line.xs(i + 1) - line.xs(i); val dy = line.ys(i + 1) - line.ys(i)
      total += math.sqrt(dx * dx + dy * dy)
    }
    def point(x: Double, y: Double) =
      GeoOps.toRow(Wkt.Geom("POINT", Array(x), Array(y), Array(1)))
    if (total == 0.0) return point(line.xs(0), line.ys(0))
    var target = f * total
    for (i <- 0 until n - 1) {
      val dx = line.xs(i + 1) - line.xs(i); val dy = line.ys(i + 1) - line.ys(i)
      val len = math.sqrt(dx * dx + dy * dy)
      if (target <= len && len > 0) {
        val t = target / len
        return point(line.xs(i) + t * dx, line.ys(i) + t * dy)
      }
      target -= len
    }
    point(line.xs(n - 1), line.ys(n - 1))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_PointN / ST_StartPoint / ST_EndPoint (GeoFunctions.java:1315, 1388,
  * 1456): vertex of a LINESTRING as a POINT geometry; 1-based index, out of
  * range or non-linestring → NULL. index < 0 counts from the end (our
  * convenience for EndPoint = -1). */
case class GeomPointN(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_point_n expects (geometry, int)")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_point_n"
  override def nullSafeEval(g0: Any, ix0: Any): Any = {
    val g = GeoOps.fromRow(g0.asInstanceOf[InternalRow])
    val ix = ix0.asInstanceOf[Int]
    if (g.kind != "LINESTRING") return null
    val n = g.xs.length
    val i = if (ix < 0) n + ix else ix - 1
    if (i < 0 || i >= n) null
    else GeoOps.toRow(Wkt.Geom("POINT", Array(g.xs(i)), Array(g.ys(i)), Array(1)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Distance(geom, geom) → double (GeoFunctions.java:1697). */
case class GeomDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_distance expects two geometry structs")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_distance"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.distance(GeoOps.fromRow(a.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b.asInstanceOf[InternalRow]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Buffer(geom, d) → geometry (GeoFunctions.java:736, octagonal join). */
case class GeomBuffer(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_buffer expects (geometry, double)")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_buffer"
  override def nullSafeEval(g: Any, d: Any): Any = {
    val out = GeoOps.buffer(GeoOps.fromRow(g.asInstanceOf[InternalRow]),
      d.asInstanceOf[Double])
    GeoOps.toRow(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Intersection(geom, geom) → geometry (see GeoOps.intersection). */
case class GeomIntersection(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_intersection expects two geometry structs")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_intersection"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.toRow(GeoOps.intersection(GeoOps.fromRow(a.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b.asInstanceOf[InternalRow])))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Difference(geom, geom) → geometry (GeoFunctions.java:1685). */
case class GeomDifference(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_difference expects two geometry structs")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_difference"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.toRow(GeoOps.difference(GeoOps.fromRow(a.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b.asInstanceOf[InternalRow])))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_SymDifference(geom, geom) → geometry (GeoFunctions.java:1754). */
case class GeomSymDifference(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_symdifference expects two geometry structs")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_symdifference"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.toRow(GeoOps.symDifference(GeoOps.fromRow(a.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b.asInstanceOf[InternalRow])))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Union(geom, geom) → geometry (GeoFunctions.java:1122). */
case class GeomUnion(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_union expects two geometry structs")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_union"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.toRow(GeoOps.union(GeoOps.fromRow(a.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b.asInstanceOf[InternalRow])))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
