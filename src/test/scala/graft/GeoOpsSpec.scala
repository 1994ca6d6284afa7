package graft

import graft.ext.{GeoOps, Wkt}
import org.apache.spark.sql.functions._

/** Kernel + column specs for GeoOps (ST_Distance / ST_Buffer / ST_Union and
  * the geometry aggregates). Fixtures use dyadic coordinates with proper
  * crossings only — the supported surface documented on GeoOps. */
class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  private def g(wkt: String): Wkt.Geom = {
    val parsed = Wkt.parse(wkt)
    assert(parsed != null, s"unparseable fixture: $wkt")
    parsed
  }

  private def area(geom: Wkt.Geom): Double = {
    // shoelace over parts (closed rings in our outputs)
    var acc = 0.0
    for ((off, len, hole) <- GeoOps.parts(geom)) {
      var s = 0.0
      for (i <- 0 until len) {
        val j = (i + 1) % len
        s += geom.xs(off + i) * geom.ys(off + j) - geom.xs(off + j) * geom.ys(off + i)
      }
      acc += (if (hole) -1 else 1) * math.abs(s / 2)
    }
    acc
  }

  test("st_distance: containment, crossing, perpendicular and corner cases") {
    val sq = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(GeoOps.distance(sq, g("POINT (2 2)")) == 0.0)               // inside
    assert(GeoOps.distance(sq, g("POINT (7 2)")) == 3.0)               // perp to right edge
    assert(GeoOps.distance(sq, g("POINT (6 6)")) == math.sqrt(8.0))    // corner-corner
    assert(GeoOps.distance(sq, g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")) == 0.0) // overlap
    assert(GeoOps.distance(sq, g("POLYGON ((6 6, 8 6, 8 8, 6 8, 6 6))")) == math.sqrt(8.0))
    assert(GeoOps.distance(sq, g("LINESTRING (-3 1, -3 3)")) == 3.0)   // parallel segment
    assert(GeoOps.distance(g("POINT (0 0)"), g("POINT (3 4)")) == 5.0)
    // symmetric
    assert(GeoOps.distance(g("POINT (7 2)"), sq) == 3.0)
  }

  test("st_buffer: octagon point buffer, square dilation, identity, negative") {
    val p = g("POINT (10 10)")
    val pb = GeoOps.buffer(p, 2.0)
    assert(pb.kind == "POLYGON" && pb.rings.sameElements(Array(9))) // 8 verts closed
    assert(pb.xs.min == 8.0 && pb.xs.max == 12.0 && pb.ys.min == 8.0 && pb.ys.max == 12.0)
    val s = 2.0 * math.sqrt(0.5)
    assert(math.abs(area(pb) - 2 * math.sqrt(2.0) * 4.0) < 1e-12)
    assert(pb.xs(0) == 8.0 && pb.ys(0) == 10.0) // canonical lexicographic start
    assert(pb.xs.contains(10.0 + s) && pb.ys.contains(10.0 - s))

    val sq = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val sb = GeoOps.buffer(sq, 1.0)
    assert(sb.rings.sameElements(Array(13))) // 12 verts closed
    // Minkowski area: A + P*d + octagon area
    assert(math.abs(area(sb) - (16.0 + 16.0 * 1.0 + 2 * math.sqrt(2.0))) < 1e-12)
    assert(sb.xs.min == -1.0 && sb.xs.max == 5.0)
    assert(GeoOps.buffer(sq, 0.0) eq sq)
    assert(GeoOps.buffer(sq, -1.0) == null)
  }

  test("st_buffer: interacting multi-part buffers MERGE through union") {
    // two points 2 apart, buffer d=2 → octagons overlap → one fused polygon
    val mp = g("MULTIPOINT ((0 0), (2 0))")
    val fused = GeoOps.buffer(mp, 2.0)
    assert(fused != null, "interacting part buffers must merge, not refuse")
    assert(fused.kind == "POLYGON", s"got ${fused.kind}")
    // area: two octagons minus their overlap — strictly between one and two
    val oct = 2 * math.sqrt(2.0) * 4.0
    assert(area(fused) > oct && area(fused) < 2 * oct, s"area ${area(fused)}")
    assert(fused.xs.min == -2.0 && fused.xs.max == 4.0)
    // far-apart parts still concatenate exactly (disjoint fast path)
    val far = GeoOps.buffer(g("MULTIPOINT ((0 0), (100 0))"), 2.0)
    assert(far.kind == "MULTIPOLYGON" && far.rings.length == 2)
    assert(math.abs(area(far) - 2 * oct) < 1e-12)
  }

  test("st_buffer: concave polygon exact (no convex-hull over-cover)") {
    val r2 = math.sqrt(2.0)
    // L-shape: A=3, P=8, 5 convex + 1 reflex right angle
    val L = g("POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))")
    val d = 0.5
    val lb = GeoOps.buffer(L, d)
    assert(lb != null && lb.kind == "POLYGON")
    val expected = 3.0 + 8.0 * d + 5.0 * (r2 / 2) * d * d - d * d
    assert(math.abs(area(lb) - expected) < 1e-12,
      s"area ${area(lb)} vs $expected")
    // the old hull construction would cover the notch: (1.5,1.5) is outside
    assert(!GeoOps.containsPoint(lb, 1.75, 1.75))
    // reflex miter vertex present: offset corner of the notch at (1.5, 1.5)
    assert(lb.xs.indices.exists(i => lb.xs(i) == 1.5 && lb.ys(i) == 1.5))
  }

  test("st_buffer: bent linestring strip with octagonal caps") {
    val r2 = math.sqrt(2.0)
    val line = g("LINESTRING (0 0, 1 0, 1 1)")
    val d = 0.25
    val b = GeoOps.buffer(line, d)
    assert(b != null && b.kind == "POLYGON")
    // 2dL + two half-octagon caps + outside 90° join − inside overlap
    val expected = 2 * d * 2.0 + 2 * r2 * d * d + (r2 / 2) * d * d - d * d
    assert(math.abs(area(b) - expected) < 1e-12, s"area ${area(b)} vs $expected")
  }

  test("st_buffer: holes erode; swallowed holes drop; closing cavity is NULL") {
    val r2 = math.sqrt(2.0)
    val d = 0.5
    // 6x6 shell with a centered 2x2 hole: hole shrinks to (2-2d)^2
    val withHole = g("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    val hb = GeoOps.buffer(withHole, d)
    assert(hb != null && hb.rings.count(_ < 0) == 1)
    val expected = (36.0 + 24 * d + 4 * (r2 / 2) * d * d) - math.pow(2 - 2 * d, 2)
    assert(math.abs(area(hb) - expected) < 1e-12, s"area ${area(hb)} vs $expected")
    // 0.8x0.8 hole is swallowed at d=0.5
    val smallHole = g("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2.8 2, 2.8 2.8, 2 2.8, 2 2))")
    val sb = GeoOps.buffer(smallHole, d)
    assert(sb != null && sb.rings.count(_ < 0) === 0)
    assert(math.abs(area(sb) - (36.0 + 24 * d + 4 * (r2 / 2) * d * d)) < 1e-12)
    // U-shape whose mouth (width 0.5 < 2d) closes: topology change → NULL
    val u = g("POLYGON ((0 0, 2.5 0, 2.5 3, 1.5 3, 1.5 1, 1 1, 1 3, 0 3, 0 0))")
    assert(GeoOps.buffer(u, 0.5) == null)
    // ...but a small d that does not close the mouth stays exact
    val ub = GeoOps.buffer(u, 0.1)
    assert(ub != null)
    val uExpected = 6.5 + 15 * 0.1 + 6 * (r2 / 2) * 0.01 - 2 * 0.01
    assert(math.abs(area(ub) - uExpected) < 1e-12, s"area ${area(ub)} vs $uExpected")
  }

  test("st_union: crossing, disjoint, containment, multipoint") {
    // A = [0,4]^2, B = [2,6]x[1,3] → union area 16 + 8 - 4 = 20, 8 verts
    val a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = g("POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))")
    val u = GeoOps.union(a, b)
    assert(u.kind == "POLYGON", Wkt.format(u.kind, u.xs, u.ys, u.rings))
    assert(area(u) == 20.0)
    assert(u.rings.sameElements(Array(9)))
    assert(u.xs(0) == 0.0 && u.ys(0) == 0.0) // canonical start
    // commutes
    val u2 = GeoOps.union(b, a)
    assert(area(u2) == 20.0 && u2.rings.sameElements(Array(9)))
    // disjoint → MULTIPOLYGON sorted by (minx, miny)
    val far = g("POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))")
    val ud = GeoOps.union(far, a)
    assert(ud.kind == "MULTIPOLYGON" && ud.rings.length == 2)
    assert(area(ud) == 20.0 && ud.xs(0) == 0.0)
    // containment → container
    val inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    val uc = GeoOps.union(a, inner)
    assert(uc.kind == "POLYGON" && area(uc) == 16.0)
    // multipoint dedup + sort
    val mp = GeoOps.union(g("MULTIPOINT (3 4, 1 2)"), g("MULTIPOINT (1 2, 5 6)"))
    assert(mp.kind == "MULTIPOINT" && mp.xs.toSeq == Seq(1.0, 3.0, 5.0) && mp.ys.toSeq == Seq(2.0, 4.0, 6.0))
    // round-8: holed single-shell operands union — a covers the hole, so
    // the result is the plain outer square
    val hole = GeoOps.union(g("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"), a)
    assert(hole != null && hole.kind == "POLYGON" && area(hole) == 81.0)
    // mixed kinds stay unsupported → null
    assert(GeoOps.union(a, g("POINT (1 1)")) == null)
  }

  test("st_intersection: crossing, cross-shape (no vertex inside), containment, disjoint") {
    val a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = g("POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))")
    val i = GeoOps.intersection(a, b)
    assert(i.kind == "POLYGON" && area(i) == 4.0, Wkt.format(i.kind, i.xs, i.ys, i.rings))
    // inclusion-exclusion against the union
    val u = GeoOps.union(a, b)
    assert(area(a) + area(b) == area(u) + area(i))
    // plus-sign overlap: neither polygon has a vertex inside the other
    val h = g("POLYGON ((0 4, 10 4, 10 6, 0 6, 0 4))")
    val v = g("POLYGON ((4 0, 6 0, 6 10, 4 10, 4 0))")
    val cross = GeoOps.intersection(h, v)
    assert(cross != null && area(cross) == 4.0,
      if (cross == null) "null" else Wkt.format(cross.kind, cross.xs, cross.ys, cross.rings))
    // containment → inner operand; disjoint → NULL
    val inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(area(GeoOps.intersection(a, inner)) == 1.0)
    assert(GeoOps.intersection(a, g("POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))")) == null)
  }

  test("st_difference: crossing, multi-region, hole punch, disjoint, empty") {
    val a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = g("POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))")
    // A∖B removes [2,4]x[1,3] (area 4) from A (area 16)
    val d = GeoOps.difference(a, b)
    assert(d != null && area(d) == 12.0, if (d == null) "null" else Wkt.format(d.kind, d.xs, d.ys, d.rings))
    // inclusion-exclusion: area(A∖B) + area(A∩B) = area(A)
    assert(area(d) + area(GeoOps.intersection(a, b)) == area(a))
    // B∖A is the complementary overhang (area 4)
    val d2 = GeoOps.difference(b, a)
    assert(d2 != null && area(d2) == 4.0)
    // strip minus U-prongs: three pieces left of/between/right of the prongs
    val strip = g("POLYGON ((0 0, 8 0, 8 1, 0 1, 0 0))")
    val u = g("POLYGON ((1 2, 1 -2, 7 -2, 7 2, 5 2, 5 -1, 3 -1, 3 2, 1 2))")
    val md = GeoOps.difference(strip, u)
    assert(md != null && md.kind == "MULTIPOLYGON" && md.rings.length == 3 && area(md) == 4.0,
      if (md == null) "null" else Wkt.format(md.kind, md.xs, md.ys, md.rings))
    // hole punch: B strictly inside A → polygon with hole
    val inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    val holed = GeoOps.difference(a, inner)
    assert(holed != null && holed.kind == "POLYGON" && holed.rings.length == 2 &&
      holed.rings(1) < 0 && area(holed) == 15.0)
    assert(!GeoOps.containsPoint(holed, 1.5, 1.5) && GeoOps.containsPoint(holed, 3.0, 3.0))
    // disjoint → A unchanged; A⊂B → NULL (empty)
    val far = g("POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))")
    assert(area(GeoOps.difference(a, far)) == 16.0)
    assert(GeoOps.difference(inner, a) == null)
  }

  test("st_symdifference: crossing, containment, disjoint") {
    val a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = g("POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))")
    val sd = GeoOps.symDifference(a, b)
    // 16 + 8 − 2·4 = 16
    assert(sd != null && sd.kind == "MULTIPOLYGON" && area(sd) == 16.0,
      if (sd == null) "null" else Wkt.format(sd.kind, sd.xs, sd.ys, sd.rings))
    // containment → container with hole
    val inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    val sdh = GeoOps.symDifference(inner, a)
    assert(sdh != null && sdh.kind == "POLYGON" && sdh.rings.length == 2 && area(sdh) == 15.0)
    // disjoint → both parts
    val far = g("POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))")
    val sdd = GeoOps.symDifference(a, far)
    assert(sdd != null && sdd.kind == "MULTIPOLYGON" && area(sdd) == 20.0)
  }

  test("holed union: pockets become holes, holes clip against the other operand") {
    // 1. pocket: strip across a U — union must carry the enclosed pocket
    //    [3,5]x[-1,0] as a hole (area 8 + 18 - 4 = 22), not overcount 24
    val strip = g("POLYGON ((0 0, 8 0, 8 1, 0 1, 0 0))")
    val u = g("POLYGON ((1 2, 1 -2, 7 -2, 7 2, 5 2, 5 -1, 3 -1, 3 2, 1 2))")
    val pu = GeoOps.union(strip, u)
    assert(pu != null && pu.kind == "POLYGON" && pu.rings.count(_ < 0) == 1,
      if (pu == null) "null" else Wkt.format(pu.kind, pu.xs, pu.ys, pu.rings))
    assert(area(pu) == 22.0, area(pu).toString)
    assert(!GeoOps.containsPoint(pu, 4.0, -0.5) && GeoOps.containsPoint(pu, 4.0, 0.5))
    // 2. holed A ∪ crossing B that reaches into the hole: hole shrinks to
    //    hole∖B (area 3), union area 99
    val aH = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))")
    val bStrip = g("POLYGON ((5 4.5, 12 4.5, 12 5.5, 5 5.5, 5 4.5))")
    val hu = GeoOps.union(aH, bStrip)
    assert(hu != null && hu.kind == "POLYGON" && hu.rings.count(_ < 0) == 1,
      if (hu == null) "null" else Wkt.format(hu.kind, hu.xs, hu.ys, hu.rings))
    assert(area(hu) == 99.0, area(hu).toString)
    assert(GeoOps.containsPoint(hu, 5.5, 5.0) && !GeoOps.containsPoint(hu, 4.5, 5.8))
    // 3. both holed, holes overlapping: result holes are hA∖sB and hA∩hB
    val a2 = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 6, 6 6, 6 2, 2 2))")
    val b2 = g("POLYGON ((1 1, 11 1, 11 3, 1 3, 1 1), (3 1.5, 3 2.5, 9 2.5, 9 1.5, 3 1.5))")
    val bu = GeoOps.union(a2, b2)
    assert(bu != null && bu.kind == "POLYGON" && bu.rings.count(_ < 0) == 2,
      if (bu == null) "null" else Wkt.format(bu.kind, bu.xs, bu.ys, bu.rings))
    assert(area(bu) == 88.5, area(bu).toString)
    // hA∖sB region stays a hole; the covered band does not
    assert(!GeoOps.containsPoint(bu, 4.0, 5.0) && GeoOps.containsPoint(bu, 4.0, 2.75))
    // hA∩hB stays a hole
    assert(!GeoOps.containsPoint(bu, 4.0, 2.25))
    // 4. island: B fully inside A's hole → two parts, interiors disjoint
    val isl = GeoOps.union(aH, g("POLYGON ((4.5 4.5, 5.5 4.5, 5.5 5.5, 4.5 5.5, 4.5 4.5))"))
    assert(isl != null && isl.kind == "MULTIPOLYGON" && area(isl) == 97.0,
      if (isl == null) "null" else Wkt.format(isl.kind, isl.xs, isl.ys, isl.rings))
  }

  test("multi-shell holed union: pairwise fold, islands preserved, disjoint parts kept") {
    // A: holed square [0,4]² (hole [1,3]², area 12) + far square [10,14]² (16)
    val a = g("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1)), ((10 10, 14 10, 14 14, 10 14, 10 10)))")
    // B properly crosses the holed part's shell: [2,6]x[-1,5]. Shell union
    // area 16+24-8 = 32, hole remnant [1,2]x[1,3] (2) → 30; + far 16 → 46
    val b = g("POLYGON ((2 -1, 6 -1, 6 5, 2 5, 2 -1))")
    val u = GeoOps.union(a, b)
    assert(u != null && u.kind == "MULTIPOLYGON" && area(u) == 46.0,
      if (u == null) "null" else s"${area(u)}: " + Wkt.format(u.kind, u.xs, u.ys, u.rings))
    assert(u.rings.count(_ < 0) == 1 && u.rings.count(_ > 0) == 2)
    assert(!GeoOps.containsPoint(u, 1.5, 2.0) && GeoOps.containsPoint(u, 2.5, 2.0))
    // island: C entirely inside A's hole → stays a separate part (3 shells)
    val c = g("POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))")
    val ui = GeoOps.union(a, c)
    assert(ui != null && ui.kind == "MULTIPOLYGON" && area(ui) == 29.0,
      if (ui == null) "null" else s"${area(ui)}: " + Wkt.format(ui.kind, ui.xs, ui.ys, ui.rings))
    assert(ui.rings.count(_ > 0) == 3)
    // two multi-shell holed operands, one interacting pair: B2's first part
    // sits in A's interior and reaches INTO the hole (proper crossings of
    // the hole ring) → hole shrinks by the covered band [1.5,2.5]x[1,1.75]
    val b2 = g("MULTIPOLYGON (((1.5 0.5, 2.5 0.5, 2.5 1.75, 1.5 1.75, 1.5 0.5)), ((20 0, 21 0, 21 1, 20 1, 20 0), (20.25 0.25, 20.75 0.25, 20.75 0.75, 20.25 0.75, 20.25 0.25)))")
    val u2 = GeoOps.union(a, b2)
    // areas: (16 - (4 - 0.75)) + 16 + (1 - 0.25) = 12.75 + 16 + 0.75 = 29.5
    assert(u2 != null && u2.kind == "MULTIPOLYGON" && area(u2) == 29.5,
      if (u2 == null) "null" else s"${area(u2)}: " + Wkt.format(u2.kind, u2.xs, u2.ys, u2.rings))
    assert(u2.rings.count(_ > 0) == 3 && u2.rings.count(_ < 0) == 2)
    assert(GeoOps.containsPoint(u2, 2.0, 1.4) && !GeoOps.containsPoint(u2, 2.0, 2.5))
    assert(!GeoOps.containsPoint(u2, 20.5, 0.5))
  }

  test("noded line union: crossings, T-junctions, collinear overlap dissolve") {
    def segs(m: Wkt.Geom): Set[(Double, Double, Double, Double)] = {
      assert(m.kind == "MULTILINESTRING" && m.rings.forall(_ == 2))
      (0 until m.rings.length).map { i =>
        (m.xs(2 * i), m.ys(2 * i), m.xs(2 * i + 1), m.ys(2 * i + 1))
      }.toSet
    }
    def totalLen(m: Wkt.Geom): Double =
      segs(m).toSeq.map { case (x1, y1, x2, y2) =>
        math.hypot(x2 - x1, y2 - y1) }.sum
    // proper crossing: X shape nodes at (1,1), 4 pieces, length preserved
    val x1 = GeoOps.union(g("LINESTRING (0 0, 2 2)"), g("LINESTRING (0 2, 2 0)"))
    assert(x1.rings.length == 4, Wkt.format(x1.kind, x1.xs, x1.ys, x1.rings))
    assert(segs(x1).contains((0.0, 0.0, 1.0, 1.0)) && segs(x1).contains((1.0, 1.0, 2.0, 2.0)))
    assert(totalLen(x1) == 4 * math.sqrt(2.0) || math.abs(totalLen(x1) - 4 * math.sqrt(2.0)) < 1e-12)
    // T-junction: endpoint of one line in the interior of the other
    val t = GeoOps.union(g("LINESTRING (0 0, 4 0)"), g("LINESTRING (2 0, 2 3)"))
    assert(t.rings.length == 3, Wkt.format(t.kind, t.xs, t.ys, t.rings))
    assert(segs(t) == Set((0.0, 0.0, 2.0, 0.0), (2.0, 0.0, 4.0, 0.0), (2.0, 0.0, 2.0, 3.0)))
    // collinear partial overlap dissolves: [0,4]+[2,6] on y=0 → [0,2],[2,4],[4,6]
    val c = GeoOps.union(g("LINESTRING (0 0, 4 0)"), g("LINESTRING (2 0, 6 0)"))
    assert(segs(c) == Set((0.0, 0.0, 2.0, 0.0), (2.0, 0.0, 4.0, 0.0), (4.0, 0.0, 6.0, 0.0)))
    assert(totalLen(c) == 6.0)
    // exact duplicate segments collapse to one
    val d = GeoOps.union(g("LINESTRING (0 0, 1 0)"), g("LINESTRING (1 0, 0 0)"))
    assert(segs(d) == Set((0.0, 0.0, 1.0, 0.0)))
    // multilinestring inputs + disjoint parts stay
    val m = GeoOps.union(g("MULTILINESTRING ((0 0, 1 0), (5 5, 6 5))"),
      g("LINESTRING (10 0, 11 0)"))
    assert(m.rings.length == 3 && totalLen(m) == 3.0)
  }

  test("WKB: known vector, roundtrips for every kind, EWKB/XDR read, Z rejected") {
    import graft.ext.Wkb
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // the standard public NDR vector: POINT(1 2)
    assert(hex(Wkb.write(g("POINT (1 2)"))) ==
      "0101000000000000000000f03f0000000000000040")
    // roundtrip every supported kind, including holes and multi-parts
    for (wkt <- Seq(
        "POINT (3.5 -7.25)",
        "LINESTRING (0 0, 1 2, 3 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",
        "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 5.5 6, 6 6, 6 5.5, 5.5 5.5)))")) {
      val geom = g(wkt)
      val rt = Wkb.read(Wkb.write(geom))
      assert(rt != null, s"roundtrip null for $wkt")
      assert(Wkt.format(rt.kind, rt.xs, rt.ys, rt.rings) ==
        Wkt.format(geom.kind, geom.xs, geom.ys, geom.rings), wkt)
    }
    // XDR (big-endian) POINT(1 2)
    val xdr = unhex("00000000013ff00000000000004000000000000000")
    val fromXdr = Wkb.read(xdr)
    assert(fromXdr != null && fromXdr.xs(0) == 1.0 && fromXdr.ys(0) == 2.0)
    // EWKB with SRID 4326 (PostGIS): 0101000020E6100000 + coords
    val ewkb = unhex("0101000020e6100000000000000000f03f0000000000000040")
    val fromEwkb = Wkb.read(ewkb)
    assert(fromEwkb != null && fromEwkb.xs(0) == 1.0 && fromEwkb.ys(0) == 2.0)
    // Z flag (EWKB 0x80000000) and ISO 1001 type → NULL, never dropped ordinates
    assert(Wkb.read(unhex("0101000080000000000000f03f00000000000000400000000000000840")) == null)
    assert(Wkb.read(unhex("01e9030000000000000000f03f00000000000000400000000000000840")) == null)
    // truncated + trailing garbage → NULL
    assert(Wkb.read(unhex("0101000000000000000000f03f")) == null)
    assert(Wkb.read(unhex("0101000000000000000000f03f000000000000004000")) == null)
  }

  test("st_intersection with a non-convex operand yields all disjoint regions") {
    // U-shaped B's two prongs cross strip A → two disjoint rectangles,
    // [1,3]x[0,1] and [5,7]x[0,1]
    val strip = g("POLYGON ((0 0, 8 0, 8 1, 0 1, 0 0))")
    val u = g("POLYGON ((1 2, 1 -2, 7 -2, 7 2, 5 2, 5 -1, 3 -1, 3 2, 1 2))")
    val i = GeoOps.intersection(strip, u)
    assert(i != null && i.kind == "MULTIPOLYGON",
      if (i == null) "null" else Wkt.format(i.kind, i.xs, i.ys, i.rings))
    assert(i.rings.length == 2 && area(i) == 4.0,
      Wkt.format(i.kind, i.xs, i.ys, i.rings))
    // exact component extents: [1,3]x[0,1] and [5,7]x[0,1]
    assert(i.xs.min == 1.0 && i.xs.max == 7.0 && i.ys.min == 0.0 && i.ys.max == 1.0)
  }

  test("st_union chains a staircase of overlapping cells into one polygon") {
    // even cells [2i, 2i+3] x [0,4]; odd cells [2i, 2i+3] x [1,3]
    def cell(i: Int): Wkt.Geom = {
      val x0 = 2 * i; val x1 = 2 * i + 3
      val (y0, y1) = if (i % 2 == 0) (0, 4) else (1, 3)
      g(s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")
    }
    for (k <- 2 to 6) {
      val merged = (1 until k).foldLeft(cell(0))((acc, i) => GeoOps.union(acc, cell(i)))
      assert(merged.kind == "POLYGON", s"k=$k")
      val expected = (0 until k).map(i => if (i % 2 == 0) 12.0 else 6.0).sum - 2.0 * (k - 1)
      assert(area(merged) == expected, s"k=$k area=${area(merged)} expected=$expected")
    }
  }

  test("geometry_union_agg and convex_hull_agg over exploded rows") {
    import graft.functions.{GeoAggregates, GeoFunctions}
    val wkts = (0 until 5).map { i =>
      val x0 = 2 * i; val x1 = 2 * i + 3
      val (y0, y1) = if (i % 2 == 0) (0, 4) else (1, 3)
      (i % 2, s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")
    }
    val df = wkts.toDF("grp", "wkt")
      .withColumn("geom", GeoFunctions.stGeometryFromText($"wkt"))
    val u = df.agg(GeoAggregates.geometryUnionAgg($"geom").as("u"))
      .select($"u").as[String].head()
    val ug = Wkt.parse(u)
    assert(ug.kind == "POLYGON")
    assert(area(ug) == 12.0 * 3 + 6.0 * 2 - 2.0 * 4)
    // grouped: each group's cells are pairwise disjoint → MULTIPOLYGON
    val grouped = df.groupBy($"grp").agg(GeoAggregates.geometryUnionAgg($"geom").as("u"))
      .orderBy($"grp").as[(Int, String)].collect()
    assert(Wkt.parse(grouped(0)._2).kind == "MULTIPOLYGON") // 3 even cells, disjoint
    assert(area(Wkt.parse(grouped(0)._2)) == 36.0)
    assert(area(Wkt.parse(grouped(1)._2)) == 12.0)

    // hull of all cell corners: rectangle [0,11] x [0,4] (collinear dropped)
    val h = df.agg(GeoAggregates.convexHullAgg($"geom").as("h")).select($"h").as[String].head()
    val hg = Wkt.parse(h)
    assert(hg.kind == "POLYGON" && hg.rings.sameElements(Array(5)), h)
    assert(area(hg) == 44.0)
    assert(hg.xs(0) == 0.0 && hg.ys(0) == 0.0)
    // degenerate: single point → POINT
    val hp = Seq("POINT (3 4)").toDF("wkt")
      .select(GeoFunctions.stGeometryFromText($"wkt").as("geom"))
      .agg(GeoAggregates.convexHullAgg($"geom")).as[String].head()
    assert(hp == "POINT (3.0 4.0)")
  }

  test("spherical geography: octant known answer, pole enclosure, degenerate kinds") {
    import graft.ext.SphericalGeo
    val r = SphericalGeo.EarthRadiusM
    // octant (equator-equator-pole triangle): exactly 1/8 of the sphere
    val octant = SphericalGeo.area(g("POLYGON ((0 0, 90 0, 0 90, 0 0))"))
    assert(math.abs(octant / (math.Pi * r * r / 2) - 1) < 1e-6, octant)
    // a ring around the pole triggers the course-delta 2π correction and
    // must cover less than a hemisphere but more than the planar guess
    val cap = SphericalGeo.area(g("POLYGON ((0 80, 90 80, 180 80, 270 80, 0 80))"))
    assert(cap > 0 && cap < 2 * math.Pi * r * r, cap)
    // antipodal-ish distance: equator quarter = πR/2
    val gc = SphericalGeo.distance(g("POINT (0 0)"), g("POINT (90 0)"))
    assert(math.abs(gc / (math.Pi * r / 2) - 1) < 1e-9)
    assert(SphericalGeo.area(g("POINT (1 1)")) == null)
    assert(SphericalGeo.length(g("POINT (1 1)")) == null)
  }

  test("geometry_n keeps a multipolygon shell grouped with its holes") {
    import graft.functions.GeoFunctions._
    val df = Seq(
      "MULTIPOLYGON (((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1)), ((20 0, 22 0, 22 2, 20 2, 20 0)))")
      .toDF("wkt").withColumn("g", stGeometryFromText($"wkt"))
    val row = df.select(
      stGeomArea(stGeometryN($"g", lit(1))).as("a1"),       // 81 - 1 hole
      stNumInteriorRing(stGeometryN($"g", lit(1))).as("h1"),
      stGeomArea(stGeometryN($"g", lit(2))).as("a2"),
      stGeometryN($"g", lit(3)).isNull.as("oob"),
      stGeomArea(stEnvelope($"g")).as("env")).head()
    assert(row.getDouble(0) == 80.0)
    assert(row.getInt(1) == 1)
    assert(row.getDouble(2) == 4.0)
    assert(row.getBoolean(3))
    assert(row.getDouble(4) == 22.0 * 9.0) // bbox (0,0)-(22,9)
  }

  test("st_distance / st_buffer / st_union as columns") {
    import graft.functions.GeoFunctions._
    val df = Seq(
      ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POINT (7 2)", 1.0),
      ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (2 1)", 0.5)
    ).toDF("wa", "wb", "d")
      .withColumn("ga", stGeometryFromText($"wa"))
      .withColumn("gb", stGeometryFromText($"wb"))
      .select(
        stDistance($"ga", $"gb").as("dist"),
        stNumPoints(stBuffer($"gb", $"d")).as("nbuf"),
        stGeomArea(stUnion($"ga", stBuffer($"gb", lit(8.0)))).isNotNull.as("u_ok"))
      .collect()
    assert(df(0).getDouble(0) == 3.0 && df(1).getDouble(0) == 0.0)
    assert(df.forall(_.getInt(1) == 9))
    assert(df.forall(_.getBoolean(2)))
  }
}
