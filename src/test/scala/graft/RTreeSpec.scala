package graft

import graft.functions.RTree

/** STR R-tree: query results must equal the brute-force scan on every
  * (tree size, query) combination, including degenerate shapes. */
class RTreeSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def bruteForce(minX: Array[Double], minY: Array[Double],
      maxX: Array[Double], maxY: Array[Double],
      qx0: Double, qy0: Double, qx1: Double, qy1: Double): Set[Int] =
    minX.indices.filter(i =>
      minX(i) <= qx1 && maxX(i) >= qx0 && minY(i) <= qy1 && maxY(i) >= qy0).toSet

  test("packed tree answers equal brute force across sizes and query shapes") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 5, 16, 17, 100, 1000)) {
      val minX = new Array[Double](n); val minY = new Array[Double](n)
      val maxX = new Array[Double](n); val maxY = new Array[Double](n)
      for (i <- 0 until n) {
        val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
        val w = rnd.nextDouble() * 5; val h = rnd.nextDouble() * 5
        minX(i) = x; minY(i) = y; maxX(i) = x + w; maxY(i) = y + h
      }
      val tree = RTree.pack(minX, minY, maxX, maxY)
      assert(tree.size == n)
      // point probes, small boxes, huge boxes, empty-region boxes
      val queries = Seq(
        (50.0, 50.0, 50.0, 50.0), (10.0, 90.0, 12.0, 95.0),
        (-10.0, -10.0, 200.0, 200.0), (300.0, 300.0, 310.0, 310.0)) ++
        (0 until 20).map { _ =>
          val x = rnd.nextDouble() * 110 - 5; val y = rnd.nextDouble() * 110 - 5
          (x, y, x + rnd.nextDouble() * 10, y + rnd.nextDouble() * 10)
        }
      for ((x0, y0, x1, y1) <- queries) {
        val got = tree.query(x0, y0, x1, y1).toSet
        val want = bruteForce(minX, minY, maxX, maxY, x0, y0, x1, y1)
        assert(got == want, s"n=$n query=($x0,$y0,$x1,$y1): got ${got.size}, want ${want.size}")
      }
    }
  }

  test("payloads are original input indices, not packed positions") {
    // distinctive bboxes so each payload maps to a unique box
    val minX = Array(0.0, 10.0, 20.0, 30.0)
    val tree = RTree.pack(minX, minX.map(_ + 1), minX.map(_ + 2), minX.map(_ + 3))
    for (i <- minX.indices) {
      val hits = tree.query(minX(i) + 0.5, minX(i) + 1.5, minX(i) + 0.6, minX(i) + 1.6)
      assert(hits.toSeq == Seq(i))
    }
  }

  test("all-identical boxes pack and answer") {
    val n = 100
    val a = Array.fill(n)(5.0)
    val tree = RTree.pack(a, a, a.map(_ + 1), a.map(_ + 1))
    assert(tree.query(5.5, 5.5, 5.5, 5.5).toSet == (0 until n).toSet)
    assert(tree.query(7.0, 7.0, 8.0, 8.0).isEmpty)
  }
}
