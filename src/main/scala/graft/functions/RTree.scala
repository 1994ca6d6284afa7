package graft.functions

/** Per-task in-memory R-tree — the role the reference's PagesRTreeIndex
  * (core/trino-main/src/main/java/io/trino/operator/PagesRTreeIndex.java:53,
  * a JTS STRtree built by SpatialIndexBuilderOperator and probed by
  * SpatialJoinOperator.java:41) plays INSIDE one spatial-join task, after
  * the KDB/grid partitioning layer has routed candidate rows to the task.
  *
  * Bulk-loaded with the classic Sort-Tile-Recursive packing (Leutenegger,
  * Lopez, Edgington, "STR: A Simple and Efficient Algorithm for R-Tree
  * Packing", ICDE 1997 — the same packing JTS STRtree uses): sort entries
  * by x-center, slice into ⌈√(n/M)⌉ vertical strips, sort each strip by
  * y-center, pack runs of M into leaf nodes, then repeat bottom-up. Every
  * level is a flat array (no object graph), so a tree over k build rows
  * costs O(k) memory with small constants and zero allocation per probe
  * beyond the result buffer.
  *
  * Probe(bbox) walks top-down visiting only nodes whose MBR intersects the
  * query — O(log_M k + answers) per probe versus the O(k) per-probe scan of
  * an equi-join's per-key cross product. At 100 TB the partitioning layer
  * bounds per-task build size and this index bounds per-row probe cost, so
  * neither the shuffle NOR the within-task refine is quadratic.
  */
object RTree {

  private val Fanout = 16

  /** Static packed tree over entry bboxes; `payload(i)` is the caller's row
    * index for entry i (leaf slots reference entries by position). */
  final class Tree private[RTree] (
      // per level (0 = leaves' parents ... top), node MBRs + child ranges
      val levelMinX: Array[Array[Double]], val levelMinY: Array[Array[Double]],
      val levelMaxX: Array[Array[Double]], val levelMaxY: Array[Array[Double]],
      val levelChildStart: Array[Array[Int]], val levelChildEnd: Array[Array[Int]],
      // entries, in packed order
      val entMinX: Array[Double], val entMinY: Array[Double],
      val entMaxX: Array[Double], val entMaxY: Array[Double],
      val payload: Array[Int]) {

    def size: Int = payload.length

    /** Payloads of all entries whose bbox intersects the query bbox
      * (closed-interval intersection, matching JTS Envelope semantics). */
    def query(qMinX: Double, qMinY: Double, qMaxX: Double, qMaxY: Double): Array[Int] = {
      val out = new scala.collection.mutable.ArrayBuffer[Int]()
      if (payload.length == 0) return Array.empty
      def scanEntries(from: Int, until: Int): Unit = {
        var i = from
        while (i < until) {
          if (entMinX(i) <= qMaxX && entMaxX(i) >= qMinX &&
              entMinY(i) <= qMaxY && entMaxY(i) >= qMinY) out += payload(i)
          i += 1
        }
      }
      if (levelMinX.isEmpty) { scanEntries(0, payload.length); return out.toArray }
      // top level is last; descend through node levels
      def visit(level: Int, node: Int): Unit = {
        if (levelMinX(level)(node) <= qMaxX && levelMaxX(level)(node) >= qMinX &&
            levelMinY(level)(node) <= qMaxY && levelMaxY(level)(node) >= qMinY) {
          val from = levelChildStart(level)(node)
          val until = levelChildEnd(level)(node)
          if (level == 0) scanEntries(from, until)
          else { var c = from; while (c < until) { visit(level - 1, c); c += 1 } }
        }
      }
      val top = levelMinX.length - 1
      var n = 0
      while (n < levelMinX(top).length) { visit(top, n); n += 1 }
      out.toArray
    }
  }

  /** STR bulk load from parallel bbox arrays; payloads are input indices. */
  def pack(minX: Array[Double], minY: Array[Double],
      maxX: Array[Double], maxY: Array[Double]): Tree = {
    val n = minX.length
    val order = packOrder(minX, minY, maxX, maxY)
    val eMinX = new Array[Double](n); val eMinY = new Array[Double](n)
    val eMaxX = new Array[Double](n); val eMaxY = new Array[Double](n)
    val payload = new Array[Int](n)
    var i = 0
    while (i < n) {
      val src = order(i)
      eMinX(i) = minX(src); eMinY(i) = minY(src)
      eMaxX(i) = maxX(src); eMaxY(i) = maxY(src)
      payload(i) = src
      i += 1
    }
    // build node levels bottom-up over the packed order
    val lvlMinX = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val lvlMinY = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val lvlMaxX = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val lvlMaxY = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val lvlFrom = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    val lvlTo = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    var curMinX = eMinX; var curMinY = eMinY; var curMaxX = eMaxX; var curMaxY = eMaxY
    while (curMinX.length > Fanout) {
      val m = (curMinX.length + Fanout - 1) / Fanout
      val nMinX = new Array[Double](m); val nMinY = new Array[Double](m)
      val nMaxX = new Array[Double](m); val nMaxY = new Array[Double](m)
      val nFrom = new Array[Int](m); val nTo = new Array[Int](m)
      var node = 0
      while (node < m) {
        val from = node * Fanout
        val until = math.min(from + Fanout, curMinX.length)
        var mnx = Double.PositiveInfinity; var mny = Double.PositiveInfinity
        var mxx = Double.NegativeInfinity; var mxy = Double.NegativeInfinity
        var c = from
        while (c < until) {
          if (curMinX(c) < mnx) mnx = curMinX(c)
          if (curMinY(c) < mny) mny = curMinY(c)
          if (curMaxX(c) > mxx) mxx = curMaxX(c)
          if (curMaxY(c) > mxy) mxy = curMaxY(c)
          c += 1
        }
        nMinX(node) = mnx; nMinY(node) = mny; nMaxX(node) = mxx; nMaxY(node) = mxy
        nFrom(node) = from; nTo(node) = until
        node += 1
      }
      lvlMinX += nMinX; lvlMinY += nMinY; lvlMaxX += nMaxX; lvlMaxY += nMaxY
      lvlFrom += nFrom; lvlTo += nTo
      curMinX = nMinX; curMinY = nMinY; curMaxX = nMaxX; curMaxY = nMaxY
    }
    new Tree(lvlMinX.toArray, lvlMinY.toArray, lvlMaxX.toArray, lvlMaxY.toArray,
      lvlFrom.toArray, lvlTo.toArray, eMinX, eMinY, eMaxX, eMaxY, payload)
  }

  /** STR ordering: x-center sort → √(n/M) vertical strips → y-center sort
    * within each strip. */
  private def packOrder(minX: Array[Double], minY: Array[Double],
      maxX: Array[Double], maxY: Array[Double]): Array[Int] = {
    val n = minX.length
    val byX = Array.tabulate(n)(identity)
      .sortBy(i => (minX(i) + maxX(i), minY(i) + maxY(i), i))
    val leafCount = (n + Fanout - 1) / Fanout
    val stripCount = math.max(1, math.ceil(math.sqrt(leafCount.toDouble)).toInt)
    val perStrip = stripCount * Fanout
    val out = new Array[Int](n)
    var pos = 0
    var s = 0
    while (s * perStrip < n) {
      val from = s * perStrip
      val until = math.min(from + perStrip, n)
      val strip = java.util.Arrays.copyOfRange(byX, from, until)
        .sortBy(i => (minY(i) + maxY(i), minX(i) + maxX(i), i))
      var k = 0
      while (k < strip.length) { out(pos) = strip(k); pos += 1; k += 1 }
      s += 1
    }
    out
  }
}
