package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature with md5-derived Rademacher (±1) planes.
  *
  * One bucket per hash table: `bits` sign-bits of ±1-projections packed
  * MSB-first into a long. The hyperplane component for (plane p, dim d) is
  * +1 iff the first hex char of md5("p:d") is even — a deterministic,
  * engine-portable pseudo-random sign, so the DuckDB oracle reproduces the
  * exact buckets (graft.operators.Similarity.qSimAnnLshSql), unlike the
  * xxhash64-seeded variant this replaces. Projections accumulate float→double
  * left-to-right in dim order, matching a per-element SQL formulation
  * bit-for-bit (same convention as [[CosineSimilarity]]).
  *
  * The sign matrix is data-independent: computed once per (tables, bits, dims)
  * and cached process-wide, so the per-row cost is one fused multiply-free
  * loop (tables·bits·dims adds) — no per-row hashing at all.
  *
  * Replaces the round-2 nested-HOF implementation, which was interpreted
  * (CodegenFallback lambdas) and not cross-engine reproducible.
  */
case class RademacherLshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(tables >= 1 && bits >= 1 && bits <= 62)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rademacher_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val signs = RademacherLshBuckets.signs(tables * bits, dims)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var j = 0
      while (j < bits) {
        val plane = signs(t * bits + j)
        var dot = 0.0
        var d = 0
        while (d < dims) {
          val x = vec.getFloat(d).toDouble
          dot += (if (plane(d) > 0) x else -x)
          d += 1
        }
        acc = acc * 2 + (if (dot > 0.0) 1L else 0L)
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RademacherLshBuckets {
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]()

  /** ±1 sign matrix [plane][dim]; +1 iff first md5 hex char of "p:d" is even. */
  private[ext] def signs(planes: Int, dims: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((planes, dims), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes) { p =>
        Array.tabulate(dims) { d =>
          md.reset()
          val h = md.digest(s"$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val firstHexChar = (h(0) >> 4) & 0xf
          if (firstHexChar % 2 == 0) 1.toByte else (-1).toByte
        }
      }
    })
}
