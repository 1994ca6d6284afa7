package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector similarity function bundle (extension track: ANN / embedding ops).
  *
  * cosine() is the native codegen'd expression (graft.ext.CosineSimilarity);
  * the LSH helpers compose built-in HOFs only, so the whole signature pipeline
  * stays in whole-stage codegen with zero shuffles until the bucket join.
  */
object VectorFunctions {

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Codegen'd cosine similarity between two ARRAY<FLOAT> columns. */
  def cosine(a: Column, b: Column): Column =
    column(graft.ext.CosineSimilarity(expression(a), expression(b)))

  /** Register SQL surface: cosine_similarity(a, b). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => graft.ext.CosineSimilarity(exprs(0), exprs(1)),
      "built-in")

  /** Random-hyperplane LSH signature: `tables` hash tables of `bits` sign-bits
    * each, packed into one int per table. The hyperplane for (table t, bit j)
    * has deterministic ±1 components derived from xxhash64(t*bits+j, dim) —
    * no stored model, reproducible across the cluster. */
  def lshBuckets(vec: Column, tables: Int, bits: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      aggregate(
        sequence(lit(0), lit(bits - 1)),
        lit(0L),
        (acc, j) => acc * 2 + when(hyperplaneDot(vec, t * lit(bits) + j) > 0.0, 1L).otherwise(0L)))

  /** Pseudo-random ±1 projection of `vec` onto hyperplane `planeId`. */
  private def hyperplaneDot(vec: Column, planeId: Column): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
        when(xxhash64(planeId, i) % 2 === 0, x.cast("double")).otherwise(-x.cast("double"))),
      lit(0.0d), (acc, v) => acc + v)
}
