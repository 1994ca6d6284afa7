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

  /** Register SQL surface: cosine_similarity / euclidean_distance /
    * dot_product over ARRAY<FLOAT>. */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("cosine_similarity",
      exprs => graft.ext.CosineSimilarity(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("euclidean_distance",
      exprs => graft.ext.EuclideanDistance(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("dot_product",
      exprs => graft.ext.DotProduct(exprs(0), exprs(1)), "built-in")
  }

  /** Random-hyperplane LSH signature: `tables` hash tables of `bits` sign-bits
    * each, packed into one long per table. Native compiled kernel with
    * md5-derived ±1 hyperplanes — deterministic, no stored model, and
    * engine-portable so the DuckDB oracle reproduces the buckets exactly
    * (see graft.ext.RademacherLshBuckets). */
  def lshBuckets(vec: Column, tables: Int, bits: Int): Column =
    column(graft.ext.RademacherLshBuckets(expression(vec), tables, bits))
}
