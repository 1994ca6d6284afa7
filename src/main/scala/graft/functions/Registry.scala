package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call SQL registration of every custom function in the engine —
  * the analogue of the reference's GlobalFunctionCatalog assembly
  * (reference: core/trino-main/src/main/java/io/trino/metadata/
  * GlobalFunctionCatalog.java:72, fed by SystemFunctionBundle.java:385).
  * Spark built-ins cover the rest of the library; these are the expressions
  * the engine adds. */
object Registry {

  /** Names registered, for discovery/specs. */
  val customFunctions: Seq[String] = Seq(
    "cosine_similarity", "minhash_agreement", "hamming_distance",
    "poly_fingerprint", "simhash_bands", "word_stem")

  def registerAll(spark: SparkSession): Unit = {
    VectorFunctions.register(spark)
    TextFunctions.register(spark)
  }
}
