package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (extension track: ANN).
  *
  * - Brute-force cosine top-k: broadcast the (small) query set against the
  *   corpus — the exact baseline. At 100 TB the corpus side stays partitioned;
  *   work is |queries|·|corpus| fused-loop cosine evaluations with no shuffle
  *   (queries broadcast, per-partition top-k via WindowGroupLimit).
  * - LSH-bucketed ANN: random-hyperplane signatures (graft.functions
  *   .VectorFunctions.lshBuckets) restrict candidates to bucket-mates across
  *   4 tables of 8 bits — the scale path: candidate count ≈ |corpus|/2^bits
  *   per table instead of |corpus|.
  */
object Similarity {

  private val NQ = 8 // vec_id < NQ are the query vectors

  /** Exact top-5 cosine neighbors per query vector; oracle-backed (the DuckDB
    * SQL reproduces the identical float→double left-to-right accumulation). */
  def q_sim_cosine_topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = table(s, dir, "embeddings")
    val queries = e.filter($"vec_id" < NQ)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val corpus = e.filter($"vec_id" >= NQ)
    val w = Window.partitionBy($"query_id").orderBy($"sim_r".desc, $"vec_id")
    corpus.crossJoin(broadcast(queries))
      .withColumn("sim_r", round(VectorFunctions.cosine($"qvec", $"embedding"), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"query_id", $"rn", $"vec_id", $"sim_r")
      .orderBy($"query_id", $"rn")
  }
  val qSimCosineTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < $NQ),
       c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $NQ),
       sims AS (
         SELECT q.query_id, c.vec_id,
           round(
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               [CAST(qvec[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, len(qvec) + 1)]), (a, x) -> a + x)
             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE) for i in range(1, len(qvec) + 1)]), (a, x) -> a + x))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, len(embedding) + 1)]), (a, x) -> a + x))),
           6) AS sim_r
         FROM c CROSS JOIN q),
       ranked AS (
         SELECT query_id, vec_id, sim_r,
           row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, vec_id) AS rn
         FROM sims)
       SELECT query_id, rn, vec_id, sim_r FROM ranked WHERE rn <= 5
       ORDER BY query_id, rn"""

  /** LSH-bucketed approximate top-k (rows-only check; AnnSpec asserts recall
    * against the exact top-k). 8 tables × 6 sign-bits — coarse buckets chosen
    * for near-orthogonal data; denser real-world embeddings would use more bits. */
  def q_sim_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tables = 8; val bits = 6
    val e = table(s, dir, "embeddings")
      .withColumn("buckets", VectorFunctions.lshBuckets($"embedding", tables, bits))
    val queries = e.filter($"vec_id" < NQ)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"),
        posexplode($"buckets").as(Seq("tbl", "bucket")))
    val corpus = e.filter($"vec_id" >= NQ)
      .select($"vec_id", $"embedding", posexplode($"buckets").as(Seq("tbl", "bucket")))
    val w = Window.partitionBy($"query_id").orderBy($"sim_r".desc, $"vec_id")
    queries.join(corpus, Seq("tbl", "bucket"))
      .select($"query_id", $"qvec", $"vec_id", $"embedding").distinct()
      .withColumn("sim_r", round(VectorFunctions.cosine($"qvec", $"embedding"), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"query_id", $"rn", $"vec_id", $"sim_r")
      .orderBy($"query_id", $"rn")
  }

  /** IVF (inverted-file) ANN index — the second scale path from the brief.
    * Fully distributed and deterministic-by-construction:
    *  1. seed cells by hashing vec_id (no sampled init, no driver loops);
    *  2. centroids = per-cell element-wise means (explode → two-level agg —
    *     shuffle cardinality is |cells|·|dims|, never |corpus|);
    *  3. one Lloyd refinement: re-assign to the nearest centroid via a
    *     broadcast of the (tiny) centroid table, recompute means;
    *  4. queries probe the nprobe nearest cells and run exact cosine only on
    *     those cells' members — candidate count ≈ |corpus|·nprobe/C.
    * At 100 TB the corpus stays partitioned throughout; only centroids (C
    * rows) are ever broadcast. probing all C cells degenerates to exact
    * brute force, which AnnSpec uses as an equivalence invariant. */
  def q_sim_ann_ivf(s: SparkSession, dir: String): DataFrame =
    ivfTopK(s, dir, nprobe = 4)

  private[graft] def ivfTopK(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    import s.implicits._
    val cellCount = 16
    val e = table(s, dir, "embeddings")
    val corpus = e.filter($"vec_id" >= NQ).select($"vec_id", $"embedding")

    def centroids(assigned: DataFrame): DataFrame =
      assigned.select($"cell", posexplode($"embedding").as(Seq("pos", "v")))
        .groupBy($"cell", $"pos").agg(avg($"v").as("m"))
        .groupBy($"cell")
        .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
          el => el.getField("m").cast("float")).as("centroid"))

    def assign(df: DataFrame, cents: DataFrame): DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("csim", VectorFunctions.cosine($"embedding", $"centroid"))
        .groupBy($"vec_id")
        .agg(max_by(struct($"cell", $"embedding"), struct($"csim", -$"cell")).as("b"))
        .select($"vec_id", $"b.cell".as("cell"), $"b.embedding".as("embedding"))

    val seeded = corpus.withColumn("cell", pmod(xxhash64($"vec_id"), lit(cellCount)))
    val cents1 = centroids(assign(corpus, centroids(seeded)))
    val cells = assign(corpus, cents1)

    val probes = e.filter($"vec_id" < NQ)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      .crossJoin(broadcast(cents1))
      .withColumn("csim", VectorFunctions.cosine($"qvec", $"centroid"))
      .withColumn("pr", row_number().over(
        Window.partitionBy($"query_id").orderBy($"csim".desc, $"cell")))
      .filter($"pr" <= nprobe)
      .select($"query_id", $"qvec", $"cell")

    val w = Window.partitionBy($"query_id").orderBy($"sim_r".desc, $"vec_id")
    probes.join(cells, "cell")
      .withColumn("sim_r", round(VectorFunctions.cosine($"qvec", $"embedding"), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"query_id", $"rn", $"vec_id", $"sim_r")
      .orderBy($"query_id", $"rn")
  }

  /** Embedding-space near-duplicate detection: corpus pairs with cosine ≥ 0.3
    * within the same label partition (embedding-cosine near-dup from the brief). */
  def q_sim_neardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = table(s, dir, "embeddings").select($"vec_id", $"label", $"embedding")
    e.as("a").join(e.as("b"), $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .withColumn("sim_r", round(VectorFunctions.cosine($"a.embedding", $"b.embedding"), 6))
      .filter($"sim_r" >= 0.3)
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"), $"a.label".as("label"), $"sim_r")
      .orderBy($"vec_a", $"vec_b")
  }
  val qSimNeardupSql: String =
    """WITH sims AS (
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           round(
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               [CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)]), (x, y) -> x + y))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(b.embedding) + 1)]), (x, y) -> x + y))),
           6) AS sim_r
         FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
       SELECT vec_a, vec_b, label, sim_r FROM sims WHERE sim_r >= 0.3
       ORDER BY vec_a, vec_b"""

  val queries: Map[String, Q] = Map(
    "q_sim_cosine_topk" -> q_sim_cosine_topk _,
    "q_sim_ann_lsh" -> q_sim_ann_lsh _,
    "q_sim_ann_ivf" -> q_sim_ann_ivf _,
    "q_sim_neardup" -> q_sim_neardup _)

  val oracles: Map[String, String] = Map(
    "q_sim_cosine_topk" -> qSimCosineTopkSql,
    "q_sim_neardup" -> qSimNeardupSql)
}
