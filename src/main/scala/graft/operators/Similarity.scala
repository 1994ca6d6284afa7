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

  /** Deterministic left-to-right float→double cosine, as DuckDB SQL, between
    * two table-qualified ARRAY<FLOAT> columns — bit-identical to the
    * graft.ext.CosineSimilarity kernel. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($a) + 1)]), (x, y) -> x + y)
       / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE) for i in range(1, len($a) + 1)]), (x, y) -> x + y))
        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($b) + 1)]), (x, y) -> x + y)))"""

  /** LSH-bucketed approximate top-k, fully oracle-checked: the md5-Rademacher
    * hyperplanes (graft.ext.RademacherLshBuckets) are engine-portable, so the
    * DuckDB oracle rebuilds the identical buckets, candidate set, and exact
    * rescoring — verifying the approximate operator end-to-end, not just its
    * exact parts. 8 tables × 6 sign-bits — coarse buckets chosen for
    * near-orthogonal data; denser real-world embeddings would use more bits. */
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

  val qSimAnnLshSql: String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       dots AS (
         SELECT vec_id, p.range AS p,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [
             CASE WHEN ('0x' || substr(md5(CAST(p.range AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 1))::INT % 2 = 0
                  THEN CAST(embedding[i] AS DOUBLE) ELSE -CAST(embedding[i] AS DOUBLE) END
             for i in range(1, len(embedding) + 1)]), (a, x) -> a + x) AS dot
         FROM e CROSS JOIN range(48) p),
       buckets AS (
         SELECT vec_id, CAST(p // 6 AS INT) AS tbl,
           CAST(SUM((CASE WHEN dot > 0.0 THEN 1::BIGINT ELSE 0::BIGINT END)
                    << CAST(5 - (p % 6) AS INT)) AS BIGINT) AS bucket
         FROM dots GROUP BY 1, 2),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
         FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
         WHERE q.vec_id < $NQ AND c.vec_id >= $NQ),
       sims AS (
         SELECT cand.query_id, cand.vec_id,
           round(${cosSql("qe.embedding", "ce.embedding")}, 6) AS sim_r
         FROM cand
         JOIN e qe ON qe.vec_id = cand.query_id
         JOIN e ce ON ce.vec_id = cand.vec_id),
       ranked AS (
         SELECT query_id, vec_id, sim_r,
           row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, vec_id) AS rn
         FROM sims)
       SELECT query_id, rn, vec_id, sim_r FROM ranked WHERE rn <= 5
       ORDER BY query_id, rn"""

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

  /** IVF parameters: cell count grows with the corpus (∝ √n, floored at 16 —
    * at 100 TB a 10⁹-vector corpus gets ~16k cells, keeping both the broadcast
    * centroid table and the per-probe candidate fraction small), and Lloyd
    * refinement rounds are configurable (default 2). Every arithmetic step is
    * deterministic cross-engine: md5-based seeding, exact DECIMAL centroid
    * sums (order-independent) finished by one IEEE double division, and the
    * left-to-right cosine kernel — so the DuckDB oracle replays the whole
    * index build bit-for-bit (qSimAnnIvfSql). */
  private[graft] def ivfCells(n: Long): Int =
    math.max(16, math.floor(math.sqrt(n / 4.0)).toInt)

  private[graft] def ivfTopK(
      s: SparkSession, dir: String, nprobe: Int, lloydRounds: Int = 2): DataFrame = {
    import s.implicits._
    val e = table(s, dir, "embeddings")
    val corpus = e.filter($"vec_id" >= NQ).select($"vec_id", $"embedding")
    val cellCount = ivfCells(corpus.count())

    // exact decimal mean per (cell, pos): order-independent partial sums, one
    // IEEE division at the end — identical in any engine at any parallelism
    def centroids(assigned: DataFrame): DataFrame =
      assigned.select($"cell", posexplode($"embedding").as(Seq("pos", "v")))
        .groupBy($"cell", $"pos")
        .agg((sum($"v".cast("double").cast("decimal(25,12)")).cast("double") /
          count(lit(1)).cast("double")).as("m"))
        .groupBy($"cell")
        .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
          el => el.getField("m").cast("float")).as("centroid"))

    def assign(df: DataFrame, cents: DataFrame): DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("csim", VectorFunctions.cosine($"embedding", $"centroid"))
        .groupBy($"vec_id")
        .agg(max_by(struct($"cell", $"embedding"), struct($"csim", -$"cell")).as("b"))
        .select($"vec_id", $"b.cell".as("cell"), $"b.embedding".as("embedding"))

    val seeded = corpus.withColumn("cell",
      expr("CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT)") %
        cellCount)
    var cents = centroids(seeded)
    (1 to lloydRounds).foreach(_ => cents = centroids(assign(corpus, cents)))
    val cells = assign(corpus, cents)

    val probes = e.filter($"vec_id" < NQ)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      .crossJoin(broadcast(cents))
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

  /** DuckDB replay of the full IVF build + probe (see ivfTopK). Generated so
    * the Lloyd-round CTE chain stays in lockstep with the Scala parameter. */
  private def ivfSql(nprobe: Int, lloydRounds: Int): String = {
    def assignCte(k: Int): String =
      s"""asg$k AS (
         SELECT vec_id, embedding, cell FROM (
           SELECT c.vec_id, c.embedding, ct.cell,
             row_number() OVER (PARTITION BY c.vec_id
               ORDER BY ${cosSql("c.embedding", "ct.centroid")} DESC, ct.cell) AS rnk
           FROM corpus c CROSS JOIN cent$k ct) WHERE rnk = 1)"""
    def centCte(k: Int, src: String): String =
      s"""cm$k AS (
         SELECT s.cell, f.pos,
           CAST(SUM(CAST(f.x AS DECIMAL(25,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
         FROM flat f JOIN $src s ON f.vec_id = s.vec_id GROUP BY 1, 2),
       cent$k AS (
         SELECT cell, list_transform(list(m ORDER BY pos), v -> CAST(v AS FLOAT)) AS centroid
         FROM cm$k GROUP BY cell)"""
    val rounds = (1 to lloydRounds).map(k => s"${assignCte(k - 1)},\n       ${centCte(k, s"asg${k - 1}")}")
      .mkString(",\n       ")
    val last = lloydRounds
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       corpus AS (SELECT vec_id, embedding FROM e WHERE vec_id >= $NQ),
       params AS (
         SELECT GREATEST(16, CAST(FLOOR(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS c FROM corpus),
       flat AS (
         SELECT vec_id, i.range AS pos, CAST(embedding[CAST(i.range + 1 AS INT)] AS DOUBLE) AS x
         FROM corpus CROSS JOIN range(64) i),
       asgSeed AS (
         SELECT vec_id, embedding,
           ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % (SELECT c FROM params) AS cell
         FROM corpus),
       ${centCte(0, "asgSeed")},
       $rounds,
       cells AS (
         SELECT vec_id, embedding, cell FROM (
           SELECT c.vec_id, c.embedding, ct.cell,
             row_number() OVER (PARTITION BY c.vec_id
               ORDER BY ${cosSql("c.embedding", "ct.centroid")} DESC, ct.cell) AS rnk
           FROM corpus c CROSS JOIN cent$last ct) WHERE rnk = 1),
       probes AS (
         SELECT query_id, qvec, cell FROM (
           SELECT q.vec_id AS query_id, q.embedding AS qvec, ct.cell,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY ${cosSql("q.embedding", "ct.centroid")} DESC, ct.cell) AS pr
           FROM (SELECT vec_id, embedding FROM e WHERE vec_id < $NQ) q
           CROSS JOIN cent$last ct) WHERE pr <= $nprobe),
       sims AS (
         SELECT p.query_id, m.vec_id,
           round(${cosSql("p.qvec", "m.embedding")}, 6) AS sim_r
         FROM probes p JOIN cells m ON p.cell = m.cell),
       ranked AS (
         SELECT query_id, vec_id, sim_r,
           row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, vec_id) AS rn
         FROM sims)
       SELECT query_id, rn, vec_id, sim_r FROM ranked WHERE rn <= 5
       ORDER BY query_id, rn"""
  }
  val qSimAnnIvfSql: String = ivfSql(nprobe = 4, lloydRounds = 2)

  /** Embedding-space near-duplicate detection: corpus pairs with cosine ≥ 0.3
    * within the same label partition (embedding-cosine near-dup from the brief).
    * EXACT BASELINE / ORACLE DEVICE: all-pairs within label is quadratic in the
    * hottest label — correct for verification, not the 100 TB route. The scale
    * path is q_sim_neardup_lsh below. */
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

  /** PQ (product-quantization) ANN — the memory-bound scale path the other
    * ANN variants don't cover: vectors compress to M=4 one-byte codes
    * (nearest codebook centroid per 16-dim subspace), and queries score
    * against CODES via an additive-distance lookup table (ADC), never
    * touching full corpus vectors until the final top-k rescoring.
    *
    * Scale: codebooks are (M×K×16 floats) — broadcast; codes are M bytes
    * per vector; the ADC join moves only (m, cell) lookup rows and codes.
    * At 10⁹ vectors that is ~4 GB of codes vs ~256 GB of raw floats.
    *
    * Determinism (the oracle replays the ENTIRE pipeline): subspace seed
    * assignment via md5(vec_id:m), codebooks as exact DECIMAL means (one
    * IEEE division at the end), squared-distance terms cast to
    * DECIMAL(25,12) before the order-independent sum, all argmins
    * tie-broken on the cell / vec_id. Production would Lloyd-refine the
    * codebooks exactly as the IVF build does; the hash-partitioned means
    * keep the replay compact without changing the pipeline shape. */
  def q_sim_ann_pq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = 4; val K = 16; val sub = 16 // 4 × 16 dims, 16 centroids each
    val e = table(s, dir, "embeddings")
    val corpus = e.filter($"vec_id" >= NQ).select($"vec_id", $"embedding")
    def flatOf(df: DataFrame): DataFrame =
      df.select($"vec_id", posexplode($"embedding").as(Seq("pos", "x")))
        .select($"vec_id", $"pos", $"x".cast("double").as("x"),
          ($"pos" / sub).cast("int").as("m"))
    val flat = flatOf(corpus)
    val seeded = flat.withColumn("cell",
      expr("CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), ':', CAST(m AS STRING))), 1, 15), 16, 10) AS BIGINT)") % K)
    val centFlat = seeded.groupBy($"m", $"cell", $"pos")
      .agg((sum($"x".cast("decimal(25,12)")).cast("double") /
        count(lit(1)).cast("double")).as("c"))
    // encode: nearest centroid per (vector, subspace), exact decimal sums
    def sqDistTo(cents: DataFrame, points: DataFrame): DataFrame =
      points.join(cents, Seq("m", "pos"))
        .groupBy($"vec_id", $"m", $"cell")
        .agg(sum((($"x" - $"c") * ($"x" - $"c")).cast("decimal(25,12)")).as("d2"))
    val codes = sqDistTo(broadcast(centFlat), flat)
      .groupBy($"vec_id", $"m")
      .agg(min_by($"cell", struct($"d2", $"cell")).as("cell"))
    // ADC: per-query lookup table over the same centroids
    val qflat = flatOf(e.filter($"vec_id" < NQ))
    val qdist = sqDistTo(broadcast(centFlat), qflat)
      .select($"vec_id".as("query_id"), $"m", $"cell", $"d2")
    val w = Window.partitionBy($"query_id").orderBy($"approx", $"vec_id")
    val top = codes.join(broadcast(qdist), Seq("m", "cell"))
      .groupBy($"query_id", $"vec_id")
      .agg(sum($"d2").as("approx"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
    // exact rescoring of only the survivors
    top
      .join(e.select($"vec_id", $"embedding"), "vec_id")
      .join(e.select($"vec_id".as("query_id"), $"embedding".as("qvec")), "query_id")
      .select($"query_id", $"rn", $"vec_id",
        $"approx".cast("double").as("approx_d2"),
        round(VectorFunctions.cosine($"qvec", $"embedding"), 6).as("sim_r"))
      .orderBy($"query_id", $"rn")
  }
  val qSimAnnPqSql: String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       corpus AS (SELECT vec_id, embedding FROM e WHERE vec_id >= $NQ),
       flat AS (
         SELECT vec_id, i.range AS pos, CAST(i.range // 16 AS INT) AS m,
                CAST(embedding[CAST(i.range + 1 AS INT)] AS DOUBLE) AS x
         FROM corpus CROSS JOIN range(64) i),
       seeded AS (
         SELECT *, ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':' || CAST(m AS VARCHAR)), 1, 15))::BIGINT % 16 AS cell
         FROM flat),
       centflat AS (
         SELECT m, cell, pos,
           CAST(SUM(CAST(x AS DECIMAL(25,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS c
         FROM seeded GROUP BY 1, 2, 3),
       cdist AS (
         SELECT f.vec_id, f.m, ct.cell,
           SUM(CAST((f.x - ct.c) * (f.x - ct.c) AS DECIMAL(25,12))) AS d2
         FROM flat f JOIN centflat ct ON f.m = ct.m AND f.pos = ct.pos
         GROUP BY 1, 2, 3),
       codes AS (
         SELECT vec_id, m, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cell) AS rnk
           FROM cdist) WHERE rnk = 1),
       qflat AS (
         SELECT vec_id, i.range AS pos, CAST(i.range // 16 AS INT) AS m,
                CAST(embedding[CAST(i.range + 1 AS INT)] AS DOUBLE) AS x
         FROM (SELECT vec_id, embedding FROM e WHERE vec_id < $NQ) q
         CROSS JOIN range(64) i),
       qdist AS (
         SELECT f.vec_id AS query_id, f.m, ct.cell,
           SUM(CAST((f.x - ct.c) * (f.x - ct.c) AS DECIMAL(25,12))) AS d2
         FROM qflat f JOIN centflat ct ON f.m = ct.m AND f.pos = ct.pos
         GROUP BY 1, 2, 3),
       approx AS (
         SELECT q.query_id, c.vec_id, SUM(q.d2) AS approx
         FROM codes c JOIN qdist q ON c.m = q.m AND c.cell = q.cell
         GROUP BY 1, 2),
       top AS (
         SELECT query_id, vec_id, approx,
           row_number() OVER (PARTITION BY query_id ORDER BY approx, vec_id) AS rn
         FROM approx)
       SELECT t.query_id, t.rn, t.vec_id,
         CAST(t.approx AS DOUBLE) AS approx_d2,
         round(${cosSql("qe.embedding", "ce.embedding")}, 6) AS sim_r
       FROM top t
       JOIN e qe ON qe.vec_id = t.query_id
       JOIN e ce ON ce.vec_id = t.vec_id
       WHERE t.rn <= 5
       ORDER BY t.query_id, t.rn"""

  /** Embedding near-dup CLUSTERS: distributed connected components
    * (Dedup.connectedComponents — large-star/small-star) over the exact
    * within-label similarity pair graph; every vector labeled with its
    * component minimum, the canonical-representative step after pair
    * detection. Oracle: the same pair SQL closed transitively with a
    * recursive min-label CTE. */
  def q_sim_embed_clusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = q_sim_neardup(s, dir).select($"vec_a", $"vec_b")
    val labels = Dedup.connectedComponents(pairs)
      .select($"node".as("vec_id"), $"label".as("lbl"))
    table(s, dir, "embeddings").select($"vec_id")
      .join(labels, Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce($"lbl", $"vec_id"))
      .select($"vec_id", $"cluster_id",
        count(lit(1)).over(Window.partitionBy($"cluster_id")).as("n_members"))
      .orderBy($"vec_id")
  }
  val qSimEmbedClustersSql: String = {
    val simsBody = qSimNeardupSql.substring(
      qSimNeardupSql.indexOf("WITH ") + 5,
      qSimNeardupSql.indexOf("SELECT vec_a, vec_b, label, sim_r FROM sims"))
    s"""WITH RECURSIVE $simsBody,
       p2 AS (SELECT vec_a, vec_b FROM sims WHERE sim_r >= 0.3),
       edges AS (
         SELECT vec_a AS u, vec_b AS v FROM p2
         UNION SELECT vec_b, vec_a FROM p2),
       reach(node, label) AS (
         SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         UNION
         SELECT e.v, r.label FROM reach r JOIN edges e ON r.node = e.u),
       lab AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node),
       assigned AS (
         SELECT em.vec_id, coalesce(l.cluster, em.vec_id) AS cluster_id
         FROM embeddings em LEFT JOIN lab l ON em.vec_id = l.node)
       SELECT vec_id, cluster_id,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
       FROM assigned ORDER BY vec_id"""
  }

  /** Scale path for embedding near-dup: label blocking + LSH bucket blocking.
    *
    * q_sim_neardup above is the exact all-pairs-within-label baseline —
    * correct, oracle-green, and quadratic in the hottest label, so it is the
    * *oracle device*, not the 100 TB route. This variant only compares pairs
    * that collide in ≥1 of 16 LSH tables (4 sign-bits each) inside the label
    * block: the bucket join carries only (label, vec_id), candidates are
    * distinct-ed, embeddings re-joined for exact scoring. Recall vs the exact
    * baseline is a property of the data (AnnSpec measures it; ~0.89 expected
    * at sim 0.3 for these near-random fixtures, →1 for genuinely duplicated
    * embeddings); the md5-Rademacher planes make the whole pipeline
    * reproducible in DuckDB, so even this approximate operator hash-matches. */
  def q_sim_neardup_lsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tables = 16; val bits = 4
    val e = table(s, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding",
        VectorFunctions.lshBuckets($"embedding", tables, bits).as("buckets"))
    val b = e.select($"vec_id", $"label", posexplode($"buckets").as(Seq("tbl", "bucket")))
    val cand = b.as("a").join(b.as("b"),
        $"a.label" === $"b.label" && $"a.tbl" === $"b.tbl" &&
          $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"), $"a.label".as("label"))
      .distinct()
    cand
      .join(e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a")), "vec_a")
      .join(e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b")), "vec_b")
      .withColumn("sim_r", round(VectorFunctions.cosine($"emb_a", $"emb_b"), 6))
      .filter($"sim_r" >= 0.3)
      .select($"vec_a", $"vec_b", $"label", $"sim_r")
      .orderBy($"vec_a", $"vec_b")
  }
  val qSimNeardupLshSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       dots AS (
         SELECT vec_id, p.range AS p,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [
             CASE WHEN ('0x' || substr(md5(CAST(p.range AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 1))::INT % 2 = 0
                  THEN CAST(embedding[i] AS DOUBLE) ELSE -CAST(embedding[i] AS DOUBLE) END
             for i in range(1, len(embedding) + 1)]), (a, x) -> a + x) AS dot
         FROM e CROSS JOIN range(64) p),
       buckets AS (
         SELECT vec_id, CAST(p // 4 AS INT) AS tbl,
           CAST(SUM((CASE WHEN dot > 0.0 THEN 1::BIGINT ELSE 0::BIGINT END)
                    << CAST(3 - (p % 4) AS INT)) AS BIGINT) AS bucket
         FROM dots GROUP BY 1, 2),
       lb AS (SELECT b.vec_id, e.label, b.tbl, b.bucket
              FROM buckets b JOIN e ON b.vec_id = e.vec_id),
       cand AS (
         SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label
         FROM lb a JOIN lb b
           ON a.label = b.label AND a.tbl = b.tbl AND a.bucket = b.bucket
          AND a.vec_id < b.vec_id),
       sims AS (
         SELECT cand.vec_a, cand.vec_b, cand.label,
           round(${cosSql("ea.embedding", "eb.embedding")}, 6) AS sim_r
         FROM cand
         JOIN e ea ON ea.vec_id = cand.vec_a
         JOIN e eb ON eb.vec_id = cand.vec_b)
       SELECT vec_a, vec_b, label, sim_r FROM sims WHERE sim_r >= 0.3
       ORDER BY vec_a, vec_b"""

  val queries: Map[String, Q] = Map(
    "q_sim_cosine_topk" -> q_sim_cosine_topk _,
    "q_sim_ann_lsh" -> q_sim_ann_lsh _,
    "q_sim_ann_ivf" -> q_sim_ann_ivf _,
    "q_sim_ann_pq" -> q_sim_ann_pq _,
    "q_sim_neardup" -> q_sim_neardup _,
    "q_sim_embed_clusters" -> q_sim_embed_clusters _,
    "q_sim_neardup_lsh" -> q_sim_neardup_lsh _)

  val oracles: Map[String, String] = Map(
    "q_sim_cosine_topk" -> qSimCosineTopkSql,
    "q_sim_ann_lsh" -> qSimAnnLshSql,
    "q_sim_ann_ivf" -> qSimAnnIvfSql,
    "q_sim_ann_pq" -> qSimAnnPqSql,
    "q_sim_neardup" -> qSimNeardupSql,
    "q_sim_embed_clusters" -> qSimEmbedClustersSql,
    "q_sim_neardup_lsh" -> qSimNeardupLshSql)
}
