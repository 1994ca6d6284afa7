package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators (extension track — LLM-data-pipeline).
  *
  * Four escalating strategies over `documents`:
  *  - exact: hash-groupBy on normalized text — one shuffle on the norm key.
  *  - ngram: exact word-3-gram Jaccard via an inverted-index self-join — the
  *    correctness baseline; quadratic within shingle buckets, so the *scale*
  *    path is:
  *  - minhash LSH: per-row signature (one compiled loop, no shuffle) →
  *    band-bucket join → candidates. At 100 TB: |bands|·|docs| rows shuffle
  *    instead of |docs|², and bucket skew is bounded by band width.
  *  - simhash: 64-bit fingerprint packed as 4×16-bit bands; hamming≤3 pairs
  *    are guaranteed to collide on ≥1 band (pigeonhole).
  *
  * Join-shape rules learned at sf0.1 (and load-bearing at 100 TB):
  *  1. The bucket self-join carries ONLY (bucket key, doc_id) — signatures
  *     would multiply the shuffle by |sig| and they're re-joinable afterwards.
  *  2. Candidate pairs are `.distinct()`-ed BEFORE scoring: a near-dup pair
  *     collides in many of its bands, and scoring each collision separately
  *     turns an O(pairs) kernel into O(pairs·bands).
  *  3. Signatures are materialized once per invocation (`materialized` =
  *     lazy Dataset persist + unpersist-registry, lineage intact — blocks
  *     compute inside the first consuming job, no separate materialization
  *     job): they're consumed by the bucket
  *     build and by the two sides of the scoring join (at cluster scale this
  *     is the standard materialize-signatures step). Every invocation pays
  *     the signature computation — no state survives the query, so a
  *     benchmark pass can never ride on a previous pass's persisted blocks
  *     and a long-lived server session accumulates nothing (round-12/13
  *     verdicts; see operators.materialized for the persist-vs-checkpoint
  *     fault-tolerance trade-off at cluster scale).
  *  4. documents.parquet at test SF is a single small file → one input split;
  *     an explicit repartition spreads signature computation across cores. On
  *     a real corpus the file count makes this a no-op-ish round-robin.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = s.sparkContext.defaultParallelism
    table(s, dir, "documents").repartition(n, $"doc_id")
  }

  /** Exact dedup on normalized text: keep first doc_id per group, report group size.
    *
    * Shuffle-key spelling (round-14 verdict #5): the ONE exchange routes on
    * `xxhash64(norm)` — 8 bytes hashed per row instead of the full document
    * text — via an explicit repartition; the window then clusters on
    * `(h, norm)`, which Spark satisfies with the EXISTING hashpartitioning(h)
    * (HashPartitioning on a subset of the clustering keys — no second
    * exchange; PlanShapeSpec pins it). `norm` stays in the row as payload
    * and is compared only between hash-equal neighbors during the
    * within-partition sort (the 8-byte `h` prefix decides everything else),
    * so the dedup stays EXACT — a 2⁻⁶⁴ collision costs a comparison, never
    * a wrong answer. */
  def q_dedup_exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"h", $"norm").orderBy($"doc_id")
    table(s, dir, "documents")
      .withColumn("norm", regexp_replace(lower($"text"), "\\s+", " "))
      .withColumn("h", xxhash64($"norm"))
      .repartition($"h")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("dups", count(lit(1)).over(Window.partitionBy($"h", $"norm")))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"dups")
      .orderBy($"doc_id")
  }
  val qDedupExactSql: String =
    """WITH n AS (
         SELECT doc_id, lang, regexp_replace(lower(text), '\s+', ' ', 'g') AS norm FROM documents),
       r AS (
         SELECT doc_id, lang,
           row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn,
           count(*) OVER (PARTITION BY norm) AS dups
         FROM n)
       SELECT doc_id, lang, dups FROM r WHERE rn = 1 ORDER BY doc_id"""

  /** Exact n-gram (word trigram) Jaccard near-dup pairs ≥ 0.8 via a
    * document-frequency-guarded inverted index.
    *
    * The unguarded self-join is quadratic inside a shingle bucket, and stock
    * phrases ("of the and …") make those buckets skew bombs at corpus scale.
    * Guard: shingles appearing in more than max(16, 2% of docs) documents are
    * dropped from the *candidate index only* — scoring still uses the full
    * shingle sets (array intersection), so reported Jaccards are exact. A
    * jaccard ≥ 0.8 pair shares ≥ ~44% of its shingles; for the guard to lose
    * it, every one of those shared shingles would have to be corpus-common —
    * which is the stop-phrase-only-document edge case this guard consciously
    * trades away (documented semantic delta; the oracle equality shows it is
    * empty on the fixtures). Bucket fan-out is now bounded by the cutoff, so
    * the join is O(shingles · cutoff), never O(docs²). */
  def q_dedup_ngram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = materialized(
      docs(s, dir).select($"doc_id", shingleHashes3(tokens($"text")).as("shs")))
    def sh = d.select($"doc_id", explode($"shs").as("sh"))
    // The stop-shingle dictionary is SIZE-BOUNDED BY CONSTRUCTION at any
    // corpus size: a shingle needs dfreq > 2%·ndocs to qualify, so at most
    // total_shingle_occurrences/(0.02·ndocs) = 50·avg_shingles_per_doc
    // entries exist — a driver-safe collect (like a broadcast build side,
    // which also lands on the driver first). Collecting it turns the guard
    // and the common-intersection from two broadcast joins + a groupBy
    // into in-row binary-search kernels: the round-13 plan's four eager
    // materialization jobs collapse to one lazy checkpoint + this collect.
    val commonArr: Array[Long] = {
      val nd = d.agg(count(lit(1)).as("ndocs"))
      sh.groupBy($"sh").agg(count(lit(1)).as("dfreq"))
        .crossJoin(broadcast(nd))
        .filter($"dfreq" > greatest(lit(16.0), lit(0.02) * $"ndocs"))
        .select($"sh").as[Long].collect().sorted
    }
    // guarded inverted index: rare shingles only, in-row anti filter
    def index = sh.filter(!longInSet($"sh", commonArr))
    // exact intersection = co-occurrence count over the rare index (the cheap
    // counting join — no shingle arrays in the shuffle) + in-row intersection
    // of each doc's shingle set with the bounded common dictionary.
    val pairsRare = index.as("a").join(index.as("b"), Seq("sh"))
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter_rare"))
    // per-doc scalars ride one narrow projection of the checkpointed d:
    // sz and the (bounded-size) common-shingle intersection array
    def sideInfo = d.select($"doc_id",
      size($"shs").cast("long").as("sz"),
      arraySetIntersect($"shs", commonArr).as("cshs"))
    pairsRare
      .join(sideInfo.select($"doc_id".as("doc_a"), $"sz".as("sz_a"), $"cshs".as("cshs_a")), "doc_a")
      .join(sideInfo.select($"doc_id".as("doc_b"), $"sz".as("sz_b"), $"cshs".as("cshs_b")), "doc_b")
      .withColumn("inter", $"inter_rare" +
        size(array_intersect($"cshs_a", $"cshs_b")).cast("long"))
      .withColumn("jaccard", $"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter"))
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      // sortedResult (r19): the pair-agg + rescore tail otherwise runs twice
      // (orderBy's range-sample job). The explicit key matters here: this
      // plan embeds the per-invocation commonArr literal, so the default
      // canonicalized-plan key would never evict the previous invocation's
      // blocks (see operators package).
      .transform(r => sortedResult(r, "q_dedup_ngram.result")($"doc_a", $"doc_b"))
  }
  val qDedupNgramSql: String =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       sh AS (
         SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(w) >= 3
                THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
                ELSE [list_aggregate(w, 'string_agg', ' ')] END)) AS s
         FROM toks),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT doc_a, doc_b,
         round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
       FROM pairs
       JOIN sizes sa ON doc_a = sa.doc_id
       JOIN sizes sb ON doc_b = sb.doc_id
       WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
       ORDER BY doc_a, doc_b"""

  /** MinHash+LSH near-dup pipeline in its production shape: LSH bands generate
    * candidates, an exact-Jaccard rescoring verifies them. The output is
    * therefore the exact pair set ≥ 0.8 — oracle-checked against the same
    * DuckDB SQL as the inverted-index baseline — reached with LSH's scale
    * properties (bands·docs shuffle, never docs²). With 16 bands × 4 rows a
    * true-0.8 pair escapes all bands with p = (1−0.8⁴)¹⁶ ≈ 2·10⁻⁴; AnnSpec
    * asserts the candidate set covers every exact pair on the fixtures. */
  def q_dedup_minhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 64; val bands = 16; val r = 4
    // fused kernel (r19): shs + sig in one compiled pass over the tokens,
    // materialized as ONE struct column so the kernel provably runs once per
    // row at cache-fill time; bit-identical to the two-expression spelling
    // (ext.MinHashShinglesAndSig scaladoc, TextKernelFusionSpec)
    val d0 = materialized(docs(s, dir).select($"doc_id",
      minhashShinglesSig(tokens($"text"), k).as("ss")))
    val d = d0.select($"doc_id", $"ss.shs".as("shs"), $"ss.sig".as("sig"))
    val sigs = d.select($"doc_id", $"sig")
    val buckets = sigs.select($"doc_id",
      posexplode(minhashBands($"sig", bands, r)).as(Seq("band", "bkey")))
    val cand = buckets.as("a").join(buckets.as("b"), Seq("band", "bkey"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
      // exact-Jaccard rescoring is compute-bound (array_intersect over full
      // shingle sets): pin its parallelism to the core count rather than the
      // size-driven reduce-partition setting, which undersizes CPU-heavy
      // stages at small shuffle volumes
      .repartition(s.sparkContext.defaultParallelism, $"doc_a")
    cand
      .join(d.select($"doc_id".as("doc_a"), $"shs".as("shs_a")), "doc_a")
      .join(d.select($"doc_id".as("doc_b"), $"shs".as("shs_b")), "doc_b")
      .withColumn("inter", size(array_intersect($"shs_a", $"shs_b")).cast("long"))
      .withColumn("jaccard", $"inter".cast("double") /
        (size($"shs_a") + size($"shs_b") - $"inter"))
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** SimHash fingerprint + banded hamming candidates, oracle-checked.
    *
    * The fingerprint is the engine-portable 60-bit md5 simhash
    * (graft.ext.Md5SimHash60): DuckDB recomputes the identical fingerprints,
    * bands, candidates and hamming distances in SQL. With 4 bands × 15 bits,
    * hamming <= 3 pairs are guaranteed to share a band (pigeonhole), so the
    * LSH candidate generation is *complete* for the reported pair set — the
    * output is exact by construction, not approximately recalled. */
  def q_dedup_simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = materialized(
      docs(s, dir).select($"doc_id", md5SimHash60(tokens($"text")).as("fp")))
    val bandArr = array((0 until 4).map(i =>
      shiftright($"fp", i * 15).bitwiseAND(lit(32767L))): _*)
    val byBand = sigs.select($"doc_id", posexplode(bandArr).as(Seq("band_idx", "band_val")))
    val cand = byBand.as("a").join(byBand.as("b"), Seq("band_idx", "band_val"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val pairs = cand
      .join(sigs.select($"doc_id".as("doc_a"), $"fp".as("fp_a")), "doc_a")
      .join(sigs.select($"doc_id".as("doc_b"), $"fp".as("fp_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        bit_count($"fp_a".bitwiseXOR($"fp_b")).cast("long").as("hamming"))
    pairs.filter($"hamming" <= 3)
      .groupBy($"doc_a")
      .agg(count(lit(1)).as("n_near"), min($"hamming").as("min_hamming"))
      .orderBy($"doc_a")
  }
  val qDedupSimhashSql: String =
    """WITH toks AS (
         SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
         FROM documents),
       h AS (
         SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
       bits AS (
         SELECT doc_id, b.range AS b,
           SUM(CASE WHEN (h >> CAST(b.range AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
         FROM h CROSS JOIN range(60) b GROUP BY 1, 2),
       fp AS (
         SELECT doc_id,
           CAST(SUM(CASE WHEN s >= 0 THEN 1::BIGINT << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS fp
         FROM bits GROUP BY doc_id),
       bands AS (
         SELECT doc_id, i.range AS band_idx,
           (fp >> CAST(i.range * 15 AS INT)) & 32767 AS band_val
         FROM fp CROSS JOIN range(4) i),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id),
       pairs AS (
         SELECT doc_a, doc_b, bit_count(xor(fa.fp, fb.fp)) AS hamming
         FROM cand
         JOIN fp fa ON cand.doc_a = fa.doc_id
         JOIN fp fb ON cand.doc_b = fb.doc_id)
       SELECT doc_a, count(*) AS n_near, CAST(min(hamming) AS BIGINT) AS min_hamming
       FROM pairs WHERE hamming <= 3
       GROUP BY doc_a ORDER BY doc_a"""

  /** Near-dup CLUSTER assignment: connected components over the exact
    * near-dup pair graph (jaccard ≥ 0.8), each document labeled with its
    * component's minimum doc_id — the "pick one canonical doc per
    * duplicate cluster" step a training-data pipeline runs after pair
    * detection.
    *
    * Scale: alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — see
    * PAPERS.md): each round is one shuffle (groupBy node for the local
    * min) plus one broadcast-or-shuffle join back to the edge list; the
    * component diameter collapses doubly-exponentially, so even
    * planet-scale graphs converge in a handful of rounds (vs O(diameter)
    * for naive label propagation). No driver-side graph state — the edge
    * list never leaves the cluster; convergence is detected from a
    * 2-value aggregate (count + order-independent hash sum).
    *
    * The oracle replays the SAME pair set in DuckDB (the ngram SQL) and
    * closes it transitively with a recursive min-label CTE — exact,
    * including singleton documents keeping their own id. */
  /** Distributed connected components: alternating large-star/small-star
    * over an (u, v) edge list until fixpoint; returns (node, label) with
    * label = the component minimum. Only nodes appearing in edges are
    * returned. Exposed for direct spec coverage (DedupSpec chains). */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsInstrumented(pairs)._1

  /** Instrumented twin returning (labels, rounds, checkpoints): every
    * round's edge list is localCheckpoint'ed (lineage stays ONE round deep
    * — without it the plan doubles per round and planning time, not data,
    * becomes the bottleneck at scale, guide §3.3). Spec-guarded so the
    * cadence cannot silently regress (r18 verdict #8). */
  private[graft] def connectedComponentsInstrumented(
      pairs: DataFrame): (DataFrame, Int, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    var checkpoints = 0
    def ckpt(df: DataFrame): DataFrame = {
      checkpoints += 1
      df.localCheckpoint(eager = true)
    }
    var edges = ckpt(pairs.toDF("u", "v")
      .filter($"u" =!= $"v").distinct())

    def sym(e: DataFrame): DataFrame =
      e.union(e.select($"v".as("u"), $"u".as("v")))
    /** min(N(u) ∪ {u}) per node. */
    def minn(e: DataFrame): DataFrame =
      sym(e).groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
    def largeStar(e: DataFrame): DataFrame =
      sym(e).join(minn(e), "u").filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v").distinct()
    def smallStar(e: DataFrame): DataFrame = {
      val withM = sym(e).join(minn(e), "u")
      withM.filter($"v" <= $"u").select($"v".as("u"), $"m".as("v"))
        .union(withM.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v").distinct()
    }
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(hash($"u", $"v").cast("long")), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      val next = ckpt(smallStar(largeStar(edges)))
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      edges = next
      rounds += 1
    }
    // at the fixpoint every edge points node → its component minimum
    (sym(edges).groupBy($"u".as("node")).agg(min($"v").as("label"))
      .withColumn("label", least($"label", $"node")), rounds, checkpoints)
  }

  def q_dedup_clusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = q_dedup_ngram(s, dir).select($"doc_a", $"doc_b")
    val labels = connectedComponents(pairs)
      .select($"node".as("doc_id"), $"label".as("lbl"))
    val all = docs(s, dir).select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"lbl", $"doc_id"))
    all.select($"doc_id", $"cluster_id",
        count(lit(1)).over(Window.partitionBy($"cluster_id")).as("n_members"))
      .orderBy($"doc_id")
  }
  val qDedupClustersSql: String = {
    // the ngram pair CTEs, re-used verbatim, then transitive closure
    val pairBody = qDedupNgramSql
      .substring(qDedupNgramSql.indexOf("WITH ") + 5, qDedupNgramSql.indexOf("SELECT doc_a, doc_b,"))
    s"""WITH RECURSIVE $pairBody,
       p2 AS (
         SELECT doc_a, doc_b
         FROM pairs
         JOIN sizes sa ON doc_a = sa.doc_id
         JOIN sizes sb ON doc_b = sb.doc_id
         WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8),
       edges AS (
         SELECT doc_a AS u, doc_b AS v FROM p2
         UNION SELECT doc_b, doc_a FROM p2),
       reach(node, label) AS (
         SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         UNION
         SELECT e.v, r.label FROM reach r JOIN edges e ON r.node = e.u),
       lab AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node),
       assigned AS (
         SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster_id
         FROM documents d LEFT JOIN lab l ON d.doc_id = l.node)
       SELECT doc_id, cluster_id,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
       FROM assigned ORDER BY doc_id"""
  }

  /** INCREMENTAL dedup: today's BATCH against a persisted, BUCKETED
    * historical signature index — the daily-crawl-vs-corpus operation a
    * training-data team runs at 100 TB (reference analogue: hive bucketed
    * map-side joins, plugin/trino-hive/.../HiveBucketing.java — the index
    * is laid out once so every daily probe joins WITHOUT shuffling it).
    *
    * Nightly job (here: the build step): corpus minhash signatures land in
    * TWO bucketed CoW tables —
    *  - `buckets(bucket, doc_id)` bucketed by `bucket` (one combined
    *    xxhash64(band, band-key) LSH key; collisions across bands only ADD
    *    candidates, which exact rescoring then filters — never lose pairs),
    *  - `docs(doc_id, shs)` bucketed by `doc_id` (the rescore side).
    * Daily job: signature the batch, explode its band buckets, join the
    * bucket index on `bucket` — the index scan reports
    * HashPartitioning(bucket, n) so ONLY the (small) batch side shuffles —
    * then dedup-distinct the candidate pairs and rescore exact Jaccard
    * against `docs`, whose scan likewise joins exchange-free on doc_id.
    * PlanShapeSpec asserts no ShuffleExchange sits above either index scan.
    *
    * At 100 TB: the corpus index is built once and mutated incrementally
    * (CoW INSERT of each day's accepted docs); every probe moves only
    * |batch|·bands rows plus the candidate pairs — the corpus itself never
    * re-shuffles. The oracle is the exact cross-split n-gram Jaccard SQL
    * (same recall argument as q_dedup_minhash: 16 bands × 4 rows misses a
    * true-0.8 pair with p ≈ 2·10⁻⁴; fixtures verified exhaustively). */
  def q_dedup_incremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 64; val bands = 16; val r = 4
    val all = docs(s, dir)
    val corpus = all.filter($"doc_id" % 5 =!= 0)
    val batch = all.filter($"doc_id" % 5 === 0)
    // fused kernel (r19), materialized as the struct column so the kernel
    // provably runs once per row — same bit-identity argument as
    // q_dedup_minhash (ext.MinHashShinglesAndSig scaladoc)
    def withSig(df: DataFrame): DataFrame = materialized(
      df.select($"doc_id", minhashShinglesSig(tokens($"text"), k).as("ss")))
      .select($"doc_id", $"ss.shs".as("shs"), $"ss.sig".as("sig"))
    def bandBuckets(df: DataFrame): DataFrame = df
      .select($"doc_id", posexplode(minhashBands($"sig", bands, r)).as(Seq("band", "bkey")))
      .select($"doc_id", xxhash64($"band", $"bkey").as("bucket"))

    // ---- index build (idempotent per invocation: fresh root, like the
    // DROP TABLE IF EXISTS convention of the warehouse oracles). The root is
    // suffixed with the Spark application id so concurrent sessions on one
    // machine never race each other's rm-recreate (ADVICE r16).
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_dedup_idx_${s.sparkContext.applicationId}").toString
    def rmRec(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val it = java.nio.file.Files.list(p).iterator()
        while (it.hasNext) rmRec(it.next())
      }
      java.nio.file.Files.deleteIfExists(p)
      ()
    }
    rmRec(java.nio.file.Paths.get(root))
    val corpusSig = withSig(corpus) // materialized inside (struct column)
    val idxBuckets = graft.catalog.CowTable.create(s, s"$root/buckets",
      bandBuckets(corpusSig),
      bucketBy = Seq("bucket"), bucketCount = 8, sortedBy = Seq("bucket"))
    val idxDocs = graft.catalog.CowTable.create(s, s"$root/docs",
      corpusSig.select($"doc_id", $"shs"),
      bucketBy = Seq("doc_id"), bucketCount = 8, sortedBy = Seq("doc_id"))

    // ---- daily probe
    val batchSig = withSig(batch) // materialized inside (struct column)
    val cand = bandBuckets(batchSig).select($"bucket", $"doc_id".as("doc_a"))
      .join(idxBuckets.read().select($"bucket", $"doc_id".as("doc_b")), "bucket")
      .select($"doc_a", $"doc_b")
      .distinct() // a near-dup pair collides in many bands — score once
    cand
      .join(idxDocs.read().select($"doc_id".as("doc_b"), $"shs".as("shs_b")), "doc_b")
      .join(batchSig.select($"doc_id".as("doc_a"), $"shs".as("shs_a")), "doc_a")
      .withColumn("inter", size(array_intersect($"shs_a", $"shs_b")).cast("long"))
      .withColumn("jaccard", $"inter".cast("double") /
        (size($"shs_a") + size($"shs_b") - $"inter"))
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }
  val qDedupIncrementalSql: String =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       sh AS (
         SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(w) >= 3
                THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
                ELSE [list_aggregate(w, 'string_agg', ' ')] END)) AS s
         FROM toks),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         FROM sh a JOIN sh b ON a.s = b.s
         WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
         GROUP BY 1, 2)
       SELECT doc_a, doc_b,
         round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
       FROM pairs
       JOIN sizes sa ON doc_a = sa.doc_id
       JOIN sizes sb ON doc_b = sb.doc_id
       WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
       ORDER BY doc_a, doc_b"""

  val queries: Map[String, Q] = Map(
    "q_dedup_clusters" -> q_dedup_clusters _,
    "q_dedup_incremental" -> q_dedup_incremental _,
    "q_dedup_exact" -> q_dedup_exact _,
    "q_dedup_ngram" -> q_dedup_ngram _,
    "q_dedup_minhash" -> q_dedup_minhash _,
    "q_dedup_simhash" -> q_dedup_simhash _)

  val oracles: Map[String, String] = Map(
    "q_dedup_clusters" -> qDedupClustersSql,
    // exact cross-split pair set, reached via the bucketed LSH index probe
    "q_dedup_incremental" -> qDedupIncrementalSql,
    "q_dedup_exact" -> qDedupExactSql,
    "q_dedup_ngram" -> qDedupNgramSql,
    // same exact pair set, reached via LSH candidates + exact verify
    "q_dedup_minhash" -> qDedupNgramSql,
    "q_dedup_simhash" -> qDedupSimhashSql)
}
