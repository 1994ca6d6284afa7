package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the two letter-marginal bench entries (r16 verdict #2):
  * q_dedup_ngram and q_text_contamination. Baseline runs FIRST and LAST
  * (JIT order bias — trust the last); each variant is prewarmed then
  * min-of-4. Also times the judge-prescribed FLOOR skeletons (scan + same
  * job/sort shape, no real work) for a possible measured retirement. */
object WeakBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shuffle = math.max(8, math.min(cpus.toInt, (inputBytes / (8L << 20)).toInt))
    val spark = graft.engine.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = shuffle)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions._

    def docs: DataFrame = graft.sources.Tables.load(spark, sfDir, "documents")

    def timed(name: String, mk: () => DataFrame, n: Int = 4): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // prewarm
      val best = (1 to n).map(_ => run()).min
      println(f"[weak] $name%-28s $best%.3f s")
      best
    }

    // ---------------- contamination variants
    val Gram = 8
    def benchSetV0(): Array[Long] = docs.filter($"doc_id" % 50 === 0)
      .select(explode(shingleHashSeq(split($"text", " "), Gram)).as("sh"))
      .distinct().as[Long].collect().sorted
    def benchSetV1(): Array[Long] = docs.filter($"doc_id" % 50 === 0)
      .select(shingleHashSeq(split($"text", " "), Gram).as("shs"))
      .as[Seq[Long]].collect().iterator.flatten.toArray.distinct.sorted

    def contamV0(): DataFrame = {
      val bs = benchSetV0()
      docs.filter($"doc_id" % 50 =!= 0)
        .select($"doc_id",
          arraySetCountDistinct(shingleHashSeq(split($"text", " "), Gram), bs).as("hit_shingles"))
        .withColumn("contaminated", $"hit_shingles" > 0)
        .orderBy($"doc_id")
    }
    def contamV1(): DataFrame = { // driver-side bench distinct
      val bs = benchSetV1()
      docs.filter($"doc_id" % 50 =!= 0)
        .select($"doc_id",
          arraySetCountDistinct(shingleHashSeq(split($"text", " "), Gram), bs).as("hit_shingles"))
        .withColumn("contaminated", $"hit_shingles" > 0)
        .orderBy($"doc_id")
    }
    def contamV2(): DataFrame = { // + persist narrow projection before sort
      val bs = benchSetV1()
      val proj = graft.operators.materialized(
        docs.filter($"doc_id" % 50 =!= 0)
          .select($"doc_id",
            arraySetCountDistinct(shingleHashSeq(split($"text", " "), Gram), bs).as("hit_shingles")))
      proj.withColumn("contaminated", $"hit_shingles" > 0).orderBy($"doc_id")
    }
    def contamSkeleton(): DataFrame = {
      // judge floor: bench-slice scan+collect, corpus scan + trivial in-row
      // column + the same global sort — no shingle hashing anywhere
      val k = docs.filter($"doc_id" % 50 === 0).select($"doc_id").as[Long].collect()
      docs.filter($"doc_id" % 50 =!= 0)
        .select($"doc_id", (length($"text") % lit(k.length + 1)).as("hit_shingles"))
        .withColumn("contaminated", $"hit_shingles" > 0)
        .orderBy($"doc_id")
    }

    // ---------------- ngram variants
    def ngramV0(): DataFrame = graft.operators.Dedup.q_dedup_ngram(spark, sfDir)
    def ngramV1(): DataFrame = {
      val d = graft.operators.materialized(
        docs.select($"doc_id", shingleHashes3(tokens($"text")).as("shs")))
      def sh = d.select($"doc_id", explode($"shs").as("sh"))
      val commonArr: Array[Long] = {
        val nd = d.agg(count(lit(1)).as("ndocs"))
        sh.groupBy($"sh").agg(count(lit(1)).as("dfreq"))
          .crossJoin(broadcast(nd))
          .filter($"dfreq" > greatest(lit(16.0), lit(0.02) * $"ndocs"))
          .select($"sh").as[Long].collect().sorted
      }
      def index = sh.filter(!longInSet($"sh", commonArr))
      // in-bucket pair generation: ONE exchange on sh, ordered pairs built
      // in-row from each bucket's (bounded: dfreq <= cutoff) doc list
      def combos(ds: Column): Column = {
        val sorted = array_sort(ds)
        flatten(transform(sorted, (x, i) =>
          transform(slice(sorted, i.plus(lit(2)), size(sorted)),
            y => struct(x.as("doc_a"), y.as("doc_b")))))
      }
      val pairsRare = index.groupBy($"sh").agg(collect_list($"doc_id").as("ds"))
        .filter(size($"ds") >= 2)
        .select(explode(combos($"ds")).as("p"))
        .select($"p.doc_a".as("doc_a"), $"p.doc_b".as("doc_b"))
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter_rare"))
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
        .orderBy($"doc_a", $"doc_b")
    }
    def ngramV2(): DataFrame = {
      // V1 + tiny-result presentation sort without a range-sampling pass
      val base = ngramV1()
      base.repartition(1).sortWithinPartitions($"doc_a", $"doc_b")
    }

    // correctness cross-check before timing anything
    val v0c = contamV0().collect().map(_.toString).sorted
    require(contamV1().collect().map(_.toString).sorted.sameElements(v0c), "contamV1 mismatch")
    require(contamV2().collect().map(_.toString).sorted.sameElements(v0c), "contamV2 mismatch")
    val n0 = ngramV0().collect().map(_.toString).sorted
    require(ngramV1().collect().map(_.toString).sorted.sameElements(n0), "ngramV1 mismatch")
    require(ngramV2().collect().map(_.toString).sorted.sameElements(n0), "ngramV2 mismatch")
    println(s"[weak] correctness OK (contam ${v0c.length} rows, ngram ${n0.length} rows)")

    timed("contam V0 (first)", () => contamV0())
    timed("contam V1 driver-set", () => contamV1())
    timed("contam V2 +persist", () => contamV2())
    timed("contam skeleton", () => contamSkeleton())
    timed("ngram V0 (first)", () => ngramV0())
    timed("ngram V1 in-bucket", () => ngramV1())
    timed("ngram V2 +sort1", () => ngramV2())
    timed("ngram V0 (last)", () => ngramV0())
    timed("contam V0 (last)", () => contamV0())
    spark.stop()
  }
}
