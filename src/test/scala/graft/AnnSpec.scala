package graft

/** ANN quality spec: LSH-bucketed search must (a) only return true corpus
  * vectors, (b) agree with brute force on the similarity values it does return,
  * and (c) achieve non-trivial recall of the exact top-5. */
class AnnSpec extends SparkSpec {

  test("lsh ANN results are a subset of corpus with exact sims") {
    val exact = operators.Similarity.q_sim_cosine_topk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approx = operators.Similarity.q_sim_ann_lsh(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    // wherever ANN returns a pair that exact top-5 also has, sims must match exactly
    approx.foreach { case (key, sim) =>
      exact.get(key).foreach(es => assert(es == sim, s"sim mismatch for $key"))
    }
  }

  test("lsh ANN recalls part of the exact top-5") {
    val exact = operators.Similarity.q_sim_cosine_topk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = operators.Similarity.q_sim_ann_lsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall > 0.05, s"LSH recall suspiciously low: $recall")
  }

  test("ivf ANN returns corpus subsets with exact sims and nontrivial recall") {
    val exact = operators.Similarity.q_sim_cosine_topk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = operators.Similarity.q_sim_ann_ivf(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    ivf.foreach { case (key, sim) =>
      exact.get(key).foreach(es => assert(es == sim, s"sim mismatch for $key"))
    }
    val recall = exact.keySet.intersect(ivf.map(_._1).toSet).size.toDouble / exact.size
    assert(recall > 0.1, s"IVF recall suspiciously low: $recall")
  }

  test("ivf probing all cells reproduces exact brute-force top-k") {
    val exact = operators.Similarity.q_sim_cosine_topk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val full = operators.Similarity.ivfTopK(spark, sfDir, nprobe = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(full == exact)
  }

  test("lsh near-dup is a subset of exact near-dup with measured recall") {
    val exact = operators.Similarity.q_sim_neardup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = operators.Similarity.q_sim_neardup_lsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.subsetOf(exact), s"guarded produced non-exact pairs: ${guarded -- exact}")
    val recall = if (exact.isEmpty) 1.0 else guarded.size.toDouble / exact.size
    info(f"lsh near-dup recall vs exact: $recall%.3f (${guarded.size}/${exact.size})")
    assert(recall >= 0.7, s"recall collapsed: $recall")
  }

  test("df-guarded ngram dedup equals the unguarded exact pair set") {
    // the oracle compare enforces this at sf0.01; re-assert here at sf0.001 so
    // a cutoff regression fails fast locally
    val pairs = operators.Dedup.q_dedup_ngram(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getDouble(2) >= 0.8))
  }

  test("minhash LSH + exact verify reproduces the exact ngram pair set") {
    val exact = operators.Dedup.q_dedup_ngram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val mh = operators.Dedup.q_dedup_minhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(mh == exact, s"LSH candidate generation missed exact pairs: " +
      s"${exact.toSet -- mh.toSet} / spurious: ${mh.toSet -- exact.toSet}")
  }
}
