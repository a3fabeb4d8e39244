package graft

import org.apache.spark.sql.functions._

/** Quantified recall of the approximate retrieval paths against the exact
  * baselines that sit next to them in SparkEntry — the approx-aggregate
  * error-bound discipline (PipelineDB documents rsd for its HLL CVs)
  * applied to ANN and dedup candidate generation. A user tuning bucket
  * bits / band counts reads the measured recall off these assertions.
  *
  * sf0.01 (500 docs / 500 vectors): large enough for stable recall, small
  * enough for an exact all-pairs ground truth in-test. The embeddings are
  * RANDOM (TESTDATA.md), the hardest case for locality-sensitive buckets —
  * production corpora cluster, so these floors are conservative shapes,
  * not marketing numbers. The floors assert on the DETERMINISTIC output
  * (fixed data, fixed hash parameters — reruns are bit-identical), so any
  * change to bucket/band geometry that degrades recall trips them.
  */
class RecallSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def ids(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf001)
      .select(col("vec_id").cast("string")).collect().map(_.getString(0)).toSeq

  test("ANN recall@10: LSH sign-bucket and IVF posting-list vs exact top-k") {
    val exact = ids("q_similarity_topk").toSet
    assert(exact.size === 10)
    val lsh = ids("q_similarity_lsh").toSet
    val ivf = ids("q_similarity_ivf").toSet
    val rLsh = (lsh & exact).size / 10.0
    val rIvf = (ivf & exact).size / 10.0
    // Scan cut = what recall is traded for; report it with the recall.
    val nLsh = lsh.size; val nIvf = ivf.size
    info(f"recall@10 lsh=$rLsh%.2f (scanned ~${nLsh} of 499) " +
         f"ivf=$rIvf%.2f (scanned ~${nIvf} of 499)")
    // Single-probe 8-bit sign LSH on random 64-d vectors: each top-10
    // neighbor lands in the probe's bucket with prob ≈ (1-θ/π)^8 — near
    // zero by construction at one probe (measured 0.00 here; raising it
    // means multi-probe, not a laxer test). The MEANINGFUL property to
    // pin is that recall loss comes ONLY from bucket pruning, never from
    // misranking: within its candidate bucket, LSH must return exactly
    // the exact-cosine ranking.
    val withB = Tables.embeddings(spark, sf001)
    // the queries' own bucket geometry — asserting with a private copy
    // would keep passing against stale bucketing after a bits change
    import graft.queries.Similarity.bucketOf
    val pb = withB.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb"),
              bucketOf(col("embedding")).as("probe_bucket"))
    val bucketExact = withB
      .withColumn("bucket", bucketOf(col("embedding")))
      .join(broadcast(pb), col("bucket") === col("probe_bucket"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").cast("string").as("v"),
              round(graft.operators.VectorOps.cosine(
                col("embedding"), col("probe_emb")), 4).as("c"))
      .orderBy(col("c").desc, col("v").asc).limit(10)
      .collect().map(_.getString(0)).toSeq
    assert(ids("q_similarity_lsh") === bucketExact,
      "LSH must be exact within its bucket — recall is traded only at " +
        "the bucket-pruning step, never by misranking scanned candidates")
    // Multi-probe (probe bucket + 8 Hamming-1 neighbors, 9/256 of the
    // corpus) exists precisely to lift single-probe recall; it must never
    // be worse, and its candidate set strictly contains single-probe's.
    val multi = ids("q_similarity_lsh_multi").toSet
    val rMulti = (multi & exact).size / 10.0
    info(f"recall@10 lsh_multi=$rMulti%.2f (9 of 256 buckets probed)")
    // Guaranteed, not just likely: a global-top-10 member in the candidate
    // set can be displaced only by vectors ranked above it, of which there
    // are ≤ 9 — so widening the candidate set can never lose a true hit.
    assert(rMulti >= rLsh,
      f"multi-probe recall $rMulti%.2f fell below single-probe $rLsh%.2f")
    // IVF searches the probe's coarse cluster (~1/16 of the corpus):
    // measured 0.90 on this data — nearest-centroid assignment co-locates
    // the probe's true neighbors far better than chance (~0.06 if
    // assignment were broken/random). 0.5 floor catches any regression in
    // the codebook or cluster-assignment logic with huge margin over the
    // broken case.
    assert(rIvf >= 0.5,
      f"IVF recall@10 = $rIvf%.2f — posting-list search lost the probe's " +
        "true neighbors; check the centroid assignment")
  }

  test("minhash band stage recovers >= 75% of exact-Jaccard >= 0.75 pairs") {
    // Ground truth: exact shingle-set Jaccard over ALL pairs (all-pairs is
    // test-only — the operators under test exist precisely to avoid this
    // at scale).
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"),
              array_distinct(call_function("graft_shingles", col("text"))).as("shs"))
      .filter(size(col("shs")) > 0)
    val a = docs.select(col("doc_id").as("da"), col("shs").as("sa"))
    val b = docs.select(col("doc_id").as("db"), col("shs").as("sb"))
    val exact = a.crossJoin(b).filter(col("da") < col("db"))
      .select(col("da"), col("db"),
              (size(array_intersect(col("sa"), col("sb"))).cast("double") /
               (size(col("sa")) + size(col("sb")) -
                size(array_intersect(col("sa"), col("sb"))))).as("j"))
      .filter(col("j") >= 0.75)
      .select(concat_ws("|", col("da"), col("db"))).collect()
      .map(_.getString(0)).toSet
    assert(exact.nonEmpty, "test data lost its near-dup pairs")
    // Candidate set = every pair the band equi-join surfaces (before any
    // est_jaccard threshold) — exactly what downstream rescoring sees.
    val cand = SparkEntry.queries("q_dedup_minhash")(spark, sf001)
      .select(concat_ws("|", col("doc_a"), col("doc_b"))).collect()
      .map(_.getString(0)).toSet
    val recall = (cand & exact).size.toDouble / exact.size
    info(f"minhash band pair-recall = $recall%.2f " +
         f"(${(cand & exact).size}/${exact.size} true pairs banded, " +
         f"${cand.size} candidates vs ${497L * 496 / 2} possible pairs)")
    // Theory for 4 bands × 2 rows at J = 0.75: 1-(1-J²)⁴ ≈ 0.96; the 0.75
    // floor tolerates unlucky shingle draws yet catches any band-geometry
    // regression (dropping to 2 bands halves the expected recall).
    assert(recall >= 0.75,
      f"band-stage recall $recall%.2f below 0.75 — LSH banding is losing " +
        "true near-duplicate pairs before the rescore")
  }
}
