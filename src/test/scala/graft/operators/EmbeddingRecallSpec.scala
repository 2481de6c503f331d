package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall gate for the sign-LSH blocked embedding near-dup path
  * (Similarity.cosinePairs): the catalog query and its DuckDB oracle embed
  * the SAME hyperplanes, so the cross-engine hash check cannot catch recall
  * loss in candidate generation — this spec can. It compares the blocked
  * pairs against an exact all-pairs ground truth (test-only cross join at
  * sf0.001 scale) and pins a recall floor, and it verifies the sign
  * blocking is FP-robust: no fixture dot product sits within epsilon of the
  * sign cutoff 0, so a reassociated evaluation (e.g. DuckDB's
  * list_dot_product vs Spark's sequential fold) cannot flip a block bit. */
class EmbeddingRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  private lazy val vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  test("banded sign-LSH pairs are a subset of exact all-pairs; recall pinned") {
    val lsh = Similarity.cosinePairs(vecs, tau = 0.2, dim = 64)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val exact = vecs.as("x").join(vecs.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", Similarity.cosine(col("x.embedding"), col("y.embedding")))
      .where(col("cos") >= 0.2)
      .select(col("x.vec_id"), col("y.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "blocking must never invent pairs")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    info(f"banded sign-LSH (6 bands of 4) recall at tau=0.2: ${lsh.size}/${exact.size} = $recall%.4f")
    // OR-of-6-bands at width 4: measured ≈0.4-0.5 at tau=0.2 (the tau=0.2
    // pair set is dominated by far-from-duplicate pairs — p(bit agrees)
    // ≈ 0.565 at cos 0.2 — so sub-1 recall is the designed LSH trade; the
    // old all-24-bits-equal form measured 0.015 here)
    assert(recall > 0.3, "banded blocking recall collapsed below the pinned floor")

    // the single-band form must be a subset of the banded form (bands only
    // ADD candidate routes) — and stay above ITS measured floor
    val single = Similarity.cosinePairs(vecs, tau = 0.2, dim = 64,
        nPlanes = 4, nBands = 1)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(single.subsetOf(lsh), "band 0 candidates must survive banding")
  }

  // The sf fixtures are near-uniform, where Lloyd refinement measurably
  // HURTS (COVERAGE.md records the negative result). This fixture is the
  // other regime: 8 planted Gaussian clusters, rows ORDERED BY CLUSTER —
  // a crawl grouped by source — so the sampled codebook (first 16 vec_ids)
  // seeds every centroid inside cluster 0, the worst case for IVF. One
  // Lloyd round must recover the planted structure.
  test("clustered corpus: one Lloyd round recovers IVF recall from the collapsed sampled init") {
    import spark.implicits._
    val rng = new scala.util.Random(101)
    val dim = 64; val nClusters = 8; val per = 250
    val centers = Array.fill(nClusters, dim)(rng.nextGaussian())
    val rows = for (c <- 0 until nClusters; j <- 0 until per) yield {
      val emb = Array.tabulate(dim)(d =>
        (centers(c)(d) + 0.35 * rng.nextGaussian()).toFloat)
      ((c * per + j).toLong, emb)
    }
    val v = rows.toDF("vec_id", "embedding")
    // one query per cluster, away from the codebook sample ids
    val q = v.where(col("vec_id") % per === 37)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteTopK(v, q, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap

    def recallAt(lloydRounds: Int, nProbe: Int): Double = {
      val got = Similarity.ivfTopK(v, q, 10, dim, nCentroids = 16,
          nProbe = nProbe, lloydRounds = lloydRounds)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      // keys is a Set — map to a Seq first, or equal per-query recalls
      // collapse before the sum (Set[Double] dedup)
      exact.keys.toSeq.map(k =>
        (got.getOrElse(k, Set.empty) intersect exact(k)).size / 10.0)
        .sum / exact.size
    }

    val r0 = recallAt(0, 1); val r1 = recallAt(1, 1)
    val r0p4 = recallAt(0, 4); val r1p4 = recallAt(1, 4)
    info(f"recall@10 nProbe=1: init=$r0%.3f lloyd1=$r1%.3f; nProbe=4: init=$r0p4%.3f lloyd1=$r1p4%.3f")
    // refined centroids sit at the planted means → each cluster concentrates
    // into one bucket; a single probe must then be near-perfect, while the
    // collapsed init leaves cluster members scattered across buckets
    assert(r1 > r0 + 0.1, s"Lloyd round did not lift nProbe=1 recall: $r0 -> $r1")
    // not 1.0: with 16 centroids over 8 clusters, two refined centroids can
    // legitimately share one planted cluster and split it at nProbe=1
    assert(r1 >= 0.8, s"refined single-probe recall collapsed: $r1")
    assert(r1p4 >= 0.95, s"refined 4-probe recall should be near-exact, got $r1p4")

    // semDedup on the same fixture: refinement must not invent duplicates —
    // τ=0.97 is above the intra-cluster cosine, so nothing is a dup either way
    val sd = Similarity.semDedup(v, tau = 0.97, nCentroids = 16, lloydRounds = 1)
    assert(sd.where(col("is_dup") === 1).count() == 0)
    assert(sd.count() == nClusters.toLong * per)
  }

  test("sign margins: no fixture dot is near the 0 cutoff") {
    val rows = vecs.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val margins = for {
      d <- 0 until 24
      dir = Similarity.direction(100 + d, 64).toArray
      v <- rows
    } yield math.abs(v.zip(dir).map { case (a, b) => a * b }.sum)
    val minMargin = margins.min
    info(f"min |dot(v, plane)| over ${margins.size} pairs: $minMargin%.3e")
    // double reassociation perturbs a 64-term dot by ~1e-13 relative; a
    // margin this much wider means no engine pair can disagree on a sign
    assert(minMargin > 1e-6)
  }
}
