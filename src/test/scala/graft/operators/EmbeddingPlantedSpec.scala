package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Banded sign-LSH at its DESIGN POINT: near-duplicate detection (high τ).
  * The catalog query runs at the fixture's loose τ = 0.2 (where sub-1
  * recall is the documented LSH trade); real dedup runs at τ ≈ 0.9+, where
  * a near-dup pair's embeddings differ by a small perturbation and the
  * probability a random hyperplane separates them is θ/π ≈ small. This
  * spec plants true near-dup pairs among random vectors and asserts the
  * banded blocker finds ALL of them — the property the operator exists
  * for — plus the hot-bucket cap's candidate bound on a degenerate
  * (all-identical-direction) corpus. */
class EmbeddingPlantedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  private val dim = 64

  /** Deterministic pseudo-random unit-free vector k (splitmix64-driven,
    * same generator family as the fixtures). */
  private def vec(k: Long): Array[Float] =
    Array.tabulate(dim) { c =>
      val h = graft.core.SplitMix64.next(k * 2654435761L + c)
      ((java.lang.Long.remainderUnsigned(h, 2001L) - 1000L).toFloat / 1000f)
    }

  /** Small deterministic perturbation of v (≈2% relative) — cosine with
    * the original stays ≥ 0.99. */
  private def nearDup(v: Array[Float], salt: Long): Array[Float] =
    v.zipWithIndex.map { case (x, c) =>
      val h = graft.core.SplitMix64.next(salt * 40503L + c)
      x + ((java.lang.Long.remainderUnsigned(h, 41L) - 20L).toFloat / 1000f)
    }

  test("planted near-dups (cos >= 0.9) are all recovered by banded blocking") {
    import spark.implicits._
    val base = (0L until 400L).map(k => (k, vec(k)))
    // 30 planted near-dup partners: ids 1000+k duplicate vector k
    val planted = (0L until 30L).map(k => (1000L + k, nearDup(vec(k), k)))
    val vecs = (base ++ planted).toDF("vec_id", "embedding")

    val pairs = Similarity.cosinePairs(vecs, tau = 0.9, dim = dim)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet

    val expected = (0L until 30L).map(k => (k, 1000L + k)).toSet
    // every planted pair must be found (banded recall at the design point);
    // random 64-d pairs essentially never reach cos 0.9, so equality also
    // checks no false positives survive the exact verify
    assert(expected.subsetOf(pairs),
      s"missed planted near-dups: ${expected -- pairs}")
    assert(pairs == expected, s"unexpected extra pairs: ${pairs -- expected}")
  }

  test("hot-bucket cap bounds candidates on a degenerate corpus") {
    import spark.implicits._
    // 2000 copies of the SAME direction (scaled) — every band key collides,
    // an uncapped blocker would generate 2000*1999/2 ≈ 2M candidate pairs
    val v0 = vec(7L)
    val clones = (0L until 2000L).map { k =>
      (k, v0.map(x => x * (1f + (k % 7L).toFloat / 100f)))
    }
    val vecs = clones.toDF("vec_id", "embedding")
    val capped = Similarity.cosinePairs(vecs, tau = 0.9, dim = dim,
      bucketCap = 100)
    // all buckets exceed the cap → no candidates at all (bounded-recall
    // trade, same semantics as Dedup's DF caps)
    assert(capped.count() === 0L)
    // sanity: with the cap lifted the same corpus yields quadratic pairs
    val uncapped = Similarity.cosinePairs(vecs.limit(60), tau = 0.9, dim = dim,
      bucketCap = Int.MaxValue)
    assert(uncapped.count() === 60L * 59L / 2L)
  }

  test("crossCosinePairs finds every planted paraphrase of an eval vector (semantic decontamination)") {
    import spark.implicits._
    // eval set: 10 vectors; corpus: 300 random + a perturbed copy of each
    // eval vector (the paraphrased-leak case n-gram decontamination misses)
    val evalSet = (0L until 10L).map(k => (k, vec(1000L + k)))
      .toDF("eval_id", "embedding")
    val corpus = ((0L until 300L).map(k => (2000L + k, vec(k))) ++
      (0L until 10L).map(k => (3000L + k, nearDup(vec(1000L + k), salt = k))))
      .toDF("vec_id", "embedding")
    val hits = Similarity.crossCosinePairs(corpus, evalSet, tau = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { k =>
      assert(hits.contains((3000L + k, k)), s"planted leak of eval $k not found")
    }
    // no random vector should sit at cosine >= 0.9 of an eval vector
    assert(hits.forall(_._1 >= 3000L), s"false positives: $hits")
    spark.catalog.clearCache()
  }
}
