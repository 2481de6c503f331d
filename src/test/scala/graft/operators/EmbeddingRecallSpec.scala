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
