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

  test("sign-LSH pairs are a subset of exact all-pairs; recall pinned") {
    val lsh = Similarity.cosinePairs(vecs, tau = 0.2, dim = 64, nPlanes = 8)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val exact = vecs.as("x").join(vecs.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", Similarity.cosine(col("x.embedding"), col("y.embedding")))
      .where(col("cos") >= 0.2)
      .select(col("x.vec_id"), col("y.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "blocking must never invent pairs")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    info(f"sign-LSH (8 planes, all-equal) recall at tau=0.2: ${lsh.size}/${exact.size} = $recall%.4f")
    // identical-8-bit-sign blocking is a harsh block for moderate cosine
    // (measured 105/6903 = 0.0152 on the fixture; the tau=0.2 pair set is
    // dominated by far-from-duplicate pairs that near-dup blocking is not
    // meant to keep) — the floor documents the measured trade
    assert(recall > 0.01, "blocking recall collapsed below the pinned floor")
  }

  test("sign margins: no fixture dot is near the 0 cutoff") {
    val rows = vecs.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val margins = for {
      d <- 0 until 8
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
