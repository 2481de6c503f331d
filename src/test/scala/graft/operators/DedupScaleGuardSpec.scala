package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two dedup scale guards:
  *
  *  - the collapsed (exact-dup collapse + expand) and uncollapsed pipelines
  *    are output-IDENTICAL on a dup-heavy corpus, so the adaptive probe can
  *    pick either purely on cost;
  *  - a blocking key shared by many distinct documents (the boilerplate-
  *    phrase scenario: one shingle in 10³ docs → 10⁶/2 candidates) is
  *    dropped by the document-frequency cap, bounding candidate generation.
  */
class DedupScaleGuardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  /** 40 base docs + 3 copies each of two texts + a near-dup — enough dup
    * mass that both code paths have real work to agree on. */
  private def corpus: DataFrame = {
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").where(col("doc_id") < 40)
    val dups = base.where(col("doc_id") < 2)
      .crossJoin(spark.range(1, 4).toDF("k"))
      .select((col("doc_id") + col("k") * 10000).as("doc_id"), col("text"))
    val near = base.where(col("doc_id") === 5)
      .select(lit(90000L).as("doc_id"), concat(col("text"), lit(" tail")).as("text"))
    base.unionByName(dups).unionByName(near)
  }

  private def collect(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("ngramJaccard: collapsed and uncollapsed paths agree exactly") {
    val a = Dedup.ngramJaccard(corpus, w = 3, minJaccard = 0.3, collapseThreshold = -1)
    val b = Dedup.ngramJaccard(corpus, w = 3, minJaccard = 0.3,
      collapseThreshold = Double.PositiveInfinity)
    val (ra, rb) = (collect(a), collect(b))
    assert(ra.nonEmpty, "corpus must produce pairs")
    assert(ra == rb)
  }

  test("simhashPairs: collapsed and uncollapsed paths agree exactly") {
    val a = Dedup.simhashPairs(corpus, maxHamming = 8, collapseThreshold = -1)
    val b = Dedup.simhashPairs(corpus, maxHamming = 8,
      collapseThreshold = Double.PositiveInfinity)
    val (ra, rb) = (collect(a), collect(b))
    assert(ra.nonEmpty)
    assert(ra == rb)
  }

  test("minhashLsh: collapsed and uncollapsed paths agree exactly") {
    val a = Dedup.minhashLsh(corpus, minJaccard = 0.4, collapseThreshold = -1)
    val b = Dedup.minhashLsh(corpus, minJaccard = 0.4,
      collapseThreshold = Double.PositiveInfinity)
    val (ra, rb) = (collect(a), collect(b))
    assert(ra.nonEmpty)
    assert(ra == rb)
  }

  test("dupPairMass probe measures the exact duplicate candidate mass") {
    // 2 groups of 4 copies: mass = 2 * 4*3 = 24; N = 40 + 6 + 1
    val (mass, n) = Dedup.dupPairMass(corpus)
    assert(mass == 24.0)
    assert(n == 47L)
  }

  test("hot-shingle DF cap bounds candidate generation") {
    import spark.implicits._
    // 1000 DISTINCT docs all sharing one 3-gram ("boilerplate legal footer")
    // plus unique tails: exact-dup collapse cannot help, only the DF cap can.
    val docs = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        concat(lit("boilerplate legal footer unique"),
          col("id").cast("string"), lit(" tail"), col("id").cast("string")).as("text"))
    // uncapped: every pair shares the hot shingle → n(n-1)/2 candidates
    assert(Dedup.ngramCandidates(docs, w = 3, dfCap = Int.MaxValue).count() == 1000L * 999 / 2)
    // capped: the hot key is dropped; unique-tail shingles produce nothing
    assert(Dedup.ngramCandidates(docs, w = 3, dfCap = Dedup.ShingleDfCap).count() == 0)
    // and the full operator still terminates with an empty (not wrong) result
    assert(Dedup.ngramJaccard(docs, w = 3, minJaccard = 0.9).count() == 0)
  }
}
