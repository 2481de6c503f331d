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

  test("degenerate key skew switches to the wide cap form, output-identical") {
    import spark.implicits._
    // one shingle ("all rights reserved") planted on 50% of 2000 DISTINCT
    // docs — the hottest-key window task would sort all those rows alone;
    // the sampled probe must detect it and pick the wide 3-exchange form
    val docs = spark.range(0, 2000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0,
          concat(lit("all rights reserved body"), col("id").cast("string"),
            lit(" tail"), col("id").cast("string")))
          .otherwise(concat(lit("unique"), col("id").cast("string"),
            lit(" text"), col("id").cast("string"), lit(" here"),
            col("id").cast("string"))).as("text"))
    val sh = spark.range(0, 2000).select(col("id").as("doc_id"),
      md5(col("id").cast("string")).as("th"),
      when(col("id") % 2 === 0, lit("hotkey")).otherwise(concat(lit("k"), col("id"))).as("sh"))

    // probe detects the planted dominance (~1000 rows on one key)
    val est = Dedup.approxMaxKeyRows(sh, Seq("sh"))
    assert(est > 250 && est < 4000, s"estimate $est should be ~1000")

    // wide and window cap forms agree exactly on the capped candidates
    val capped = Dedup.ngramCandidates(docs, w = 3, dfCap = Dedup.ShingleDfCap)
    val cappedWide = Dedup.ngramCandidates(docs, w = 3, dfCap = Dedup.ShingleDfCap,
      rowLimit = 100L)
    assert(collect(capped) == collect(cappedWide))

    // the wide plan must not contain a Window node (no single-task sort of
    // the hot key) and must broadcast the hot-key side
    val widePlan = cappedWide.queryExecution.executedPlan.toString
    assert(!widePlan.contains("Window"), "wide form must avoid the window sort")
    assert(widePlan.contains("BroadcastHashJoin") || widePlan.contains("Broadcast"),
      "hot keys must be broadcast, not shuffled")
  }

  test("cosinePairs: degenerate bucket skew takes the wide form, output-identical") {
    import spark.implicits._
    // 2000 near-identical vectors share every band bucket (> BandBucketCap
    // → dropped by the cap) + 8 vectors of a different sign pattern that
    // stay under the cap and yield real verified pairs
    def vecs(n0: Long, n1: Long, flip: Boolean) = spark.range(n0, n1)
      .select(col("id").as("vec_id"),
        array((0 until 8).map(c =>
          lit(if (flip && c == 0) -1.0 else 1.0) + col("id") * lit(1e-9) * (c + 1)): _*)
          .cast("array<float>").as("embedding"))
    val all = vecs(0, 2000, flip = false).unionByName(vecs(2000, 2008, flip = true))
    val wide = Similarity.cosinePairs(all, tau = 0.5, dim = 8, hotKeyRowLimit = 50L)
    val window = Similarity.cosinePairs(all, tau = 0.5, dim = 8,
      hotKeyRowLimit = Long.MaxValue)
    val (rw, rn) = (collect(wide), collect(window))
    assert(rw.nonEmpty, "cool cluster must produce pairs")
    assert(rw == rn)
    assert(!wide.queryExecution.executedPlan.toString.contains("Window"),
      "wide form must avoid the window sort")
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
