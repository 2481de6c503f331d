package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale demonstration for the dedup guards on a corpus shaped like real
  * crawl text: heavy exact duplication (copied pages) plus a boilerplate
  * phrase shared across a quarter of all DISTINCT documents (cookie
  * banners, legal footers). Shows, with measured counts and walls:
  *
  *   1. the duplicate-mass probe flips the exact-dup collapse ON for this
  *      corpus (it stays OFF on the low-dup sf fixtures);
  *   2. the blocking-key DF cap cuts the boilerplate-shingle candidate
  *      quadratic (measured candidate counts capped vs uncapped);
  *   3. end-to-end ngramJaccard wall at corpus scale.
  *
  * Usage: runMain graft.tools.DedupBench [nDocs]  (default 100000) */
object DedupBench {

  /** Deterministic corpus: ids in duplicate groups — per 125-id block, the
    * 50 ids with id%5<2 (40% of ids) share the block leader's text, so they
    * collapse into one 50-copy group per block — 10 content words derived
    * from the group leader, and a 5-token boilerplate footer on every 4th
    * group. */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val leader = when(col("id") % 5 < 2, col("id") - col("id") % 125)
      .otherwise(col("id"))
    val words = (0 until 10).map(k =>
      concat(lit(s"w$k"), ((col("leader") * (2 * k + 3) + k) % 99991).cast("string")))
    val text = concat_ws(" ", words: _*)
    spark.range(0, n).select(col("id").as("doc_id"), leader.as("leader"))
      .select(col("doc_id"),
        when(col("leader") % 4 === 0,
          concat(text, lit(" all rights reserved contact us today")))
          .otherwise(text).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = corpus(spark, n).persist()
    val nDocs = docs.count()

    val (mass, total) = Dedup.dupPairMass(docs)
    val collapses = mass > Dedup.CollapsePairsPerDoc * total

    // candidate counts, capped vs uncapped, on a bounded slice (the
    // uncapped count is the quadratic being demonstrated — size it so the
    // demonstration itself terminates)
    val slice = docs.where(col("doc_id") < math.min(n, 20000L))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (candUncapped: Long, tUncapped: Double) =
      timed(Dedup.ngramCandidates(slice, 3, Int.MaxValue).count())
    val (candCapped: Long, tCapped: Double) =
      timed(Dedup.ngramCandidates(slice, 3, Dedup.ShingleDfCap).count())

    // end-to-end blocked+verified pairs at full size, default guards
    val (nPairs: Long, tFull: Double) =
      timed(Dedup.ngramJaccard(docs, w = 3, minJaccard = 0.5).count())

    println(f"""{"n_docs":$nDocs,"dup_pair_mass":$mass%.0f,"collapse_engaged":$collapses,""" +
      f""""cand_uncapped_20k":$candUncapped,"cand_capped_20k":$candCapped,""" +
      f""""cand_cut":${candUncapped.toDouble / math.max(candCapped, 1)}%.1f,""" +
      f""""wall_uncapped_20k_sec":$tUncapped%.2f,"wall_capped_20k_sec":$tCapped%.2f,""" +
      f""""ngram_pairs_full":$nPairs,"wall_full_sec":$tFull%.2f}""")
    spark.stop()
  }
}
