package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** A/B wall-clock for the dedup family with the skew probe on vs off —
  * quantifies what the adaptive hot-key path costs on a non-degenerate
  * corpus (it must stay ≤5% per the round-3 verdict's acceptance bar).
  * Usage: runMain graft.tools.DedupProfile [sfDir] [rounds]. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, Long => Long)] = Seq(
      "ngram" -> (lim => Dedup.ngramJaccard(docs, w = 5, minJaccard = 0.25,
        collapseThreshold = Double.PositiveInfinity, hotKeyRowLimit = lim).count()),
      "lsh" -> (lim => Dedup.minhashLsh(docs, minJaccard = 0.4,
        collapseThreshold = Double.PositiveInfinity, hotKeyRowLimit = lim).count()),
      "simhash" -> (lim => Dedup.simhashPairs(docs, maxHamming = 12,
        collapseThreshold = Double.PositiveInfinity, hotKeyRowLimit = lim).count()))
    for ((name, run) <- variants; lim <- Seq(Long.MaxValue, Dedup.HotKeyWindowRowLimit)) {
      val walls = (1 to rounds).map { _ =>
        val t = timed(run(lim)); spark.catalog.clearCache(); t
      }
      val tag = if (lim == Long.MaxValue) "probe-off" else "probe-on "
      println(f"DEDUPPROF $name%-8s $tag min=${walls.min}%6.2f s  all=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
