package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit, sum}

/** Two-cluster-size scaling evidence with noise control: runs the flagship
  * at local[N] and local[4N] ALTERNATING in one JVM (shared JIT + page
  * cache, adjacent in time — host throughput drifts ±15% between windows,
  * so only adjacent pairs compare like-for-like), takes the min wall per
  * level over `rounds` rounds, prints one JSON line. Usage:
  *   runMain graft.tools.ScalingBench [nPages] [rounds] [baseCores]
  * baseCores defaults to 8 (levels 8 vs 32); 4 gives 4 vs 16 — on this
  * 32-core box the 4→16 pair is the honest N→4N proxy: the hardware's own
  * ceiling there is 0.87–0.97 (vs 0.66–0.81 at 8→32, where memory
  * bandwidth saturates), matching a real cluster where per-node resources
  * don't shrink as node count grows. */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val base = args.lift(2).map(_.toInt).getOrElse(8)
    val quad = base * 4
    val labels = graft.sources.Fixtures.labelGeoms().map { case (g, c) =>
      (graft.core.Geom.toWkb(g), c) }
    val pagesDir = s"/tmp/graft_pages_$n"

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // materialize input once
    {
      val s = session(32)
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(pagesDir, "_SUCCESS")))
        graft.sources.Fixtures.pages(s, n, partitions = 64)
          .write.mode("overwrite").parquet(pagesDir)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def flagship(s: SparkSession): (Double, Long) = {
      val pages = s.read.parquet(pagesDir).as[graft.sources.Model.Page](
        org.apache.spark.sql.Encoders.product[graft.sources.Model.Page])
      val t0 = System.nanoTime()
      val agg = graft.operators.PagesTiling.extractChips(s, pages,
        graft.sources.Fixtures.luxMeta(), labels = Some(labels))
        .agg(sum("n_pages"), count(lit(1)), sum("bad_text")).head()
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0) + agg.getLong(1))
    }

    val walls = scala.collection.mutable.Map(base -> List.empty[Double], quad -> List.empty[Double])
    var emitted = 0L
    for (r <- 1 to rounds; cpus <- Seq(base, quad)) {
      val s = session(cpus)
      if (r == 1) flagship(s) // warm-up per level, untimed
      val (w, e) = flagship(s)
      walls(cpus) = w :: walls(cpus)
      emitted = e
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      // measurement hygiene: a controlled same-window A/B showed the shared
      // JVM taxes the 4N level ~15% (heap aging across levels); a full GC
      // between levels reclaims the previous level's tenured garbage so the
      // next level starts closer to fresh-JVM state
      System.gc(); Thread.sleep(500); System.gc()
      System.err.println(f"ROUND $r cpus=$cpus wall=$w%.2f s")
    }
    val wB = walls(base).min; val wQ = walls(quad).min
    val thrB = emitted / wB; val thrQ = emitted / wQ
    val eff = (thrQ / thrB) / 4.0
    // per-round pairwise efficiencies: adjacent in time, so each pair saw
    // the same host window — the spread between pairs measures host drift
    val pairEffs = walls(base).reverse.zip(walls(quad).reverse)
      .map { case (b, q) => b / (4.0 * q) }
    println(f"""{"metric":"scaling efficiency $base->$quad","emitted":$emitted,"wall${base}_best":$wB%.3f,"wall${quad}_best":$wQ%.3f,"throughput$base":$thrB%.1f,"throughput$quad":$thrQ%.1f,"efficiency":$eff%.3f,"pair_effs":${pairEffs.map(x => f"$x%.3f").mkString("[", ",", "]")},"all$base":${walls(base).map(x => f"$x%.2f").mkString("[", ",", "]")},"all$quad":${walls(quad).map(x => f"$x%.2f").mkString("[", ",", "]")}}""")
  }
}
