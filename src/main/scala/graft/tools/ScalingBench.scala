package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit, sum}

/** Two-cluster-size scaling evidence with noise control: runs the flagship
  * at local[8] and local[32] ALTERNATING in one JVM (shared JIT + page
  * cache, adjacent in time), takes the min wall per level over `rounds`
  * rounds, prints one JSON line. Usage:
  *   runMain graft.tools.ScalingBench [nPages] [rounds]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
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

    val walls = scala.collection.mutable.Map(8 -> List.empty[Double], 32 -> List.empty[Double])
    var emitted = 0L
    for (r <- 1 to rounds; cpus <- Seq(8, 32)) {
      val s = session(cpus)
      if (r == 1) flagship(s) // warm-up per level, untimed
      val (w, e) = flagship(s)
      walls(cpus) = w :: walls(cpus)
      emitted = e
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      System.err.println(f"ROUND $r cpus=$cpus wall=$w%.2f s")
    }
    val w8 = walls(8).min; val w32 = walls(32).min
    val thr8 = emitted / w8; val thr32 = emitted / w32
    val eff = (thr32 / thr8) / 4.0
    println(f"""{"metric":"scaling efficiency 8->32","emitted":$emitted,"wall8_best":$w8%.3f,"wall32_best":$w32%.3f,"throughput8":$thr8%.1f,"throughput32":$thr32%.1f,"efficiency":$eff%.3f,"all8":${walls(8).map(x => f"$x%.2f").mkString("[", ",", "]")},"all32":${walls(32).map(x => f"$x%.2f").mkString("[", ",", "]")}}""")
  }
}
