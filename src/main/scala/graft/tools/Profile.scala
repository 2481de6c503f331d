package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PagesTiling
import graft.sources.Fixtures

/** Stage-by-stage wall-clock profile of the flagship pipeline at the given
  * parallelism — used to locate scaling bottlenecks (not part of the driver
  * contract). Usage: runMain graft.tools.Profile <cpus> <nPages>. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pagesDir = s"/tmp/graft_pages_$n"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(pagesDir, "_SUCCESS"))) {
      Fixtures.pages(spark, n, partitions = 64).write.mode("overwrite").parquet(pagesDir)
    }
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val pages = spark.read.parquet(pagesDir)
      .as[graft.sources.Model.Page](org.apache.spark.sql.Encoders.product[graft.sources.Model.Page])
    val meta = Fixtures.luxMeta()
    val cfg = PagesTiling.TilingConfig()
    val labels = Fixtures.labelGeoms().map { case (g, c) => (graft.core.Geom.toWkb(g), c) }

    timed("scan_count")(spark.read.parquet(pagesDir).count())
    timed("scan_html_bytes")(spark.read.parquet(pagesDir)
      .agg(sum(length(col("html")))).head().getLong(0))
    timed("synth_in_memory")(Fixtures.pages(spark, n, 64).count())
    val geo = PagesTiling.geotagged(spark, pages, cfg.cellRes)
    timed("geotag_extract")(geo.count())
    timed("geotag_forced")(geo.agg(sum("lat"), sum("cell")).head().getDouble(0))
    timed("geotag_forced_2nd")(geo.agg(sum("lat"), sum("cell")).head().getDouble(0))
    val tiles = PagesTiling.tileCells(spark, meta, cfg)
    val assigned = PagesTiling.assignTiles(geo, tiles, cfg)
    timed("assign_join")(assigned.count())
    timed("assign_join_2nd")(assigned.count())
    timed("full_chips")(PagesTiling.extractChips(spark, pages, meta,
      labels = Some(labels)).agg(sum("n_pages")).head().getLong(0))
    timed("full_chips_2nd")(PagesTiling.extractChips(spark, pages, meta,
      labels = Some(labels)).agg(sum("n_pages")).head().getLong(0))
    spark.stop()
  }
}
