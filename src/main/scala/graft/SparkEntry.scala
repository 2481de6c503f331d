package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator surface lives in [[QueryCatalog]]; the flagship pipeline is
  * [[graft.operators.PagesTiling]] (pages → tiles spatial join → chips). */
object SparkEntry {
  /** Flagship query on sf=0.001-scale synthesized pages: full web-scale
    * chipping pipeline (geotag extract → cell join → density chips + label
    * masks). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val labels = graft.sources.Fixtures.labelGeoms().map { case (g, c) =>
      (graft.core.Geom.toWkb(g), c)
    }
    graft.operators.PagesTiling.extractChips(
      spark, graft.sources.Fixtures.pages(spark, 20000),
      graft.sources.Fixtures.luxMeta(), labels = Some(labels))
      .select("raster_id", "i", "j", "n_pages", "bad_text", "filename")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Since round 3 EVERY catalog query has one —
    * the raster/geometry kernels are re-derived in SQL (recursive-CTE
    * Bresenham/Chaikin, scanline fill, chamfer adjacency, discrete medians)
    * rather than golden-tested only. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
