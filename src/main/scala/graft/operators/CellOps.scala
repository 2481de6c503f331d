package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CellIndex

/** Relational operators over the hierarchical cell index
  * ([[graft.core.CellIndex]]) beyond per-row encode/cover/ring — the
  * set-level index maintenance a spatial partitioning layer needs. */
object CellOps {

  /** Compact a single-resolution cell cover to canonical mixed
    * resolutions (H3 `compactCells` / S2 `CellUnion.Normalize`): any
    * COMPLETE 4-sibling group collapses into its parent, repeatedly, down
    * to `minRes` — the covered area is exactly preserved while dense
    * regions shrink 4× per level (a broadcast cover list gets
    * correspondingly smaller, which is the point at scale: tile covers of
    * large AOIs stop carrying millions of uniform high-res cells).
    *
    * Scale shape: res − minRes rounds, each ONE map-side-combined
    * groupBy(parent) count (a quadkey sibling group is 4 consecutive ids,
    * so partial aggregation collapses it inside the scan task) + an
    * anti-join of the shrinking frontier; level k's frontier is ≤ |cover|
    * / 4^k rows, so total work is a geometric series in the cover size —
    * never the corpus. Emitted levels union by name; `(cell, res)` is the
    * canonical mixed-res key downstream joins use.
    *
    * cells: one column `cell` at resolution `res` (duplicates tolerated).
    * Returns (cell, res) with minRes ≤ res ≤ input res, minimal (no
    * complete sibling group survives — CellOpsSpec pins minimality and
    * exact area preservation). */
  /** Fill a CONVEX polygon with index cells at `res` — the polygon form
    * of [[graft.core.CellIndex.cellCover]] (H3 polygonToCells): the cells
    * whose CENTER lies strictly inside the polygon, which is the standard
    * center-containment fill rule. Candidates enumerate the bbox index
    * grid as ONE distributed range (xi = x0 + id % w, yi = y0 + id div w
    * — no cartesian), the inside test is the half-plane conjunction of a
    * CCW convex ring (cross > 0 per edge; every operand is a literal or
    * exactly-rounded IEEE arithmetic, so the oracle evaluates the
    * identical tree), and surviving centers re-encode through the
    * cell_id codegen Expression — the center sits 0.5 index units from
    * every floor boundary, ~1e13 ulps of headroom, so the round-trip is
    * bit-safe. Composes with [[compactCells]] for mixed-res covers of
    * large AOIs. Convex-only by contract (concave AOIs triangulate
    * first); boundary-touching centers are excluded by the strict test
    * on both engines. */
  def convexFill(spark: SparkSession, poly: Seq[(Double, Double)],
                 res: Int): DataFrame = {
    require(poly.size >= 3, "need a polygon")
    val lons = poly.map(_._1); val lats = poly.map(_._2)
    val x0 = CellIndex.xIndex(lons.min, res); val x1 = CellIndex.xIndex(lons.max, res)
    val y0 = CellIndex.yIndex(lats.max, res); val y1 = CellIndex.yIndex(lats.min, res)
    val w = x1 - x0 + 1; val h = y1 - y0 + 1
    require(w * h <= CellIndex.MaxCoverCells,
      s"convexFill: bbox covers ${w * h} cells at res=$res (cap ${CellIndex.MaxCoverCells})")
    val n = (1L << res).toDouble
    val grid = spark.range(w * h).select(
      (lit(x0) + col("id") % w).as("xi"),
      (lit(y0) + expr(s"id div $w")).as("yi"))
    val lonC = (col("xi").cast("double") + lit(0.5)) / lit(n) * lit(360.0) - lit(180.0)
    val latC = lit(90.0) - (col("yi").cast("double") + lit(0.5)) / lit(n) * lit(180.0)
    val ring = poly :+ poly.head
    val inside = ring.sliding(2).map { case Seq((ax, ay), (bx, by)) =>
      ((lit(bx) - lit(ax)) * (latC - lit(ay)) -
        (lit(by) - lit(ay)) * (lonC - lit(ax))) > lit(0.0)
    }.reduce(_ && _)
    grid.where(inside)
      .select(graft.functions.CellFunctions.cell_id(latC, lonC, lit(res)).as("cell"))
  }

  def compactCells(cells: DataFrame, res: Int, minRes: Int): DataFrame = {
    require(minRes >= 0 && minRes <= res, s"need 0 <= minRes <= res, got $minRes..$res")
    var cur = cells.select(col("cell")).distinct()
    var r = res
    var out: DataFrame = null
    while (r > minRes) {
      val marked = cur.withColumn("parent", shiftright(col("cell"), 2))
      val counts = marked.groupBy("parent").agg(count(lit(1)).as("n"))
      val complete = counts.where(col("n") === 4).select("parent")
      val kept = marked.join(complete, Seq("parent"), "left_anti")
        .select(col("cell"), lit(r).as("res"))
      out = if (out == null) kept else out.unionByName(kept)
      cur = complete.select(col("parent").as("cell"))
      r -= 1
    }
    val tail = cur.select(col("cell"), lit(minRes).as("res"))
    if (out == null) tail else out.unionByName(tail)
  }
}
