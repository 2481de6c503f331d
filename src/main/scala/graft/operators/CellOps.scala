package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
