package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CellCoverExpr, CellIdExpr, DotProductExpr, KRingExpr, TileWindowsGenerator}

/** Spark session extension (`--conf spark.sql.extensions=graft.GraftExtensions`):
  * registers the engine's Catalyst functions for pure-SQL users —
  *   cell_id(lat, lon, res), cell_cover(minLat, minLon, maxLat, maxLon, res),
  *   k_ring(cell, k, res), tile_windows(w, h, size, step, mode),
  *   dot_product(a, b) — sequential-order embedding dot product.
  * The same functions are injected per-session by CellFunctions.register /
  * TileWindowsGenerator.register when the session is built programmatically. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cell_id"),
      info("cell_id", "cell_id(lat, lon, res) - hierarchical spatial cell id"),
      (es: Seq[Expression]) => CellIdExpr(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("cell_cover"),
      info("cell_cover", "cell_cover(minLat, minLon, maxLat, maxLon, res) - covering cells of a bbox"),
      (es: Seq[Expression]) => CellCoverExpr(es(0), es(1), es(2), es(3), es(4))))
    e.injectFunction((FunctionIdentifier("k_ring"),
      info("k_ring", "k_ring(cell, k, res) - disk of cells within Chebyshev distance k"),
      (es: Seq[Expression]) => KRingExpr(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("tile_windows"),
      info("tile_windows", "tile_windows(w, h, size, step, mode) - sliding-window grid generator"),
      (es: Seq[Expression]) => TileWindowsGenerator(es(0), es(1), es(2), es(3), es(4))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - left-to-right double dot product of float/double arrays"),
      (es: Seq[Expression]) => DotProductExpr(es(0), es(1))))
  }
}
