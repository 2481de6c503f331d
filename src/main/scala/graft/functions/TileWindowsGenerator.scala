package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.core.TileGrid

/** Catalyst Generator (table-valued): `tile_windows(width, height, size,
  * step, mode)` → rows (i, j, col_off, row_off, win_width, win_height).
  * The engine's SQL surface for the reference's sliding-window enumeration
  * (satproc/utils.py:39-90) — used as a lateral generator off the raster
  * metadata table so the window list is produced distributed, never on the
  * driver. */
case class TileWindowsGenerator(rasterW: Expression, rasterH: Expression,
                                size: Expression, step: Expression,
                                mode: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(rasterW, rasterH, size, step, mode)

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4))

  override def elementSchema: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("col_off", IntegerType, nullable = false),
    StructField("row_off", IntegerType, nullable = false),
    StructField("win_width", IntegerType, nullable = false),
    StructField("win_height", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val w = rasterW.eval(input)
    val h = rasterH.eval(input)
    val sz = size.eval(input)
    val st = step.eval(input)
    val m = mode.eval(input)
    if (w == null || h == null || sz == null || st == null || m == null) return Nil
    TileGrid.squareWindows(sz.asInstanceOf[Int], st.asInstanceOf[Int],
      w.asInstanceOf[Int], h.asInstanceOf[Int], m.toString).map { c =>
      InternalRow(c.i, c.j, c.window.colOff, c.window.rowOff,
        c.window.width, c.window.height)
    }
  }
}

object TileWindowsGenerator {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graft.Bridge

  def tile_windows(width: Column, height: Column, size: Column,
                   step: Column, mode: Column): Column =
    Bridge.column(TileWindowsGenerator(
      Bridge.expression(width), Bridge.expression(height),
      Bridge.expression(size), Bridge.expression(step),
      Bridge.expression(mode)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tile_windows", es => TileWindowsGenerator(es(0), es(1), es(2), es(3), es(4)),
      "built-in")
}
