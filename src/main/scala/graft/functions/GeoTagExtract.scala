package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for the flagship's hot path (G5): geotag
  * extraction + byte-identical text-invariant check straight from the html
  * bytes and the text column's UTF8String — no java.lang.String decode, no
  * Tuple3/boxing, no ScalaUDF converter layer. At 10^12 rows the UDF
  * version's ~6 heap objects/row made the 4N-parallelism level
  * allocation-rate bound; this emits one result row per page.
  *
  * Marked nondeterministic for the same reason the UDF was: it stops
  * CollapseProject from duplicating the (expensive) extraction once per
  * consumed struct field.
  */
case class GeoTagExtract(html: Expression, text: Expression)
    extends BinaryExpression {
  override def left: Expression = html
  override def right: Expression = text
  override def dataType: DataType = GeoTagOps.schema
  override def nullable: Boolean = left.nullable || right.nullable
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(h: Any, t: Any): Any =
    GeoTagOps.extractRow(h.asInstanceOf[Array[Byte]], t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, t) =>
      s"${ev.value} = graft.functions.GeoTagOps.extractRow($h, $t);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(html = l, text = r)
}

object GeoTagOps {
  val schema: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("text_ok", BooleanType, nullable = false)))

  def extractRow(html: Array[Byte], text: UTF8String): InternalRow = {
    val (lat, lon, ok) = graft.sources.Fixtures.extractGeoAndCheckU8(html, text)
    new GenericInternalRow(Array[Any](lat, lon, ok))
  }

  def geo_tag_extract(html: Column, text: Column): Column =
    Bridge.column(GeoTagExtract(Bridge.expression(html), Bridge.expression(text)))
}
