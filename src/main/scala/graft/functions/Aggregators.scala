package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.locationtech.jts.geom.Geometry

import graft.core.Geom

/** Hierarchical geometry dissolve, the Spark partial/final form of the
  * reference's grouped unary_union (polygonize.py:104-124: buffer(0) each
  * shape, union in groups of 10,000, then union the group results).
  * reduce = buffered append with threshold-union; merge = union of partials;
  * finish = final union. Map-side partial aggregation bounds both memory and
  * the size of shuffled partials — the reference's manual spill control,
  * expressed as a Catalyst Aggregator. Geometries travel as WKB bytes. */
class DissolveAggregator(groupSize: Int = 10000)
    extends Aggregator[Array[Byte], DissolveBuf, Array[Byte]] {

  override def zero: DissolveBuf = DissolveBuf(Nil, None)

  override def reduce(b: DissolveBuf, wkb: Array[Byte]): DissolveBuf = {
    val cleaned = Geom.makeValid(Geom.fromWkb(wkb)) // buffer(0) parity (polygonize.py:108)
    val pending = Geom.toWkb(cleaned) :: b.pending
    if (pending.size >= groupSize) DissolveBuf(Nil, Some(unionAll(pending, b.partial)))
    else b.copy(pending = pending)
  }

  override def merge(a: DissolveBuf, b: DissolveBuf): DissolveBuf = {
    val partial = (a.partial, b.partial) match {
      case (Some(x), Some(y)) =>
        Some(Geom.toWkb(Geom.unaryUnion(Seq(Geom.fromWkb(x), Geom.fromWkb(y)))))
      case (x, y) => x.orElse(y)
    }
    val pending = a.pending ++ b.pending
    if (pending.size >= groupSize) DissolveBuf(Nil, Some(unionAll(pending, partial)))
    else DissolveBuf(pending, partial)
  }

  override def finish(b: DissolveBuf): Array[Byte] =
    if (b.pending.isEmpty && b.partial.isEmpty) Geom.toWkb(Geom.factory.createGeometryCollection())
    else unionAll(b.pending, b.partial)

  private def unionAll(pending: List[Array[Byte]], partial: Option[Array[Byte]]): Array[Byte] = {
    val geoms: Seq[Geometry] =
      pending.map(Geom.fromWkb) ++ partial.map(Geom.fromWkb).toSeq
    Geom.toWkb(Geom.unaryUnion(geoms))
  }

  override def bufferEncoder: Encoder[DissolveBuf] = Encoders.product[DissolveBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

case class DissolveBuf(pending: List[Array[Byte]], partial: Option[Array[Byte]])

/** Pixelwise max merge of overlapping weighted chips placed into an output
  * window — `rasterio.merge.merge(method="max")` parity
  * (reference: smooth.py:119-125). Input rows are (pixels, placement) where
  * pixels are band-major doubles already cropped to the output window and
  * `offset` gives the placement; here the caller pre-places chips onto the
  * output grid with NaN for not-covered, so the aggregator is elementwise
  * nan-max. */
class PixelMaxAggregator(nBands: Int, size: Int)
    extends Aggregator[Array[Double], Array[Double], Array[Double]] {

  /** Length adapts to the group's placement arrays (output windows at the
    * raster border are clipped, so sizes vary per group). */
  override def zero: Array[Double] = Array.empty[Double]

  override def reduce(acc: Array[Double], px: Array[Double]): Array[Double] = {
    if (acc.isEmpty) return px.clone()
    var i = 0
    while (i < acc.length) {
      val v = px(i)
      if (!v.isNaN && (acc(i).isNaN || v > acc(i))) acc(i) = v
      i += 1
    }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b else if (b.isEmpty) a else reduce(a, b)

  /** rasterio.merge initializes the output with zeros (nodata default 0 for
    * these chips) — uncovered pixels finish as 0. */
  override def finish(acc: Array[Double]): Array[Double] = {
    var i = 0
    while (i < acc.length) { if (acc(i).isNaN) acc(i) = 0.0; i += 1 }
    acc
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
