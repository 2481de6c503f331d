package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.Coordinate

/** Property parity for the scanline rasterizer: GDAL's all_touched=False
  * rule is "burn the pixel iff its CENTER is inside the polygon" — checked
  * against JTS point-in-polygon for every pixel of random convex polygons.
  * (Centers exactly on an edge are measure-zero with random vertices.) */
class RasterizePropertySpec extends AnyFunSuite {

  test("fill equals pixel-center containment for random convex polygons") {
    val rng = new scala.util.Random(11)
    val t = Affine(1, 0, 0, 0, 1, 0) // pixel space = world space
    val W = 40; val H = 40
    for (trial <- 1 to 50) {
      // random convex polygon: sort random points around their centroid
      val n = 3 + rng.nextInt(6)
      val pts = Seq.fill(n)((2 + rng.nextDouble() * (W - 4), 2 + rng.nextDouble() * (H - 4)))
      val cx = pts.map(_._1).sum / n; val cy = pts.map(_._2).sum / n
      val hull = pts.sortBy { case (x, y) => math.atan2(y - cy, x - cx) }
      val poly = Geom.polygon(hull)
      if (poly.isValid && poly.getArea > 1) {
        val mask = Rasterize.fillPolygons(Seq(poly), t, W, H)
        var mismatches = 0
        for (y <- 0 until H; x <- 0 until W) {
          val inside = poly.contains(Geom.factory.createPoint(
            new Coordinate(x + 0.5, y + 0.5)))
          val burned = mask(y * W + x) != 0
          if (inside != burned) mismatches += 1
        }
        assert(mismatches == 0, s"trial $trial: $mismatches center/burn mismatches")
      }
    }
  }

  test("multi-polygon fill is the union of individual fills") {
    val t = Affine(1, 0, 0, 0, 1, 0)
    val a = Geom.polygon(Seq((1.0, 1.0), (5.0, 1.0), (5.0, 5.0), (1.0, 5.0)))
    val b = Geom.polygon(Seq((6.0, 6.0), (9.0, 6.0), (9.0, 9.0), (6.0, 9.0)))
    val both = Rasterize.fillPolygons(Seq(a, b), t, 12, 12)
    val ua = Rasterize.fillPolygons(Seq(a), t, 12, 12)
    val ub = Rasterize.fillPolygons(Seq(b), t, 12, 12)
    val union = ua.zip(ub).map { case (p, q) => if (p != 0 || q != 0) 255.toByte else 0.toByte }
    assert(both.sameElements(union))
  }

  test("line burn covers every cell a ring vertex lies in") {
    val t = Affine(1, 0, 0, 0, 1, 0)
    val poly = Geom.polygon(Seq((2.3, 2.7), (8.9, 3.1), (7.2, 8.8), (3.1, 7.4)))
    val burned = Rasterize.burnLines(Rasterize.boundaries(Seq(poly)), t, 12, 12)
    poly.getExteriorRing.getCoordinates.foreach { c =>
      val x = math.floor(c.x).toInt; val y = math.floor(c.y).toInt
      assert(burned(y * 12 + x) != 0, s"vertex cell ($x,$y) not burned")
    }
  }
}
