package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Geom, RasterMath}
import graft.sources.Fixtures

/** Post-processing golden counts from the reference suite:
  * tests/test_filter.py, tests/test_polygonize.py,
  * tests/test_smooth_stitch.py, tests/test_scale.py,
  * tests/test_match_histograms.py, tests/test_generalize.py. */
class PostProcessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("filter: threshold 0.05 passes 4 of 8 chips; 0.5 passes 0 (test_filter.py:15-41)") {
    val chips = Fixtures.probChips(spark)
    val pass = PostProcess.filterByMaxProb(chips, 0.05).collect()
    assert(pass.length == 4)
    assert(pass.map(r => (r.getInt(1), r.getInt(2))).toSet ==
      Set((0, 0), (0, 1), (1, 2), (1, 3)))
    assert(PostProcess.filterByMaxProb(chips, 0.5).count() == 0)
  }

  test("polygonize + dissolve: exactly 2 features (test_polygonize.py:16-46)") {
    val out = PostProcess.polygonize(spark, Fixtures.probChips(spark), Fixtures.LuxAffine)
    assert(out.count() == 2)
    // and with threshold 0.02 (t·256 = 5.12 < 40 ⇒ same nonzero region)
    val out2 = PostProcess.polygonize(spark, Fixtures.probChips(spark), Fixtures.LuxAffine,
      threshold = Some(0.02))
    assert(out2.count() == 2)
    // blob A footprint: rows 20–60 × cols 100–160 in world coords
    val geoms = out.collect().map(r => Geom.fromWkb(r.getAs[Array[Byte]]("geom")))
    val areas = geoms.map(_.getArea).sorted
    val pxArea = Fixtures.LuxPxX * math.abs(Fixtures.LuxPxY)
    assert(math.abs(areas(0) / pxArea - 40 * 60) < 1e-6)  // blob A: 2400 px
    assert(math.abs(areas(1) / pxArea - 50 * 100) < 1e-6) // blob B: 5000 px
  }

  test("smooth stitch: overlapping chips merge into 8 non-overlapping outputs (test_smooth_stitch.py:15-26)") {
    val chips = Fixtures.probChips(spark, size = 128, step = 64)
    assert(chips.count() == 21) // overlapping input grid
    val out = PostProcess.smoothStitch(spark, chips, Fixtures.LuxAffine, power = 1.5)
    val rows = out.collect()
    assert(rows.length == 8)
    // non-overlapping output windows tile the full extent
    val keys = rows.map(r => (r.getAs[Int]("oi"), r.getAs[Int]("oj"))).toSet
    assert(keys == (for (i <- 0 to 1; j <- 0 to 3) yield (i, j)).toSet)
    assert(rows.forall(_.getAs[String]("filename").matches("\\d+_\\d+")))
  }

  test("minmax scale: all bands rescale to [0,1] with 0 and 1 attained (test_scale.py)") {
    val scaled = PostProcess.minmaxScale(spark, Fixtures.luxTiles(spark)).collect()
    val all = scaled.flatMap(_.pixels.flatten)
    assert(math.abs(all.min) < 1e-7 && math.abs(all.max - 1f) < 1e-7)
  }

  test("histogram match: self-match is identity; cross-match moves the distribution (test_match_histograms.py)") {
    val (src, ref) = Fixtures.histPair(spark)
    val self = PostProcess.matchHistograms(src, src).collect()
    val orig = src.collect().map(t => (t.i, t.j) -> t.pixels).toMap
    assert(self.forall(t => t.pixels(0).sameElements(orig((t.i, t.j))(0))))
    val crossed = PostProcess.matchHistograms(src, ref).collect()
    val crossVals = crossed.flatMap(_.pixels(0))
    // ref values live in [55, 154]; matched output must move into that range
    assert(crossVals.min >= 55f && crossVals.max <= 154f)
  }

  test("generalize: reproject 3857 + douglas + chaikin; multipart skipped (test_generalize.py)") {
    val polys = PostProcess.polygonize(spark, Fixtures.probChips(spark), Fixtures.LuxAffine)
    val out = PostProcess.generalize(polys, "epsg:4326", Some("epsg:3857"),
      douglasTolerance = 0.1)
    assert(out.count() == 2)
    val gs = out.collect().map(r => Geom.fromWkb(r.getAs[Array[Byte]]("geom")))
    // in meters now: blob A is ~60px·~7m/px wide; all coords far from degree range
    assert(gs.forall(_.getEnvelopeInternal.getMinX > 600000))
    // douglas with 0.1 m tolerance on pixel-staircase rectangles → few points
    assert(gs.forall(_.getNumPoints <= 8))
    val smooth = PostProcess.generalize(polys, "epsg:4326", Some("epsg:3857"),
      douglasTolerance = 0.1, chaikin = true)
    assert(smooth.count() == 2)
    // chaikin quintuples-ish the point count (×2 per refinement, 5 rounds)
    assert(smooth.collect().forall(r =>
      Geom.fromWkb(r.getAs[Array[Byte]]("geom")).getNumPoints > 50))
  }

  test("spatial filter halo strips: shuffle volume is tiles + halos (~1× raster), not 9×") {
    val W = Fixtures.LuxWidth; val H = Fixtures.LuxHeight
    val tiles = Fixtures.luxTiles(spark, mode = "exact").collect()
    val r = 2 // ksize 5
    val shipped = tiles.map { t =>
      (for (di <- -1 to 1; dj <- -1 to 1; if t.i + di >= 0 && t.j + dj >= 0)
        yield PostProcess.haloFragment(t, di, dj, r)
          .map(f => f.width.toLong * f.height).getOrElse(0L)).sum
    }.sum
    val raster = W.toLong * H
    assert(shipped <= (raster * 1.1).toLong,
      s"halo shuffle volume $shipped px vs raster $raster px (>1.1×)")
    // fragments reconstruct exactly the r-halo neighborhoods: spot-check one
    val t = tiles.find(x => x.i == 0 && x.j == 0).get
    val right = PostProcess.haloFragment(t, 0, 1, r).get
    assert(right.width == r && right.height == t.height &&
      right.col_off == t.col_off + t.width - r)
  }

  test("spatial filter: distributed halo-exchange blur equals single-raster blur (spatial_filter.py)") {
    val W = Fixtures.LuxWidth; val H = Fixtures.LuxHeight
    // single-raster reference result, band 1
    val full = Array.tabulate(W * H)(k => Fixtures.luxValue(1, k / W, k % W))
    for (mode <- Seq("gaussian", "median")) {
      val expect =
        if (mode == "gaussian") RasterMath.gaussianBlur(full, W, H, 5)
        else RasterMath.medianBlur(full, W, H, 5)
      val tiles = Fixtures.luxTiles(spark, mode = "exact")
      val got = PostProcess.spatialFilter(spark, tiles, mode, 5).collect()
      assert(got.length == 8)
      var checked = 0
      got.foreach { t =>
        var y = 0
        while (y < t.height) {
          var x = 0
          while (x < t.width) {
            val g = t.pixels(0)(y * t.width + x)
            val e = expect((t.row_off + y) * W + t.col_off + x)
            assert(math.abs(g - e) < 1e-5,
              s"$mode tile (${t.i},${t.j}) px ($x,$y): got $g want $e")
            checked += 1
            x += 1
          }
          y += 1
        }
      }
      assert(checked == W * H)
    }
  }
}
