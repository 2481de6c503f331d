package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Geom, RasterMath}
import graft.sources.{Fixtures, Sinks}

/** Option paths of the chip pipeline: low-contrast skip (F4), extent
  * no-border (M6), s2_rgb_extra rescale, band validation (F3), sinks
  * (S5/S7/S11). */
class ChipOptionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import ChipPipeline._

  test("low-contrast skip (F4): constant chips are dropped when enabled") {
    // prob chips are near-constant outside the blobs → low contrast on the
    // float path (range/2.0 < 0.05): blob chips have range 40 vs limit 2.0
    // is 20 > 0.05 … on float dtype limits (-1,1) range=2 ⇒ 40/2 ≥ 0.05 so
    // blob chips survive, zero chips (range 0) drop.
    val chips = extractChips(spark, Fixtures.probChips(spark),
      Fixtures.luxMeta(id = "prob").copy(bands = 1),
      cfg = ChipConfig(bands = Some(Seq(1)), skipLowContrast = true))
    val got = chips.collect()
    assert(got.map(c => (c.i, c.j)).toSet == Set((0, 0), (0, 1), (1, 2), (1, 3)))
    // without the flag all 8 come through
    val all = extractChips(spark, Fixtures.probChips(spark),
      Fixtures.luxMeta(id = "prob").copy(bands = 1),
      cfg = ChipConfig(bands = Some(Seq(1))))
    assert(all.count() == 8)
  }

  test("is_low_contrast parity rule on uint8 data") {
    // uint8: full range 255; values {0, 40} with >1% at 40 ⇒ p99-p1 = 40
    // ⇒ 40/255 = 0.157 ≥ 0.05 ⇒ not low contrast
    val band = Array.fill(100)(0f) ++ Array.fill(100)(40f)
    assert(!RasterMath.isLowContrast(band, isByteData = true))
    // all-equal ⇒ low contrast
    assert(RasterMath.isLowContrast(Array.fill(100)(40f), isByteData = true))
  }

  test("F2 quirk: write_tif double-permutes non-monotone bands (chips.py:337)") {
    // bands [2,1]: subset = [o2,o1]; write re-index [subset[1],subset[0]]
    // = [o1,o2] — the latent reference bug nets out to written order [1,2]
    val quirk = extractChips(spark, Fixtures.luxTiles(spark), Fixtures.luxMeta(),
      cfg = ChipConfig(bands = Some(Seq(2, 1)))).collect()
    val straight = extractChips(spark, Fixtures.luxTiles(spark), Fixtures.luxMeta(),
      cfg = ChipConfig(bands = Some(Seq(1, 2)))).collect()
    val qm = quirk.map(c => (c.i, c.j) -> c.img_f32).toMap
    straight.foreach { c =>
      assert(qm((c.i, c.j))(0).sameElements(c.img_f32(0)))
      assert(qm((c.i, c.j))(1).sameElements(c.img_f32(1)))
    }
    // ascending 1..n stays the identity (oracle-pinned path)
    assert(straight.head.img_f32.length == 2)
    // bands beyond the subset length raise like Python's IndexError
    assertThrows[org.apache.spark.SparkException] {
      extractChips(spark, Fixtures.luxTiles(spark), Fixtures.luxMeta(),
        cfg = ChipConfig(bands = Some(Seq(1, 4)))).collect()
    }
  }

  test("S6 jpg sink: first-3-band uint8 dstack payload + write-side low-contrast skip") {
    // jpg chips carry a 3-band uint8 payload (write_image chips.py:316-322)
    val jpg = extractChips(spark, Fixtures.luxTiles(spark), Fixtures.luxMeta(),
      cfg = ChipConfig(chipType = "jpg", rescaleMode = Some("values"),
        rescaleRange = (0.0, 0.3))).collect()
    assert(jpg.forall(c => c.img_u8.length == 3 && c.img_f32 == null))
    assert(jpg.forall(_.filename.endsWith(".jpg")))
    // near-constant raster + skip flag: payload skipped on write, but the
    // chip row (and so its footprint) still exists — reference appends to
    // `chips` before write_image can return False
    val flat = extractChips(spark, Fixtures.probChips(spark),
      Fixtures.luxMeta(id = "prob").copy(bands = 1),
      cfg = ChipConfig(bands = Some(Seq(1)), chipType = "jpg",
        skipLowContrast = true)).collect()
    // zero-valued chips were dropped by the FIRST contrast check already;
    // kept blob chips have contrast on uint8 too → payload present
    assert(flat.forall(c => c.img_u8.nonEmpty))
    // a uint8-flat but float-contrasty chip: values {0, 0.4} pass the float
    // check (0.4/2.0=0.2) but truncate to uint8 {0,0} → jpg write skipped
    import spark.implicits._
    val t = Fixtures.probChips(spark).map { t =>
      t.copy(pixels = t.pixels.map(_.map(v => if (v != 0f) 0.4f else 0f)))
    }
    val rows = extractChips(spark, t, Fixtures.luxMeta(id = "prob").copy(bands = 1),
      cfg = ChipConfig(bands = Some(Seq(1)), chipType = "jpg",
        skipLowContrast = true)).collect()
    assert(rows.nonEmpty && rows.forall(_.img_u8.isEmpty),
      "write-side uint8 contrast check must skip the payload but keep the row")
  }

  test("extent no-border (M6): boundary pixels removed from the extent mask") {
    val labels = Fixtures.labelGeoms().map { case (g, c) => (Geom.toWkb(g), c) }
    def masks(noBorder: Boolean) = {
      val chips = extractChips(spark, Fixtures.luxTiles(spark), Fixtures.luxMeta(),
        labels = Some(labels),
        cfg = ChipConfig(bands = Some(Seq(1, 2, 3, 4)), extentNoBorder = noBorder,
          masks = Set("extent")))
      masksOf(spark, chips).collect()
        .map(r => ((r.getAs[Int]("i"), r.getAs[Int]("j")),
          r.getAs[Array[Byte]]("mask").count(_ != 0))).toMap
    }
    val withBorder = masks(false)
    val without = masks(true)
    assert(withBorder.keySet == without.keySet)
    // removing the boundary strictly shrinks every non-empty mask
    assert(without.forall { case (k, n) => n < withBorder(k) })
    assert(without.values.forall(_ > 0))
  }

  test("s2_rgb_extra rescale: first 3 bands forced to (0, 0.3)") {
    val bands = Array(
      Array(0f, 0.15f, 0.3f), Array(0f, 0.15f, 0.3f), Array(0f, 0.15f, 0.3f),
      Array(10f, 20f, 30f))
    val ranges = RasterMath.rescaleRanges(bands, "s2_rgb_extra", (2, 98))
    assert(ranges.take(3).forall(_ == (0.0, 0.3)))
    // band 4 keeps its percentile range
    assert(ranges(3)._1 > 10 && ranges(3)._2 < 30)
  }

  test("band validation (F3): requesting a band beyond count fails like the reference") {
    val ex = intercept[IllegalArgumentException] {
      extractChips(spark, Fixtures.luxTiles(spark), Fixtures.luxMeta(),
        cfg = ChipConfig(bands = Some(Seq(1, 5)))).count()
    }
    assert(ex.getMessage.contains("band"))
  }

  test("sinks: chips/masks parquet layout + virtual mosaic (S5/S7/S11)") {
    val tmp = java.nio.file.Files.createTempDirectory("sinks").toString
    val labels = Fixtures.labelGeoms().map { case (g, c) => (Geom.toWkb(g), c) }
    val chips = extractChips(spark, Fixtures.luxTiles(spark), Fixtures.luxMeta(),
      labels = Some(labels), cfg = ChipConfig(bands = Some(Seq(1, 2, 3, 4))))
    Sinks.writeChips(chips.drop("img_f32").toDF(), tmp)
    Sinks.writeMasks(masksOf(spark, chips), tmp)
    assert(spark.read.parquet(s"$tmp/images").count() == 5)
    assert(spark.read.parquet(s"$tmp/masks").count() == 5)
    val mosaic = Sinks.mosaic(Seq(Fixtures.luxTiles(spark), Fixtures.probChips(spark)))
    assert(mosaic.count() == 16)
  }
}
