package graft.cli

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.operators.SparkTestSession
import graft.sources.{Fixtures, GeoJson}
import graft.core.Geom

/** End-to-end runs of the console tools over the fixture tables — the CLI
  * parity surface for the reference's satproc_* entry points. */
class CliSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  private def tmp(): String = Files.createTempDirectory("graft-cli").toString

  private lazy val fixtures: (String, String, String, String) = {
    import spark.implicits._
    val d = tmp()
    Fixtures.luxTiles(spark).toDF().write.parquet(s"$d/tiles")
    Fixtures.probChips(spark).toDF().write.parquet(s"$d/prob")
    Seq(Fixtures.luxMeta()).toDS().write.parquet(s"$d/meta")
    // labels + AOI as GeoJSON files (the reference's vector input format)
    val feats = Fixtures.labelGeoms().map { case (g, c) =>
      s"""{"type":"Feature","geometry":${GeoJson.geomToJson(g)},"properties":{"class":"$c"}}"""
    }
    val labels = s"$d/labels.geojson"
    Files.writeString(java.nio.file.Paths.get(labels),
      s"""{"type":"FeatureCollection","features":[${feats.mkString(",")}]}""")
    val aoi = s"$d/aoi.geojson"
    val aoiFeats = Fixtures.aoiGeoms().map(g =>
      s"""{"type":"Feature","geometry":${GeoJson.geomToJson(g)},"properties":{}}""")
    Files.writeString(java.nio.file.Paths.get(aoi),
      s"""{"type":"FeatureCollection","features":[${aoiFeats.mkString(",")}]}""")
    (s"$d/tiles", s"$d/prob", s"$d/meta", d)
  }

  private def run(tool: String, args: String*): Unit =
    Main.run(spark, tool, Main.parse(args))

  test("extract_chips: chips + masks + footprints written, AOI golden count") {
    val (tiles, _, meta, d) = fixtures
    val out = tmp()
    run("extract_chips", tiles, "--meta", meta, "-o", out,
      "--labels", s"$d/labels.geojson", "--aoi", s"$d/aoi.geojson",
      "--bands", "1,2,3,4", "--rescale-mode", "values", "--rescale-range", "0,0.3",
      "--write-footprints", "geojson")
    assert(spark.read.parquet(s"$out/images").count() == 4) // AOI golden
    assert(spark.read.parquet(s"$out/masks").count() == 4)
    val fp = Files.readString(java.nio.file.Paths.get(s"$out/lux1.geojson"))
    assert(fp.contains("\"FeatureCollection\"") && fp.split("\"id\"").length == 5)
  }

  test("make_masks + filter + polygonize + generalize chain") {
    val (tiles, prob, meta, d) = fixtures
    val mo = tmp()
    run("make_masks", tiles, "--meta", meta, "-o", mo,
      "--labels", s"$d/labels.geojson", "--masks", "extent,boundary,distance",
      "--classes", "A")
    assert(spark.read.parquet(s"$mo/masks").select("kind").distinct().count() == 3)

    val fo = tmp()
    run("filter", prob, "--threshold", "0.05", "-o", s"$fo/kept")
    assert(spark.read.parquet(s"$fo/kept").count() == 4)

    run("polygonize", prob, "--meta", meta, "--threshold", "0.02", "-o", s"$fo/polys")
    assert(spark.read.parquet(s"$fo/polys").count() == 2)

    run("generalize", s"$fo/polys", "--target-crs", "epsg:3857",
      "--tolerance", "0.1", "--chaikin", "-o", s"$fo/gen")
    assert(spark.read.parquet(s"$fo/gen").count() == 2)
  }

  test("scale / smooth_stitch / spatial_filter / retile tools") {
    import spark.implicits._
    val (tiles, _, meta, d) = fixtures
    val o = tmp()
    run("scale", tiles, "-o", s"$o/scaled")
    val scaled = spark.read.parquet(s"$o/scaled").as[graft.sources.Model.Tile].collect()
    val all = scaled.flatMap(_.pixels.flatten)
    assert(all.min >= 0f && all.max <= 1f)

    // overlapping chips via --regrid from the stored 128-grid, then stitch
    Fixtures.probChips(spark, step = 64).toDF().write.parquet(s"$o/probov")
    run("smooth_stitch", s"$o/probov", "--meta", meta, "--power", "1.5", "-o", s"$o/stitched")
    assert(spark.read.parquet(s"$o/stitched").count() == 8)

    Fixtures.luxTiles(spark, mode = "exact").toDF().write.parquet(s"$o/exact")
    run("spatial_filter", s"$o/exact", "--meta", meta, "--filter", "gaussian",
      "--size", "5", "-o", s"$o/blur")
    assert(spark.read.parquet(s"$o/blur").count() == 8)

    run("retile", tiles, "--meta", meta, "--size", "64", "-o", s"$o/retiled")
    assert(spark.read.parquet(s"$o/retiled").count() == 32)

    // --regrid bridges a stored exact grid to the requested overlap grid
    run("extract_chips", s"$o/exact", "--meta", meta, "-o", s"$o/regridded",
      "--size", "128", "--step-size", "128", "--mode", "whole_overlap", "--regrid")
    assert(spark.read.parquet(s"$o/regridded/images").count() == 8)
  }

  test("match_histograms tool") {
    import spark.implicits._
    val o = tmp()
    val (src, ref) = Fixtures.histPair(spark)
    src.toDF().write.parquet(s"$o/src")
    ref.toDF().write.parquet(s"$o/ref")
    run("match_histograms", s"$o/src", s"$o/ref", "-o", s"$o/matched")
    val vals = spark.read.parquet(s"$o/matched").as[graft.sources.Model.Tile]
      .collect().flatMap(_.pixels(0))
    assert(vals.min >= 55f && vals.max <= 154f) // moved into ref's range
  }
}
