package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.core.Geom
import graft.operators.{ChipPipeline, SparkTestSession}

class GeoJsonSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("GeoJSON roundtrip: labels twin written and read back (S2)") {
    val tmp = Files.createTempDirectory("geojson").toString
    // write a FeatureCollection shaped like the reference's lux1_gt.geojson
    val feats = Fixtures.labelGeoms().map { case (g, c) =>
      s"""{"type":"Feature","geometry":${GeoJson.geomToJson(g)},"properties":{"class":"$c"}}"""
    }
    Files.writeString(java.nio.file.Paths.get(s"$tmp/labels.geojson"),
      s"""{"type":"FeatureCollection","features":[${feats.mkString(",")}]}""")

    val read = GeoJson.read(spark, s"$tmp/labels.geojson").collect()
    assert(read.length == 4)
    assert(read.forall(_.props("class") == "A"))
    val bounds = read.map(f => Geom.fromWkb(f.geom).getEnvelopeInternal)
    assert(bounds.count(b => math.abs(b.getMinX - 5.984150665) < 1e-9) == 2) // P1 ×2
  }

  test("invalid/missing geometries are dropped like the reference's get_shape") {
    val doc =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","geometry":null,"properties":{}},
        |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]},"properties":{"k":"v"}}
        |]}""".stripMargin
    val fs = GeoJson.parseCollection(doc)
    assert(fs.length == 1 && fs.head.props("k") == "v")
  }

  test("footprints GeoJSON + CSV sinks (S8/S9) write the reference shape") {
    val tmp = Files.createTempDirectory("fp").toString
    val tiles = Fixtures.luxTiles(spark)
    val chips = ChipPipeline.extractChips(spark, tiles, Fixtures.luxMeta(),
      cfg = ChipPipeline.ChipConfig(bands = Some(Seq(1, 2, 3, 4))))
    val fps = ChipPipeline.footprints(chips)
    GeoJson.writeFootprints(fps, s"$tmp/lux1.geojson", "epsg:4326")
    GeoJson.writeFootprintsCsv(fps, s"$tmp/lux1.csv")
    val back = GeoJson.read(spark, s"$tmp/lux1.geojson").collect()
    assert(back.length == 8)
    assert(back.forall(_.props.contains("filename")))
    val csv = Files.readString(java.nio.file.Paths.get(s"$tmp/lux1.csv")).split("\n")
    assert(csv.head == "id,x,y,minx,miny,maxx,maxy,filename")
    assert(csv.length == 9)
    // x=i / y=j quirk: first row is chip (0,0)
    assert(csv(1).startsWith("0,0,0,"))
    // no CRS block for epsg:4326 (utils.py:171)
    assert(!Files.readString(java.nio.file.Paths.get(s"$tmp/lux1.geojson")).contains("crs"))
  }
}
