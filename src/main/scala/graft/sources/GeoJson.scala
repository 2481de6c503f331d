package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.locationtech.jts.geom._

import graft.core.Geom
import graft.sources.Model.Feature

/** GeoJSON vector source/sink (reference S2/S8: fiona reads in masks.py:
  * 245-272 / chips.py:364-369; footprints writer utils.py:141-185).
  *
  * Files are read distributed (one FeatureCollection per file ⇒ wholetext),
  * parsed with Jackson (already on the Spark classpath), geometries
  * converted GeoJSON→JTS→WKB. Invalid geometries are dropped with the same
  * tolerance as the reference's get_shape warning path (chips.py:343-361).
  */
object GeoJson {

  def read(spark: SparkSession, path: String): Dataset[Feature] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String]
      .flatMap(parseCollection)
  }

  /** Parse a FeatureCollection document into features. */
  def parseCollection(doc: String): Seq[Feature] = {
    val root = new ObjectMapper().readTree(doc)
    val feats = Option(root.get("features")).map(f =>
      (0 until f.size).map(f.get)).getOrElse(Seq(root))
    feats.flatMap { f =>
      val geomNode = f.get("geometry")
      if (geomNode == null || geomNode.isNull) None
      else {
        try {
          val g = geomFromJson(geomNode)
          if (!g.isValid) None
          else {
            val props = Option(f.get("properties")).filter(!_.isNull).map { p =>
              val it = p.properties().iterator()
              val b = Map.newBuilder[String, String]
              while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
              b.result()
            }.getOrElse(Map.empty[String, String])
            Some(Feature(Geom.toWkb(g), props))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  def geomFromJson(n: JsonNode): Geometry = {
    val f = Geom.factory
    def coord(c: JsonNode) = new Coordinate(c.get(0).asDouble, c.get(1).asDouble)
    def ring(r: JsonNode): LinearRing =
      f.createLinearRing((0 until r.size).map(i => coord(r.get(i))).toArray)
    def poly(p: JsonNode): Polygon = {
      val shell = ring(p.get(0))
      val holes = (1 until p.size).map(i => ring(p.get(i))).toArray
      f.createPolygon(shell, holes)
    }
    val cs = n.get("coordinates")
    n.get("type").asText match {
      case "Point" => f.createPoint(coord(cs))
      case "LineString" =>
        f.createLineString((0 until cs.size).map(i => coord(cs.get(i))).toArray)
      case "MultiLineString" =>
        f.createMultiLineString((0 until cs.size).map(i =>
          f.createLineString((0 until cs.get(i).size).map(j => coord(cs.get(i).get(j))).toArray)).toArray)
      case "Polygon" => poly(cs)
      case "MultiPolygon" =>
        f.createMultiPolygon((0 until cs.size).map(i => poly(cs.get(i))).toArray)
      case other => throw new IllegalArgumentException(s"unsupported geometry $other")
    }
  }

  def geomToJson(g: Geometry): String = {
    def coords(c: Coordinate): String = s"[${c.x},${c.y}]"
    def ring(r: LineString): String = r.getCoordinates.map(coords).mkString("[", ",", "]")
    def poly(p: Polygon): String =
      (ring(p.getExteriorRing) +: (0 until p.getNumInteriorRing).map(i => ring(p.getInteriorRingN(i))))
        .mkString("[", ",", "]")
    g match {
      case p: Point => s"""{"type":"Point","coordinates":${coords(p.getCoordinate)}}"""
      case l: LineString => s"""{"type":"LineString","coordinates":${ring(l)}}"""
      case p: Polygon => s"""{"type":"Polygon","coordinates":${poly(p)}}"""
      case mp: MultiPolygon =>
        val parts = (0 until mp.getNumGeometries).map(i => poly(mp.getGeometryN(i).asInstanceOf[Polygon]))
        s"""{"type":"MultiPolygon","coordinates":${parts.mkString("[", ",", "]")}}"""
      case other => throw new IllegalArgumentException(s"unsupported geometry ${other.getGeometryType}")
    }
  }

  /** Footprints GeoJSON sink (utils.py:141-185): FeatureCollection with a
    * CRS block unless epsg:4326; properties {id, x, y, filename} and the
    * reference's x=i / y=j quirk preserved by the caller's columns.
    * The feature list is small (footprints of one raster) ⇒ driver-side
    * assembly like the reference, after a distributed sort. */
  def writeFootprints(footprints: DataFrame, outPath: String, crs: String): Unit = {
    val rows = footprints.orderBy("id").collect()
    val features = rows.map { r =>
      val geom = Geom.box(r.getAs[Double]("minx"), r.getAs[Double]("miny"),
        r.getAs[Double]("maxx"), r.getAs[Double]("maxy"))
      s"""{"type":"Feature","geometry":${geomToJson(geom)},"properties":{"id":${r.getAs[Long]("id")},"x":${r.getAs[Int]("x")},"y":${r.getAs[Int]("y")},"filename":"${r.getAs[String]("filename")}"}}"""
    }
    val crsBlock =
      if (crs == "epsg:4326") ""
      else s""""crs":{"type":"name","properties":{"name":"urn:ogc:def:crs:EPSG::${crs.split(':')(1)}"}},"""
    val doc = s"""{"type":"FeatureCollection",$crsBlock"features":[${features.mkString(",")}]}"""
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, doc)
  }

  /** Footprints CSV sink (utils.py:188-221): header id,x,y,minx,miny,maxx,
    * maxy,filename. */
  def writeFootprintsCsv(footprints: DataFrame, outPath: String): Unit = {
    val rows = footprints.orderBy("id").collect()
    val sb = new StringBuilder("id,x,y,minx,miny,maxx,maxy,filename\n")
    rows.foreach { r =>
      sb.append(s"${r.getAs[Long]("id")},${r.getAs[Int]("x")},${r.getAs[Int]("y")},")
      sb.append(s"${r.getAs[Double]("minx")},${r.getAs[Double]("miny")},${r.getAs[Double]("maxx")},${r.getAs[Double]("maxy")},")
      sb.append(s"${r.getAs[String]("filename")}\n")
    }
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, sb.toString)
  }
}
