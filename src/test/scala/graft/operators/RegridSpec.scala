package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fixtures

class RegridSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("retile 128/whole_overlap → 64/exact equals direct 64-grid generation") {
    val src = Fixtures.luxTiles(spark) // 128 whole_overlap
    val got = Regrid.retile(spark, src, Fixtures.LuxWidth, Fixtures.LuxHeight, 64)
      .collect().map(t => (t.i, t.j) -> t).toMap
    val want = Fixtures.luxTiles(spark, 64, 64, "exact")
      .collect().map(t => (t.i, t.j) -> t).toMap
    assert(got.keySet == want.keySet)
    assert(got.nonEmpty)
    got.foreach { case (k, g) =>
      val w = want(k)
      assert(g.col_off == w.col_off && g.row_off == w.row_off &&
        g.width == w.width && g.height == w.height)
      assert(g.pixels.length == w.pixels.length)
      g.pixels.zip(w.pixels).foreach { case (gb, wb) =>
        assert(gb.sameElements(wb), s"pixel mismatch at $k")
      }
    }
  }
}
