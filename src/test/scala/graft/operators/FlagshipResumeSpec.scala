package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.core.Geom
import graft.sources.{Fixtures, IcebergLite}

/** North-rule end-to-end on the flagship: first run commits all tiles with
  * manifest + lineage + metrics; a crash-rerun commits nothing new; after
  * invalidating part of the manifest, resume recomputes ONLY the missing
  * tiles and the final table equals a from-scratch run. */
class FlagshipResumeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("flagship resumable run: exactly-once commit, partial-manifest resume") {
    val tmp = Files.createTempDirectory("flagship").toString
    val table = new IcebergLite(tmp, spark)
    val labels = Fixtures.labelGeoms().map { case (g, c) => (Geom.toWkb(g), c) }
    def run(): Long = PagesTiling.extractChipsResumable(spark,
      Fixtures.pages(spark, 20000), Fixtures.luxMeta(), table, Some(labels))

    assert(run() == 8) // first run commits all 8 tiles
    assert(run() == 0) // rerun: manifest anti-join finds nothing pending
    val data = table.readData("chips")
    assert(data.count() == 8)
    // lineage + metrics side-tables populated
    assert(spark.read.parquet(s"$tmp/metadata/lineage").count() == 8)
    assert(table.metrics().where(col("stage") === "chips").count() == 1)

    // simulate a partially-committed job: rebuild the table with only 3
    // manifest rows committed, then resume
    val tmp2 = Files.createTempDirectory("flagship2").toString
    val table2 = new IcebergLite(tmp2, spark)
    val all = table.readData("chips")
      .withColumn("tile_key", concat_ws("_", col("raster_id"), col("i"), col("j")))
    val part = all.limit(3)
    table2.commit(Some((part.drop("tile_key"), "chips")),
      part.select(col("tile_key").as("part_key")), "chips-append")
    val resumed = PagesTiling.extractChipsResumable(spark,
      Fixtures.pages(spark, 20000), Fixtures.luxMeta(), table2, Some(labels))
    assert(resumed == 5) // only the 5 missing tiles recomputed
    val final2 = table2.readData("chips")
    assert(final2.count() == 8)
    // resumed table content equals the from-scratch run (same tiles, same counts)
    val a = data.select("raster_id", "i", "j", "n_pages").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val b = final2.select("raster_id", "i", "j", "n_pages").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(a == b)
  }
}
