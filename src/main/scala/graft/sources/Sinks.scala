package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import graft.sources.Model.Tile

/** Chip/mask/mosaic sinks (reference S5–S7, S11).
  * A chip row IS the GTiff payload logically: pixels + window + affine
  * metadata columns; the storage format is parquet partitioned by raster.
  * VRT mosaicking (gdalbuildvrt, utils.py:284-302) is a lazy unionByName —
  * a virtual view, no data movement. */
object Sinks {

  /** S5/S6: chips sink. `chip_type` only affects filenames (like jpg vs
    * tif in the reference). */
  def writeChips(chips: DataFrame, outDir: String): Unit =
    chips.write.mode(SaveMode.Overwrite)
      .partitionBy("raster_id").parquet(s"$outDir/images")

  /** S7: masks sink, partitioned by kind like the reference's per-kind
    * directories. */
  def writeMasks(masks: DataFrame, outDir: String): Unit =
    masks.write.mode(SaveMode.Overwrite)
      .partitionBy("kind").parquet(s"$outDir/masks")

  /** S11: virtual mosaic of tile tables — pure lazy union, the engine's
    * gdalbuildvrt. */
  def mosaic(tileTables: Seq[Dataset[Tile]]): Dataset[Tile] =
    tileTables.reduce(_ unionByName _)
}
