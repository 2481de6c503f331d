package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CellIndex

/** Cover compaction: exact area preservation (expanding the mixed-res
  * result recovers the input cell set exactly), minimality (no complete
  * sibling quad survives at any level), and a hand-built collapse chain. */
class CellOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("hand case: one complete quad collapses (recursively), strays stay") {
    import spark.implicits._
    // all 16 res-2 descendants of res-0 cell 3 → collapses two levels to
    // the single res-0 cell; plus a stray res-2 cell 0
    val cells = ((48L until 64L) :+ 0L).toDF("cell")
    val got = CellOps.compactCells(cells, res = 2, minRes = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((3L, 0), (0L, 2)))
  }

  test("fuzzed cover: expansion recovers the input exactly; no complete quad survives") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val res = 6
    // clustered cells: dense blobs (complete quads exist) + sparse noise
    val blob = for (bx <- 0L until 8L; by <- 0L until 8L)
      yield CellIndex.encode(16L + bx, 24L + by)
    val noise = (0 until 300).map(_ =>
      CellIndex.encode(rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
    val input = (blob ++ noise).distinct
    val got = CellOps.compactCells(input.toDF("cell"), res, minRes = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // exact area: expand every (cell, r) to its res-6 descendants
    val expanded = got.flatMap { case (c, r) =>
      val levels = res - r
      (0L until (1L << (2 * levels))).map(off => (c << (2 * levels)) | off)
    }
    assert(expanded.length == expanded.distinct.length, "overlapping cells in output")
    assert(expanded.toSet == input.toSet, "compaction changed the covered area")
    // minimality: no 4 siblings at the same res
    val byParent = got.groupBy { case (c, r) => (c >>> 2, r) }
    assert(byParent.values.forall(_.size < 4), "a complete sibling quad survived")
    // compaction did real work on the blob
    assert(got.length < input.size)
  }
}
