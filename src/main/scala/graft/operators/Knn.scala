package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => WExpr}

import graft.functions.CellFunctions

/** Exact kNN by cell ring expansion (SURVEY.md G4, north-star requirement):
  * probe cells in growing Chebyshev rings around each query's cell and stop
  * once the k-th candidate distance is provably closer than anything outside
  * the explored disk (outside ring r ⇒ coordinate gap ≥ r · 180/2^res).
  *
  * All rounds are DataFrame equi-joins on cell (the query side is tiny and
  * broadcast); no RDDs, no cross join. For hot cells the points side is
  * already pre-aggregated per cell by the join pruning; a salted sort-merge
  * fallback is unnecessary below ~10^5 candidates per cell but the points
  * input can be pre-salted by the caller with the same semantics.
  */
object Knn {

  /** points: (id: Long, lat, lon); queries: (qid, qlat, qlon) — small.
    * Returns (qid, rank, id, dist2) with rank 1..k by squared euclidean
    * degrees, ties broken by id. */
  def knnRingExpansion(spark: SparkSession, points: DataFrame, queries: DataFrame,
                       k: Int, res: Int = 4): DataFrame = {
    val cellH = 180.0 / (1L << res).toDouble
    val pts = points
      .withColumn("cell", CellFunctions.cell_id(col("lat"), col("lon"), lit(res)))

    val qRows = queries.select("qid", "qlat", "qlon").collect()
    // queries are a handful of rows by contract; the expansion radius is
    // driven per query but executed set-at-a-time
    var r = 1 // start with disk radius 1 (ring 0 alone rarely satisfies the bound)
    val maxR = (1 << res)
    var result: DataFrame = null
    var done = false
    while (!done) {
      val qCells = queries
        .withColumn("qcell", CellFunctions.cell_id(col("qlat"), col("qlon"), lit(res)))
        .withColumn("cell", explode(CellFunctions.k_ring(col("qcell"), lit(r), lit(res))))
        .drop("qcell")
      val cand = pts.join(broadcast(qCells), "cell")
        .withColumn("dist2",
          (col("lat") - col("qlat")) * (col("lat") - col("qlat")) +
            (col("lon") - col("qlon")) * (col("lon") - col("qlon")))
      val w = WExpr.partitionBy(col("qid")).orderBy(col("dist2"), col("id"))
      val topk = cand.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("qid", "rank", "id", "dist2")
      // stop when every query has k hits and its k-th distance STRICTLY beats
      // the closest possible unexplored point (gap ≥ r·cellH). Strict < :
      // at kd == bound an unprobed point at exactly that distance with a
      // smaller id would win the row_number tie-break, so one more (cheap)
      // expansion round is required to certify the ordering.
      val bound = (r.toDouble * cellH) * (r.toDouble * cellH)
      val stats = topk.groupBy("qid").agg(count(lit(1)).as("n"), max("dist2").as("kd"))
        .collect().map(x => (x.getAs[Long]("n"), x.getAs[Double]("kd")))
      val allOk = stats.length == qRows.length &&
        stats.forall { case (n, kd) => n >= k && kd < bound }
      if (allOk || r >= maxR) { result = topk; done = true }
      else r = math.min(r * 2, maxR)
    }
    result
  }
}
