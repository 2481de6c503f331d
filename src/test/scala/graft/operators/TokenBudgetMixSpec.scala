package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget mixture sampling laws: the selected bucket prefix reaches
  * the budget, minimally (dropping the cutoff bucket would fall short), and
  * a source poorer than its budget is taken whole. */
class TokenBudgetMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("budget met minimally per source; poor sources taken whole; cutoff shrinks as corpus grows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val budgets = Map("src0" -> 300L, "src1" -> 200L)
    val sel = TextOps.tokenBudgetMix(docs, budgets, defaultBudget = 100000L)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(2)))

    val totals = docs
      .groupBy("source").agg(sum(size(split(col("text"), " "))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    totals.keys.foreach { src =>
      val budget = budgets.getOrElse(src, 100000L)
      val rows = sel.filter(_._1 == src)
      val selTok = rows.map(_._2).sum
      if (totals(src) <= budget) {
        // poorer than the budget: the whole source is selected
        assert(selTok == totals(src), s"$src should be taken whole")
      } else {
        assert(selTok >= budget, s"$src under budget: $selTok < $budget")
        // minimal: without the cutoff bucket the prefix falls short
        val cut = rows.map(_._3).max
        val withoutCut = rows.filter(_._3 < cut).map(_._2).sum
        assert(withoutCut < budget, s"$src cutoff bucket not minimal")
      }
    }

    // growth law: doubling the corpus (fresh ids, same source) can only
    // move src0's cutoff DOWN — the budget buys a smaller hash prefix
    val grown = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val cut0 = sel.filter(_._1 == "src0").map(_._3).max
    val cutG = TextOps.tokenBudgetMix(grown, budgets, defaultBudget = 100000L)
      .where(col("source") === "src0")
      .agg(max("bucket")).head().getLong(0)
    assert(cutG <= cut0, s"cutoff must not grow with the corpus: $cut0 -> $cutG")
  }
}
