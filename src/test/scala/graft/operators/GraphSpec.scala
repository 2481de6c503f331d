package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact PageRank: the exact-fixpoint law on balanced cycles, and
  * equivalence with an independent in-memory reference on a fuzzed graph
  * with dangling nodes and weighted multi-edges. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  /** Plain-Scala replay of the integer iteration — same flooring, same
    * drop-dangling rule, written against Maps instead of DataFrames. */
  private def refPageRank(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val mass = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v, w) =>
        mass(v) += r(u) * 85L * w / (100L * wout(u))
      }
      r = nodes.map(n => n -> (150000L + mass(n))).toMap
    }
    r
  }

  test("weight-1 cycle is an exact fixpoint at 1_000_000 micro-units") {
    import spark.implicits._
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, iters = 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }

  test("fuzzed weighted graph with dangling nodes == in-memory reference, exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    // 25 nodes, 80 random weighted edges; node 24 receives but never sends
    // (dangling — its mass leaks, the drop-dangling rule)
    val raw = (0 until 80).map { _ =>
      val u = rnd.nextInt(24).toLong // never 24 as src
      var v = rnd.nextInt(25).toLong
      while (v == u) v = rnd.nextInt(25).toLong
      (u, v, (1 + rnd.nextInt(4)).toLong)
    }
    val edges = raw.groupBy(e => (e._1, e._2)).map { case ((u, v), es) =>
      (u, v, es.map(_._3).sum)
    }.toSeq
    val got = Graph.pageRank(edges.toDF("src", "dst", "w"), iters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPageRank(edges, 10)
    assert(got == want, s"engine=$got\nreference=$want")
    // hybrid contract: the forced distributed loop emits the identical map
    val loop = Graph.pageRank(edges.toDF("src", "dst", "w"), iters = 10,
        localEdgeLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loop == want, s"distributed loop diverged: $loop")
    // the dangling node's rank is jump + in-mass and total mass shrinks
    assert(got(24L) > 150000L)
    assert(got.values.sum < 25L * 1000000L)
  }

  test("domainLinkGraph: deterministic, self-loop-free, weights = link multiplicity") {
    import spark.implicits._
    val docs = (0L until 300L).toDF("doc_id")
    val g = Graph.domainLinkGraph(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(g.nonEmpty)
    assert(g.keys.forall { case (s, d) => s != d })
    assert(g.keys.forall { case (s, d) => s >= 0 && s < 97 && d >= 0 && d < 97 })
    // replay one doc's links by hand: doc 5 → (5, (5*31+7)%97) and (5, (5*53+11)%97)
    val d1 = (5L * 31 + 7) % 97
    val d2 = (5L * 53 + 11) % 97
    assert(g.contains((5L, d1)) && g.contains((5L, d2)))
  }
}
