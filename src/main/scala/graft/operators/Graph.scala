package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the crawl's domain graph — the curation
  * signal family (domain authority as a quality weight) that large-scale
  * web-corpus pipelines compute alongside text filters: Common-Crawl-style
  * curation weights documents by their domain's rank in the host/domain
  * link graph.
  */
object Graph {

  /** PageRank (Page et al. 1999) in exact INTEGER micro-units — designed
    * so the cross-engine gate is a hash match, not a float truce: ranks
    * live in millionths (r₀ = 1 000 000 = 1.0), each edge contribution is
    * floored by integer division BEFORE the sum, and the damping jump is
    * an integer constant, so every iterate is an exact integer on any
    * engine:
    *
    *   r_{t+1}(v) = jumpU + Σ_{(u,v,w)} (r_t(u) · dampNum · w) div (100 · W(u))
    *
    * with W(u) = Σ outlink weight of u. Dangling nodes (inlinks but no
    * outlinks) simply leak their mass — the standard drop-dangling
    * variant; total mass is then sub-stochastic, which is fine for the
    * RANKING use (curation weights), and exactly mirrored by the oracle.
    * A weight-1 symmetric cycle is an exact fixpoint at 1 000 000
    * (GraphSpec pins it), so the micro-unit flooring loses nothing on
    * balanced graphs and ≤ 1 µ-unit per edge elsewhere.
    *
    * Scale shape: the working state is the EDGE table with its
    * precomputed out-weights — checkpointed once; every iteration is one
    * edge-sized equi-join + a map-side-combined integer sum + a node-sized
    * left join (ranks for isolated-inlink nodes coalesce to the jump
    * term). Lineage is truncated per round with an eager localCheckpoint
    * (the CC-loop discipline — without it the driver re-analyzes the whole
    * accumulated plan every iteration); shuffles are graph-sized, never
    * corpus-sized, because the corpus collapses to (src, dst, w) before
    * the loop starts.
    *
    * edges: (src, dst, w) — pre-aggregated, self-loops already dropped.
    * Returns (node, rank_u) for every node appearing as src or dst. */
  def pageRank(edges: DataFrame, iters: Int = 10,
               dampNum: Long = 85L, jumpU: Long = 150000L): DataFrame = {
    require(iters >= 0)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
    val outW = edges.groupBy("src").agg(sum("w").as("wout"))
    // edge table + out-weights materialized ONCE; the loop re-joins it
    // every round, so its lineage must not include the corpus scan
    val ew = edges.join(outW, Seq("src")).localCheckpoint(true)
    val nodesCk = nodes.localCheckpoint(true)
    var ranks = nodesCk.withColumn("rank_u", lit(1000000L)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(rank_u * $dampNum * w) div (100 * wout)").as("c"))
        .groupBy("node").agg(sum("c").as("mass"))
      val next = nodesCk.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(jumpU) + coalesce(col("mass"), lit(0L))).as("rank_u"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
    }
    ranks
  }

  /** The deterministic domain link graph of the documents corpus (two
    * outlinks per doc by fixed affine maps over a 97-domain space,
    * self-loops dropped, multiplicity kept as edge weight) — the fixture
    * form of "aggregate per-page outlinks to the domain graph". Shared
    * verbatim with the DuckDB oracle. */
  def domainLinkGraph(docs: DataFrame, nDomains: Int = 97): DataFrame = {
    val d = lit(nDomains.toLong)
    docs.select((col("doc_id") % d).as("src"),
        ((col("doc_id") * 31 + 7) % d).as("dst"))
      .unionByName(docs.select((col("doc_id") % d).as("src"),
        ((col("doc_id") * 53 + 11) % d).as("dst")))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }
}
