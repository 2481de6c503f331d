package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of the key queries for plan review
  * (pushdown / pruning / broadcast / codegen spans). Not part of the
  * driver contract. Usage: runMain graft.tools.Explain [names...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "spatial_join_tiles", "knn", "knn_large",
        "dedup_minhash_lsh", "ann_topk", "url_dedup", "pii_redact")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) => println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None if n == "flagship" =>
          val labels = graft.sources.Fixtures.labelGeoms().map { case (g, c) =>
            (graft.core.Geom.toWkb(g), c) }
          val pages = spark.read.parquet("/tmp/graft_pages_2000000")
            .as[graft.sources.Model.Page](org.apache.spark.sql.Encoders.product[graft.sources.Model.Page])
          println(graft.operators.PagesTiling.extractChips(spark, pages,
            graft.sources.Fixtures.luxMeta(), labels = Some(labels))
            .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
        case None => println("unknown query")
      }
    }
    spark.stop()
  }
}
