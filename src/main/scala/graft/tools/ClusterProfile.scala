package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall breakdown of dedup_clusters at a given sf dir: times the pair
  * stage alone, then the full pairs→clusters query, min-of-N each —
  * isolates the connected-components fixed cost from the LSH pipeline it
  * sits on. Usage: runMain graft.tools.ClusterProfile [sfDir] [reps] */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"$name: min=${walls.map(_._1).min}%.2f s all=${walls.map(w => f"${w._1}%.2f").mkString(",")} rows=${walls.head._2}")
    }
    time("pairs_only")(graft.QueryCatalog.queries("dedup_simhash_pairs")(spark, sfDir).count())
    time("clusters_full")(graft.QueryCatalog.queries("dedup_clusters")(spark, sfDir).count())
    // CC loop alone over PRE-MATERIALIZED pairs (parquet round-trip) —
    // isolates the iteration fixed cost from the LSH pipeline
    val tmp = java.nio.file.Files.createTempDirectory("graft_ccprof").toString
    graft.QueryCatalog.queries("dedup_simhash_pairs")(spark, sfDir)
      .write.mode("overwrite").parquet(s"$tmp/pairs")
    val pairsOnDisk = spark.read.parquet(s"$tmp/pairs")
    time("cc_only")(graft.operators.Dedup.connectedComponents(pairsOnDisk).count())
    spark.stop()
  }
}
