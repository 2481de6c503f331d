package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit, sum}

/** Hot-cell skew evidence (north star: "kNN … with a salted sort-merge
  * fallback for hot cells"; SURVEY §7.3 item 2): 90% of pages land in ONE
  * res-16 cell. The flagship's default broadcast join is skew-immune (the
  * pages side never shuffles by cell, and the two-level aggregation
  * pre-combines map-side), so to exercise the salted fallback this bench
  * DISABLES broadcast, forcing the shuffle join path, and compares
  * salt=1 (hot key on one reducer) vs salt=8 (hot key split 8 ways) plus
  * the max task time of the join stage. Usage:
  *   runMain graft.tools.SkewBench [nPages]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      .config("spark.sql.adaptive.enabled", "false")        // isolate OUR salting
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/tmp/graft_skewed_$n"
    // isolate the JOIN: materialize the geotagged table once (the html
    // extract is embarrassingly parallel and would otherwise mask the
    // join-stage skew entirely)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS")))
      graft.operators.PagesTiling.geotagged(spark,
          graft.sources.Fixtures.skewedPages(spark, n), res = 16)
        .write.mode("overwrite").parquet(dir)
    val geo = spark.read.parquet(dir)

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          maxTaskMs.getAndUpdate(m => math.max(m, e.taskMetrics.executorRunTime))
    })

    def run(salt: Int): (Double, Long, Long) = {
      val cfg = graft.operators.PagesTiling.TilingConfig(salt = salt, cellRes = 16)
      val tiles = graft.operators.PagesTiling.tileCells(spark,
        graft.sources.Fixtures.luxMeta(), cfg)
      def joined = graft.operators.PagesTiling.assignTiles(geo, tiles, cfg)
        .groupBy("i", "j").agg(count(lit(1)).as("n"))
      joined.agg(sum("n")).head() // warm-up
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val agg = graft.operators.PagesTiling.assignTiles(geo, tiles, cfg)
        .groupBy("i", "j").agg(count(lit(1)).as("n"))
        .agg(sum("n")).head()
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0), maxTaskMs.get())
    }

    val (w1, e1, m1) = run(salt = 1)
    val (w8, e8, m8) = run(salt = 8)
    require(e1 == e8, s"salted join must not change results: $e1 vs $e8")
    println(f"""{"metric":"hot-cell skew (shuffle-join path, broadcast off)","pages":$n,"emitted":$e1,"wall_salt1":$w1%.3f,"wall_salt8":$w8%.3f,"max_task_ms_salt1":$m1,"max_task_ms_salt8":$m8,"speedup":${w1 / w8}%.2f}""")
    spark.stop()
  }
}
