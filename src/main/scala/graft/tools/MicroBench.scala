package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-isolation harness for per-row kernel costs inside Spark (guide
  * §1 empirical loop; not part of the driver contract). Times a few
  * synthetic pipelines that isolate suspected overheads. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(name: String)(f: => Any): Unit = {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name%-32s min=${walls.min}%6.3f all=${walls.map(w => f"$w%.3f").mkString(",")}")
    }

    val n = 5000L
    timed("range_count")(spark.range(n).repartition(cpus.toInt).count())
    timed("encode_wav_only")(spark.range(n).repartition(cpus.toInt)
      .as[Long].map(k => graft.operators.Multimodal.encodeWav(k).length).agg(Map("value" -> "sum")).head())
    timed("encode_plus_hash")(spark.range(n).repartition(cpus.toInt)
      .as[Long].map(k => java.lang.Long.bitCount(graft.operators.Multimodal.aHash60(
        graft.operators.Multimodal.encodeWav(k)))).agg(Map("value" -> "sum")).head())
    timed("mediarow_dataset")(graft.operators.Multimodal.nearDupAudioFromDocs(spark,
      spark.range(n).select(org.apache.spark.sql.functions.col("id").as("doc_id")))
      .mapPartitions(_.map(r => (r.doc_id, graft.operators.Multimodal.aHash60(r.payload))))
      .toDF("id", "h").count())
    timed("encode_png_hash")(spark.range(n).repartition(cpus.toInt)
      .as[Long].map(k => java.lang.Long.bitCount(graft.operators.Multimodal.dHash60(
        graft.operators.Multimodal.encodePng(k)))).agg(Map("value" -> "sum")).head())
    spark.stop()
  }
}
