package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock for the simhash pipeline — used to decide
  * which constant factor to attack (token distinct width, md5 per token,
  * the 60-column bit-sum aggregation, or the quarter-block join).
  * Usage: runMain graft.tools.SimhashProfile [sfDir] [rounds]. */
object SimhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val toks = split(col("text"), " ", -1)

    def timed(name: String)(f: => Long): Unit = {
      val walls = (1 to rounds).map { _ =>
        val t0 = System.nanoTime(); f; spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SIMPROF $name%-24s min=${walls.min}%6.2f s  all=${walls.map(w => f"$w%.2f").mkString(",")}")
    }

    timed("scan")(docs.count())
    timed("explode")(docs.select(col("doc_id"), explode(toks).as("tok")).count())
    timed("distinct_with_th")(docs
      .select(col("doc_id"), md5(col("text")).as("th"), explode(toks).as("tok"))
      .distinct().count())
    timed("distinct_no_th")(docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .distinct().count())
    timed("distinct+md5tok")(docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .distinct().select(col("doc_id"), h60(col("tok")).as("h"))
      .agg(sum("h")).count())
    timed("agg60_with_th")({
      val tok = docs.select(col("doc_id"), md5(col("text")).as("th"), explode(toks).as("tok"))
        .distinct().withColumn("h", h60(col("tok")))
      val bitSums = (0 until 60).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"s_$b"))
      tok.groupBy("doc_id", "th").agg(bitSums.head, bitSums.tail: _*).count()
    })
    timed("agg60_no_th")({
      val tok = docs.select(col("doc_id"), explode(toks).as("tok"))
        .distinct().withColumn("h", h60(col("tok")))
      val bitSums = (0 until 60).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"s_$b"))
      tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*).count()
    })
    timed("simhash_full")(graft.operators.Dedup.simhash(docs).count())
    timed("pairs_full")(graft.operators.Dedup.simhashPairs(docs, maxHamming = 12).count())
    spark.stop()
  }
}
