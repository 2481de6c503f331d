package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Text pipeline ops: URL canonicalization rules, PII patterns, and the
  * distributed-prefix-sum sequence packer's partition invariance. */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("canonicalizeUrl: case, default port, fragment, tracking params, param order") {
    assert(TextOps.canonicalizeUrl("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&z=1&a=2#frag")
      == "https://www.example.com/a/b?a=2&z=1")
    assert(TextOps.canonicalizeUrl("http://host.org:8080/p?fbclid=abc")
      == "http://host.org:8080/p")
    assert(TextOps.canonicalizeUrl("https://host.org") == "https://host.org/")
  }

  test("redactPii finds exactly the planted emails/phones") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to a.b-c_d@sub.example.io or call 555-123-4567 today"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.com and z@w.org, number 123-456-7890 but not 12-34-5678"))
      .toDF("doc_id", "text")
    val out = TextOps.redactPii(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"), r.getAs[String]("text"))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(1L)._3 == "write to <EMAIL> or call <PHONE> today")
    assert(out(2L) == ((0, 0, "no pii here at all")))
    assert(out(3L)._1 == 2 && out(3L)._2 == 1)
  }

  test("packSequences: bins are partition-count-invariant and sequential-fill exact") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def bins(df: org.apache.spark.sql.DataFrame) =
      TextOps.packSequences(df, capacity = 256).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = bins(docs)
    val b = bins(docs.repartition(13))
    val c = bins(docs.repartition(1))
    assert(a.sameElements(b) && a.sameElements(c),
      "bin assignment must not depend on input partitioning")
    // exact sequential-fill law: bin = floor(prefix-exclusive / capacity)
    var prefix = 0L
    a.foreach { case (_, n, bin) =>
      assert(bin == prefix / 256)
      prefix += n
    }
    spark.catalog.clearCache()
  }
}
