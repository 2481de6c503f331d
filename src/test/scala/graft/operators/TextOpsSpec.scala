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

  test("gopherQuality: each signal trips on exactly its planted pathological doc") {
    import spark.implicits._
    // 22 words, 21 all-distinct bigrams, 6 Gopher stopwords, mean len 95/22
    val good = "the quick brown fox jumps over the lazy dog and runs across " +
      "wide fields with great speed to reach that distant river"
    val df = Seq(
      (1L, good),                                // passes everything
      (2L, "too short doc the end"),             // n_words < 15, all else ok
      (3L, ("spam ham " * 20).trim + " the"),    // dup-bigram fraction only
      (4L, good + " # ... #"),                   // symbol ratio only (3 symbols / 25 words)
      (5L, ("aa " * 20).trim + " the"),          // mean word length < 3
      (6L, "12345 67890 13579 24680 98765 the quick brown fox jumps over lazy dogs running fast"), // alpha 10/15 only
      (7L, "quick brown fox jumps high above lazy dog while many animals watch quietly from nearby green hills") // no stopwords only
    ).toDF("doc_id", "text")
    val rows = TextOps.gopherQuality(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("gopher_ok"), "control doc must pass")
    (2L to 7L).foreach(id =>
      assert(!rows(id).getAs[Boolean]("gopher_ok"), s"doc $id must fail its planted signal"))
    // exact signal values on the control doc
    assert(rows(1L).getAs[Long]("n_words") == 22)
    assert(rows(1L).getAs[Long]("n_letters") == 95)
    assert(rows(1L).getAs[Long]("n_stop") == 6)
    assert(rows(1L).getAs[Long]("n_bigrams") == 21)
    assert(rows(1L).getAs[Long]("n_dup_bigrams") == 0)
    // and single-cause failures where the doc was built for one signal
    assert(rows(4L).getAs[Long]("n_symbols") == 3)
    assert(rows(3L).getAs[Long]("n_dup_bigrams") == 40 - 3)
    assert(rows(7L).getAs[Long]("n_stop") == 0)
  }

  test("decontaminate: planted 5-gram overlap is flagged; corpus side never shuffles") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "clean document with no overlap whatsoever in any span of words"),
      (2L, "prefix words then alpha beta gamma delta epsilon copied from the benchmark"),
      (3L, "two hits alpha beta gamma delta epsilon zeta here"), // grams 1+2 of bench
      (4L, "short doc")
    ).toDF("doc_id", "text")
    val out = TextOps.decontaminate(docs, bench, w = 5)
    val got = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) == ((0L, false)))
    assert(got(2L) == ((1L, true)))
    assert(got(3L) == ((2L, true)))
    assert(got(4L) == ((0L, false)))
    // the 100-TB contract: the corpus side is one mapPartitions pass over
    // the scan — no Exchange anywhere in the plan (benchmark is collected)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "decontaminate must not shuffle the corpus")
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
