package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication family for the training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup. All pure
  * `functions._` relational plans (codegen'd, shuffle only on the group/join
  * keys) — at 100 TB the LSH variants shuffle only (band_key, doc_id) pairs,
  * never the documents themselves. */
object Dedup {

  /** Engine-portable 60-bit hash: md5 → 15 hex chars → bigint. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def toks(c: Column): Column = split(c, " ")

  /** Word w-shingles of the text, as strings; empty when n < w
    * (sequence(1, 0) would DESCEND in Spark, so guard explicitly). */
  def shingles(c: Column, w: Int): Column = {
    val t = toks(c)
    when(size(t) >= w,
      transform(sequence(lit(1), size(t) - lit(w - 1)),
        i => concat_ws(" ", slice(t, i, lit(w)))))
      .otherwise(array())
  }

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * Output: (text_hash, n_copies, keeper_id). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))

  /** Collapse exact-duplicate texts to one representative (min doc_id)
    * BEFORE any quadratic blocking stage: D identical docs in one LSH
    * bucket would otherwise contribute D²/2 candidate pairs — the classic
    * hot-bucket blowup on a real corpus, where exact duplicates dominate.
    * Returns (reps, members): `reps` is one (doc_id, text) row per distinct
    * text; `members` maps every doc_id to its group's representative.
    * Pair sets are preserved EXACTLY: signatures/shingles/simhashes depend
    * only on the text, so (mᴬ, mᴮ) is a candidate iff (repᴬ, repᴮ) is, and
    * the verified score is identical — [[expandPairs]] restores the full
    * pair set, and within-group pairs are emitted directly (score = exact
    * match) by the callers. */
  private def collapseExact(docs: DataFrame): (DataFrame, DataFrame) = {
    // groupBy(text) instead of a window over md5(text): partial aggregation
    // combines duplicates map-side (on a dup-heavy corpus the shuffle
    // carries each distinct text ~once) and needs no sort
    val reps = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val members = docs.select(col("doc_id"), md5(col("text")).as("th"))
      .join(reps.select(md5(col("text")).as("th"), col("doc_id").as("rep")), Seq("th"))
      .select("doc_id", "rep")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    (reps, members)
  }

  /** Expand representative-level pairs back to all member pairs, preserving
    * the payload columns (scores depend only on the texts, which are
    * identical within a group). Emits doc_a < doc_b. */
  private def expandPairs(repPairs: DataFrame, members: DataFrame,
                          payload: Seq[String]): DataFrame =
    repPairs
      .join(members.select(col("rep").as("doc_a"), col("doc_id").as("ma")), Seq("doc_a"))
      .join(members.select(col("rep").as("doc_b"), col("doc_id").as("mb")), Seq("doc_b"))
      .select(least(col("ma"), col("mb")).as("doc_a") +:
        greatest(col("ma"), col("mb")).as("doc_b") +: payload.map(col): _*)

  /** MinHash signatures: nHashes permutations approximated by salted md5;
    * minhash_i(doc) = min over shingles of h60(i || ':' || shingle). */
  def minhashSignatures(docs: DataFrame, w: Int = 3, nHashes: Int = 8): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"), w)).as("sh"))
      .distinct() // shingle *sets*
    val aggs = (0 until nHashes).map(i =>
      min(h60(concat(lit(s"$i:"), col("sh")))).as(s"mh_$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH candidate pairs → verified Jaccard over shingle sets.
    * bands of `rowsPerBand` signature values; candidates share ≥1 band.
    * Returns (doc_a, doc_b, jaccard_num, jaccard_den) with a<b and
    * jaccard ≥ minJaccard (kept as an exact fraction for determinism).
    * Exact duplicates are collapsed before blocking ([[collapseExact]])
    * and their pairs restored afterwards — same output, no hot-bucket
    * quadratics. */
  def minhashLsh(docs: DataFrame, w: Int = 3, nHashes: Int = 8,
                 rowsPerBand: Int = 2, minJaccard: Double = 0.5): DataFrame = {
    val (reps, members) = collapseExact(docs)
    // ONE shingle table shared by the signature aggregation and the verify
    // join — the explode + distinct shuffle (the dominant scan at 100 TB)
    // happens once instead of twice
    val sh = shingleTable(reps, w)
    val aggs = (0 until nHashes).map(i =>
      min(h60(concat(lit(s"$i:"), col("sh")))).as(s"mh_$i"))
    val sig = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val nBands = nHashes / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      sig.select(col("doc_id"),
        lit(b).as("band"), md5(concat_ws("_", cols: _*)).as("band_key"))
    }.reduce(_ unionByName _)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    expandJaccardPairs(verifyJaccardOnShingles(sh, cand, minJaccard), members, sh)
  }

  private def shingleTable(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"), w)).as("sh")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK_SER)

  /** Exact Jaccard over candidate pairs against a prepared (doc_id, sh)
    * shingle table (blocked joins, never a cross join). */
  def verifyJaccardOnShingles(sh: DataFrame, cand: DataFrame,
                              minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .withColumn("jaccard_num", col("n_common"))
      .withColumn("jaccard_den", col("n_a") + col("n_b") - col("n_common"))
      .where(col("jaccard_num") >= col("jaccard_den") * lit(minJaccard))
      .select("doc_a", "doc_b", "jaccard_num", "jaccard_den")
  }

  /** Exact n-gram Jaccard over candidate pairs. */
  def verifyJaccard(docs: DataFrame, cand: DataFrame, w: Int,
                    minJaccard: Double): DataFrame =
    verifyJaccardOnShingles(shingleTable(docs, w), cand, minJaccard)

  /** Representative pairs → all member pairs for the Jaccard family:
    * cross-group pairs expand with their verified fraction; within-group
    * pairs (identical texts) are exact matches (num = den = |shingles|),
    * emitted only when the shingle set is non-empty — mirroring the
    * blocked pipeline, where shingle-less docs never become candidates. */
  private def expandJaccardPairs(repPairs: DataFrame, members: DataFrame,
                                 sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id").as("rep")).agg(count(lit(1)).as("n_sh"))
    val grouped = members.join(sizes, Seq("rep"))
    val within = grouped.as("x").join(grouped.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n_sh").as("jaccard_num"), col("x.n_sh").as("jaccard_den"))
    expandPairs(repPairs, members, Seq("jaccard_num", "jaccard_den"))
      .unionByName(within)
  }

  /** n-gram Jaccard near-dup: candidates = pairs sharing any shingle
    * (shingle-blocked join), verified exactly. Exact-dup collapse as in
    * [[minhashLsh]]. */
  def ngramJaccard(docs: DataFrame, w: Int = 3, minJaccard: Double = 0.3): DataFrame = {
    val (reps, members) = collapseExact(docs)
    val sh = shingleTable(reps, w)
    val cand = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    expandJaccardPairs(verifyJaccardOnShingles(sh, cand, minJaccard), members, sh)
  }

  /** SimHash: 60-bit fingerprint from token hashes — bit b of the simhash is
    * the majority vote of bit b over the distinct tokens' h60 values.
    * Pure relational: explode tokens → per-bit sums → reassemble. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .distinct()
      .withColumn("h", h60(col("tok")))
    val bitSums = (0 until 60).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"s_$b"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 60).map(b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: block by the 4 15-bit quarters (Hamming ≤ 3 ⇒
    * at least one quarter equal), verify Hamming distance exactly.
    * Exact-dup collapse as in [[minhashLsh]]: identical texts share every
    * quarter (hottest possible block), so D copies would be D²/2
    * candidates; collapsed, they re-enter as within-group hamming-0 pairs. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val (reps, members) = collapseExact(docs)
    // fingerprints feed 4 block projections × 2 join sides — persist
    val sig = simhash(reps).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val blocks = (0 until 4).map(q =>
      sig.select(col("doc_id"), col("simhash"),
        lit(q).as("q"), shiftright(col("simhash"), q * 15).bitwiseAND(lit(0x7fffL)).as("qk")))
      .reduce(_ unionByName _)
    val cand = blocks.as("x").join(blocks.as("y"),
        col("x.q") === col("y.q") && col("x.qk") === col("y.qk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.simhash").as("sim_a"),
        col("y.doc_id").as("doc_b"), col("y.simhash").as("sim_b"))
      .distinct()
    val repPairs = cand
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
    val within = members.as("x").join(members.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0).cast("int").as("hamming"))
    expandPairs(repPairs, members, Seq("hamming")).unionByName(within)
  }
}
