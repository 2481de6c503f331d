package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication family for the training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup. All pure
  * `functions._` relational plans (codegen'd, shuffle only on the group/join
  * keys) — at 100 TB the LSH variants shuffle only (band_key, doc_id) pairs,
  * never the documents themselves.
  *
  * Two scale guards bound the classic hot-bucket quadratics:
  *
  *  1. '''Exact-duplicate collapse''' ([[collapseExact]]) — D identical
  *     documents in one LSH bucket would contribute D²/2 candidate pairs;
  *     collapsed to one representative they contribute 0, and the pairs are
  *     restored exactly afterwards. Collapse costs ~3 extra shuffles, so it
  *     is engaged '''adaptively''': a one-pass hash-only probe
  *     ([[dupPairMass]]) measures the exact duplicate-driven candidate mass
  *     Σ Dᵢ(Dᵢ−1) and collapses only when it exceeds
  *     `collapseThreshold × N` (default [[CollapsePairsPerDoc]]).  The two
  *     paths are provably output-identical (signatures, shingles and
  *     simhashes depend only on the text), which DedupEquivalenceSpec pins.
  *  2. '''Blocking-key document-frequency cap''' — a blocking key (shingle,
  *     band signature, simhash quarter) shared by many *distinct* documents
  *     (boilerplate phrases, templated pages) produces DF²/2 candidates.
  *     Keys whose DF — counted over distinct texts, so both collapse paths
  *     agree — exceeds the cap are dropped from candidate generation
  *     ([[dropHotKeys]]).  This is the standard LSH trade: bounded recall
  *     loss on boilerplate keys for a hard `DF ≤ cap` bound per key.
  *     Verification is unaffected (Jaccard / Hamming are still computed on
  *     the full shingle set / fingerprint), and the DuckDB oracles mirror
  *     the identical cap.
  *
  * Caching contract: each operator persists its blocking intermediates
  * (shingle table, capped key tables, signatures) for the lifetime of the
  * returned DataFrame's evaluation — they CANNOT be unpersisted here
  * because the result is lazy. A long-lived session running many dedup
  * queries should `spark.catalog.clearCache()` between them (Verify/Bench
  * do); otherwise the cached blocks are bounded only by LRU eviction. */
object Dedup {

  /** DF cap for shingle blocking keys (ngram Jaccard candidates). */
  val ShingleDfCap = 64
  /** DF cap for MinHash band keys (bands of 2 of 8 minhashes are already
    * selective; the cap only guards degenerate corpora). */
  val BandDfCap = 64
  /** DF cap for simhash 15-bit quarter keys — the least selective blocking
    * family (similar templated texts cluster on quarters). */
  val QuarterDfCap = 128
  /** Collapse probe threshold: collapse exact dups before blocking when the
    * duplicate-driven candidate mass Σ Dᵢ(Dᵢ−1) exceeds this many pairs per
    * document — i.e. when dup quadratics would outweigh the ~3 extra
    * shuffles the collapse costs. */
  val CollapsePairsPerDoc = 4.0

  /** Engine-portable 60-bit hash: md5 → 15 hex chars → bigint. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def toks(c: Column): Column = split(c, " ")

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * Output: (text_hash, n_copies, keeper_id). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))

  /** Exact duplicate-group profile in ONE hash-only aggregation (the shuffle
    * carries (md5, partial count) pairs, combined map-side): returns
    * (Σ Dᵢ(Dᵢ−1) as a double, N).  Σ Dᵢ(Dᵢ−1) is exactly twice the number of
    * candidate pairs that exact duplicates would inject into any blocking
    * stage — the quantity the collapse exists to eliminate. */
  private[graft] def dupPairMass(docs: DataFrame): (Double, Long) = {
    val r = docs.groupBy(md5(col("text")).as("th"))
      .agg(count(lit(1)).cast("double").as("n"))
      .agg(sum(col("n") * (col("n") - lit(1.0))).as("mass"),
        sum(col("n")).as("total"))
      .head()
    if (r.isNullAt(0)) (0.0, 0L) else (r.getDouble(0), r.getDouble(1).toLong)
  }

  /** `threshold < 0` forces collapse, `Double.PositiveInfinity` forbids it
    * (both used by the equivalence spec); otherwise probe the data. */
  private def shouldCollapse(docs: DataFrame, threshold: Double): Boolean =
    if (threshold < 0) true
    else if (threshold.isPosInfinity) false
    else { val (mass, n) = dupPairMass(docs); mass > threshold * n }

  /** Collapse exact-duplicate texts to one representative (min doc_id)
    * BEFORE any quadratic blocking stage. Returns (reps, members): `reps` is
    * one (doc_id, text) row per distinct text; `members` maps every doc_id
    * to its group's representative. Pair sets are preserved EXACTLY:
    * signatures/shingles/simhashes depend only on the text, so (mᴬ, mᴮ) is a
    * candidate iff (repᴬ, repᴮ) is, and the verified score is identical —
    * [[expandPairs]] restores the full pair set, and within-group pairs are
    * emitted directly (score = exact match) by the callers, gated on the
    * representative surviving blocking (≥1 non-hot key), mirroring the
    * uncollapsed pipeline. */
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

  /** Distinct shingle rows (doc_id, th, sh); th = md5(text) identifies the
    * distinct text, so blocking-key DF is counted identically whether the
    * table was built over all docs or over collapse representatives.
    *
    * Typed flatMap, NOT `explode(shingles(...))`: higher-order functions
    * are interpreted (no whole-stage codegen, no subexpression elimination
    * inside the lambda), so the `slice(split(text), i, w)` body re-runs
    * split() once per EMITTED SHINGLE — O(tokens²) per document, measured
    * as 6.2 s of the 8 s minhash-LSH wall at sf0.1. The flatMap splits once
    * per row; tokenization is identical (both split on the single-space
    * regex keeping empty tokens). */
  private def shingleTableTh(docs: DataFrame, w: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), md5(col("text")).as("th"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, th, text) =>
        val t = text.split(" ", -1)
        if (t.length < w) Iterator.empty
        else (0 to t.length - w).iterator.map(i => (id, th, t.slice(i, i + w).mkString(" ")))
      }
      .toDF("doc_id", "th", "sh").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
  }

  /** Rows-of-the-hottest-key threshold above which the one-exchange window
    * form of [[dropHotKeys]] (which sorts the hottest key's rows in ONE
    * task) is abandoned for the wide 3-exchange form. Sized to what one
    * executor task sorts comfortably (~a few hundred MB of (key, th)
    * rows); below it the window form's single hot task is still cheaper
    * than two extra exchanges. */
  val HotKeyWindowRowLimit = 4000000L

  /** Skew probe sample fraction (deterministic seed — the decision only
    * picks between two provably output-identical plans). */
  private val SkewProbeFraction = 0.02

  /** Estimate the hottest blocking key's row multiplicity from a one-pass
    * sample of `rows` (persisted upstream, so the scan is cheap and also
    * warms the cache the downstream stages reuse). Scale-up of the sampled
    * max is a fine estimator HERE because the probe only needs to detect
    * keys that dominate the corpus (≫ rowLimit rows): such a key appears
    * ~fraction·D times in the sample with tiny relative error, while keys
    * far below the limit can be off by 10× without changing the plan. */
  private[graft] def approxMaxKeyRows(rows: DataFrame, keyCols: Seq[String]): Long = {
    val r = rows.sample(withReplacement = false, SkewProbeFraction, seed = 42L)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx")).head()
    if (r.isNullAt(0)) 0L else (r.getLong(0) / SkewProbeFraction).toLong
  }

  /** Shingle-skew probe that samples DOCUMENTS before shingling: builds the
    * shingle table for a 2% doc sample only (2% of the flatMap+distinct
    * work, nothing materialized ahead of the real pipeline) and scales the
    * hottest shingle's distinct-doc count back up. Used by [[ngramJaccard]],
    * whose full shingle table has no cheap total-rows bound to short-circuit
    * on. */
  private[graft] def approxMaxShingleDf(docs: DataFrame, w: Int): Long = {
    val sampled = shingleTableTh(
      docs.sample(withReplacement = false, SkewProbeFraction, seed = 42L), w)
    val r = sampled.groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx")).head()
    sampled.unpersist()
    if (r.isNullAt(0)) 0L else (r.getLong(0) / SkewProbeFraction).toLong
  }

  /** Hot-key-set size above which the anti-join build side is SHUFFLED
    * instead of broadcast. The hot set holds every key whose DF exceeds the
    * cap — bounded by |distinct (key, th) rows| / cap, NOT by
    * [[HotKeyWindowRowLimit]] — so on the degenerate corpora this path is
    * selected for it can reach millions of keys and a forced broadcast
    * would OOM the driver. 1M keys ≈ tens of MB broadcast, a safe bound. */
  val HotKeySetBroadcastLimit = 1000000L

  /** Anti-join `rows` against a hot-key set, broadcasting only when the set
    * is MEASURED small (one count over the already-aggregated keys — the
    * shuffle that produced them is cached by the count and reused by the
    * join). Above [[HotKeySetBroadcastLimit]] the plain shuffle anti-join
    * costs one more exchange of `rows` but cannot OOM the driver. */
  private[graft] def antiJoinHotKeys(rows: DataFrame, hot: DataFrame,
                                     keyCols: Seq[String]): DataFrame = {
    val h = hot.persist(StorageLevel.MEMORY_AND_DISK_SER)
    val small = h.count() <= HotKeySetBroadcastLimit
    if (small) {
      // measured-small path (the overwhelmingly common one): COLLECT the
      // keys — bounded by the very limit the broadcast would enforce — into
      // a LocalRelation, so the cached frame is unpersisted HERE instead of
      // leaking until the caller's clearCache. broadcast(h) directly would
      // read the cache blocks lazily at result evaluation, forcing the
      // persist to outlive this call (the old form's leak).
      val keys = h.collect()
      val schema = h.schema
      h.unpersist()
      val local = rows.sparkSession.createDataFrame(
        java.util.Arrays.asList(keys: _*), schema)
      rows.join(broadcast(local), keyCols, "left_anti")
    } else
      // degenerate-corpus path: the key set is too big to hold on the
      // driver, so the shuffled build side must stay persisted until the
      // result evaluates (object-level cache contract: caller clearCache)
      rows.join(h, keyCols, "left_anti")
  }

  /** Wide 3-exchange form of the DF cap for degenerate key skew: map-side
    * partial dedup of (key, th) via distinct(), per-key distinct-text
    * counts via hash aggregation (the hottest key's final count receives
    * one partial row per map partition — never a single-task sort), then an
    * anti-join whose build side is broadcast only while measured under
    * [[HotKeySetBroadcastLimit]] (see [[antiJoinHotKeys]]). */
  private[graft] def dropHotKeysWide(rows: DataFrame, keyCols: Seq[String],
                                     cap: Int): DataFrame = {
    val kcols = keyCols.map(col)
    val hot = rows.select(kcols :+ col("th"): _*).distinct()
      .groupBy(kcols: _*).agg(count(lit(1)).as("df"))
      .where(col("df") > cap)
      .select(kcols: _*)
    antiJoinHotKeys(rows, hot, keyCols)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
  }

  /** Drop rows whose blocking key is shared by more than `cap` distinct
    * texts.  Default form is ONE exchange: window by the blocking key,
    * where max(dense_rank ordered by th) = exact count(DISTINCT th) — a
    * groupBy(countDistinct) + anti-join costs 3 exchanges for the same
    * filter.  The output is persisted hash-partitioned by the key, so the
    * downstream candidate self-join ([[blockedPairs]]) reuses the
    * partitioning and adds NO further exchange.
    *
    * Hot-key skew is handled ADAPTIVELY: the window form puts the hottest
    * key's rows in one sorted task — fine up to [[HotKeyWindowRowLimit]]
    * rows, a straggler/OOM beyond it (a degenerate corpus where one
    * boilerplate shingle covers half the documents). A one-pass sampled
    * probe ([[approxMaxKeyRows]]) detects that regime and switches to
    * [[dropHotKeysWide]]; the two forms are provably output-identical
    * (both filter on exact count(DISTINCT th) per key — DedupScaleGuardSpec
    * pins the equivalence on a planted degenerate corpus). */
  private def dropHotKeys(rows: DataFrame, keyCols: Seq[String], cap: Int,
                          rowLimit: Long, probe: () => Long): DataFrame = {
    // rowLimit = Long.MaxValue disables the skew probe entirely (callers
    // that know their corpus, and A/B measurement in tools.DedupProfile);
    // `probe` is a thunk so call sites can short-circuit it for free when a
    // cheap upper bound (e.g. total band rows = nBands × |docs|) already
    // rules the degenerate regime out — fixture-scale runs pay zero for the
    // adaptivity while a 100-TB corpus (where the probe is relatively
    // negligible) still gets it.
    if (rowLimit != Long.MaxValue && probe() > rowLimit)
      dropHotKeysWide(rows, keyCols, cap)
    else {
      val pw = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
      rows
        .withColumn("dr", dense_rank().over(pw.orderBy(col("th"))))
        .withColumn("df", max(col("dr")).over(pw))
        .where(col("df") <= cap)
        .drop("dr", "df")
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
    }
  }

  /** Shingle-blocked candidate pairs with the DF cap applied — exposed so
    * the planted hot-shingle scale test and tools.DedupBench can measure
    * the candidate count (the blowup is invisible in the verified output). */
  private[graft] def ngramCandidates(docs: DataFrame, w: Int, dfCap: Int,
                                     rowLimit: Long = HotKeyWindowRowLimit): DataFrame =
    blockedPairs(dropHotKeys(shingleTableTh(docs, w), Seq("sh"), dfCap, rowLimit,
      // DF is counted over distinct texts, so |docs| bounds any shingle's DF
      () => if (rowLimit == Long.MaxValue || docs.count() <= rowLimit) 0L
            else approxMaxShingleDf(docs, w)), Seq("sh"))

  /** Candidate pairs (doc_a < doc_b) sharing a blocking key. Both join
    * inputs are the persisted, key-partitioned [[dropHotKeys]] output, so
    * the equi-join is co-partitioned (no exchange). */
  private def blockedPairs(rows: DataFrame, keyCols: Seq[String]): DataFrame = {
    val cond = keyCols.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col("x.doc_id") < col("y.doc_id")
    rows.as("x").join(rows.as("y"), cond)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
  }

  /** MinHash signatures: nHashes permutations approximated by salted md5;
    * minhash_i(doc) = min over shingles of h60(i || ':' || shingle). */
  def minhashSignatures(docs: DataFrame, w: Int = 3, nHashes: Int = 8): DataFrame = {
    val sh = shingleTableTh(docs, w) // shingle *sets* (distinct)
    val aggs = (0 until nHashes).map(i =>
      min(h60(concat(lit(s"$i:"), col("sh")))).as(s"mh_$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH candidate pairs → verified Jaccard over shingle sets.
    * bands of `rowsPerBand` signature values; candidates share ≥1 non-hot
    * band key ([[BandDfCap]]). Returns (doc_a, doc_b, jaccard_num,
    * jaccard_den) with a<b and jaccard ≥ minJaccard (kept as an exact
    * fraction for determinism). */
  def minhashLsh(docs: DataFrame, w: Int = 3, nHashes: Int = 8,
                 rowsPerBand: Int = 2, minJaccard: Double = 0.5,
                 bandCap: Int = BandDfCap,
                 collapseThreshold: Double = CollapsePairsPerDoc,
                 hotKeyRowLimit: Long = HotKeyWindowRowLimit): DataFrame = {

    // ONE shingle table shared by the signature aggregation and the verify
    // join — the explode + distinct shuffle (the dominant scan at 100 TB)
    // happens once instead of twice; the same aggregation also emits each
    // doc's shingle-set size, so the verify stage reuses it instead of
    // re-scanning the shingle table for a separate count
    def pairsOn(base: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val sh3 = shingleTableTh(base, w)
      val aggs = (0 until nHashes).map(i =>
        min(h60(concat(lit(s"$i:"), col("sh")))).as(s"mh_$i")) :+
        count(lit(1)).as("n_sh")
      val sig = sh3.groupBy("doc_id", "th").agg(aggs.head, aggs.tail: _*)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      val nBands = nHashes / rowsPerBand
      val bands = (0 until nBands).map { b =>
        val cols = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
        sig.select(col("doc_id"), col("th"),
          lit(b).as("band"), md5(concat_ws("_", cols: _*)).as("band_key"))
      }.reduce(_ unionByName _)
      // cheap short-circuit: band rows = nBands × |base| exactly (one row
      // per doc per band; the count is parquet-metadata cheap, or a cache
      // materialization the collapse path reuses) — the sampled probe only
      // runs when a single key COULD exceed the limit
      val blk = dropHotKeys(bands, Seq("band", "band_key"), bandCap, hotKeyRowLimit,
        () => if (hotKeyRowLimit == Long.MaxValue ||
                  nBands.toLong * base.count() <= hotKeyRowLimit) 0L
              else approxMaxKeyRows(bands, Seq("band", "band_key")))
      val cand = blockedPairs(blk, Seq("band", "band_key"))
      val sh = sh3.select("doc_id", "sh")
      val sizes = sig.select("doc_id", "n_sh")
      (verifyJaccardOnShingles(sh, cand, minJaccard, Some(sizes)), sizes,
        blk.select("doc_id").distinct())
    }

    if (shouldCollapse(docs, collapseThreshold)) {
      val (reps, members) = collapseExact(docs)
      val (repPairs, sizes, keptDocs) = pairsOn(reps)
      expandJaccardPairs(repPairs, members, sizes, keptDocs)
    } else pairsOn(docs)._1
  }

  /** Exact Jaccard over candidate pairs against a prepared (doc_id, sh)
    * shingle table (blocked joins, never a cross join). `precomputedSizes`
    * supplies per-doc shingle-set sizes when a prior aggregation already
    * produced them (minhash signatures), avoiding a second full pass over
    * the shingle table. */
  def verifyJaccardOnShingles(sh: DataFrame, cand: DataFrame,
                              minJaccard: Double,
                              precomputedSizes: Option[DataFrame] = None): DataFrame = {
    val sizes = precomputedSizes.getOrElse(
      sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh")))
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

  /** Exact n-gram Jaccard over externally-supplied candidate pairs. */
  def verifyJaccard(docs: DataFrame, cand: DataFrame, w: Int,
                    minJaccard: Double): DataFrame =
    verifyJaccardOnShingles(shingleTableTh(docs, w).select("doc_id", "sh"),
      cand, minJaccard)

  /** Representative pairs → all member pairs for the Jaccard family:
    * cross-group pairs expand with their verified fraction; within-group
    * pairs (identical texts) are exact matches (num = den = |shingles|),
    * emitted only for groups whose representative survived blocking
    * (`keptReps`: ≥1 non-hot blocking key) — mirroring the uncollapsed
    * pipeline, where such docs never become candidates. `repSizes` is the
    * per-representative (doc_id, n_sh) table the caller already has. */
  private def expandJaccardPairs(repPairs: DataFrame, members: DataFrame,
                                 repSizes: DataFrame, keptDocs: DataFrame): DataFrame = {
    val sizes = repSizes.select(col("doc_id").as("rep"), col("n_sh"))
    val grouped = members
      .join(sizes, Seq("rep"))
      .join(keptDocs.select(col("doc_id").as("rep")), Seq("rep"))
    val within = grouped.as("x").join(grouped.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n_sh").as("jaccard_num"), col("x.n_sh").as("jaccard_den"))
    expandPairs(repPairs, members, Seq("jaccard_num", "jaccard_den"))
      .unionByName(within)
  }

  /** n-gram Jaccard near-dup: candidates = pairs sharing any shingle whose
    * distinct-text DF ≤ dfCap (shingle-blocked join), verified exactly over
    * the full shingle sets. */
  def ngramJaccard(docs: DataFrame, w: Int = 3, minJaccard: Double = 0.3,
                   dfCap: Int = ShingleDfCap,
                   collapseThreshold: Double = CollapsePairsPerDoc,
                   hotKeyRowLimit: Long = HotKeyWindowRowLimit): DataFrame = {

    def pairsOn(base: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val sh3 = shingleTableTh(base, w)
      val blk = dropHotKeys(sh3, Seq("sh"), dfCap, hotKeyRowLimit,
        // DF is counted over distinct texts, so |base| bounds any shingle DF
        () => if (hotKeyRowLimit == Long.MaxValue ||
                  base.count() <= hotKeyRowLimit) 0L
              else approxMaxShingleDf(base, w))
      val cand = blockedPairs(blk, Seq("sh"))
      val sh = sh3.select("doc_id", "sh")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      (verifyJaccardOnShingles(sh, cand, minJaccard, Some(sizes)), sizes,
        blk.select("doc_id").distinct())
    }

    if (shouldCollapse(docs, collapseThreshold)) {
      val (reps, members) = collapseExact(docs)
      val (repPairs, sizes, keptDocs) = pairsOn(reps)
      expandJaccardPairs(repPairs, members, sizes, keptDocs)
    } else pairsOn(docs)._1
  }

  /** Duplicate-CLUSTER resolution: connected components over an undirected
    * near-dup pair list (the step between "pairs" and "keepers" in a real
    * dedup pipeline — every doc maps to its component's min doc_id, the
    * keeper). Min-label propagation, pure DataFrame ops:
    * per iteration each node takes the min of its own and its neighbors'
    * labels (one equi-join + one partial-aggregated groupBy — both map-side
    * combined), until a fixpoint. Iterations = component diameter; near-dup
    * components are band-/shingle-blocked near-cliques (diameter ≤ ~3), so
    * the loop is 3–4 rounds of O(E) shuffles at any corpus size. For an
    * adversarial long-chain graph the alternating large-star/small-star
    * scheme (Kiveris et al., "Connected Components in MapReduce") drops
    * iterations to O(log n); the propagation loop below is the right
    * default for dedup graphs and fails loudly at `maxIter` rather than
    * silently emitting unconverged labels.
    *
    * pairs: (doc_a, doc_b); returns (node, label) for every node in pairs,
    * label = min doc_id of its component. */
  /** Edge-count ceiling for [[connectedComponents]]'s single-task
    * union-find fast path. 2M symmetric edges ≈ a few hundred MB of
    * hash-map state in one task — far under executor memory — while the
    * graphs the threshold targets (near-dup pair graphs of fixture-to-
    * moderate corpora) finish in one O(E·α) pass instead of paying the
    * loop's per-iteration shuffle fixed costs. Measured at sf0.1 (136k
    * edges): 2.40 s loop → ~0.3 s fast path. */
  val LocalCcEdgeLimit = 2000000L

  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      localEdgeLimit: Long = LocalCcEdgeLimit): DataFrame = {
    // eager localCheckpoint, NOT plain persist: an iterative loop over
    // persisted frames still re-analyzes the whole accumulated logical plan
    // (including the pair producer's full lineage, referenced twice by the
    // union) every iteration — the driver pays O(iterations × plan) analysis
    // and eventually OOMs. Checkpointing truncates the plan to the cached
    // blocks so every iteration analyzes a constant-size tree. On a
    // cluster, swap for reliable `checkpoint()` against the checkpoint dir
    // so executor loss replays from storage instead of recomputing.
    // symmetrize with ONE explode pass so the pair producer runs exactly
    // once into the checkpoint (a two-branch union would execute the full
    // LSH pipeline twice, and checkpointing the producer first — the old
    // form — paid an extra materialization job just to avoid that)
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("u"), col("doc_b").as("v")),
        struct(col("doc_b").as("u"), col("doc_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .localCheckpoint(true)
    // size the loop's shuffles to the GRAPH, not the corpus: the pair graph
    // is orders of magnitude smaller than the documents it came from, and
    // each iteration pays 4 exchanges whose per-task fixed cost dominates
    // when partitions ≫ data (same lesson as the stream-stream join's
    // state-sized shuffle). Measured from the already-materialized edge
    // count (a cached-block scan), ~2M edges per partition, never above
    // the session setting — at 100-TB pair volumes this keeps the session
    // value.
    val caller = pairs.sparkSession
    val edgeCount = edges.count()

    // hybrid CC: a measured-small graph is pure per-iteration shuffle fixed
    // cost for the loop below — ONE task runs union-find over the whole
    // edge list in O(E·α) and emits the identical min-label-per-component
    // contract (union always points the larger root at the smaller, so a
    // set's root IS its minimum node id). The task is bounded by
    // `localEdgeLimit` (see [[LocalCcEdgeLimit]]); graphs above it take the
    // distributed loop. CcEquivalenceSpec pins path equality.
    if (edgeCount <= localEdgeLimit) {
      import caller.implicits._
      // the union-find runs on Longs; cast the output back to the INPUT id
      // dtype so both CC paths emit an identical schema (the distributed
      // loop preserves the input type — a caller passing int ids must not
      // get a path-dependent LongType here)
      val idType = pairs.schema(pairs.schema.fieldIndex("doc_a")).dataType
      val out = edges.as[(Long, Long)].repartition(1)
        .mapPartitions { it =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
            r
          }
          it.foreach { case (u, v) =>
            if (!parent.contains(u)) parent(u) = u
            if (!parent.contains(v)) parent(v) = v
            val ru = find(u); val rv = find(v)
            if (ru < rv) parent(rv) = ru
            else if (rv < ru) parent(ru) = rv
          }
          val nodes = parent.keys.toArray // snapshot: find() compresses paths
          nodes.iterator.map(n => (n, find(n)))
        }
        .toDF("node", "label")
        .select(col("node").cast(idType).as("node"),
          col("label").cast(idType).as("label"))
        .localCheckpoint(true) // edges' cached blocks are about to go away
      edges.unpersist()
      // broadcast-hint the labels: a localCheckpoint is an ExistingRDD with
      // UNKNOWN stats, so a caller joining the (small) label table against a
      // corpus-sized id column gets a SortMergeJoin that shuffles the CORPUS
      // (measured: dedup_clusters' final join was SMJ + 2 exchanges + 2
      // sorts). This path guarantees ≤ localEdgeLimit edges → ≤ 2× that in
      // label rows (two ids each ≈ tens of MB at the 2M default) — a safe,
      // measured-small broadcast at ANY corpus size, and strictly cheaper
      // than exchanging the big side (guide §3.1: pick the strategy
      // deliberately). The distributed-loop path below keeps no hint: its
      // graphs are unbounded.
      return broadcast(out)
    }

    val sessionParts = caller.conf.get("spark.sql.shuffle.partitions").toInt
    val graphParts = math.max(4L, math.min(sessionParts.toLong,
      edgeCount / 2000000L + 1L)).toInt
    // the override lives in a CLONED session (shared SparkContext, cache
    // manager and checkpoint blocks; private SQLConf): mutating the
    // caller's session-global shuffle.partitions — even restored in a
    // finally — would make any CONCURRENT query on the same session plan
    // its corpus-sized shuffles at the graph's partition count. A plain
    // per-plan repartition() can't replace the conf here: it is a
    // user-inserted exchange of RAW rows, which forfeits the partial
    // (map-side) aggregation the loop's neighbor-min relies on. The
    // checkpointed edge frame crosses sessions via a uniquely-named global
    // temp view (its plan is a constant-size LogicalRDD).
    val loopSession = caller.newSession()
    loopSession.conf.set("spark.sql.shuffle.partitions", graphParts.toString)
    val viewTag = s"graft_cc_${ccSeq.incrementAndGet()}"
    edges.createOrReplaceGlobalTempView(s"${viewTag}_edges")
    try {
    val edgesLoop = loopSession.table(s"global_temp.${viewTag}_edges")
    // iteration 0 is folded into initialization: label(node) = min of the
    // CLOSED neighborhood, one aggregation over the symmetric edges (every
    // node appears as `u`). The old form derived the node set with a
    // distinct and then spent a full join round to reach this same state.
    // `ckpt` is the frame actually holding checkpoint blocks (unpersist
    // target — unpersisting a projection of it would be a no-op and leak);
    // `labels` is the (node, label) view the joins use
    var ckpt = edgesLoop.groupBy(col("u").as("node"))
      .agg(min(col("v")).as("mn"))
      .select(col("node"), least(col("mn"), col("node")).as("label"))
      .localCheckpoint(true)
    var labels = ckpt
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // step 1: neighbor-min — each node takes the min label in its
      // closed neighborhood
      val nbr = edgesLoop.join(labels.select(col("node").as("v"), col("label")), Seq("v"))
        .select(col("u").as("node"), col("label"))
      val relaxed = labels.unionByName(nbr)
        .groupBy("node").agg(min("label").as("label"))
      // step 2: pointer jumping (path halving) — follow label→label(label)
      // one hop (every label is itself a node id, so the self-join always
      // resolves). Neighbor-min alone converges in O(diameter) rounds — an
      // adversarial CHAIN of n near-dups would need n rounds and trip
      // maxIter; with halving the label graph's depth halves every round,
      // giving O(log n) total. Near-clique dedup graphs still converge in
      // 2-3 rounds; the halving join is over the (tiny) label table.
      // the convergence flag rides INSIDE the checkpointed frame (one join
      // with the previous labels before materialization), so the `changed`
      // count is a scan of cached blocks, not an extra shuffle job
      val next = relaxed
        .join(relaxed.select(col("node").as("label"), col("label").as("label2")),
          Seq("label"))
        .select(col("node"), least(col("label"), col("label2")).as("label"))
        .join(labels.select(col("node"), col("label").as("old")), Seq("node"))
        .withColumn("chg", col("label") =!= col("old"))
        .select("node", "label", "chg")
        .localCheckpoint(true)
      changed = next.where(col("chg")).count()
      ckpt.unpersist()
      ckpt = next
      labels = next.drop("chg")
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter iterations")
    edges.unpersist()
    // hand the result back to the CALLER's session (same view mechanism) so
    // downstream plans over it use the caller's conf, not the loop clone's;
    // the view resolves to the final checkpoint's constant-size LogicalRDD,
    // so dropping the views afterwards cannot invalidate the returned frame
    labels.createOrReplaceGlobalTempView(s"${viewTag}_labels")
    val out = caller.table(s"global_temp.${viewTag}_labels")
    caller.catalog.dropGlobalTempView(s"${viewTag}_labels")
    out
    } finally caller.catalog.dropGlobalTempView(s"${viewTag}_edges")
  }

  /** Monotonic tag for [[connectedComponents]]'s cross-session temp views —
    * global temp views are process-wide, so concurrent CC runs must not
    * collide on a name. */
  private val ccSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (doc_id, simhash) — the per-token pipeline carries NOTHING but
    * (doc_id, token): th (the 32-char text md5, functionally dependent on
    * doc_id) used to ride through both the token distinct and the bit-sum
    * aggregation, doubling each exchange's row width for a value that is
    * per-DOC, not per-token (measured at sf0.1: distinct 0.65→0.31 s,
    * agg 0.46→0.23 s — see tools/SimhashProfile). */
  private def simhashOf(docs: DataFrame): DataFrame = {
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

  /** (doc_id, th, simhash); th (needed only for the quarter cap's
    * distinct-TEXT accounting) is joined back onto the per-doc aggregate —
    * a doc-count-sized exchange, three orders smaller than the token rows
    * the old carry-through form paid for. */
  private def simhashTh(docs: DataFrame): DataFrame =
    simhashOf(docs)
      .join(docs.select(col("doc_id"), md5(col("text")).as("th")), Seq("doc_id"))
      .select("doc_id", "th", "simhash")

  /** SimHash: 60-bit fingerprint from token hashes — bit b of the simhash is
    * the majority vote of bit b over the distinct tokens' h60 values.
    * Pure relational: explode tokens → per-bit sums → reassemble. */
  def simhash(docs: DataFrame): DataFrame = simhashOf(docs)

  /** SimHash near-dup pairs: block by the 4 15-bit quarters (Hamming ≤ 3 ⇒
    * at least one quarter equal), drop quarter keys hotter than `quarterCap`
    * distinct texts, verify Hamming distance exactly. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   quarterCap: Int = QuarterDfCap,
                   collapseThreshold: Double = CollapsePairsPerDoc,
                   hotKeyRowLimit: Long = HotKeyWindowRowLimit): DataFrame = {

    def pairsOn(base: DataFrame): (DataFrame, DataFrame) = {
      // fingerprints feed 4 block projections × 2 join sides — persist
      val sig = simhashTh(base).persist(StorageLevel.MEMORY_AND_DISK_SER)
      val blocks = (0 until 4).map(q =>
        sig.select(col("doc_id"), col("th"), col("simhash"),
          lit(q).as("q"), shiftright(col("simhash"), q * 15).bitwiseAND(lit(0x7fffL)).as("qk")))
        .reduce(_ unionByName _)
      // block rows = 4 quarters × |base| exactly — free probe short-circuit
      val blk = dropHotKeys(blocks, Seq("q", "qk"), quarterCap, hotKeyRowLimit,
        () => if (hotKeyRowLimit == Long.MaxValue ||
                  4L * base.count() <= hotKeyRowLimit) 0L
              else approxMaxKeyRows(blocks, Seq("q", "qk")))
      // hamming verify BEFORE the cross-quarter distinct: bit_count is a
      // codegen'd couple of instructions evaluated inside the join stage,
      // while the distinct is an exchange — filtering first shrinks that
      // exchange from every quarter-collision candidate (×2 simhash longs
      // per row) to the surviving pairs only. Identical output: a pair
      // seen via several quarters has the same hamming on every route.
      val pairs = blk.as("x").join(blk.as("y"),
          col("x.q") === col("y.q") && col("x.qk") === col("y.qk") &&
            col("x.doc_id") < col("y.doc_id"))
        .withColumn("hamming",
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))))
        .where(col("hamming") <= maxHamming)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("hamming"))
        .distinct()
      (pairs, blk.select("doc_id").distinct())
    }

    if (shouldCollapse(docs, collapseThreshold)) {
      val (reps, members) = collapseExact(docs)
      val (repPairs, keptDocs) = pairsOn(reps)
      val grouped = members.join(keptDocs.select(col("doc_id").as("rep")), Seq("rep"))
      val within = grouped.as("x").join(grouped.as("y"),
          col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          lit(0).cast("int").as("hamming"))
      expandPairs(repPairs, members, Seq("hamming")).unionByName(within)
    } else pairsOn(docs)._1
  }

  /** Banded Hamming near-dup pairs over PRECOMPUTED 60-bit fingerprints —
    * the [[simhashPairs]] quarter-split machinery factored out for any
    * fingerprint family (token simhash, perceptual image dHash
    * [[Multimodal.dHash60]], audio fingerprints): block by the 4 15-bit
    * quarters (Hamming ≤ 3 ⇒ some quarter equal, so recall is total
    * there; 4..maxHamming pairs are found on the usual OR-of-bands LSH
    * terms), drop quarter keys hotter than `quarterCap` DISTINCT
    * fingerprints (a group of byte-identical payloads counts once, the
    * exact-collapse accounting), and verify Hamming INSIDE the join stage
    * before the cross-quarter distinct (the r6 simhash lesson — the
    * exchange carries survivors only).
    *
    * Input: (id, h) with h in [0, 2^60); output (id_a, id_b, hamming),
    * id_a < id_b. Scale shape: the only corpus-sized plan is the (q, qk)
    * equi-join over the persisted quarter projection — never all-pairs;
    * the hot-key cap guards degenerate corpora (e.g. a run of blank
    * images all hashing to 0) exactly as the text-side caps do.
    *
    * RECALL CONTRACT (the LSH trade, pinned by DedupSpec): Hamming ≤ 3 is
    * found with certainty (pigeonhole over 4 quarters); a pair at
    * 4..maxHamming is found iff its differing bits leave SOME quarter
    * untouched — differences spread across all four quarters are missed
    * by construction (the oracle replays the same blocking, so the hash
    * gate shares the trade). Callers wanting certainty at d > 3 need a
    * wider band split (e.g. ⌈d+1⌉ bands), paying proportionally more
    * join volume.
    *
    * Cache contract: the quarter projection is persisted (4 block
    * projections + 2 join sides read it) and the returned plan depends
    * on it — callers release it with `spark.catalog.clearCache()` (or
    * their own unpersist) after the terminal action, same as
    * [[crossCorpus]]. */
  def hammingPairs(hashes: DataFrame, maxHamming: Int = 3,
                   quarterCap: Int = QuarterDfCap,
                   hotKeyRowLimit: Long = HotKeyWindowRowLimit): DataFrame = {
    // quarter projections read the hash frame 4×+2 join sides — persist;
    // `th` = the fingerprint itself, so dropHotKeys' dense_rank counts
    // DISTINCT fingerprints per quarter key
    val sig = hashes.select(col("id"), col("h"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val blocks = (0 until 4).map(q =>
      sig.select(col("id"), col("h"), col("h").as("th"), lit(q).as("q"),
        shiftright(col("h"), q * 15).bitwiseAND(lit(0x7fffL)).as("qk")))
      .reduce(_ unionByName _)
    // block rows = 4 × |hashes| exactly — free probe short-circuit
    val blk = dropHotKeys(blocks, Seq("q", "qk"), quarterCap, hotKeyRowLimit,
      () => if (hotKeyRowLimit == Long.MaxValue ||
                4L * hashes.count() <= hotKeyRowLimit) 0L
            else approxMaxKeyRows(blocks, Seq("q", "qk")))
    blk.as("x").join(blk.as("y"),
        col("x.q") === col("y.q") && col("x.qk") === col("y.qk") &&
          col("x.id") < col("y.id"))
      .withColumn("hamming",
        bit_count(col("x.h").bitwiseXOR(col("y.h"))))
      .where(col("hamming") <= maxHamming)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("hamming"))
      .distinct()
  }

  /** Cross-corpus (incremental) exact dedup: drop every new-crawl doc whose
    * content fingerprint already exists in a PRIOR corpus (the snapshot-
    * over-snapshot Common-Crawl pass — each monthly crawl is deduped
    * against the union of earlier ones). Two-stage at scale:
    *
    *  1. A Bloom filter over the prior fingerprints (one map-side-combined
    *     aggregation; the filter itself is megabytes for billions of keys
    *     at 1% fpp) is broadcast, and definite non-members — the VAST
    *     majority of a fresh crawl — are passed through with ZERO shuffle.
    *  2. Only Bloom-positive candidates (true dups + the fpp sliver) pay
    *     the exact fingerprint anti-join, so the join exchange carries
    *     ~dup_rate·|new| rows instead of |new|.
    *
    * False positives are exact-verified away by stage 2, so the output is
    * deterministic and identical to a plain anti-join (pinned by
    * DedupSpec) — the Bloom stage is pure shuffle avoidance. Fingerprints
    * are the engine-portable 60-bit md5; only (doc_id, fp) ever shuffles.
    * Output: surviving new docs as (doc_id, fp).
    *
    * Cache contract: the prior-fingerprint frame is persisted (count,
    * Bloom build, and exact verify all read it) and the returned plan
    * depends on it — callers release it with `spark.catalog.clearCache()`
    * (or their own unpersist) after the terminal action; same contract as
    * [[graft.operators.Search.bm25TopK]] / [[TextOps.ngramNovelty]]. */
  /** Prior-fingerprint count at or below which [[crossCorpus]] skips the
    * Bloom stage for a plain anti-join: a prior that fits a broadcast
    * build (8-byte fingerprints; 4M ≈ tens of MB) makes the broadcast
    * LEFT ANTI join strictly better at ANY scale — the new side is not
    * shuffled AT ALL and no Bloom build pass runs. The Bloom stage's value
    * begins exactly where the prior outgrows broadcast. */
  val BloomSkipPriorLimit = 4000000L

  def crossCorpus(newDocs: DataFrame, prior: DataFrame,
      fpp: Double = 0.01, bloom: Boolean = true,
      bloomSkipPriorLimit: Long = BloomSkipPriorLimit): DataFrame = {
    val spark = newDocs.sparkSession
    val nf = newDocs.select(col("doc_id"), h60(col("text")).as("fp"))
    if (!bloom) return nf.join(
        prior.select(h60(col("text")).as("fp")).distinct(), Seq("fp"), "left_anti")
      .select("doc_id", "fp")
    // the prior fingerprints are read up to three times (count for
    // expectedNumItems, bloomFilter build, exact verify anti-join) —
    // persist so the prior corpus is scanned+hashed once, not per action
    // (usual cache contract: caller clearCache after the terminal action)
    val pf = prior.select(h60(col("text")).as("fp"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    // expectedNumItems from a cheap hash-only count; never collect the fps
    val nPrior = math.max(pf.count(), 1L)
    // measured-small prior: broadcast anti-join, no Bloom build, no UDF
    // pass, zero shuffle of the new side — output-identical to the Bloom
    // path (which is itself pinned identical to the plain anti-join by
    // DedupSpec). The count above is paid on both paths.
    if (nPrior <= bloomSkipPriorLimit)
      return nf.join(pf.distinct(), Seq("fp"), "left_anti").select("doc_id", "fp")
    val filter = pf.stat.bloomFilter("fp", nPrior, fpp)
    val bc = spark.sparkContext.broadcast(filter)
    val mightContain = udf((fp: Long) => bc.value.mightContainLong(fp))
    // a NULL fp (null text) can never match the prior side — route it to
    // the definite pass-through, exactly as the plain anti-join keeps it
    // (a primitive-typed UDF returns NULL on null input, which would
    // otherwise drop the row from BOTH branches)
    val flagged = nf.withColumn("maybe",
      when(col("fp").isNull, lit(false)).otherwise(mightContain(col("fp"))))
    val definite = flagged.where(!col("maybe")).drop("maybe")
    val verified = flagged.where(col("maybe")).drop("maybe")
      .join(pf.distinct(), Seq("fp"), "left_anti")
    definite.unionByName(verified.select("doc_id", "fp")).select("doc_id", "fp")
  }

  /** Canonical keeper selection — what a production dedup pass actually
    * emits: per near-dup cluster, the single best member (longest text,
    * doc_id tie-break) plus the member count, not the arbitrary min-id
    * representative. Takes the (doc_id, cluster_rep) assignment from
    * [[connectedComponents]] (singletons map to themselves) and the
    * corpus for the quality signal.
    *
    * The argmax is ONE map-side-combined aggregation via the min-struct
    * keeper pattern ([[graft.operators.TextOps.chunkDedup]]'s trick):
    * min(struct(-n_chars, doc_id)) is the lexicographic (quality desc,
    * id asc) winner and partial-aggregates inside the scan task, so a
    * boilerplate mega-cluster (millions of members on one key) never
    * materializes a window partition — the hot-key-safe shape at
    * 100 TB. */
  def keepBest(clusters: DataFrame, docs: DataFrame): DataFrame =
    clusters
      .join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars")), Seq("doc_id"))
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("n_chars")).as("neg"), col("doc_id").as("d"))).as("m"))
      .select(col("cluster_rep"), col("m.d").as("keeper"),
        (-col("m.neg")).as("keeper_chars"), col("n_members"))
}
