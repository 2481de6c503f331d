package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => WExpr}

/** Event-stream analytics over the events table (the behavioural side of a
  * web corpus: the same user/event log the crawl's engagement signals come
  * from). */
object EventOps {

  /** Gap-based sessionization: a user's events belong to one session until
    * a silence longer than `gapSec`, then a new session starts — the
    * standard web-analytics session rule. One window partitioned by
    * user_id (lag for the gap flag, running sum for the session index) +
    * one groupBy for the per-session rollup: both shuffle on user_id, so
    * Spark plans a single exchange reused by both operators. Parallelism
    * is the user-key space (millions at corpus scale); the hottest
    * possible task is one user's full history, which is the operator's
    * irreducible sequential unit. Session boundaries depend only on
    * timestamp DIFFERENCES, so the epoch encoding is timezone-invariant.
    * Ordering ties break by event_id — total and deterministic. */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = WExpr.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // exact MICROSECOND epochs: the fixture timestamps carry sub-second
    // precision, and a seconds-truncated gap flips boundary decisions vs
    // an engine comparing full-precision epochs
    val epochUs = unix_micros(col("ts").cast("timestamp"))
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap", epochUs - lag(epochUs, 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_sess").over(w.rowsBetween(WExpr.unboundedPreceding,
          WExpr.currentRow)) - 1)
    flagged.groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        (max(epochUs) - min(epochUs)).as("duration_us"))
  }

  /** Weekly retention cohorts: users are cohorted by the epoch-week of
    * their FIRST event; n_users(cohort_week, k) counts how many of that
    * cohort were active k weeks later — the standard product-analytics
    * retention matrix.
    *
    * Scale shape: the corpus collapses to the distinct (user, week)
    * activity table first (map-side-combined; ≤ users × weeks rows no
    * matter how many raw events), cohorts are a user-keyed aggregate of
    * it, and the join back is user-keyed over the already-small table.
    * Weeks come from exact INTEGER division of microsecond epochs (`div`),
    * so every output column is an integer and the cross-engine gate is
    * exact — no date/timezone arithmetic in the plan. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val week = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000")
    val activity = events.select(col("user_id"), week.as("week")).distinct()
    val cohorts = activity.groupBy("user_id").agg(min("week").as("cohort_week"))
    activity.join(cohorts, Seq("user_id"))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("k"))
      .groupBy("cohort_week", "k").agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel conversion: a user reaches step i when events of types
    * steps(0..i) exist at STRICTLY increasing timestamps (the classic
    * product funnel — a later-step event before the earlier step does not
    * count). Returns one row per step: (step, step_type, n_users).
    *
    * Scale shape: step i is `min ts of step-i events AFTER the user's
    * step-(i−1) time` — each stage filters the corpus to ONE event type
    * before its user-keyed aggregate and joins the (users-reaching)-sized
    * frame from the previous stage, so the chain's exchanges carry one
    * step's events plus a user-id frame, never the whole log; the
    * |steps|-long chain is driver-composed but every stage is fully
    * distributed. Ties (same µs) break strictly: equal timestamps do NOT
    * advance the funnel, keeping the rule engine-portable. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val us = unix_micros(col("ts").cast("timestamp"))
    val typed = events.select(col("user_id"), col("event_type"), us.as("us"))
    // persist each stage: its count is an action AND the next stage joins
    // it — without the cache every stage would recompute the whole prefix
    // chain (k scans of the log by stage k)
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var reached = typed.where(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("us").as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    cached += reached
    val counts = scala.collection.mutable.ArrayBuffer[(Int, String, Long)](
      (1, steps.head, reached.count()))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = typed.where(col("event_type") === st)
        .join(reached.select(col("user_id"), col("t").as("prev")), Seq("user_id"))
        .where(col("us") > col("prev"))
        .groupBy("user_id").agg(min("us").as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      cached += reached
      counts += ((i + 1, st, reached.count()))
    }
    cached.foreach(_.unpersist()) // counts are materialized driver values
    counts.toSeq.toDF("step", "step_type", "n_users")
  }
}
