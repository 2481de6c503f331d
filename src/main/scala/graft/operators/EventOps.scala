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
}
