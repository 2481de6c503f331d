package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("sessionize: gap rule, per-user indexing, microsecond-exact boundaries") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      // user 1: two events 10 min apart (one session), then a 31-min gap
      (10L, ts("2024-01-01 10:00:00"), 1L),
      (11L, ts("2024-01-01 10:10:00"), 1L),
      (12L, ts("2024-01-01 10:41:00.000001"), 1L), // 1 µs past the 30-min gap
      // user 2: single event
      (20L, ts("2024-01-01 09:00:00"), 2L),
      // user 1 again: exactly 30 min after event 12 — NOT a new session
      (13L, ts("2024-01-01 11:11:00.000001"), 1L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventOps.sessionize(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 0L)) == ((2L, 10L, 600000000L)))   // 10 min in µs
    assert(out((1L, 1L)) == ((2L, 12L, 1800000000L)))  // events 12+13, 30 min span
    assert(out((2L, 0L)) == ((1L, 20L, 0L)))
    assert(out.size == 3)
  }
}
