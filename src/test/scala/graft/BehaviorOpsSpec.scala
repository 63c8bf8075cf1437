package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Histogram, Profiling}

/** Targeted specs for the round-6 behavioral/data-quality operators
  * (activity streaks, FD audit, rate limiting, calibration bins) —
  * hand-computed expectations on crafted inputs, independent of the
  * DuckDB gate. */
class BehaviorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): Timestamp =
    new Timestamp(day * 86400000L + sec * 1000L)

  // ── activity streaks ────────────────────────────────────────────────────

  test("activityStreaks finds islands of consecutive days") {
    // u1 active days {1,2,3, 7, 9,10}: streaks 3,1,2 → max 3, start day 1
    // u2 active day {5} twice (two events, one day): one streak of 1
    val events = Seq(
      (1L, ts(1)), (1L, ts(2, 60)), (1L, ts(3)), (1L, ts(7)),
      (1L, ts(9)), (1L, ts(10)), (1L, ts(2)), // day 2 twice: distinct'd
      (2L, ts(5)), (2L, ts(5, 3600))
    ).toDF("user_id", "ts")
    val got = Funnel.activityStreaks(events, "user_id", "ts")
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 3L, 3L, 1L),
      (2L, 1L, 1L, 1L, 5L)))
  }

  test("activityStreaks argmax picks the longest streak's start day") {
    // two streaks of equal max length 2: {3,4} and {8,9} → ties break to
    // the LATER start (max int64 encode), documented behavior
    val events = Seq((9L, ts(3)), (9L, ts(4)), (9L, ts(8)), (9L, ts(9)))
      .toDF("user_id", "ts")
    val got = Funnel.activityStreaks(events, "user_id", "ts")
      .select("best_streak_start_day").as[Long].head()
    assert(got == 8L)
  }

  // ── FD audit ────────────────────────────────────────────────────────────

  test("fdViolations reports only groups with >1 distinct RHS") {
    val df = Seq(
      ("a", "x"), ("a", "x"),          // clean: 1 distinct
      ("b", "x"), ("b", "y"), ("b", "y"), // violation: 2 distinct
      ("c", null.asInstanceOf[String]) // all-NULL: not a violation
    ).toDF("k", "v")
    val got = Profiling.fdViolations(df, Seq("k"), "v")
      .as[(String, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(("b", 3L, 2L, "x", "y")))
  }

  // ── rate limiting ───────────────────────────────────────────────────────

  test("rateLimit keeps the earliest k per (user, bucket), ties by id") {
    // one user, one bucket (all within the same 1000s window):
    // 4 events, k=2 → keep the two earliest; tie at t=100 broken by id
    val events = Seq(
      (10L, 1L, ts(0, 100)), (11L, 1L, ts(0, 100)),
      (12L, 1L, ts(0, 50)), (13L, 1L, ts(0, 900)),
      (20L, 2L, ts(0, 10)) // other user: kept
    ).toDF("event_id", "user_id", "ts")
    val kept = Funnel.rateLimit(events, "user_id", "event_id", "ts",
        bucketUs = 1000L * 1000000L, k = 2)
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(12L, 10L, 20L))
  }

  test("rateLimit buckets are fixed windows, not sessions") {
    // same user, events in two adjacent 60s buckets → k applies per bucket
    val events = Seq(
      (1L, 1L, ts(0, 10)), (2L, 1L, ts(0, 20)),
      (3L, 1L, ts(0, 70)), (4L, 1L, ts(0, 80))
    ).toDF("event_id", "user_id", "ts")
    val kept = Funnel.rateLimit(events, "user_id", "event_id", "ts",
        bucketUs = 60L * 1000000L, k = 1)
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  // ── calibration bins ────────────────────────────────────────────────────

  test("calibrationBins quantizes against the fixed domain and rates exactly") {
    // domain [0, 100], bits=2 → rank = (q*3) div 100:
    // 0,10 → bucket 0; 50 → 1; 90 → 2; 100 → 3; 150 clamps to 100 → 3
    val df = Seq((0L, 0L), (10L, 1L), (50L, 1L), (90L, 0L), (100L, 1L),
      (150L, 1L)).toDF("q", "pos")
    val got = Histogram.calibrationBins(df, "q", "pos", bits = 2,
        mn = 0L, mx = 100L)
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 0.5, 5.0),    // qs {0,10}: mean 5, 1 of 2 positive
      (1L, 1L, 1L, 1.0, 50.0),
      (2L, 1L, 0L, 0.0, 90.0),
      (3L, 2L, 2L, 1.0, 100.0))) // q=100 and clamped 150
  }

  // ── burstiness ──────────────────────────────────────────────────────────

  test("burstiness: metronome is -1, hand-computed mixed gaps, all-zero NULL") {
    val events = Seq(
      // u1: gaps {10s, 10s} → std 0 → B = -1
      (1L, 1L, ts(0, 0)), (2L, 1L, ts(0, 10)), (3L, 1L, ts(0, 20)),
      // u2: gaps {10s, 30s} → mean 20s, std 10s → B = -10/30
      (4L, 2L, ts(0, 0)), (5L, 2L, ts(0, 10)), (6L, 2L, ts(0, 40)),
      // u3: three events at one instant → gaps {0,0} → B undefined
      (7L, 3L, ts(0, 5)), (8L, 3L, ts(0, 5)), (9L, 3L, ts(0, 5))
    ).toDF("event_id", "user_id", "ts")
    val got = Funnel.burstiness(events, "user_id", "event_id", "ts")
      .orderBy("user_id")
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 10000000L, 0.0, Some(-1.0)),
      (2L, 2L, 20000000L, 10.0, Some(-0.333333)),
      (3L, 2L, 0L, 0.0, None)))
  }

  // ── forward fill ────────────────────────────────────────────────────────

  test("forwardFill: dense grid, last-in-bucket wins, gaps carry forward") {
    // day 0 has two events (later one wins), day 1 is a gap, day 2 observed
    val events = Seq(
      (1L, 1L, ts(0, 10), 1.0), (2L, 1L, ts(0, 20), 2.0),
      (3L, 1L, ts(2, 0), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Resample.forwardFill(events, "user_id",
        "event_id", "ts", "value", bucketUs = 86400000000L)
      .orderBy("bucket")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 2.0, true),
      (1L, 1L, 2.0, false),
      (1L, 2L, 3.0, true)))
  }

  // ── top paths ───────────────────────────────────────────────────────────

  test("topPaths counts consecutive trigrams per user, never across users") {
    val events = Seq(
      (1L, 1L, ts(0, 1), "a"), (2L, 1L, ts(0, 2), "b"),
      (3L, 1L, ts(0, 3), "c"), (4L, 1L, ts(0, 4), "d"),
      (5L, 2L, ts(0, 1), "a"), (6L, 2L, ts(0, 2), "b"),
      (7L, 2L, ts(0, 3), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.topPaths(events, "user_id", "event_type", "ts",
        "event_id", k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L), ("b>c>d", 1L)))
  }

  test("calibrationBins rejects an overflowing domain") {
    val df = Seq((0L, 0L)).toDF("q", "pos")
    val err = intercept[IllegalArgumentException] {
      Histogram.calibrationBins(df, "q", "pos", bits = 31,
        mn = 0L, mx = 1L << 40)
    }
    assert(err.getMessage.contains("overflows int64"))
  }
}
