package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Timeline}

/** Hand-computed expectations for the round-7 sampling/trend operators
  * (A-ES weighted top-k, sliding distinct actives, Theil–Sen). */
class SamplingTrendOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): Timestamp =
    new Timestamp(day * 86400000L + sec * 1000L)

  // ── weightedTopKPerStratum ──────────────────────────────────────────────

  test("weightedTopK returns exactly k per stratum, deterministic") {
    val df = (0L until 50L).map(i => (i, "s" + (i % 2), (i + 1) * 10.0))
      .toDF("k", "strat", "w")
    val got = Sampling.weightedTopKPerStratum(df, "k", "w", "strat",
        salt = "t", k = 5)
      .groupBy("strat").count().orderBy("strat")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("s0", 5L), ("s1", 5L)))
    val run1 = Sampling.weightedTopKPerStratum(df, "k", "w", "strat",
      salt = "t", k = 5).select("k").as[Long].collect().toSet
    val run2 = Sampling.weightedTopKPerStratum(df, "k", "w", "strat",
      salt = "t", k = 5).select("k").as[Long].collect().toSet
    assert(run1 == run2)
  }

  test("weightedTopK favors heavy rows and raises on bad weights") {
    // one row with overwhelming weight is (virtually) always kept:
    // key = ln(u)/w → w=1e9 pushes the key to ~0, above all others
    val df = ((0L until 40L).map(i => (i, 1.0)) :+ (99L, 1e9))
      .toDF("k", "w").withColumn("strat", lit("s"))
    val kept = Sampling.weightedTopKPerStratum(df, "k", "w", "strat",
      salt = "t", k = 3).select("k").as[Long].collect().toSet
    assert(kept.contains(99L))
    val bad = Seq((1L, 0.0)).toDF("k", "w").withColumn("strat", lit("s"))
    val e = intercept[Exception] {
      Sampling.weightedTopKPerStratum(bad, "k", "w", "strat", "t", 1)
        .collect()
    }
    assert(e.getMessage.contains("weightedTopKPerStratum") ||
      e.getCause != null)
  }

  // ── slidingActive ───────────────────────────────────────────────────────

  test("slidingActive counts distinct entities over the trailing window") {
    // u1 active day 0; u2 active days 0 and 2; window 3 days.
    // day 0: {u1,u2}=2; day 1: {u1,u2}=2; day 2: {u1,u2}=2 (u1 visible
    // through day 2, u2 re-active); days 3,4: {u2}=1 (from day 2);
    // grid cut at max day 2 → days 0..2 only… wait: targets go to
    // day 2+2=4 but are cut at max OBSERVED day = 2 → 3 rows.
    val events = Seq((1L, ts(0)), (2L, ts(0)), (2L, ts(2)))
      .toDF("user_id", "ts")
    val got = Timeline.slidingActive(events, "user_id", "ts", windowDays = 3)
      .orderBy("day").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (1L, 2L), (2L, 2L)))
  }

  test("slidingActive window 1 equals plain daily distinct") {
    val events = Seq((1L, ts(0)), (1L, ts(0, 60)), (2L, ts(1)))
      .toDF("user_id", "ts")
    val got = Timeline.slidingActive(events, "user_id", "ts", windowDays = 1)
      .orderBy("day").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (1L, 1L)))
  }

  // ── theilSen ────────────────────────────────────────────────────────────

  test("theilSen recovers a clean linear trend exactly") {
    // y = 2·day + 5 at days 0..3 → all pairwise slopes = 2
    val events = (0 to 3).map(d => (1L, ts(d), 2.0 * d + 5.0))
      .toDF("user_id", "ts", "value")
    val got = Timeline.theilSen(events, "user_id", "ts", "value",
        bucketUs = 86400000000L)
      .select("n_pairs", "slope_micro").as[(Long, Long)].head()
    assert(got == ((6L, 2000000L)))
  }

  test("theilSen shrugs off a single outlier day") {
    // days 0..4 on y = day, except day 2 spikes to 100: 10 pairs, the
    // lower median slope stays 1.0 (6 of 10 slopes are exactly 1)
    val events = Seq((1L, ts(0), 0.0), (1L, ts(1), 1.0), (1L, ts(2), 100.0),
        (1L, ts(3), 3.0), (1L, ts(4), 4.0))
      .toDF("user_id", "ts", "value")
    val got = Timeline.theilSen(events, "user_id", "ts", "value",
        bucketUs = 86400000000L)
      .select("slope_micro").as[Long].head()
    assert(got == 1000000L)
  }

  test("theilSen averages within-day values before pairing") {
    // day 0 has values 1 and 3 (mean 2); day 1 has 5 → slope 3
    val events = Seq((1L, ts(0), 1.0), (1L, ts(0, 60), 3.0),
        (1L, ts(1), 5.0))
      .toDF("user_id", "ts", "value")
    val got = Timeline.theilSen(events, "user_id", "ts", "value",
        bucketUs = 86400000000L)
      .select("n_pairs", "slope_micro").as[(Long, Long)].head()
    assert(got == ((1L, 3000000L)))
  }
}
