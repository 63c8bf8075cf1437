package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Resample, Timeline}

/** Hand-computed expectations for the round-7 timeline operators
  * (interpolating resample, TWAP, interval coverage, CUSUM),
  * independent of the DuckDB gate. */
class TimelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  // ── interpolate ─────────────────────────────────────────────────────────

  test("interpolate fills gap ticks on the straight line") {
    // u1 observes value 10 at bucket 0 and 40 at bucket 3 (bucket = 10s):
    // grid 0..3, ticks 1,2 interpolate to 20, 30
    val events = Seq(
      (1L, ts(0), 10.0), (2L, ts(30), 40.0)
    ).toDF("event_id", "ts", "value").withColumn("user_id", lit(7L))
    val got = Resample.interpolate(events, "user_id", "event_id", "ts",
        "value", bucketUs = 10000000L)
      .orderBy("bucket")
      .select("bucket", "value", "is_observed")
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((0L, 10.0, true), (1L, 20.0, false),
      (2L, 30.0, false), (3L, 40.0, true)))
  }

  test("interpolate uses the LAST observation within a bucket") {
    // bucket 0 has two events (ids 1,2 same ts): the later id wins
    val events = Seq(
      (1L, ts(0), 99.0), (2L, ts(0), 10.0), (3L, ts(20), 30.0)
    ).toDF("event_id", "ts", "value").withColumn("user_id", lit(7L))
    val got = Resample.interpolate(events, "user_id", "event_id", "ts",
        "value", bucketUs = 10000000L)
      .orderBy("bucket").select("value").as[Double].collect().toSeq
    assert(got == Seq(10.0, 20.0, 30.0))
  }

  // ── twap ────────────────────────────────────────────────────────────────

  test("twap weights each value by its time in force") {
    // u1: v=2 held 10s, v=10 held 30s, final v=99 unweighted:
    // twap = (2*10 + 10*30) / 40 = 8.0; span 40s
    val events = Seq(
      (1L, ts(0), 2.0), (2L, ts(10), 10.0), (3L, ts(40), 99.0)
    ).toDF("event_id", "ts", "value").withColumn("user_id", lit(1L))
    val got = Timeline.twap(events, "user_id", "event_id", "ts", "value")
      .select("n_weighted", "span_s", "twap")
      .as[(Long, Double, Double)].head()
    assert(got == ((2L, 40.0, 8.0)))
  }

  test("twap: zero total weight (all events at one instant) gives NULL") {
    val events = Seq((1L, ts(5), 2.0), (2L, ts(5), 9.0))
      .toDF("event_id", "ts", "value").withColumn("user_id", lit(1L))
    val got = Timeline.twap(events, "user_id", "event_id", "ts", "value")
      .select(col("span_s"), col("twap").isNull)
      .as[(Double, Boolean)].head()
    assert(got == ((0.0, true)))
  }

  test("twap drops single-event entities (no gaps)") {
    val events = Seq((1L, ts(0), 5.0, 1L), (2L, ts(0), 5.0, 2L),
        (3L, ts(10), 7.0, 2L))
      .toDF("event_id", "ts", "value", "user_id")
    val got = Timeline.twap(events, "user_id", "event_id", "ts", "value")
      .select("user_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  // ── intervalCoverage ────────────────────────────────────────────────────

  test("intervalCoverage merges overlapping and touching intervals") {
    // hold = 10s. u1: events at 0, 5 (overlap), 15 (touches end=15),
    // 40 (separate) → islands [0,25) and [40,50): covered 35s, max 25s
    val events = Seq(
      (1L, ts(0)), (2L, ts(5)), (3L, ts(15)), (4L, ts(40))
    ).toDF("event_id", "ts").withColumn("user_id", lit(1L))
    val got = Timeline.intervalCoverage(events, "user_id", "event_id",
        "ts", holdUs = 10000000L)
      .select("n_islands", "covered_us", "max_island_us", "n_events")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((2L, 35000000L, 25000000L, 4L)))
  }

  test("intervalCoverage: non-overlapping events count separately") {
    val events = Seq((1L, ts(0)), (2L, ts(100)))
      .toDF("event_id", "ts").withColumn("user_id", lit(1L))
    val got = Timeline.intervalCoverage(events, "user_id", "event_id",
        "ts", holdUs = 1000000L)
      .select("n_islands", "covered_us").as[(Long, Long)].head()
    assert(got == ((2L, 2000000L)))
  }

  // ── cusum ───────────────────────────────────────────────────────────────

  test("cusum alarms on a sustained shift, not on the steady segment") {
    // 8 points at 10 then 12 at 20 (slack=0, h=2σ): μ=16, var=24,
    // σ=4.898979 (6dp), ref=16, h=9.797959.
    // Low block: d=−6 each, P=−6k = running min → S=0, no alarms.
    // High block: d=+4, P=−48+4k, min stays −48 → S=4k; 4k > h ⟺ k≥3
    // → alarms at k=3..12 (10 alarms); first at event index 10
    // (ts=100s); peak S=48.
    val vals = Seq.fill(8)(10.0) ++ Seq.fill(12)(20.0)
    val events = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i * 10L), v)
    }.toDF("event_id", "ts", "value").withColumn("user_id", lit(1L))
    val got = Timeline.cusum(events, "user_id", "event_id", "ts", "value",
        slack = 0.0, hSigma = 2.0)
      .select("n_events", "n_alarms", "first_alarm_us", "peak_s_micros")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((20L, 10L, 100000000L, 48000000L)))
  }

  test("cusum constant series never alarms (σ = 0)") {
    val events = (0 until 5).map(i => (i.toLong, ts(i * 10L), 3.0))
      .toDF("event_id", "ts", "value").withColumn("user_id", lit(1L))
    val got = Timeline.cusum(events, "user_id", "event_id", "ts", "value")
      .select("n_alarms", "peak_s_micros").as[(Long, Long)].head()
    assert(got == ((0L, 0L)))
  }
}
