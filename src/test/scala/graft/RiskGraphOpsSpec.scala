package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Timeline}

/** Hand-computed expectations for the round-7 graph/risk operators
  * (two-hop counts, realized volatility, max drawdown). */
class RiskGraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): Timestamp =
    new Timestamp(day * 86400000L + sec * 1000L)

  // ── twoHopCounts ────────────────────────────────────────────────────────

  test("twoHopCounts: path graph counts strict two-hop neighbors") {
    // path 1-2-3-4: two-hop pairs are (1,3), (2,4) and mirrors →
    // 1:{3}, 2:{4}, 3:{1}, 4:{2} — one each
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
    val got = Graph.twoHopCounts(pairs, "d1", "d2")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("twoHopCounts: triangle has no strict two-hop neighbors") {
    // in a triangle every 2-hop target is already a direct neighbor
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("d1", "d2")
    assert(Graph.twoHopCounts(pairs, "d1", "d2").count() == 0)
  }

  test("twoHopCounts: star center sees none, leaves see each other") {
    // star 0-{1,2,3}: center's 2-hops are itself-excluded leaves→center
    // paths... leaves: each sees the other 2 leaves; center: none
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("d1", "d2")
    val got = Graph.twoHopCounts(pairs, "d1", "d2")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  // ── volatility ──────────────────────────────────────────────────────────

  test("volatility: constant closes give zero vol, doubling gives ln 2") {
    val events = Seq(
      (1L, ts(0), 8.0, 1L), (2L, ts(1), 8.0, 1L), (3L, ts(2), 8.0, 1L),
      // u2: closes 1, 2, 4 → returns ln2, ln2 → mean ln2; vol ≈ 0 (the
      // 6-dp per-term rounding of r vs r² leaves a ~5e-4 residual)
      (4L, ts(0), 1.0, 2L), (5L, ts(1), 2.0, 2L), (6L, ts(2), 4.0, 2L)
    ).toDF("event_id", "ts", "value", "user_id")
    val got = Timeline.volatility(events, "user_id", "event_id", "ts",
        "value", bucketUs = 86400000000L)
      .orderBy("user_id")
      .select("n_returns", "mean_return_micro", "volatility")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.head == ((2L, 0L, 0.0)))
    assert(got(1)._2 == 693147L && got(1)._3 < 0.001)
  }

  test("volatility uses the LAST event of each bucket as the close") {
    // day 0 events 5 then 10 (close 10), day 1 close 20 → one return ln2
    val events = Seq(
      (1L, ts(0), 5.0, 1L), (2L, ts(0, 60), 10.0, 1L), (3L, ts(1), 20.0, 1L)
    ).toDF("event_id", "ts", "value", "user_id")
    val got = Timeline.volatility(events, "user_id", "event_id", "ts",
        "value", bucketUs = 86400000000L)
      .select("n_returns", "mean_return_micro").as[(Long, Long)].head()
    assert(got == ((1L, 693147L)))
  }

  // ── maxDrawdown ─────────────────────────────────────────────────────────

  test("maxDrawdown finds the worst peak-to-trough") {
    // closes 10, 8, 12, 6: peaks 10,10,12,12 → dds 0, 0.2, 0, 0.5
    val events = Seq(
      (1L, ts(0), 10.0), (2L, ts(1), 8.0), (3L, ts(2), 12.0),
      (4L, ts(3), 6.0)
    ).toDF("event_id", "ts", "value").withColumn("user_id", lit(1L))
    val got = Timeline.maxDrawdown(events, "user_id", "event_id", "ts",
        "value", bucketUs = 86400000000L)
      .select("n_buckets", "max_drawdown", "peak_close")
      .as[(Long, Double, Double)].head()
    assert(got == ((4L, 0.5, 12.0)))
  }

  test("maxDrawdown on a monotone rally is zero") {
    val events = Seq((1L, ts(0), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
      .toDF("event_id", "ts", "value").withColumn("user_id", lit(1L))
    val got = Timeline.maxDrawdown(events, "user_id", "event_id", "ts",
        "value", bucketUs = 86400000000L)
      .select("max_drawdown").as[Double].head()
    assert(got == 0.0)
  }
}
