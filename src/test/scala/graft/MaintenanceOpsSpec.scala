package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Snapshot}

/** Hand-computed expectations for the round-7 maintenance/sequence
  * operators (MERGE apply, join IVM, pattern matching). */
class MaintenanceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  // ── mergeApply ──────────────────────────────────────────────────────────

  test("mergeApply: upserts replace, deletes remove, inserts appear") {
    val current = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, null.asInstanceOf[String], "D"),
        (9L, "i", "U"))
      .toDF("k", "v", "op")
    val got = Snapshot.mergeApply(current, changes, "k", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (9L, "i")))
  }

  test("mergeApply rejects unknown ops instead of silently deleting") {
    val current = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "A", "I")).toDF("k", "v", "op")
    val e = intercept[Exception] {
      Snapshot.mergeApply(current, changes, "k", "op").collect()
    }
    assert(e.getMessage.contains("mergeApply") || e.getCause != null)
  }

  // ── maintainJoin ────────────────────────────────────────────────────────

  test("maintainJoin equals the full recompute on the new snapshots") {
    val aOld = Seq((1L, 10L), (2L, 20L)).toDF("k", "a")
    val bOld = Seq((1L, "x"), (2L, "y")).toDF("k", "b")
    val dA = Seq((1L, 11L), (3L, 30L)).toDF("k", "a")
    val dB = Seq((3L, "z")).toDF("k", "b")
    val inc = Snapshot.maintainJoin(aOld, dA, bOld, dB, "k")
      .orderBy("k", "a", "b").as[(Long, Long, String)].collect().toSeq
    val full = aOld.unionByName(dA).join(bOld.unionByName(dB), "k")
      .orderBy("k", "a", "b").as[(Long, Long, String)].collect().toSeq
    assert(inc == full)
    // the ΔA⋈ΔB term is actually exercised: key 3 only exists in deltas
    assert(inc.exists(_._1 == 3L))
  }

  // ── sequencePatternCounts ───────────────────────────────────────────────

  test("sequencePatternCounts finds non-overlapping motifs in order") {
    // u1 sequence: v c v p e v p → 'v[vc]*p' matches "vcvp" then "vp"
    val events = Seq(
      (1L, ts(1), "view"), (2L, ts(2), "click"), (3L, ts(3), "view"),
      (4L, ts(4), "purchase"), (5L, ts(5), "error"), (6L, ts(6), "view"),
      (7L, ts(7), "purchase")
    ).toDF("event_id", "ts", "event_type").withColumn("user_id", lit(1L))
    val got = Funnel.sequencePatternCounts(events, "user_id", "event_type",
        "ts", "event_id", "v[vc]*p")
      .select("n_events", "n_matches").as[(Long, Long)].head()
    assert(got == ((7L, 2L)))
  }

  test("sequencePatternCounts: ties order by id, no match when absent") {
    // same ts: order by event_id → p before v → no match
    val events = Seq(
      (1L, ts(1), "purchase"), (2L, ts(1), "view")
    ).toDF("event_id", "ts", "event_type").withColumn("user_id", lit(1L))
    val got = Funnel.sequencePatternCounts(events, "user_id", "event_type",
        "ts", "event_id", "v[vc]*p")
      .select("n_matches").as[Long].head()
    assert(got == 0L)
  }
}
