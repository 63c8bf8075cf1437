package graft

import org.apache.spark.sql.functions._
import graft.operators.{Histogram, Layout, Similarity}

/** Hand-computed expectations for the round-7 placement/selection
  * operators (rendezvous sharding, isotonic PAV, farthest points),
  * independent of the DuckDB gate. */
class PlacementOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── rendezvous sharding ─────────────────────────────────────────────────

  test("shardOf and rendezvousShards agree and are stable") {
    val keys = (0L until 200L).toDF("k")
    val viaProjection = keys
      .select(col("k"), Layout.shardOf(col("k"), 8).as("shard"))
    val viaWindow = Layout.rendezvousShards(keys, "k", 8)
      .select(col("k"), col("shard").cast("long").as("shard"))
    assert(viaProjection.except(viaWindow).count() == 0 &&
      viaWindow.except(viaProjection).count() == 0)
    // all shards in range, deterministic across evaluations
    val shards = viaProjection.select("shard").as[Long].collect()
    assert(shards.forall(s => s >= 0 && s < 8))
    val again = keys.select(Layout.shardOf(col("k"), 8)).as[Long].collect()
    assert(shards.toSeq == again.toSeq)
  }

  test("rendezvous reassigns only leavers when a shard is removed") {
    // keys on shards 0..6 keep their shard when shard 7 is removed;
    // that is the whole point of highest-random-weight hashing
    val keys = (0L until 300L).toDF("k")
    val with8 = keys.select(col("k"), Layout.shardOf(col("k"), 8).as("s8"))
    val with7 = keys.select(col("k"), Layout.shardOf(col("k"), 7).as("s7"))
    val joined = with8.join(with7, "k")
      .select(col("s8"), col("s7")).as[(Long, Long)].collect()
    val stayers = joined.filter(_._1 < 7)
    assert(stayers.forall { case (a, b) => a == b })
    assert(joined.exists(_._1 == 7)) // some keys actually were on shard 7
  }

  // ── isotonic calibration ────────────────────────────────────────────────

  test("isotonicCalibration pools adjacent violators, exact on monotone") {
    // bins with a violation: rates 0.2, 0.6, 0.4 (n=10 each) → middle
    // two pool to (6+4)/20 = 0.5; monotone output 0.2, 0.5, 0.5
    val bins = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L))
      .toDF("bucket", "n", "n_pos")
    val got = Histogram.isotonicCalibration(bins, "bucket", "n", "n_pos")
      .orderBy("bucket").select("bucket", "raw_rate", "iso_rate")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((0L, 0.2, 0.2), (1L, 0.6, 0.5), (2L, 0.4, 0.5)))
    // already-monotone input passes through unchanged
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
      .toDF("bucket", "n", "n_pos")
    val got2 = Histogram.isotonicCalibration(mono, "bucket", "n", "n_pos")
      .orderBy("bucket").select("iso_rate").as[Double].collect().toSeq
    assert(got2 == Seq(0.1, 0.5, 0.9))
  }

  test("isotonicCalibration: empty bins produce zero rows, not nulls") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("bucket", "n", "n_pos")
    assert(Histogram.isotonicCalibration(empty, "bucket", "n", "n_pos")
      .count() == 0)
  }

  test("isotonicCalibration: global pooling when fully decreasing") {
    val bins = Seq((0L, 10L, 9L), (1L, 10L, 5L), (2L, 10L, 1L))
      .toDF("bucket", "n", "n_pos")
    val got = Histogram.isotonicCalibration(bins, "bucket", "n", "n_pos")
      .orderBy("bucket").select("iso_rate").as[Double].collect().toSeq
    assert(got == Seq(0.5, 0.5, 0.5))
  }

  // ── farthest points ─────────────────────────────────────────────────────

  test("farthestPoints stops instead of re-selecting when points run out") {
    // three identical vectors, k=3: after the first pick every distance
    // is 0 — the traversal must stop at 1 row, not duplicate ids
    val dup = Seq((0L, Seq(1f)), (1L, Seq(1f)), (2L, Seq(1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.farthestPoints(dup, "vec_id", "embedding", k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(0L))
  }

  test("farthestPoints walks the greedy k-center traversal") {
    // 1-D embeddings at 0, 1, 10, 11 (ids 0..3): start id 0;
    // farthest is 11 (d=121); then 10: min(100, 1)=... candidates after
    // {0, 11}: id1 min(1,100)=1, id2 min(100,1)=1 → tie → lower id (1)
    val vecs = Seq(
      (0L, Seq(0f)), (1L, Seq(1f)), (2L, Seq(10f)), (3L, Seq(11f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.farthestPoints(vecs, "vec_id", "embedding", k = 3)
      .orderBy("sel_idx")
      .select("sel_idx", "vec_id", "dmin")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((0L, 0L, None), (1L, 3L, Some(121.0)),
      (2L, 1L, Some(1.0))))
  }
}
