package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{GlobalRank, Sessionize, Similarity, TextDedup, VectorAggs}

/** Operator specs for the round-2/3 additions: sessionization boundaries,
  * vector aggregation + IVF ANN, distributed global rank/ntile, the
  * df-capped Jaccard path, and bucketed cosine near-dup. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("gap strictly greater than gapSeconds starts a new session") {
    val df = Seq(
      ("u1", 1L, ts(0)), ("u1", 2L, ts(600)),     // same session
      ("u1", 3L, ts(600 + 1800)),                 // gap == 1800 s: SAME session
      ("u1", 4L, ts(600 + 1800 + 1801)),          // gap  > 1800 s: new session
      ("u2", 5L, ts(0))
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize(df, Seq("user_id"), "ts", 1800,
        Seq(col("event_id")))
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("equal timestamps order by the tiebreak, numbering stays deterministic") {
    val df = Seq(
      ("u1", 2L, ts(100)), ("u1", 1L, ts(100)),   // same instant, 2 events
      ("u1", 3L, ts(100 + 5000))                  // far later: session 2
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize(df, Seq("user_id"), "ts", 1800, Seq(col("event_id")))
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessions rollup: counts and bounds per session") {
    val df = Seq(
      ("u1", 1L, ts(0)), ("u1", 2L, ts(10)), ("u1", 3L, ts(10000))
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize.sessions(df, Seq("user_id"), "ts", 1800,
        Seq(col("event_id")))
      .orderBy("session_id")
      .select("session_id", "n_events", "session_start", "session_end")
      .collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 2 && out(0).getTimestamp(2) === ts(0) &&
      out(0).getTimestamp(3) === ts(10))
    assert(out(1).getLong(1) === 1)
  }
}

class VectorAggsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, "a", Seq(1.0f, 0.0f)), (1L, "a", Seq(0.0f, 1.0f)),
    (2L, "b", Seq(1.0f, 1.0f)), (3L, "b", Seq(3.0f, 1.0f)),
    (4L, "b", Seq(2.0f, 1.0f))
  ).toDF("vec_id", "label", "embedding")

  test("centroids: exact per-(label, dim) means") {
    val out = VectorAggs.centroids(emb, "label", "embedding")
      .orderBy("label", "dim")
      .as[(String, Int, Double)].collect()
    assert(out === Array(("a", 0, 0.5), ("a", 1, 0.5),
      ("b", 0, 2.0), ("b", 1, 1.0)))
  }

  test("centroids are partitioning-invariant (decimal accumulation)") {
    val a = VectorAggs.centroids(emb.repartition(7), "label", "embedding")
    val b = VectorAggs.centroids(emb.coalesce(1), "label", "embedding")
    assert(a.orderBy("label", "dim").collect()
      === b.orderBy("label", "dim").collect())
  }

  test("ivfAssign puts every vector in its nearest centroid bucket") {
    val cent = VectorAggs.centroidVectors(emb, "label", "embedding")
    val out = VectorAggs.ivfAssign(emb, "vec_id", "embedding", cent, "label")
      .select("vec_id", "cluster").as[(Long, String)].collect().toMap
    // (3,1) and (2,1) are closer in angle to b's centroid (2,1); (0,1) to a's
    assert(out(1L) === "a" && out(3L) === "b" && out(4L) === "b")
    assert(out.size === 5)
  }

  test("ivfTopK: nprobe >= n_labels degrades to exact top-k") {
    val exact = Set((0L, 2L), (0L, 3L), (0L, 4L), (0L, 1L))
    val out = VectorAggs.ivfTopK(emb, "vec_id", "embedding", "label",
        col("vec_id") === 0, k = 4, nprobe = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    assert(out === exact)
  }

  test("ivfTopK with an empty query set returns no rows") {
    val n = VectorAggs.ivfTopK(emb, "vec_id", "embedding", "label",
      col("vec_id") < 0, k = 3, nprobe = 1).count()
    assert(n === 0)
  }
}

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-partition window row_number") {
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i)).toDF("v", "id")
      .repartition(13)
    val viaOp = GlobalRank.globalRowNumber(df,
        Seq(col("v").asc, col("id").asc), "rn")
      .select("id", "rn").as[(Int, Long)].collect().toMap
    val viaWindow = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v").asc, col("id").asc))
          .cast("long"))
      .select("id", "rn").as[(Int, Long)].collect().toMap
    assert(viaOp === viaWindow)
  }

  test("ntileExact matches ntile() including uneven and n < buckets cases") {
    for ((n, b) <- Seq((997, 10), (10, 10), (7, 10), (100, 7))) {
      val df = (1 to n).map(i => ((i * 37) % 101, i)).toDF("v", "id")
        .repartition(5)
      val viaOp = GlobalRank.ntileExact(df,
          Seq(col("v").asc, col("id").asc), b, "bkt")
        .select("id", "bkt").as[(Int, Int)].collect().toMap
      val viaWindow = df.withColumn("bkt",
          ntile(b).over(Window.orderBy(col("v").asc, col("id").asc)))
        .select("id", "bkt").as[(Int, Int)].collect().toMap
      assert(viaOp === viaWindow, s"n=$n b=$b")
    }
  }
}

class DfCapAndBucketedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy cat today"),
    (3L, "completely different text about spark engines running fast"),
    (4L, "completely different text about spark engines running slow")
  ).toDF("doc_id", "text")

  test("maxDf cap keeps true near-dup pairs when cap >= their support") {
    val uncapped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      w = 3, threshold = 0.5).select("d1", "d2")
      .as[(Long, Long)].collect().toSet
    val capped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      w = 3, threshold = 0.5, maxDf = Some(10L)).select("d1", "d2")
      .as[(Long, Long)].collect().toSet
    assert(uncapped === capped)
    assert(uncapped === Set((1L, 2L), (3L, 4L)))
  }

  test("maxDf = 0 drops every candidate (all shingles too common)") {
    assert(TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      w = 3, threshold = 0.5, maxDf = Some(0L)).count() === 0)
  }

  test("bucketed cosine near-dup finds identical-direction vectors") {
    val emb = Seq(
      (0L, (1 to 64).map(i => i.toFloat / 64)),
      (1L, (1 to 64).map(i => i.toFloat / 32)),  // same direction as 0
      (2L, (1 to 64).map(i => ((i * 31) % 17 - 8).toFloat))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairsBucketed(emb, "vec_id",
        "embedding", threshold = 0.99, nTables = 4, planesPerTable = 4,
        dims = 64)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(out === Set((0L, 1L)))
  }
}
