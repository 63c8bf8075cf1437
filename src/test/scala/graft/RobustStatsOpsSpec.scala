package graft

import org.apache.spark.sql.functions._
import graft.operators.{Itemsets, Standardize}

/** Hand-computed expectations for the round-7 robust-stats/itemset
  * operators (MAD outliers, frequent pairs). */
class RobustStatsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── madOutliers ─────────────────────────────────────────────────────────

  test("madOutliers: integer medians and the Hampel flag") {
    // values 1,2,3,4,100 (ids 1..5): lower median at rn=(5+1)/2=3 → 3;
    // devs 2,1,0,1,97 → sorted 0,1,1,2,97 → mad = 1;
    // outliers: dev > 3·1 → only 97 → 1 outlier
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 100L))
      .toDF("id", "v").withColumn("g", lit("a"))
    val got = Standardize.madOutliers(df, "v", "id", "g")
      .select("n", "med", "mad", "n_outliers")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((5L, 3L, 1L, 1L)))
  }

  test("madOutliers: even count takes the lower median") {
    // values 1,2,3,4: lower median at rn=(4+1)/2=2 → 2; devs 1,0,1,2 →
    // sorted 0,1,1,2 → mad at rn=2 → 1; outliers: dev > 3 → none
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("id", "v").withColumn("g", lit("a"))
    val got = Standardize.madOutliers(df, "v", "id", "g")
      .select("med", "mad", "n_outliers").as[(Long, Long, Long)].head()
    assert(got == ((2L, 1L, 0L)))
  }

  test("madOutliers: constant stratum has mad 0, spikes flagged") {
    val df = (Seq.fill(9)(7L) :+ 8L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").withColumn("g", lit("a"))
    val got = Standardize.madOutliers(df, "v", "id", "g")
      .select("med", "mad", "n_outliers").as[(Long, Long, Long)].head()
    assert(got == ((7L, 0L, 1L))) // dev 1 > 3·0
  }

  // ── frequentPairs ───────────────────────────────────────────────────────

  test("frequentPairs applies support at word and pair level") {
    // 4 docs; words: a in all 4, b in 3, c in 2, d in 1.
    // support 1/2 (≥2 docs): frequent words a,b,c (d pruned).
    // pairs: (a,b) in 3 docs ✓; (a,c) in 2 ✓; (b,c) in 1 ✗.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "a b"), (4L, "a c")
    ).toDF("doc_id", "text")
    val got = Itemsets.frequentPairs(docs, "doc_id", "text", 1, 2)
      .orderBy("w1", "w2")
      .select("w1", "w2", "n_both", "lift")
      .as[(String, String, Long, Double)].collect().toSeq
    // lift(a,b) = 3·4/(4·3) = 1.0; lift(a,c) = 2·4/(4·2) = 1.0
    assert(got == Seq(("a", "b", 3L, 1.0), ("a", "c", 2L, 1.0)))
  }

  test("frequentPairs counts presence, not multiplicity") {
    val docs = Seq((1L, "x y x y x"), (2L, "x y"))
      .toDF("doc_id", "text")
    val got = Itemsets.frequentPairs(docs, "doc_id", "text", 1, 1)
      .select("w1", "w2", "n_both", "lift")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("x", "y", 2L, 1.0)))
  }
}
