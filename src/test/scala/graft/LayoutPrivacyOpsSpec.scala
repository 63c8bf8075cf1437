package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Profiling}

/** Hand-computed expectations for the round-7 layout/privacy operators
  * (Hilbert curve, bootstrap CI, k-anonymity). */
class LayoutPrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── hilbertValue ────────────────────────────────────────────────────────

  test("hilbert: 2x2 curve is the canonical U") {
    val cells = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val got = cells.select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits = 1).as("d"))
      .orderBy("d").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 0L), (0L, 1L, 1L), (1L, 1L, 2L),
      (1L, 0L, 3L)))
  }

  test("hilbert: every curve step is grid-adjacent (16x16, bits=4)") {
    val n = 16
    val cells = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got = cells.select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits = 4).as("d"))
      .as[(Long, Long, Long)].collect()
    // bijective onto 0..255
    assert(got.map(_._3).sorted.toSeq == (0L until 256L).toSeq)
    // consecutive d → Manhattan distance exactly 1 (the Hilbert
    // property Morton order lacks)
    val byD = got.map(t => t._3 -> ((t._1, t._2))).toMap
    for (d <- 0L until 255L) {
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("withHilbertValue guards absurd domains") {
    val df = Seq((0L, 0L), (Long.MaxValue / 2, 1L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Layout.withHilbertValue(df, "a", "b", bits = 16)
    }
    assert(e.getMessage.contains("domain"))
  }

  // ── bootstrapMeanCI ─────────────────────────────────────────────────────

  test("bootstrapMeanCI brackets the point estimate, deterministic") {
    val df = (1L to 200L).map(i => (i, 100L + (i % 21)))
      .toDF("id", "x").withColumn("g", lit("a"))
    val r1 = Profiling.bootstrapMeanCI(df, "x", "id", "g", salt = "t")
      .select("n", "mean", "ci_lo", "ci_hi")
      .as[(Long, Double, Double, Double)].head()
    assert(r1._1 == 200L)
    assert(r1._3 <= r1._2 && r1._2 <= r1._4,
      s"CI [${r1._3}, ${r1._4}] should bracket mean ${r1._2}")
    // ~95% CI width for mean of U(100..120): sd≈6.06, se≈0.43 — the
    // interval is tight but nonzero
    assert(r1._4 - r1._3 > 0.0 && r1._4 - r1._3 < 5.0)
    val r2 = Profiling.bootstrapMeanCI(df, "x", "id", "g", salt = "t")
      .select("ci_lo").as[Double].head()
    assert(r2 == r1._3) // bit-stable across runs
  }

  // ── kAnonymityAudit ─────────────────────────────────────────────────────

  test("kAnonymityAudit reports only small classes with their diversity") {
    val df = Seq(
      // class (a, 1): 3 members, 2 sensitive values → reported, l=2
      ("a", 1L, "s1"), ("a", 1L, "s1"), ("a", 1L, "s2"),
      // class (a, 2): 5 members → NOT reported at k=5
      ("a", 2L, "s1"), ("a", 2L, "s2"), ("a", 2L, "s3"),
      ("a", 2L, "s4"), ("a", 2L, "s5"),
      // class (b, 1): singleton, l=1 → worst case
      ("b", 1L, "s9")
    ).toDF("q1", "q2", "sv")
    val got = Profiling.kAnonymityAudit(df, Seq("q1", "q2"), "sv", k = 5L)
      .orderBy("q1", "q2")
      .select("q1", "q2", "n", "l_diversity")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 3L, 2L), ("b", 1L, 1L, 1L)))
  }
}
