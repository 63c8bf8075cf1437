package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiling

/** Hand-computed expectations for the round-7 audit operators
  * (Benford, χ² homogeneity) — restored verbatim after AuditOpsSpec was
  * repurposed for the round-12 statistical layer; both operators still
  * back live gates (q187/q188), so their unit tests stay additive. */
class DiagnosticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── benfordAudit ────────────────────────────────────────────────────────

  test("benford: digits from cents, spine keeps zero rows") {
    // values 1.23 (123 → digit 1), 0.45 (45 → 4), 9.99 (999 → 9),
    // 1.00 (100 → 1): digit 1 has 2 obs; digits 2,3,5..8 have 0
    val df = Seq(1.23, 0.45, 9.99, 1.00).toDF("v")
      .withColumn("g", lit("a"))
    val got = Profiling.benfordAudit(df, "v", "g")
      .orderBy("digit")
      .select("digit", "n", "n_obs")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 9)
    assert(got.map(_._2).forall(_ == 4L))
    assert(got.map(t => t._1 -> t._3).toMap ==
      Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 0L,
        7L -> 0L, 8L -> 0L, 9L -> 1L))
  }

  test("benford: zero and negative values stay out of the population") {
    // 0.0 has no leading digit; -1.23 audits as |v| → digit 1; totals
    // must cover only the digit-bearing rows (n = 2, not 3)
    val df = Seq(0.0, -1.23, 4.5).toDF("v").withColumn("g", lit("a"))
    val got = Profiling.benfordAudit(df, "v", "g")
      .orderBy("digit").select("digit", "n", "n_obs")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).forall(_ == 2L))
    assert(got.map(t => t._1 -> t._3).toMap.filter(_._2 > 0) ==
      Map(1L -> 1L, 4L -> 1L))
  }

  test("benford: expected counts follow log10(1 + 1/d)") {
    val df = Seq.fill(1000)(1.0).toDF("v").withColumn("g", lit("a"))
    val e1 = Profiling.benfordAudit(df, "v", "g")
      .filter(col("digit") === 1).select("n_expected").as[Double].head()
    assert(e1 == 301.029996) // 1000·log10(2)
  }

  // ── chiSquareDrift ──────────────────────────────────────────────────────

  test("chi2 drift: identical distributions score zero") {
    // both strata 2:1 over categories x:y — expected == observed
    val df = Seq(
      ("s1", "x"), ("s1", "x"), ("s1", "y"),
      ("s2", "x"), ("s2", "x"), ("s2", "y")
    ).toDF("strat", "c")
    val got = Profiling.chiSquareDrift(df, "strat", "c")
      .orderBy("strat").select("n", "dof", "chi2")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((3L, 1L, 0.0), (3L, 1L, 0.0)))
  }

  test("chi2 drift: a missing category contributes its expectation") {
    // s1: 4×x; s2: 2×x, 2×y. Globals: x=6, y=2, n=8.
    // s1 expected: x=3, y=1 → terms (4−3)²/3 + (0−1)²/1 = 1.333333
    // s2 expected: x=3, y=1 → (2−3)²/3 + (2−1)²/1 = 1.333334 (rounded
    // terms 0.333333+1.0 vs 0.333333+1.0 — recompute: (1/3 → 0.333333)
    // both strata: 0.333333 + 1.0 = 1.333333
    val df = Seq.fill(4)(("s1", "x")) ++
      Seq(("s2", "x"), ("s2", "x"), ("s2", "y"), ("s2", "y"))
    val got = Profiling.chiSquareDrift(df.toDF("strat", "c"), "strat", "c")
      .orderBy("strat").select("dof", "chi2")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.333333), (1L, 1.333333)))
  }
}
