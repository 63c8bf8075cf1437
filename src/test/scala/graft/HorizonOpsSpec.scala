package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Relevance, Standardize, TextDedup}

class HorizonOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── ERR@k ───────────────────────────────────────────────────────────────

  test("errAtK: single relevant top hit gives ERR = (2^rel-1)/2^g exactly") {
    // rel 3 at rank 1, rel 0 at rank 2 → ERR = 7/8
    val df = Seq(("g1", 100L, 1L, 3L), ("g1", 50L, 2L, 0L))
      .toDF("grp", "score", "id", "rel")
    val got = Relevance.errAtK(df, "grp", "score", "id", "rel",
        k = 10, gradeBits = 3)
      .select("n_items", "err_num", "err_den", "err_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 == 2L)
    assert(got._2 == 2520L * (1L << 27) * 7)
    assert(got._3 == 2520L * (1L << 30))
    assert(got._4 == 875000L)
  }

  test("errAtK: NULL relevance scores as zero, never as the max grade") {
    // least/greatest skip NULLs, so an unguarded clamp would turn a NULL
    // judgment into rel = gradeBits (maximally relevant) — the coalesce
    // must pin it to 0: same ERR as an explicit rel-0 second hit
    val withNull = Seq(("g", 100L, 1L, Some(3L)),
        ("g", 50L, 2L, None: Option[Long]))
      .toDF("grp", "score", "id", "rel")
    val explicit0 = Seq(("g", 100L, 1L, 3L), ("g", 50L, 2L, 0L))
      .toDF("grp", "score", "id", "rel")
    def run(df: org.apache.spark.sql.DataFrame) =
      Relevance.errAtK(df, "grp", "score", "id", "rel",
          k = 10, gradeBits = 3)
        .select("err_num", "err_den", "err_micro")
        .as[(Long, Long, Long)].head()
    assert(run(withNull) == run(explicit0))
    assert(run(withNull)._3 == 875000L)
  }

  test("errAtK: cascade discounts a second hit by the first's satisfaction") {
    // rel 3, rel 3: ERR = 7/8 + (1/2)·(7/8)·(1/8) = 7/8 + 7/128
    val df = Seq(("g", 9L, 1L, 3L), ("g", 8L, 2L, 3L))
      .toDF("grp", "score", "id", "rel")
    val got = Relevance.errAtK(df, "grp", "score", "id", "rel",
        k = 10, gradeBits = 3)
      .select("err_num", "err_den").as[(Long, Long)].head()
    // 7/8 + 7/128 = 119/128
    assert(BigInt(got._1) * 128 == BigInt(119) * got._2)
  }

  test("errAtK matches the direct double computation on mixed grades") {
    val rels = Seq(1L, 0L, 3L, 2L, 0L, 1L)
    val df = rels.zipWithIndex.map { case (r, i) =>
      ("g", 100L - i, i.toLong, r)
    }.toDF("grp", "score", "id", "rel")
    val got = Relevance.errAtK(df, "grp", "score", "id", "rel",
        k = 10, gradeBits = 3)
      .select("err_num", "err_den").as[(Long, Long)].head()
    var p = 1.0
    var err = 0.0
    rels.zipWithIndex.foreach { case (r, i) =>
      val rr = ((1 << r) - 1).toDouble / 8.0
      err += p * rr / (i + 1)
      p *= (1.0 - rr)
    }
    assert(math.abs(got._1.toDouble / got._2.toDouble - err) < 1e-12)
  }

  // ── harmonic centrality ─────────────────────────────────────────────────

  test("harmonicCentrality: path graph distances from one and two seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val seeds1 = Seq(1L).toDF("node")
    val got1 = Graph.harmonicCentrality(edges, "a", "b", seeds1, "node", 6)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(got1 == Seq((1L, 0L, 0L), (2L, 1L, 1000000L),
      (3L, 1L, 500000L), (4L, 1L, 333333L)))
    val seeds2 = Seq(1L, 4L).toDF("node")
    val got2 = Graph.harmonicCentrality(edges, "a", "b", seeds2, "node", 6)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(got2 == Seq((1L, 1L, 333333L), (2L, 2L, 1500000L),
      (3L, 2L, 1500000L), (4L, 1L, 333333L)))
  }

  test("harmonicCentrality respects the depth bound") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.harmonicCentrality(edges, "a", "b",
        Seq(1L).toDF("node"), "node", maxDepth = 2)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    // node 4 at distance 3 is beyond the horizon → 0
    assert(got == Seq((1L, 0L, 0L), (2L, 1L, 1000000L),
      (3L, 1L, 500000L), (4L, 0L, 0L)))
  }

  // ── Krippendorff's alpha ────────────────────────────────────────────────

  test("krippendorffAlpha: hand-computed 4-unit 2-rater nominal example") {
    // u1 (A,A), u2 (A,B), u3 (B,B), u4 (B,B):
    // D_o = 2/8, D_e = 30/56 → alpha = 128/240 = 0.533333…
    val long = Seq(
      (1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "B"), (4L, "B"), (4L, "B")
    ).toDF("unit", "label")
    val got = Standardize.krippendorffAlpha(long, "unit", "label")
      .select("n_units", "n_raters", "complete", "alpha_micro")
      .as[(Long, Long, Boolean, Long)].head()
    assert(got == ((4L, 2L, true, 533333L)))
  }

  test("krippendorffAlpha: perfect agreement is exactly 1, NULL when" +
      " expected disagreement is zero") {
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("unit", "label")
    val a = Standardize.krippendorffAlpha(perfect, "unit", "label")
      .select("alpha_micro").as[Option[Long]].head()
    assert(a.contains(1000000L))
    val constant = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("unit", "label")
    val b = Standardize.krippendorffAlpha(constant, "unit", "label")
      .select("alpha_micro").as[Option[Long]].head()
    assert(b.isEmpty)
  }

  // ── character-bigram F1 ─────────────────────────────────────────────────

  test("charBigramF1Pairs: multiset overlap, hand-computed") {
    // "abab" → {ab:2, ba:1} h=3; "abba" → {ab:1, bb:1, ba:1} r=3
    // m = min(2,1) + min(1,1) = 2 → F1 = 4/6 → 666667 micro
    val docs = Seq((1L, "abab"), (2L, "abba")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("d1", "d2")
    val got = TextDedup.charBigramF1Pairs(docs, pairs, "doc_id", "text")
      .select("m", "h", "r", "f1_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((2L, 3L, 3L, 666667L)))
  }

  test("charBigramF1Pairs: identical docs score exactly 1, disjoint 0") {
    val docs = Seq((1L, "hello"), (2L, "hello"), (3L, "zzzz"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("d1", "d2")
    val got = TextDedup.charBigramF1Pairs(docs, pairs, "doc_id", "text")
      .orderBy("d2").select("f1_micro").as[Long].collect().toSeq
    assert(got == Seq(1000000L, 0L))
  }
}
