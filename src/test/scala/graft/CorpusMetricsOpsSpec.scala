package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiling, Relevance, TextAnalysis}

/** Hand-computed expectations for the round-7 corpus-metric operators
  * (winnowing fingerprints, average precision, Gini concentration). */
class CorpusMetricsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── winnowedFingerprints ────────────────────────────────────────────────

  test("winnowing: identical docs share all fingerprints") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowedFingerprints(docs, "doc_id", "text",
        w = 3, winnow = 4)
      .orderBy("doc_id")
      .select("n_fingerprints", "fp_sum", "fp_min")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 2 && got(0) == got(1))
  }

  test("winnowing guarantee: a shared run of w+winnow-1 words leaves a " +
      "common fingerprint") {
    // both docs contain the 6-word run "p q r s t u" (w=3, winnow=4:
    // guarantee length 3+4-1=6) at DIFFERENT positions; position rides
    // in the low bits of the encode, so intersect on the hash part
    val docs = Seq(
      (1L, "p q r s t u x1 y1 z1 w1 v1 u1"),
      (2L, "a2 b2 c2 d2 e2 p q r s t u")
    ).toDF("doc_id", "text")
    val picks = TextAnalysis.winnowedPicks(docs, "doc_id", "text",
      w = 3, winnow = 4)
    val h1 = picks.filter(col("doc_id") === 1)
      .select("fp_hash").as[Long].collect().toSet
    val h2 = picks.filter(col("doc_id") === 2)
      .select("fp_hash").as[Long].collect().toSet
    assert(h1.intersect(h2).nonEmpty)
  }

  test("winnowing: too-short docs produce no rows") {
    val docs = Seq((1L, "a b"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowedFingerprints(docs, "doc_id", "text",
        w = 3, winnow = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  // ── concordance ─────────────────────────────────────────────────────────

  test("concordance extracts every hit with a clamped window") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "data a b data c"),       // hits at pos 1 (left-clamped), 4
      (2L, "x y z")                  // no hits
    ).toDF("doc_id", "text")
    val got = TextAnalysis.concordance(docs, "doc_id", "text", "data", 2)
      .orderBy("doc_id", "pos")
      .select("doc_id", "pos", "context")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "data a b"),
      (1L, 4L, "a b data c")))
  }

  // ── averagePrecision ────────────────────────────────────────────────────

  test("averagePrecision: perfect and worst rankings") {
    // g1: rels at ranks 1,2 of 4 → AP = (1/1 + 2/2)/2 = 1
    // g2: rels at ranks 3,4 of 4 → AP = (1/3 + 2/4)/2 = 0.416667
    val df = Seq(
      ("g1", 40, 1L, 1L), ("g1", 30, 2L, 1L), ("g1", 20, 3L, 0L),
      ("g1", 10, 4L, 0L),
      ("g2", 40, 1L, 0L), ("g2", 30, 2L, 0L), ("g2", 20, 3L, 1L),
      ("g2", 10, 4L, 1L)
    ).toDF("grp", "score", "id", "rel")
    val got = Relevance.averagePrecision(df, "grp", "score", "id", "rel")
      .orderBy("grp").select("avg_precision").as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.416667))
  }

  test("averagePrecision: no relevant items yields NULL") {
    val df = Seq(("g", 2, 1L, 0L), ("g", 1, 2L, 0L))
      .toDF("grp", "score", "id", "rel")
    val r = Relevance.averagePrecision(df, "grp", "score", "id", "rel")
      .select(col("avg_precision").isNull).as[Boolean].head()
    assert(r)
  }

  // ── giniConcentration ───────────────────────────────────────────────────

  test("gini: equal values → 0, total concentration → (n−1)/n") {
    val even = (1L to 4L).map(i => (i, 10L)).toDF("id", "x")
      .withColumn("g", lit("a"))
    val g0 = Profiling.giniConcentration(even, "x", "id", "g")
      .select("gini").as[Double].head()
    assert(g0 == 0.0)
    // one row holds everything: gini = (n−1)/n = 0.75
    val conc = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 100L))
      .toDF("id", "x").withColumn("g", lit("a"))
    val g1 = Profiling.giniConcentration(conc, "x", "id", "g")
      .select("gini").as[Double].head()
    assert(g1 == 0.75)
  }

  test("gini: known small case") {
    // values 1,2,3,4 sorted: Σix = 1+4+9+16 = 30, Σx = 10, n = 4:
    // gini = (60 − 50)/40 = 0.25
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("id", "x").withColumn("g", lit("a"))
    val got = Profiling.giniConcentration(df, "x", "id", "g")
      .select("n", "total", "gini").as[(Long, Long, Double)].head()
    assert(got == ((4L, 10L, 0.25)))
  }
}
